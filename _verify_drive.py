"""Verify driver: public API end-to-end (encode -> AWGN -> SC/SCL decode).

Drives the flows the verify skill lists: Arikan (2,)*k, pure (16,) BCH,
mixed kernels; L=1 vs L>1; with/without CRC. Checks FER monotonicity,
crc_ok ~ 1-FER, zero-noise exactness, and oracle bit-match on one config.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from polar_tpu.utils.compilecache import enable
enable()

from polar_tpu.models.polar import CodeSpec, CrcSpec
from polar_tpu.ops.crc import crc_append
from polar_tpu.ops.encode import encode
from polar_tpu.ops.scl import build_scl_decoder
from polar_tpu.sim.channel import ebn0_to_sigma

print(f"backend: {jax.default_backend()}  devices: {jax.devices()}",
      flush=True)

# frozen masks are construction artifacts, not the thing under test here;
# cache them so the TPU pass doesn't recompile the genie-MC constructor
import pathlib
_MASKS = pathlib.Path("/tmp/_verify_masks.npz")
if _MASKS.exists():
    _m = dict(np.load(_MASKS))
else:
    from polar_tpu.construction.ga import construct_ga
    from polar_tpu.construction.montecarlo import construct_mc
    _m = {
        "a256_128": construct_ga(256, 128, 2.0),
        "a256_136": construct_ga(256, 136, 2.0),
        "b256_128": construct_mc((16, 16), 128, 2.0, frames=2048),
        "m64_32": construct_mc((16, 2, 2), 32, 2.0, frames=2048),
        "a32_20": construct_ga(32, 20, 2.0),
    }
    np.savez(_MASKS, **_m)


def _mask(name):
    return tuple(int(v) for v in _m[name])


def drive(spec, L, snrs=(1.0, 3.0, 8.0), batch=512, seed=0):
    dec = jax.jit(build_scl_decoder(spec, L))
    K = spec.K
    fers = []
    for i, snr in enumerate(snrs):
        sigma = float(ebn0_to_sigma(snr, spec.rate))
        key = jax.random.fold_in(jax.random.key(seed), i)
        k1, k2 = jax.random.split(key)
        info = jax.random.bernoulli(k1, 0.5, (batch, K)).astype(jnp.int8)
        payload = crc_append(spec.crc, info) if spec.crc else info
        x = encode(spec, payload)
        y = (1.0 - 2.0 * x.astype(jnp.float32)) + sigma * jax.random.normal(
            k2, x.shape, jnp.float32)
        out = dec(2.0 * y / (sigma * sigma))
        got = np.asarray(out.payload[:, :K])
        fer = float(np.mean(np.any(got != np.asarray(info), axis=1)))
        crc_rate = float(np.mean(np.asarray(out.crc_ok)))
        fers.append(fer)
        if spec.crc is not None:
            assert abs(crc_rate - (1.0 - fer)) < 0.05, (crc_rate, fer)
    assert all(fers[i] >= fers[i + 1] - 1e-9 for i in range(len(fers) - 1)), fers
    assert fers[-1] == 0.0, fers
    # noiseless replay must be exact
    llr_clean = 50.0 * (1.0 - 2.0 * np.asarray(x, np.float32))
    out = dec(jnp.asarray(llr_clean))
    assert np.array_equal(np.asarray(out.payload[:, :K]), np.asarray(info))
    return fers


# 1. Arikan N=256 K=128, SC (L=1), no CRC
s1 = CodeSpec(N=256, K=128, factors=(2,) * 8, frozen_mask=_mask("a256_128"))
f1 = drive(s1, 1)
print(f"arikan_sc256   FER {f1}", flush=True)

# 2. Arikan N=256 K=120 + CRC-16, SCL L=8
s2 = CodeSpec(N=256, K=120, factors=(2,) * 8, frozen_mask=_mask("a256_136"),
              crc=CrcSpec(16, 0x1021, 0))
f2 = drive(s2, 8)
print(f"ca_scl256      FER {f2}", flush=True)

# 3. pure BCH 16x16, N=256 K=128, SC
s3 = CodeSpec(N=256, K=128, factors=(16, 16), frozen_mask=_mask("b256_128"))
f3 = drive(s3, 1)
print(f"bch_sc256      FER {f3}", flush=True)

# 4. mixed (16, 2, 2) N=64 K=24 + CRC-8, SCL L=4
s4 = CodeSpec(N=64, K=24, factors=(16, 2, 2), frozen_mask=_mask("m64_32"),
              crc=CrcSpec(8, 0x07, 0))
f4 = drive(s4, 4, snrs=(1.0, 4.0, 9.0))
print(f"mixed_scl64    FER {f4}", flush=True)

# 5. oracle bit-match: Arikan N=32 SCL L=4 + CRC-8 on noisy frames
from polar_tpu.oracle import scl_decode
s5 = CodeSpec(N=32, K=12, factors=(2,) * 5, frozen_mask=_mask("a32_20"),
              crc=CrcSpec(8, 0x07, 0))
dec5 = jax.jit(build_scl_decoder(s5, 4))
rng = np.random.default_rng(7)
llrs = rng.normal(0, 3.0, (64, 32)).astype(np.float32)
out = dec5(jnp.asarray(llrs))
for i in range(llrs.shape[0]):
    u_ref = scl_decode(s5, llrs[i], 4)
    assert np.array_equal(np.asarray(out.u[i]), u_ref), f"frame {i}"
print("oracle bit-match: 64/64 frames exact", flush=True)
print("VERIFY OK", flush=True)
