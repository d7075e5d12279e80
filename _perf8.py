"""Scratch: Pallas mega-kernel SCL on real TPU — correctness vs XLA + speed."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from polar_tpu.utils.compilecache import enable
enable()

from polar_tpu.models.presets import ca_scl
from polar_tpu.ops.scl import build_scl_decoder
from polar_tpu.ops.pallas_scl import build_pallas_scl_decoder

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
BT = int(sys.argv[3]) if len(sys.argv) > 3 else 128
spec = ca_scl().spec
print(f"devices: {jax.devices()}  B={B} BT={BT}", flush=True)

dec_p = build_pallas_scl_decoder(spec, 8, batch_tile=BT)
llr = jax.random.normal(jax.random.key(0), (B, spec.N), jnp.float32)

t0 = time.perf_counter()
out_p = jax.jit(dec_p)(llr)
u_p = np.asarray(out_p.u)
print(f"pallas compile+run: {time.perf_counter()-t0:.1f}s", flush=True)

# correctness vs the XLA decoder on-device
dec_x = jax.jit(build_scl_decoder(spec, 8))
out_x = dec_x(llr)
for f in ("u", "payload", "crc_ok", "pm"):
    a, b = np.asarray(getattr(out_p, f)), np.asarray(getattr(out_x, f))
    assert np.allclose(a, b), f
print("pallas == xla bit-match on TPU", flush=True)


def timeit(dec, name):
    @jax.jit
    def many(llr, n):
        def body(_, carry):
            cur, acc = carry
            out = dec(cur)
            s = jnp.sum(out.pm)
            return (llr + 0.0 * s, acc + s)
        return jax.lax.fori_loop(0, n, body, (llr, jnp.float32(0)))[1]

    float(many(llr, 1))
    t0 = time.perf_counter()
    float(many(llr, 1))
    base = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(many(llr, reps + 1))
    dt = (time.perf_counter() - t0 - base) / reps
    print(f"{name}: {dt*1e3:.3f} ms/decode, {B/dt:.0f} cw/s", flush=True)


timeit(dec_p, "pallas")
timeit(dec_x, "xla   ")
