"""Pallas mega-kernel SCL decoder vs the XLA decoder (interpret mode on
the CPU backend; the real-TPU bit-match is exercised by
benchmarks/decode_bench.py and bench.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polar_tpu.construction.ga import construct_ga
from polar_tpu.models.polar import CodeSpec, CrcSpec
from polar_tpu.ops.pallas_scl import build_pallas_scl_decoder
from polar_tpu.ops.scl import build_scl_decoder


def _spec(N, K, crc):
    nk = K + (crc.width if crc else 0)
    mask = tuple(int(v) for v in construct_ga(N, nk, 2.0))
    m = int(np.log2(N))
    return CodeSpec(N=N, K=K, factors=(2,) * m, frozen_mask=mask, crc=crc)


@pytest.mark.parametrize("N,K,L,crc", [
    (64, 28, 4, CrcSpec(8, 0x07, 0)),
    (128, 56, 8, CrcSpec(16, 0x1021, 0)),
    (128, 64, 1, None),
])
def test_pallas_matches_xla(N, K, L, crc):
    spec = _spec(N, K, crc)
    llr = 3.0 * jax.random.normal(jax.random.key(N + L), (128, N),
                                  jnp.float32)
    ref = jax.jit(build_scl_decoder(spec, L))(llr)
    out = build_pallas_scl_decoder(spec, L, interpret=True)(llr)
    for f in ("u", "payload", "crc_ok", "pm"):
        a, b = np.asarray(getattr(out, f)), np.asarray(getattr(ref, f))
        assert np.allclose(a, b), f


def test_pallas_rejects_non_arikan():
    from polar_tpu.construction.montecarlo import construct_mc
    mask = tuple(int(v) for v in construct_mc((16, 2), 16, 2.0, frames=512))
    spec = CodeSpec(N=32, K=16, factors=(16, 2), frozen_mask=mask)
    with pytest.raises(ValueError):
        build_pallas_scl_decoder(spec, 4)
