"""Hybrid big-stage Pallas kernels (ops/pallas_stage.py) vs the pure-XLA
decoder: bit-identical on BCH/mixed kernel configs (interpret mode on the
CPU backend; the real-TPU check is the mixed golden record replay +
decode_bench --big-stage pallas)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polar_tpu.models.polar import CodeSpec, CrcSpec
from polar_tpu.ops.kernel_proc import StageProcessor
from polar_tpu.ops.scl import build_scl_decoder

from tests.test_pallas_scl import _mixed_spec


@pytest.mark.slow
def test_down_kernel_matches_stage_processor():
    """Every input i of the 16x16 eBCH kernel: the standalone Pallas DOWN
    kernel equals StageProcessor._llr_static bit-for-bit (both backends,
    trellis i<5 and table 5<=i<15)."""
    from polar_tpu.kernels.bch import build_bch_kernel
    from polar_tpu.ops.pallas_stage import build_down_kernel

    K = build_bch_kernel(16)
    proc = StageProcessor(K)
    rng = np.random.default_rng(0)
    P, n, B = 2, 4, 8
    lam_adj = jnp.asarray(rng.normal(0, 2, (P, 16, n, B)), jnp.float32)
    for i in range(15):           # i = 15 is the plain-correlation XLA path
        ref = np.asarray(proc._llr_static(i, lam_adj))
        got = np.asarray(build_down_kernel(K, i, P, n, batch_tile=B,
                                           interpret=True)(lam_adj))
        assert np.array_equal(got, ref), (i, proc.backend[i])


@pytest.mark.parametrize("factors,K,L,crc", [
    ((16,), 6, 1, None),
    pytest.param((16, 2), 12, 2, None, marks=pytest.mark.slow),
    pytest.param((16, 2, 2), 20, 8, CrcSpec(8, 0x07, 0),
                 marks=pytest.mark.slow),   # mixed_scl32 shape, CA-SCL
])
def test_hybrid_decoder_matches_xla(factors, K, L, crc):
    spec = _mixed_spec(factors, K, crc)
    llr = 2.0 * jax.random.normal(jax.random.key(spec.N + L),
                                  (128, spec.N), jnp.float32)
    ref = jax.jit(build_scl_decoder(spec, L))(llr)
    out = jax.jit(build_scl_decoder(spec, L, big_stage_backend="pallas",
                                    pallas_interpret=True))(llr)
    for f in ("u", "payload", "crc_ok", "pm"):
        a, b = np.asarray(getattr(out, f)), np.asarray(getattr(ref, f))
        assert np.array_equal(a, b), f
