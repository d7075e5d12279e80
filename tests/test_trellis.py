"""Trellis backend tests: minimal-trellis min-path == brute force, and the
integrated per-input backend choice stays bit-exact (SURVEY.md C5, §4)."""
import numpy as np
import jax.numpy as jnp

from polar_tpu.kernels.bch import build_bch_kernel
from polar_tpu.kernels.trellis import build_trellis, min_path_cost
from polar_tpu.ops.kernel_proc import StageProcessor


def _brute_min_cost(tail_basis, lam):
    nf = tail_basis.shape[0]
    msgs = ((np.arange(1 << nf)[:, None] >> np.arange(nf)[None, :]) & 1)
    words = (msgs.astype(np.int64) @ tail_basis.astype(np.int64)) % 2
    pen = np.where(words[:, :, None, None] == 1,
                   np.maximum(lam, 0)[None], np.maximum(-lam, 0)[None])
    return pen.sum(axis=1).min(axis=0)


def test_min_path_matches_brute_force():
    K = build_bch_kernel(16)
    rng = np.random.default_rng(0)
    for i in [0, 2, 5, 11, 14]:
        tr = build_trellis(K[i + 1:], 16)
        lam = rng.normal(0, 2, (1, 16, 2, 3)).astype(np.float32)
        got = np.asarray(min_path_cost(tr, jnp.asarray(lam)))[0]
        ref = _brute_min_cost(K[i + 1:], lam[0])
        assert np.allclose(got, ref, atol=1e-4), i


def test_spc_trellis_two_states():
    K = build_bch_kernel(16)
    tr = build_trellis(K[1:], 16)   # [16,15] SPC tail of input 0
    assert tr.s_max == 2


def test_backend_split_exists():
    proc = StageProcessor(build_bch_kernel(16))
    assert "trellis" in proc.backend and "table" in proc.backend
    # small i (huge cosets, tiny trellis) must use the trellis
    assert proc.backend[0] == "trellis"
    # large i (tiny cosets) must use the table
    assert proc.backend[14] == "table"


def test_backends_agree_on_llr():
    """Force-table vs auto (trellis for small i) give identical LLRs."""
    K = build_bch_kernel(16)
    rng = np.random.default_rng(1)
    auto = StageProcessor(K)
    forced = StageProcessor(K)
    from polar_tpu.ops.kernel_proc import _tail_table
    forced.backend = ["table"] * 16
    forced.tables = [_tail_table(K, i) for i in range(16)]
    lam = jnp.asarray(rng.normal(0, 2, (2, 16, 4, 3)).astype(np.float32))
    for i in [0, 1, 4, 9]:
        a = np.asarray(auto._llr_static(i, lam))
        b = np.asarray(forced._llr_static(i, lam))
        assert np.allclose(a, b, atol=1e-4), i
