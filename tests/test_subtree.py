"""Depth-1 subtree Pallas offload (ops/scl.py subtree_backend="pallas" +
ops/pallas_scl.py subtree=True) vs the plain unrolled XLA decoder.

The subtree kernel consumes the stage-1 DOWN's LLR block + path metrics
and returns ordinary traj entries, the net survival permutation, and the
re-encoded child block; the sub-program's classification and fork order
equal the corresponding span of the full program, so results must be
bit-identical. The r4 regression this pins: the lam input is PATH-BOUND
at kernel entry — stage-1 DOWNs after an in-kernel fork must gather it
through the accumulated net survival map (path-invariant channel inputs
never need this, which is why broadcast-input tests alone missed it).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polar_tpu.models.polar import CodeSpec, CrcSpec
from polar_tpu.ops.scl import build_scl_decoder


def _mixed_spec(factors, K, crc, seed=1):
    N = int(np.prod(factors))
    r = np.random.default_rng(seed)
    nk = K + (crc.width if crc else 0)
    mask = np.ones(N, np.uint8)
    mask[np.argsort(r.random(N) + np.linspace(0, 1, N))[-nk:]] = 0
    return CodeSpec(N=N, K=K, factors=tuple(factors),
                    frozen_mask=tuple(int(v) for v in mask), crc=crc)


@pytest.mark.parametrize("factors,K,L,crc", [
    ((2, 2, 2, 2, 2), 12, 2, None),            # binary, diverging paths
    pytest.param((2, 2, 2, 2, 2), 12, 4, CrcSpec(8, 0x07, 0),
                 marks=pytest.mark.slow),
    pytest.param((16, 2, 2), 20, 8, CrcSpec(8, 0x07, 0),
                 marks=pytest.mark.slow),      # eBCH outer stage
    pytest.param((2, 16, 2), 14, 4, CrcSpec(8, 0x07, 0),
                 marks=pytest.mark.slow),      # eBCH SUB-stage (trellis
    pytest.param((16, 16), 100, 2, None,       # in-kernel), bch_sc shape
                 marks=pytest.mark.slow),
    pytest.param((16, 2, 2), 24, 1, None,
                 marks=pytest.mark.slow),      # SC (P=1)
    # VERDICT r4 item 6: mixed_scl32's ACTUAL child shape — depth-1
    # subtrees of (2,16,2,2,2,2) are (16,2,2,2,2) n=256 at L=32, the
    # VMEM-binding operating point of the real config-4 kernel.
    pytest.param((2, 16, 2, 2, 2, 2), 200, 32, CrcSpec(16, 0x1021, 0),
                 marks=pytest.mark.slow),
])
def test_subtree_matches_plain(factors, K, L, crc):
    spec = _mixed_spec(factors, K, crc)
    llr = 3.0 * jax.random.normal(jax.random.key(L + 31),
                                  (128, spec.N), jnp.float32)
    ref = jax.jit(build_scl_decoder(spec, L))(llr)
    out = build_scl_decoder(spec, L, subtree_backend="pallas",
                            pallas_interpret=True)(llr)
    for f in ("u", "payload", "crc_ok", "pm"):
        a, b = np.asarray(getattr(out, f)), np.asarray(getattr(ref, f))
        assert np.allclose(a, b), f


@pytest.mark.slow
def test_subtree_multitile():
    """VERDICT r4 item 6: B=256 with batch_tile=128 runs the subtree
    kernels over a 2-tile grid — the multi-tile path all other cases
    (B=128 = one tile) never touch."""
    spec = _mixed_spec((2, 2, 2, 2, 2), 12, CrcSpec(8, 0x07, 0))
    llr = 3.0 * jax.random.normal(jax.random.key(97),
                                  (256, spec.N), jnp.float32)
    ref = jax.jit(build_scl_decoder(spec, 4))(llr)
    out = build_scl_decoder(spec, 4, subtree_backend="pallas",
                            pallas_interpret=True)(llr)
    for f in ("u", "payload", "crc_ok", "pm"):
        a, b = np.asarray(getattr(out, f)), np.asarray(getattr(ref, f))
        assert np.allclose(a, b), f
