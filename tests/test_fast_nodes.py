"""Fast-node program equivalence: the pruned fast-SSC(L) decoder must match
the leaf-sequential decoder (fast=False) frame-for-frame, including large
R1/SPC nodes where the Fast-SSCL fork bounds min(L-1, n) / min(L, n-1)
actually bind (SURVEY.md §7.2 item 1)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from polar_tpu.models.polar import CodeSpec, CrcSpec
from polar_tpu.construction.ga import construct_ga
from polar_tpu.ops.encode import encode_u
from polar_tpu.ops.program import build_program
from polar_tpu.ops.scl import build_scl_decoder


def _ga_spec(n_stages, K, crc=None):
    N = 1 << n_stages
    nslots = K + (crc.width if crc else 0)
    mask = tuple(int(v) for v in construct_ga(N, nslots, 2.0))
    return CodeSpec(N=N, K=K, factors=(2,) * n_stages, frozen_mask=mask,
                    crc=crc)


@pytest.mark.parametrize("L", [
    1,
    pytest.param(4, marks=pytest.mark.slow),
    pytest.param(8, marks=pytest.mark.slow),
])
def test_fast_equals_leafwise(L):
    spec = _ga_spec(8, 128)
    # make sure the program actually contains big special nodes
    prog = build_program(spec, scl=(L > 1))
    kinds = {op.kind for op in prog.ops}
    assert "R1" in kinds and "R0" in kinds
    rng = np.random.default_rng(17)
    B = 96
    u = np.zeros((B, spec.N), np.uint8)
    u[:, spec.info_positions] = rng.integers(0, 2, (B, spec.K))
    x = np.asarray(encode_u(spec, jnp.asarray(u)))
    llr = ((1 - 2 * x) * 1.6 + rng.normal(0, 1.3, x.shape)).astype(np.float32)
    fast = jax.jit(build_scl_decoder(spec, L, fast=True))
    slow = jax.jit(build_scl_decoder(spec, L, fast=False))
    uf = np.asarray(fast(jnp.asarray(llr)).u)
    us = np.asarray(slow(jnp.asarray(llr)).u)
    mism = (uf != us).any(axis=1).sum()
    assert mism == 0, f"{mism}/{B} frames differ"


def test_spc_nodes_present_and_exact_scl():
    # craft a spec with a guaranteed SPC node: freeze only the first leaf
    # of the second half-tree
    N = 64
    frozen = np.zeros(N, np.uint8)
    frozen[:33] = 1   # first half frozen (R0) + first leaf of second half
    spec = CodeSpec(N=N, K=31, factors=(2,) * 6,
                    frozen_mask=tuple(int(v) for v in frozen))
    prog = build_program(spec, scl=True)
    assert any(op.kind == "SPC" for op in prog.ops)
    rng = np.random.default_rng(23)
    llr = rng.normal(0.4, 1.5, (64, N)).astype(np.float32)
    fast = jax.jit(build_scl_decoder(spec, 8, fast=True))
    slow = jax.jit(build_scl_decoder(spec, 8, fast=False))
    uf = np.asarray(fast(jnp.asarray(llr)).u)
    us = np.asarray(slow(jnp.asarray(llr)).u)
    assert (uf == us).all()
