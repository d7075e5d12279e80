"""Kernel-construction tests: eBCH chain, partial distances, f/g algebra
(SURVEY.md §4: "kernel matrices (16x16 eBCH: check partial-distance
profile, invertibility, Kronecker identity); f/g algebra")."""
import numpy as np

from polar_tpu.kernels.arikan import F2, f_minsum, g_update
from polar_tpu.kernels.bch import build_bch_kernel, ebch_chain, partial_distances
from polar_tpu.utils.gf2 import gf2_kron, gf2_rank


def test_ebch_chain_dims_and_nesting():
    chain = ebch_chain(16)
    dims = [g.shape[0] for g in chain]
    assert dims == [16, 15, 11, 7, 5, 1]
    # each code contains the next (nesting)
    for big, small in zip(chain, chain[1:]):
        stacked = np.vstack([big, small])
        assert gf2_rank(stacked) == big.shape[0]


def test_bch16_partial_distances():
    k = build_bch_kernel(16)
    assert k.shape == (16, 16)
    assert gf2_rank(k) == 16
    # canonical eBCH 16x16 partial-distance profile (polarization exponent
    # 0.51828 > Arikan's 0.5)
    assert partial_distances(k) == [1, 2, 2, 2, 2, 4, 4, 4, 4, 6, 6, 8, 8, 8, 8, 16]


def test_bch_kernel_deterministic():
    assert np.array_equal(build_bch_kernel(16), build_bch_kernel(16))


def test_arikan_kernel_kron():
    k4 = gf2_kron(F2, F2)
    assert np.array_equal(
        k4,
        np.array([[1, 0, 0, 0], [1, 1, 0, 0], [1, 0, 1, 0], [1, 1, 1, 1]],
                 np.uint8))


def test_fg_algebra():
    import jax.numpy as jnp
    a = jnp.asarray([1.5, -2.0, 0.5, -0.25])
    b = jnp.asarray([1.0, 1.0, -3.0, -0.5])
    f = np.asarray(f_minsum(a, b))
    assert np.allclose(f, [1.0, -1.0, -0.5, 0.25])
    g0 = np.asarray(g_update(a, b, jnp.zeros_like(a)))
    g1 = np.asarray(g_update(a, b, jnp.ones_like(a)))
    assert np.allclose(g0, np.asarray(a) + np.asarray(b))
    assert np.allclose(g1, np.asarray(b) - np.asarray(a))
