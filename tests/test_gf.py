"""Unit tests for GF(2) / GF(2^m) host math (SURVEY.md §4 Unit row)."""
import numpy as np
import pytest

from polar_tpu.utils.gf2 import (
    gf2_inverse, gf2_kron, gf2_matmul, gf2_rank, gf2_null_space, min_weight,
)
from polar_tpu.utils.gf2m import GF2m, poly_div_gf2, poly_mul_gf2


def test_gf2_matmul_kron():
    a = np.array([[1, 1], [0, 1]], np.uint8)
    b = np.array([[1, 0], [1, 1]], np.uint8)
    assert np.array_equal(gf2_matmul(a, b), np.array([[0, 1], [1, 1]], np.uint8))
    k = gf2_kron(a, b)
    assert k.shape == (4, 4)
    assert np.array_equal(k[:2, :2], b)


def test_gf2_rank_inverse():
    rng = np.random.default_rng(0)
    for _ in range(20):
        n = rng.integers(2, 8)
        a = rng.integers(0, 2, (n, n)).astype(np.uint8)
        if gf2_rank(a) < n:
            with pytest.raises(ValueError):
                gf2_inverse(a)
            continue
        inv = gf2_inverse(a)
        assert np.array_equal(gf2_matmul(a, inv), np.eye(n, dtype=np.uint8))


def test_null_space():
    a = np.array([[1, 1, 0], [0, 1, 1]], np.uint8)
    ns = gf2_null_space(a)
    for v in ns:
        assert not gf2_matmul(a, v.reshape(-1, 1)).any()
    assert gf2_rank(ns) == 1


def test_min_weight_hamming():
    # [7,4] Hamming code has min distance 3
    g = np.array([
        [1, 0, 0, 0, 1, 1, 0],
        [0, 1, 0, 0, 1, 0, 1],
        [0, 0, 1, 0, 0, 1, 1],
        [0, 0, 0, 1, 1, 1, 1]], np.uint8)
    assert min_weight(g) == 3


def test_gf16_field():
    f = GF2m(4)
    # alpha^15 = 1, field closed, log/exp consistent
    assert f.pow_alpha(15) == 1
    for a in range(1, 16):
        for b in range(1, 16):
            p = f.mul(a, b)
            assert 1 <= p < 16
    # minimal polynomial of alpha over GF(2) is the primitive poly itself
    assert f.minimal_polynomial(1) == 0b10011
    # alpha^5 has order 3 -> degree-2 minimal polynomial x^2+x+1
    assert f.minimal_polynomial(5) == 0b111


def test_poly_ops():
    # (x+1)^2 = x^2+1 over GF(2)
    assert poly_mul_gf2(0b11, 0b11) == 0b101
    q, r = poly_div_gf2(0b101, 0b11)
    assert q == 0b11 and r == 0
