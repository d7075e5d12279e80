"""Bit-match convention knobs (SURVEY.md §2.3 items 4-5; VERDICT.md r1
item 5): exact (boxplus / sum-product) f-function and smooth
log1p(exp(-|llr|)) path metric, each verified device-vs-oracle under the
same knob settings."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from polar_tpu.kernels.arikan import f_exact, f_minsum
from polar_tpu.oracle import sc_decode, scl_decode
from polar_tpu.ops.scl import build_scl_decoder

from tests.test_decoders import _noisy_frames, _spec


def test_f_exact_is_boxplus():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 3, 256).astype(np.float64)
    b = rng.normal(0, 3, 256).astype(np.float64)
    want = 2.0 * np.arctanh(np.tanh(a / 2) * np.tanh(b / 2))
    got = np.asarray(f_exact(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)  # f32 device
    # |f_exact| <= |f_minsum|, equal sign
    ms = np.asarray(f_minsum(jnp.asarray(a), jnp.asarray(b)))
    assert (np.abs(got) <= np.abs(ms) + 1e-6).all()
    assert (np.sign(got) == np.sign(ms)).all()


KNOB_CONFIGS = [
    # factors, K, L, f_mode, pm_mode
    ((2, 2, 2, 2), 8, 1, "exact", "abs"),
    ((2, 2, 2, 2), 8, 4, "exact", "abs"),
    ((2, 2, 2, 2), 8, 4, "minsum", "smooth"),
    ((2, 2, 2, 2, 2), 10, 4, "exact", "smooth"),
    ((16,), 8, 4, "exact", "abs"),
    ((16, 2), 16, 2, "exact", "smooth"),
]


@pytest.mark.parametrize("factors,K,L,f_mode,pm_mode", KNOB_CONFIGS)
def test_knobs_match_oracle(factors, K, L, f_mode, pm_mode):
    spec = _spec(factors, K, seed=5)
    dec = jax.jit(build_scl_decoder(spec, L, f_mode=f_mode, pm_mode=pm_mode))
    B = 12
    _, llr = _noisy_frames(spec, B, seed=21)
    out = np.asarray(dec(jnp.asarray(llr)).u)
    for i in range(B):
        if L > 1:
            ref = scl_decode(spec, llr[i], L, f_mode=f_mode, pm_mode=pm_mode)
        else:
            ref = sc_decode(spec, llr[i], f_mode=f_mode)
        assert np.array_equal(out[i], ref), f"frame {i} mismatch"


def test_knobs_change_decisions():
    """The knobs must actually flip something on noisy frames (i.e. they
    are wired through, not silently ignored)."""
    spec = _spec((2, 2, 2, 2, 2), 16, seed=2)
    _, llr = _noisy_frames(spec, 64, noise=2.5, seed=3)
    base = np.asarray(jax.jit(build_scl_decoder(spec, 4))(jnp.asarray(llr)).u)
    ex = np.asarray(jax.jit(build_scl_decoder(spec, 4, f_mode="exact"))(
        jnp.asarray(llr)).u)
    sm = np.asarray(jax.jit(build_scl_decoder(spec, 4, pm_mode="smooth"))(
        jnp.asarray(llr)).u)
    assert (base != ex).any()
    assert (base != sm).any()


@pytest.mark.slow
def test_llr_dtype_bfloat16():
    """VERDICT r2 item 3: `llr_dtype` had zero test coverage. bfloat16
    LLR state must (a) run and return the right shapes/dtypes, (b) decode
    noiseless frames perfectly, (c) track the f32 FER on noisy frames
    (decisions may differ on tie-adjacent LLRs; the curve must not)."""
    spec = _spec((2,) * 7, 56, seed=5)          # N=128
    u, llr = _noisy_frames(spec, 512, noise=1.0, seed=11)
    dec32 = jax.jit(build_scl_decoder(spec, 4))
    dec16 = jax.jit(build_scl_decoder(spec, 4, llr_dtype=jnp.bfloat16))

    # (b) noiseless: bit-exact recovery
    u0, llr0 = _noisy_frames(spec, 64, noise=0.0, seed=3)
    out0 = dec16(jnp.asarray(llr0))
    assert np.array_equal(np.asarray(out0.u), u0)

    # (a)+(c): noisy FER tracks f32
    o32 = dec32(jnp.asarray(llr))
    o16 = dec16(jnp.asarray(llr))
    assert o16.u.shape == o32.u.shape and o16.u.dtype == o32.u.dtype
    fer32 = float((np.asarray(o32.u) != u).any(axis=1).mean())
    fer16 = float((np.asarray(o16.u) != u).any(axis=1).mean())
    assert abs(fer16 - fer32) <= 0.05 + 0.5 * fer32, (fer16, fer32)
    # and most frames decode identically
    same = (np.asarray(o16.u) == np.asarray(o32.u)).all(axis=1).mean()
    assert same >= 0.9, same
