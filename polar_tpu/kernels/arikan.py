"""Arikan 2x2 kernel and its min-sum LLR update functions.

TPU-native equivalent of the reference's C++ f/g routines (SURVEY.md C4;
BASELINE.json:5 "vectorized f/g (min-sum) updates"). These run batched on
device: every call operates on [batch..., lanes] arrays, never scalars.

Conventions (bit-match knobs, SURVEY.md §2.3):
  f(a, b) = sign(a)sign(b) * min(|a|, |b|)     (min-sum check update)
  g(a, b, u0) = b + (1 - 2*u0) * a             (variable update)
  sign(0) treated as +1 (jnp.sign(0)=0 is avoided by using where).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

F2 = np.array([[1, 0], [1, 1]], dtype=np.uint8)


def f_minsum(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Check-node (i=0) LLR update, min-sum approximation."""
    sign = jnp.where((a < 0) ^ (b < 0), -1.0, 1.0).astype(a.dtype)
    return sign * jnp.minimum(jnp.abs(a), jnp.abs(b))


def g_update(a: jnp.ndarray, b: jnp.ndarray, u0: jnp.ndarray) -> jnp.ndarray:
    """Variable-node (i=1) LLR update given the decision u0 for input 0."""
    return b + (1.0 - 2.0 * u0.astype(a.dtype)) * a


def f_exact(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Check-node (i=0) LLR update, exact boxplus
    2*atanh(tanh(a/2)*tanh(b/2)), in the numerically stable log-domain
    form  f_minsum(a, b) + log1p(e^{-(|a|+|b|)}) - log1p(e^{-||a|-|b||}).

    Bit-match knob (SURVEY.md §2.3 item 5): flips the decoder from the
    min-sum approximation to exact sum-product marginals so a reference
    using tanh-sum f can be matched. The fast-SSC(L) node shortcuts assume
    min-sum telescoping and are auto-disabled under this mode
    (ops/scl.py `build_scl_decoder(f_mode="exact")`).
    """
    aa, ab = jnp.abs(a), jnp.abs(b)
    corr = (jnp.log1p(jnp.exp(-(aa + ab)))
            - jnp.log1p(jnp.exp(-jnp.abs(aa - ab))))
    sign = jnp.where((a < 0) ^ (b < 0), -1.0, 1.0).astype(a.dtype)
    return f_minsum(a, b) + sign * corr.astype(a.dtype)
