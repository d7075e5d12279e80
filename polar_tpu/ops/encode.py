"""Batched multi-kernel polar encoder (device-side, XLA).

TPU-native equivalent of the reference's C++ `PolarCode::encode`
(SURVEY.md C7; BASELINE.json:5 "the Arikan/BCH-kernel Kronecker encoder
becomes a batched bit-transform kernel"). Instead of the reference's
per-codeword butterfly over GF(2), we apply each kernel factor as a
batched tensordot along its own axis of the [B, l_1, ..., l_m] reshape —
m small dense matmuls that XLA fuses and tiles for the MXU/VPU, with the
batch as the leading dimension.

x = u · (K_1 ⊗ ... ⊗ K_m) mod 2, position index p = sum_s a_s * n_s.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from polar_tpu.models.polar import CodeSpec


def encode_u(spec: CodeSpec, u: jnp.ndarray) -> jnp.ndarray:
    """Apply the full Kronecker transform to u-vectors.

    u: [..., N] int (0/1). Returns codewords x: [..., N] int8.
    """
    factors = spec.factors
    batch_shape = u.shape[:-1]
    t = u.reshape(*batch_shape, *factors).astype(jnp.float32)
    nb = len(batch_shape)
    for s, l in enumerate(factors):
        k = jnp.asarray(np.asarray(spec.kernels[s], dtype=np.float32))
        axis = nb + s
        # contract u-axis s with kernel rows: out[..., a_s, ...] =
        #   sum_i t[..., i, ...] * K[i, a_s]
        t = jnp.tensordot(t, k, axes=[[axis], [0]])
        # tensordot moves the contracted axis's replacement to the end; put it back
        t = jnp.moveaxis(t, -1, axis)
    x = jnp.mod(t, 2.0)
    return x.reshape(*batch_shape, spec.N).astype(jnp.int8)


def assemble_u(spec: CodeSpec, payload: jnp.ndarray) -> jnp.ndarray:
    """Scatter payload bits (info + CRC, already concatenated in slot order)
    into unfrozen positions; zeros at frozen positions.

    payload: [..., K + n_crc] -> u: [..., N]
    """
    batch_shape = payload.shape[:-1]
    u = jnp.zeros((*batch_shape, spec.N), dtype=jnp.int8)
    pos = jnp.asarray(spec.info_positions)
    return u.at[..., pos].set(payload.astype(jnp.int8))


def encode(spec: CodeSpec, payload: jnp.ndarray) -> jnp.ndarray:
    """payload (info+CRC bits) -> codeword x [..., N]."""
    return encode_u(spec, assemble_u(spec, payload))


def extract_payload(spec: CodeSpec, u: jnp.ndarray) -> jnp.ndarray:
    """Gather unfrozen positions of u: inverse of assemble_u."""
    pos = jnp.asarray(spec.info_positions)
    return u[..., pos]
