"""Batched CRC append/check as GF(2) matmuls (device-side).

TPU-native equivalent of the reference's C++ `Crc16` (SURVEY.md C10;
BASELINE.json:8 "K=512 + CRC-16"). The reference computes CRCs bitwise
per codeword; on TPU the CRC is a linear map over GF(2), so appending or
checking a batch of CRCs is one [B, K] @ [K, width] matmul on the MXU
followed by mod 2 — plus an affine offset when init != 0.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from polar_tpu.models.polar import CrcSpec


def crc_append(crc: CrcSpec, info: jnp.ndarray) -> jnp.ndarray:
    """info [..., K] -> [..., K + width] with CRC bits appended."""
    k = info.shape[-1]
    g = jnp.asarray(crc.generator_matrix(k).astype(np.float32))
    off = jnp.asarray(crc.offset_bits(k).astype(np.float32))
    bits = jnp.mod(info.astype(jnp.float32) @ g + off, 2.0)
    return jnp.concatenate([info.astype(jnp.int8), bits.astype(jnp.int8)], axis=-1)


def crc_check(crc: CrcSpec, payload: jnp.ndarray) -> jnp.ndarray:
    """payload [..., K + width] (info ++ crc) -> bool [...]: True if CRC ok."""
    k = payload.shape[-1] - crc.width
    info = payload[..., :k]
    expect = payload[..., k:]
    g = jnp.asarray(crc.generator_matrix(k).astype(np.float32))
    off = jnp.asarray(crc.offset_bits(k).astype(np.float32))
    bits = jnp.mod(info.astype(jnp.float32) @ g + off, 2.0)
    return jnp.all(bits.astype(jnp.int8) == expect.astype(jnp.int8), axis=-1)
