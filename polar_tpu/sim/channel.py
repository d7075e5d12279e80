"""BPSK modulation, AWGN channel, LLR demodulation (device-side).

TPU-native equivalent of the reference's C++ channel/modem (SURVEY.md C11;
BASELINE.json:5 "BPSK-AWGN mod/demod, LLR computation"). Conventions:
bit 0 -> +1, bit 1 -> -1; noise variance sigma^2 = 1 / (2 * R * 10^(EbN0/10));
llr = 2y / sigma^2 (positive llr favors bit 0).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ebn0_to_sigma(ebn0_db, rate: float):
    """Noise standard deviation for BPSK at the given Eb/N0 (dB) and code rate."""
    ebn0 = 10.0 ** (jnp.asarray(ebn0_db, dtype=jnp.float32) / 10.0)
    return jnp.sqrt(1.0 / (2.0 * rate * ebn0))


def modulate(bits: jnp.ndarray) -> jnp.ndarray:
    """0 -> +1.0, 1 -> -1.0."""
    return 1.0 - 2.0 * bits.astype(jnp.float32)


def awgn(key: jax.Array, symbols: jnp.ndarray, sigma) -> jnp.ndarray:
    return symbols + sigma * jax.random.normal(key, symbols.shape, dtype=jnp.float32)


def llr_demod(y: jnp.ndarray, sigma) -> jnp.ndarray:
    return 2.0 * y / (sigma * sigma)


def channel_llrs(key: jax.Array, codeword_bits: jnp.ndarray, ebn0_db, rate: float):
    """bits -> noisy channel LLRs in one shot."""
    sigma = ebn0_to_sigma(ebn0_db, rate)
    y = awgn(key, modulate(codeword_bits), sigma)
    return llr_demod(y, sigma)
