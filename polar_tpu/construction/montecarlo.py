"""Genie-aided Monte-Carlo frozen-set construction (any kernel mix).

TPU-native equivalent of the reference's code construction for BCH/mixed
kernels (SURVEY.md C6; exact reference method unknown — §2.3 item 2 — so
this is the standard genie method, run on our own batched device decoder):

Transmit the all-zero codeword through BPSK-AWGN at the design SNR, run SC
with every decision forced correct (genie), and count per-leaf LLR sign
errors. The error rate of leaf i estimates the i-th subchannel's
Bhattacharyya-like unreliability; freeze the worst N - n_unfrozen leaves.

Runs batched on whatever backend is active (CPU for tests, TPU for real
construction). Deterministic given the seed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from polar_tpu.models.polar import CodeSpec
from polar_tpu.ops.scl import build_scl_decoder
from polar_tpu.sim.channel import ebn0_to_sigma


def mc_leaf_error_rates(factors: tuple[int, ...], design_ebn0_db: float,
                        rate: float, frames: int = 1 << 14,
                        batch: int = 1 << 10, seed: int = 0) -> np.ndarray:
    """Per-leaf genie error rates [N] at the design SNR."""
    N = int(np.prod(factors))
    # frozen mask content is irrelevant in genie mode; use all-frozen
    spec = CodeSpec(N=N, K=0, factors=tuple(factors),
                    frozen_mask=(1,) * N, crc=None)
    dec = jax.jit(build_scl_decoder(spec, 1, genie=True))
    sigma = float(ebn0_to_sigma(design_ebn0_db, rate))

    @jax.jit
    def step(key):
        y = 1.0 + sigma * jax.random.normal(key, (batch, N), jnp.float32)
        llr = 2.0 * y / (sigma * sigma)
        out = dec(llr)
        return jnp.sum(out.u.astype(jnp.int32), axis=0)  # [N] error counts

    counts = np.zeros(N, np.int64)
    done = 0
    k = 0
    key = jax.random.key(seed)
    while done < frames:
        counts += np.asarray(step(jax.random.fold_in(key, k)))
        done += batch
        k += 1
    return counts / done


def construct_mc(factors: tuple[int, ...], n_unfrozen: int,
                 design_ebn0_db: float, rate: float | None = None,
                 frames: int = 1 << 14, seed: int = 0) -> np.ndarray:
    """Frozen mask (1 = frozen) by genie Monte-Carlo at the design SNR."""
    N = int(np.prod(factors))
    r = rate if rate is not None else n_unfrozen / N
    err = mc_leaf_error_rates(tuple(factors), design_ebn0_db, r,
                              frames=frames, seed=seed)
    order = np.argsort(err, kind="stable")      # most reliable first
    frozen = np.ones(N, dtype=np.uint8)
    frozen[order[:n_unfrozen]] = 0
    return frozen
