"""Data-parallel mesh utilities: shard_map over a batch axis + psum counters.

TPU-native parallelism layer (SURVEY.md §2.2): the reference is single
process [B:7]; here Monte-Carlo codeword batches shard over every chip of
a (multi-host) mesh via `shard_map`, and per-shard error counters cross
chips with one `lax.psum` (BASELINE.json:5 "per-host partial error counts
reduced via psum collectives"). Communication rides ICI inside a slice and
DCN across hosts — all inserted by XLA from the collective, never by hand.
"""
from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def make_batch_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh with a single 'batch' axis over the given/all devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), ("batch",))


def init_multihost() -> None:
    """Initialize the JAX distributed runtime for a multi-host pod slice.

    No-op in single-process runs. On a real pod each process calls this
    before first device use (coordinator from the cluster env); we gate on
    env presence so the same entry point works everywhere.
    """
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def sharded_mc_step(step_fn, mesh: Mesh):
    """Wrap a per-shard Monte-Carlo step into an SPMD step over the mesh.

    step_fn(key, args) must return a dict of counter arrays summed over its
    local shard; it *generates* its shard's codewords on-device from the
    key (no host data motion). The wrapper replicates (key, args), folds
    each device's mesh position into the key so shards draw independent
    info/noise, and psums the counters across the mesh.
    """

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P()), out_specs=P(),
        check_vma=False)
    def wrapped(key, args):
        idx = jax.lax.axis_index("batch")
        counters = step_fn(jax.random.fold_in(key, idx), args)
        return {k: jax.lax.psum(v, "batch") for k, v in counters.items()}

    return wrapped
