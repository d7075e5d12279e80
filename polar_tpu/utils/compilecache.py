"""Persistent XLA compilation cache setup.

The remote-tunnel TPU in this environment compiles slowly (and with
PALLAS_AXON_REMOTE_COMPILE the compile travels over the tunnel), so every
entry point enables jax's persistent cache: a program compiled once is
reused across processes.
"""
import os


def enable(cache_dir: str | None = None) -> None:
    import jax

    path = cache_dir or os.environ.get(
        "POLAR_TPU_JAX_CACHE", "/tmp/polar_tpu_jax_cache")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs
