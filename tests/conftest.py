"""Force tests onto the host CPU backend with 8 virtual devices.

Two environment quirks (SURVEY.md §4 "Multi-host without a cluster"):
- XLA_FLAGS --xla_force_host_platform_device_count=8 gives a virtual
  8-device mesh for sharding tests without TPU hardware.
- The axon remote-TPU plugin (registered by a sitecustomize when
  PALLAS_AXON_POOL_IPS is set) force-overrides jax_platforms; tests must
  not tunnel to the real chip, so we clear its trigger variable and pin
  the platform before jax initializes.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# unrolled decoder programs are compile-heavy; reuse executables across
# test runs (cache is keyed by HLO, so correctness is unaffected)
from polar_tpu.utils.compilecache import enable  # noqa: E402

enable()
