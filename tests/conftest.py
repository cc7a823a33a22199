"""Test harness: CPU backend with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (SURVEY §4 implication).

Note: this environment registers a TPU PJRT plugin from ``sitecustomize``
before pytest imports anything, so ``JAX_PLATFORMS`` in the env is too late —
we force the platform through ``jax.config`` instead (backends initialise
lazily, so this works as long as no computation ran yet).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# reruns of the (compile-heavy) suite hit the persistent cache
from stylex_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
