import os

# CPU backend with 8 virtual devices: deterministic unit tests + multi-device
# sharding tests without TPU hardware. (The axon TPU plugin ignores
# JAX_PLATFORMS from the environment, so force it via jax.config too.)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# exact f32 matmuls for golden-value parity against torch CPU
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: the suite is dominated by XLA:CPU compiles of
# the epoch scans / sharded steps, which are identical across runs
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import pytest  # noqa: E402


def reference_available() -> bool:
    return os.path.isdir("/root/reference/src")


requires_reference = pytest.mark.skipif(
    not reference_available(),
    reason="reference implementation not mounted at /root/reference")
