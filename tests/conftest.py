"""Test configuration: force an 8-device CPU mesh.

The session interpreter boots with the axon TPU plugin registered (sitecustomize)
and JAX_PLATFORMS=axon pinned in the env, so env vars alone don't stick — jax is
already imported by the time conftest runs. `jax.config.update("jax_platforms")`
before the first backend query reliably selects CPU, and XLA_FLAGS set here is
still honored because no backend client exists yet.

Multi-chip sharding is validated on the 8 virtual CPU devices
(xla_force_host_platform_device_count), per the TPU-less CI strategy.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the suite jit-compiles many tiny programs; cached
# binaries make repeat runs several times faster
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()} — "
    "a backend was initialized before conftest ran"
)
