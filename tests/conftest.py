"""Test configuration: force an 8-device CPU mesh before JAX initializes.

Multi-chip sharding is validated on virtual CPU devices
(xla_force_host_platform_device_count), per the TPU-less CI strategy.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
