"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Bench runs on the real TPU chip; unit tests exercise the same code on CPU,
including multi-device sharding via xla_force_host_platform_device_count.
Must run before the first `import jax` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon TPU plugin in this image ignores the JAX_PLATFORMS env var, so
# force CPU through the config API as well (must run before backend init).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
