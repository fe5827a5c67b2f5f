"""Test configuration: force JAX onto a virtual 8-device CPU mesh with x64
enabled, so sharding tests run without TPU hardware.

Note: the axon TPU plugin ignores JAX_PLATFORMS, so merely setting the env
var is not enough — we also pin jax's default device to the CPU backend.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
try:
    _cpu = jax.local_devices(backend="cpu")[0]
    jax.config.update("jax_default_device", _cpu)
except Exception:
    pass
