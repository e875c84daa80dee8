"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (no TPU needed in CI). Must run
before jax is imported anywhere."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize may pre-register a remote TPU backend and
# force jax_platforms to it, silently routing every test op through a device
# tunnel. Pin the CPU backend explicitly — env vars alone are overridden.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu"
