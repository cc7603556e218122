"""Test configuration: hermetic CPU backend with 8 virtual devices.

Multi-chip sharding logic is validated on a virtual CPU mesh
(`--xla_force_host_platform_device_count=8`), mirroring how the driver's
`dryrun_multichip` validates the pjit path without real multi-chip hardware.
Must run before the first jax import in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize pins jax_platforms="axon,cpu" at interpreter
# startup; force the hermetic CPU backend back for tests (no backend has
# been initialized yet — conftest runs before any array is created).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
