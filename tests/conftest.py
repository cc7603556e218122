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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # 8 virtual devices timeshare few host cores (this box has one); the
    # default 40 s rendezvous terminate timeout SIGABRTs the process when
    # serialized device execution skews collective arrivals.
    flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
        " --xla_cpu_collective_timeout_seconds=1200"
    )
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# The axon sitecustomize pins jax_platforms="axon,cpu" at interpreter
# startup; force the hermetic CPU backend back for tests (no backend has
# been initialized yet — conftest runs before any array is created).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
