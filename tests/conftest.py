"""Test configuration: force an 8-device CPU mesh before JAX initializes.

Multi-chip sharding is validated on virtual CPU devices (the driver separately
dry-runs the multi-chip path via __graft_entry__.dryrun_multichip).

Note: the environment's sitecustomize exports JAX_PLATFORMS=axon (the remote
TPU tunnel) at interpreter startup, so the env var alone is not enough — we
must override via jax.config after import, before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
