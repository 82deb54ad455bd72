"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding paths are validated on a virtual CPU mesh (the driver
separately dry-runs the multi-chip path via __graft_entry__.dryrun_multichip).
The sandbox registers a TPU ('axon') backend via sitecustomize, so we must
both set the XLA flag before jax initializes and override jax_platforms.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8"
  ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
