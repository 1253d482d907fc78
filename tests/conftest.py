"""Test configuration: force an 8-device virtual CPU mesh.

Must run before jax is imported anywhere: tests exercise the multi-chip
sharding path (pjit/shard_map over a Mesh) without real TPU hardware, per the
strategy in SURVEY.md §4(e).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU plugin and overrides
# JAX_PLATFORMS via jax.config (see memory/axon-tpu-jax-quirks.md); the env
# var alone does NOT select the CPU backend here — the config update below is
# load-bearing.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"
