"""Test config: run everything on a virtual 8-device CPU mesh.

TPU compile round-trips are slow (and CI may be TPU-less); all numeric and
sharding tests run on host CPU with 8 virtual XLA devices so that
multi-chip sharding paths are exercised without hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: harness presets JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# sitecustomize may have imported jax already (axon PJRT registration), so
# setting the env var alone is not enough — update the live config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
