"""Test config: run everything on a virtual 8-device CPU mesh.

TPU compile round-trips are slow (and CI may be TPU-less); all numeric and
sharding tests run on host CPU with 8 virtual XLA devices so that
multi-chip sharding paths are exercised without hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: harness presets JAX_PLATFORMS=axon
# Persistent-cache CPU AOT entries can carry machine features the current
# host lacks (xla cpu_aot_loader warns "+prefer-no-scatter ... could lead
# to execution errors such as SIGILL" when loading them) — one hard-crashed
# full-suite run was traced to this. Point the whole pytest session (and
# every subprocess the tests spawn) at a FRESH cache dir: entries written
# during the session are compiled on this host (feature-compatible, and
# still shared across the session's subprocess tests), while stale
# foreign-host entries in the user cache are never loaded.
import tempfile

os.environ.setdefault(
    "GENPERCEPT_CACHE_DIR",
    tempfile.mkdtemp(prefix="genpercept_test_xla_"))
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


# --------------------------------------------------------------- quick/slow
# The full suite takes ~25 min on a 1-core box (full-model torch oracles,
# end-to-end CLI training runs). `-m quick` selects a fast per-subsystem
# subset; `-m slow` the rest. Classification is by module: these modules'
# tests build full-size models, run training loops, or shell out to CLIs.
_SLOW_MODULES = {
    "test_unet_oracle", "test_vae_oracle", "test_cli_end_to_end",
    "test_pipeline", "test_models", "test_train", "test_train_extras",
    "test_train_surgery", "test_block_remat", "test_lora_noise_metric3d",
    "test_multihost", "test_serve", "test_bench", "test_harness",
    "test_quant_surrogate", "test_parity_real", "test_batch_api",
    # test_quant's pipeline-level end-to-end runs (GPTQ, tiny-VAE A/Bs)
    # alone exceed 9 min on this box — nowhere near the quick budget
    "test_quant", "test_golden_768",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        item.add_marker(
            pytest.mark.slow if mod in _SLOW_MODULES else pytest.mark.quick)
