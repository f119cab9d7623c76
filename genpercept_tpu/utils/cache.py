"""Persistent XLA compilation cache.

The 768^2 production programs take minutes to compile (the one-step
pipeline ~6-8 min on the remote v5e compiler; the full fwd+bwd train step
15-25 min), and every new process pays that again. JAX's persistent
compilation cache serializes the compiled PJRT executable keyed on
(HLO, compile options, backend version), so any later process with the
same program loads it in seconds.

The reference has no analogue (torch eager pays no compile, and its
speed ceiling shows it); for a jit-compiled TPU framework this is the
difference between "deployable service" and "8-minute cold start per
replica".

Called by every CLI entrypoint and by bench/profiling scripts. Opt out
with GENPERCEPT_NO_CACHE=1 (or point GENPERCEPT_CACHE_DIR elsewhere).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "genpercept_tpu", "xla"
)

_enabled = False


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Idempotently enable the on-disk compile cache; returns the dir used
    (None when disabled via GENPERCEPT_NO_CACHE)."""
    global _enabled
    if os.environ.get("GENPERCEPT_NO_CACHE"):
        return None
    path = path or os.environ.get("GENPERCEPT_CACHE_DIR") or _DEFAULT_DIR
    if _enabled:
        return path
    os.makedirs(path, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_enable_compilation_cache", True)
    # don't bother persisting sub-second host programs (tests, tiny shapes)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    _enabled = True
    return path
