"""Persistent compilation cache (utils/cache.py): entries land on disk and
the opt-out env var wins. The deployment rationale: 768^2 production
programs compile for minutes remotely; cached processes load in seconds."""

import glob

import jax
import jax.numpy as jnp
import numpy as np


def test_cache_writes_entries(tmp_path, monkeypatch):
    import genpercept_tpu.utils.cache as cache

    monkeypatch.setattr(cache, "_enabled", False)
    monkeypatch.delenv("GENPERCEPT_NO_CACHE", raising=False)
    # jax's persistent cache is a lazily-initialized process-global: if an
    # earlier test (e.g. test_bench via bench.main) already initialized it
    # at the default dir, changing jax_compilation_cache_dir alone doesn't
    # re-point the singleton and entries keep landing in the old dir.
    # reset_cache is a private API — if a jax upgrade moves it, skip rather
    # than reintroduce the order-dependent flake as a hard ImportError.
    try:
        from jax._src import compilation_cache as _cc
        _cc.reset_cache()
    except (ImportError, AttributeError):
        import pytest
        pytest.skip("jax._src.compilation_cache.reset_cache unavailable; "
                    "cannot re-point the cache singleton in-process")
    d = str(tmp_path / "xla")
    assert cache.enable_compilation_cache(d) == d
    # idempotent: second call keeps the same dir, no error
    assert cache.enable_compilation_cache(d) == d
    # drop the time/size floors so a toy program persists
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    try:
        f = jax.jit(lambda x: jnp.tanh(x) @ x.T)
        np.asarray(f(np.ones((64, 64), np.float32)))
        assert len(glob.glob(d + "/*")) >= 1
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_compilation_cache_dir", None)
        try:  # don't leave the singleton on the deleted tmpdir
            _cc.reset_cache()
        except AttributeError:
            pass
        monkeypatch.setattr(cache, "_enabled", False)


def test_cache_opt_out(monkeypatch):
    import genpercept_tpu.utils.cache as cache

    monkeypatch.setattr(cache, "_enabled", False)
    monkeypatch.setenv("GENPERCEPT_NO_CACHE", "1")
    assert cache.enable_compilation_cache() is None
