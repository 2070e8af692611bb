"""Persistent XLA compilation cache (utils/compile_cache).

Production cold-start subsystem: a restarted worker reloads serialized
executables instead of recompiling (no reference analogue — torch eager).
"""

import os

import jax
import jax.numpy as jnp
import pytest

from tokenpacker_tpu.utils.compile_cache import (
    disable_compilation_cache,
    enable_compilation_cache,
)


@pytest.fixture
def restore_cache_config():
    yield
    disable_compilation_cache()


def test_populates_cache_dir(tmp_path, restore_cache_config):
    d = str(tmp_path / "xla-cache")
    assert enable_compilation_cache(d, min_compile_time_secs=0.0) == d

    @jax.jit
    def f(x):
        return jnp.tanh(x @ x.T).sum()

    f(jnp.ones((128, 128), jnp.float32)).block_until_ready()
    entries = os.listdir(d)
    assert entries, "no executables persisted"


def test_cache_hit_on_fresh_jit(tmp_path, restore_cache_config):
    """A semantically identical program compiled 'fresh' (new python callable,
    caches cleared) must be served from the persistent cache."""
    d = str(tmp_path / "xla-cache")
    enable_compilation_cache(d, min_compile_time_secs=0.0)

    def make():
        def g(x):
            return jnp.sin(x) @ x.T

        return jax.jit(g)

    make()(jnp.ones((96, 96), jnp.float32)).block_until_ready()
    first = {e for e in os.listdir(d) if e.startswith("jit_g-")}
    assert len(first) == 1
    jax.clear_caches()
    make()(jnp.ones((96, 96), jnp.float32)).block_until_ready()
    # served from disk: same fingerprint, no second jit_g executable
    assert {e for e in os.listdir(d) if e.startswith("jit_g-")} == first


def test_env_off_disables(tmp_path, monkeypatch, restore_cache_config):
    monkeypatch.setenv("TOKENPACKER_COMPILE_CACHE", "off")
    assert enable_compilation_cache() is None


def test_env_path_is_used(tmp_path, monkeypatch, restore_cache_config):
    d = str(tmp_path / "from-env")
    monkeypatch.setenv("TOKENPACKER_COMPILE_CACHE", d)
    assert enable_compilation_cache() == d
    assert os.path.isdir(d)


def test_explicit_off_arg(restore_cache_config):
    assert enable_compilation_cache("off") is None


def test_worker_cli_flag_parses(tmp_path, restore_cache_config):
    """--compile-cache reaches enable_compilation_cache before model load."""
    import tokenpacker_tpu.serve.model_worker as mw

    seen = {}
    orig = mw.ModelWorker

    class Boom(Exception):
        pass

    def stop(*a, **k):
        seen["called"] = True
        raise Boom

    mw.ModelWorker = stop
    try:
        with pytest.raises(Boom):
            mw.main([
                "--model-path", "x", "--no-register",
                "--compile-cache", str(tmp_path / "wc"),
            ])
    finally:
        mw.ModelWorker = orig
    assert seen["called"]
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "wc")
