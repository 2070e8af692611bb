"""Persistent XLA compilation cache for production cold-starts.

A serving worker's first request pays XLA compilation for every traced
program (prefill buckets, decode loop, speculative verify, vision tower) —
minutes of latency on TPU, and under the axon remote-compile tunnel the
cost recurs on every worker restart. JAX's persistent compilation cache
serializes compiled executables to disk keyed by (program, compile options,
topology), so a restarted worker with unchanged code/shapes reloads its
executables in seconds instead of recompiling.

The reference has no analogue (torch eager execution compiles nothing);
this is a TPU/XLA-production subsystem in the same spirit as the
reference's background warmup of the CUDA context. Warmup
(`generate.Generator.warmup`) and this cache compose: warmup triggers the
traces at startup, the cache makes those traces cheap after the first boot.

Notes:
- The cache is keyed by XLA fingerprint; stale entries are never wrong,
  just unused. Size is bounded only by disk — point TOKENPACKER_COMPILE_CACHE
  at a scratch volume for large fleets.
- Backends whose PJRT plugin cannot serialize executables simply log a JAX
  warning per program and fall through to a normal compile (fail-open).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "tokenpacker_tpu", "xla"
)

_OFF_VALUES = ("0", "off", "none", "disable", "disabled")


def enable_compilation_cache(cache_dir: str | None = None,
                             min_compile_time_secs: float = 1.0):
    """Turn on JAX's persistent compilation cache.

    Resolution order: explicit `cache_dir` arg > TOKENPACKER_COMPILE_CACHE
    env (a path, or 0/off to disable) > ~/.cache/tokenpacker_tpu/xla.
    Programs that compile faster than `min_compile_time_secs` are not
    persisted (keeps the cache to the expensive executables instead of
    thousands of trivial ones).

    Returns the active cache directory, or None when disabled/unavailable.
    """
    env = os.environ.get("TOKENPACKER_COMPILE_CACHE", "")
    if cache_dir is None:
        if env.lower() in _OFF_VALUES:
            return None
        cache_dir = env or _DEFAULT_DIR
    elif cache_dir.lower() in _OFF_VALUES:
        return None

    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        if jax.config.jax_compilation_cache_dir != cache_dir:
            _reset_cache_backend()  # the cache object binds its dir lazily once
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_time_secs
        )
    except (OSError, AttributeError, ValueError) as e:  # fail-open
        from tokenpacker_tpu.utils.logging_utils import build_logger

        build_logger("compile_cache", "compile_cache.log").warning(
            f"persistent compilation cache unavailable ({e}); compiling cold"
        )
        return None
    return cache_dir


def _reset_cache_backend() -> None:
    """Drop the lazily-bound cache object so a new dir takes effect
    (public experimental alias of jax._src.compilation_cache)."""
    try:
        from jax.experimental.compilation_cache import compilation_cache

        compilation_cache.reset_cache()
    except (ImportError, AttributeError):
        pass


def disable_compilation_cache() -> None:
    """Reset to no persistent cache (used by tests; JAX default is None)."""
    import jax

    _reset_cache_backend()
    jax.config.update("jax_compilation_cache_dir", None)
