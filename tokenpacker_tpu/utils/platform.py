"""Backend selection for CLI entry points.

The axon TPU plugin ignores the JAX_PLATFORMS environment variable, so
subprocesses (eval launchers, smoke tests, CI) cannot force the CPU backend
through the environment alone. CLIs call `apply_platform_env()` before any
jax device query; it honors TOKENPACKER_PLATFORM=cpu|tpu|... via
jax.config, which the plugin does respect.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    plat = os.environ.get("TOKENPACKER_PLATFORM")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except RuntimeError:
        pass  # backend already initialized; leave it be
