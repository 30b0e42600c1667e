"""Persistent XLA compilation cache.

Compiles through this environment's remote-TPU link take minutes; caching
compiled executables on disk makes every process after the first start
instantly. Call enable() before the first jit dispatch (Predictor and the
trainers do).
"""

from __future__ import annotations

import os

_enabled = False


def enable(cache_dir: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    cache_dir = cache_dir or os.environ.get(
        "CLAIR_TPU_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "clair_tpu_jax"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    except Exception:
        pass
