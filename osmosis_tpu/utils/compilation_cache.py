"""Persistent XLA compilation cache.

The guided scan takes 1-3 minutes to compile; caching makes every later run
(same shapes/config) start in seconds. Enabled by the pipelines and bench.
"""

from __future__ import annotations

import os

_DONE = False


def enable(cache_dir: str = None):
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax

    cache_dir = cache_dir or os.environ.get(
        "OSMOSIS_TPU_CACHE", os.path.expanduser("~/.cache/osmosis_tpu_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass  # older jax without the knobs
