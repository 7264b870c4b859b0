"""Persistent XLA compilation cache setup.

First compiles of the SLAM pipeline are tens of seconds per program on TPU
(and worse through a remote-attached device tunnel); the pipeline spans ~15
distinct jitted programs. Enabling JAX's persistent compilation cache makes
every run after the first start in seconds. Tests already do this
(`tests/conftest.py`); this helper brings the CLI, bench, and graft entry
points onto the same shared cache directory.

Must be called before the first backend use (not merely before `import jax`).
"""
from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")
    cache_dir = os.path.abspath(cache_dir)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        if os.environ.get("EGG_EXPLAIN_CACHE"):
            # log WHY a program missed the persistent cache (hash inputs)
            jax.config.update("jax_explain_cache_misses", True)
    except Exception:
        pass  # older jax without the knobs: cache is an optimization only
