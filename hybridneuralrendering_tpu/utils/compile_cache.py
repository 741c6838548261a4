"""Persistent XLA compile cache for the CLI drivers.

The axon remote compiler takes ~30-60 s per executable (CLAUDE.md); a
lifecycle run compiles several (train step, eval chunk, grid build, probe
eval).  bench.py already uses the cache; threading it through the drivers
makes repeated fixture runs (quality A/B matrices, seed repeats) start in
seconds instead of minutes.  The JAX cache is concurrency-safe (atomic
renames), so overlapping runs share it.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> str | None:
    import jax
    d = cache_dir or os.environ.get("HNR_COMPILE_CACHE") or os.path.join(
        os.getcwd(), ".jax_cache")
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        return d
    except Exception:
        return None
