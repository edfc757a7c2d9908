"""Persistent XLA compilation cache.

The full train step takes ~4 min to compile on a v5e through the axon
tunnel; the persistent cache cuts warm recompiles ~2.7x (measured). Keyed on
the optimized HLO, so code changes invalidate naturally. Call before the
first jit compilation.
"""
from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    import jax
    try:
        # repo-anchored default so the cache is shared regardless of the
        # launch directory (a cwd-anchored default fragments per entry point)
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        d = cache_dir or os.environ.get(
            "OMNI_PQ_COMPILE_CACHE", os.path.join(repo, ".jax_cache"))
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(d))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # unwritable dir / old jax: run without the cache
