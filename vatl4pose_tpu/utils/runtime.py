"""Process-level runtime setup shared by all entry points."""

from __future__ import annotations

import os


def setup_jax_cache(cache_dir: str = None):
    """Enable JAX's persistent compilation cache — XLA programs for the
    estimators take 20s-6min to compile through the axon tunnel; caching
    makes every CLI invocation after the first start hot."""
    import jax
    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/vatl4pose_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # 0: cache sub-second compiles too — the coreset greedy (~1 s compile)
    # sat right at the old 1.0 threshold and was flakily re-compiled cold
    # every process (BENCH_DETAIL coreset_select_s_cold)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    return cache_dir
