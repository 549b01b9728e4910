"""Persistent XLA compilation cache.

The full NEAT train-step graph (5 unrolled sampler rounds + grad-of-grad)
takes minutes to compile; caching compiled executables on disk makes every
process after the first start in seconds.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "NEAT_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "neat_tpu_xla"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
