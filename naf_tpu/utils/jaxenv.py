"""JAX environment setup shared by the CLIs and benchmarks.

Enables the persistent compilation cache so repeated CLI invocations don't
pay the (remote) TPU compile latency for the fixed set of bucketed kernel
shapes.
"""

from __future__ import annotations

import os


def setup_jax(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "NAF_TPU_JAX_CACHE", os.path.expanduser("~/.cache/naf_tpu_jax")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:
        pass  # cache is best-effort
