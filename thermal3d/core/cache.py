"""Persistent XLA compilation cache.

Compiles of the ViT-L model take tens of seconds to minutes (notably under
remote-compile harnesses); caching them on disk makes every CLI/bench
invocation after the first fast. Enabled by default by all CLIs and bench.py.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get(
        "THERMAL3D_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
