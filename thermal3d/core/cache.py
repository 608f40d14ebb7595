"""Persistent XLA compilation cache.

Compiles of the ViT-L model take tens of seconds to minutes (notably under
remote-compile harnesses); caching them on disk makes every CLI/bench
invocation after the first fast. Enabled by default by all CLIs and bench.py.

The cache directory is keyed by a host machine tag (arch + hashed CPU feature
flags): XLA:CPU AOT artifacts embed the compile host's ISA extensions, and
loading one on a host that lacks them can SIGILL (XLA itself warns
`cpu_aot_loader.cc: ... could lead to execution errors such as SIGILL` on
every mismatched load). A repo-local cache rsynced or NFS-shared between
heterogeneous hosts would otherwise poison every run on the weaker machine —
the same hazard the native loader already keys its -march=native binaries
against (native/__init__.py::_cpu_flags). TPU/GPU artifacts are
host-ISA-independent but segregating them per machine tag costs only a first
compile per host.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _machine_tag() -> str:
    """Short per-host-ISA tag: arch + sha of the sorted CPU feature flags
    (the native loader's binary cache key — ONE definition of 'same ISA')."""
    from thermal3d.native import _cpu_flags

    digest = hashlib.sha256(
        platform.machine().encode() + _cpu_flags()).hexdigest()
    return f"{platform.machine()}-{digest[:10]}"


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get(
        "THERMAL3D_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"),
    )
    path = os.path.join(path, _machine_tag())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
