"""Native (C++) batch image loader — ctypes bindings.

Compiles thermal3d/native/loader.cpp on first use (g++ -O3, links libpng) and
exposes `load_thermal_batch` / `load_rgb_batch`. The data pipeline prefers
this loader and transparently falls back to the cv2/PIL path when the
toolchain or libpng is unavailable (`available()`).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import platform
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "loader.cpp")
_lock = threading.Lock()
_lib = None
_build_error: Optional[str] = None


def _cpu_flags() -> bytes:
    """CPU feature flags — part of the binary cache key. platform.machine()
    alone can't distinguish x86_64 microarchitectures, and -march=native
    binaries SIGILL on hosts lacking the build host's ISA extensions (e.g. a
    repo rsynced between an AVX-512 and a non-AVX-512 machine)."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    return " ".join(sorted(line.split(":", 1)[1].split())).encode()
    except OSError:
        pass
    return platform.processor().encode()


def _so_path() -> str:
    # Key the binary on (source hash, machine, CPU feature set): the .so is
    # built with -march=native, so a binary another CPU produced may SIGILL —
    # never dlopen one this host+source didn't produce. (Binaries are
    # gitignored; nothing is ever committed.)
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(
            f.read() + platform.machine().encode() + _cpu_flags()
        ).hexdigest()[:12]
    return os.path.join(_HERE, f"libt3dloader-{tag}.so")


def _build(so: str) -> Optional[str]:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
           "-lpng", "-lpthread", "-o", so]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except Exception as e:  # g++ missing etc.
        return str(e)
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    return None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        _SO = _so_path()
        if not os.path.exists(_SO):
            err = _build(_SO)
            if err is not None:
                _build_error = err
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            _build_error = str(e)
            return None
        lib.t3d_load_thermal_batch.restype = ctypes.c_int
        lib.t3d_load_thermal_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int, ctypes.c_int,
        ]
        lib.t3d_load_rgb_batch.restype = ctypes.c_int
        lib.t3d_load_rgb_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def _paths_array(paths: List[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def load_thermal_batch(paths: List[str], out_hw: Tuple[int, int],
                       normalize: bool = True, n_threads: int = 8
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """→ (float32 [N, H, W], ok bool [N]). Failed decodes are zero-filled."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    n = len(paths)
    h, w = out_hw
    out = np.zeros((n, h, w), dtype=np.float32)
    ok = np.zeros(n, dtype=np.uint8)
    lib.t3d_load_thermal_batch(
        _paths_array(paths), n, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        n_threads, int(normalize))
    return out, ok.astype(bool)


def load_rgb_batch(paths: List[str], out_hw: Tuple[int, int], n_threads: int = 8
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """→ (float32 [N, H, W, 3] in [0,1], ok bool [N])."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    n = len(paths)
    h, w = out_hw
    out = np.zeros((n, h, w, 3), dtype=np.float32)
    ok = np.zeros(n, dtype=np.uint8)
    lib.t3d_load_rgb_batch(
        _paths_array(paths), n, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        n_threads)
    return out, ok.astype(bool)
