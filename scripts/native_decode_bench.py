#!/usr/bin/env python3
"""Native C++ loader decode throughput vs thread count (VERDICT r2 item 7).

Generates synthetic Freiburg-style 640×480 uint16 PNGs, then measures the
pooled batch decode+resize (thermal3d/native/loader.cpp) at each thread
count. On a multi-core host the frames/s column shows the pool's scaling
slope; on a 1-core host (this dev harness) it is necessarily flat and the
sweep documents that honestly.

Usage: python scripts/native_decode_bench.py [--threads 1 2 4 8] [--frames 64]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    argv = sys.argv[1:]
    threads = [1, 2, 4, 8]
    frames = 64
    if "--threads" in argv:
        i = argv.index("--threads") + 1
        threads = []
        while i < len(argv) and not argv[i].startswith("--"):
            threads.append(int(argv[i]))
            i += 1
    if "--frames" in argv:
        frames = int(argv[argv.index("--frames") + 1])

    from thermal3d import native

    if not native.available():
        print("native loader unavailable:", native.build_error())
        return 1

    import cv2

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="t3d_decode_bench_")
    paths = []
    for i in range(frames):
        p = os.path.join(tmp, f"fl_ir_aligned_{i:05d}.png")
        cv2.imwrite(p, rng.uniform(21000, 26000, (480, 640)).astype(np.uint16))
        paths.append(p)

    print(f"host cores: {os.cpu_count()}; {frames} frames 640x480 uint16 -> "
          f"decode + bilinear resize to 224x224")
    print("| threads | frames/s | ms/frame |")
    print("|---|---|---|")
    for n in threads:
        native.load_thermal_batch(paths[:8], (224, 224), n_threads=n)  # warm
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            imgs, ok = native.load_thermal_batch(paths, (224, 224), n_threads=n)
        dt = (time.perf_counter() - t0) / reps
        assert ok.all()
        print(f"| {n} | {frames / dt:.0f} | {1000 * dt / frames:.2f} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
