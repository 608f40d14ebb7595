"""Native C++ loader vs the cv2 decode path."""

import os
import time

import numpy as np
import pytest

from thermal3d import native

cv2 = pytest.importorskip("cv2")

if not native.available():
    pytest.skip(f"native loader unavailable: {native.build_error()}",
                allow_module_level=True)


@pytest.fixture
def png_files(tmp_path, rng):
    paths16, paths8 = [], []
    for i in range(6):
        a16 = rng.integers(21000, 26000, (48, 64)).astype(np.uint16)
        p16 = tmp_path / f"t{i}.png"
        cv2.imwrite(str(p16), a16)
        paths16.append((str(p16), a16))
        a8 = rng.integers(0, 255, (48, 64, 3)).astype(np.uint8)
        p8 = tmp_path / f"c{i}.png"
        cv2.imwrite(str(p8), a8)
        paths8.append((str(p8), a8))
    return paths16, paths8


def test_thermal_decode_exact_at_native_res(png_files):
    paths16, _ = png_files
    out, ok = native.load_thermal_batch([p for p, _ in paths16], (48, 64),
                                        normalize=False)
    assert ok.all()
    for i, (_, a16) in enumerate(paths16):
        np.testing.assert_allclose(out[i], a16.astype(np.float32), atol=0)


def test_thermal_resize_matches_cv2(png_files):
    paths16, _ = png_files
    out, ok = native.load_thermal_batch([p for p, _ in paths16], (24, 32),
                                        normalize=False)
    assert ok.all()
    for i, (_, a16) in enumerate(paths16):
        ref = cv2.resize(a16.astype(np.float32), (32, 24))  # INTER_LINEAR
        np.testing.assert_allclose(out[i], ref, rtol=1e-5, atol=0.5)


def test_thermal_normalize(png_files):
    paths16, _ = png_files
    out, ok = native.load_thermal_batch([p for p, _ in paths16], (48, 64),
                                        normalize=True)
    assert ok.all()
    assert 0.3 < out.mean() < 0.42  # raw 21000..26000 / 65535


def test_rgb_decode_matches_cv2(png_files):
    _, paths8 = png_files
    out, ok = native.load_rgb_batch([p for p, _ in paths8], (48, 64))
    assert ok.all()
    for i, (_, a8) in enumerate(paths8):
        # cv2.imwrite stores BGR; our decoder reads PNG channel order = RGB of
        # the file, which cv2.imwrite wrote from its BGR input → file holds
        # the original array reversed. Compare against the file's true pixels.
        ref = cv2.cvtColor(cv2.imread(paths8[i][0]), cv2.COLOR_BGR2RGB)
        np.testing.assert_allclose(out[i], ref.astype(np.float32) / 255.0, atol=1e-3)


def test_missing_file_flagged(tmp_path, png_files):
    paths16, _ = png_files
    paths = [paths16[0][0], str(tmp_path / "nope.png")]
    out, ok = native.load_thermal_batch(paths, (24, 32))
    assert ok[0] and not ok[1]
    assert np.all(out[1] == 0)


def test_native_throughput_sanity(png_files, tmp_path, rng):
    """Batch decode is in the same ballpark as cv2 per image; on multi-core
    hosts the thread pool then scales it (this CI host may have 1 CPU, so we
    assert competitiveness, not victory)."""
    import os

    paths = []
    for i in range(32):
        a = rng.integers(0, 65535, (480, 640)).astype(np.uint16)
        p = tmp_path / f"big{i}.png"
        cv2.imwrite(str(p), a)
        paths.append(str(p))
    native.load_thermal_batch(paths[:2], (224, 224))  # warm pool

    # best-of-3 for both paths: wall-clock timing on a shared 1-core CI host
    # is at the mercy of whatever else is scheduled; the MIN is the
    # contention-free estimate of each path's cost
    t_native = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out, ok = native.load_thermal_batch(paths, (224, 224),
                                            n_threads=os.cpu_count() or 1)
        t_native = min(t_native, time.perf_counter() - t0)
        assert ok.all()
    t_cv2 = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for p in paths:
            img = cv2.imread(p, cv2.IMREAD_ANYDEPTH)
            cv2.resize(img.astype(np.float32), (224, 224))
        t_cv2 = min(t_cv2, time.perf_counter() - t0)
    budget = 2.0 if (os.cpu_count() or 1) == 1 else 1.0
    assert t_native < t_cv2 * budget, (t_native, t_cv2)
