"""Image-filter kernels vs OpenCV / numpy oracles."""

import numpy as np
import pytest

from thermal3d.kernels.filters import (
    bilateral_filter,
    canny_edges,
    clahe,
    guided_filter,
    remove_depth_outliers,
    sobel_magnitude_normalized,
)

cv2 = pytest.importorskip("cv2")


def test_clahe_vs_cv2(rng):
    img = rng.uniform(0, 1, (64, 64)).astype(np.float32)
    img[8:24, 8:24] *= 0.3
    ours = np.asarray(clahe(img, clip_limit=3.0, grid=(8, 8)))
    ref = cv2.createCLAHE(clipLimit=3.0, tileGridSize=(8, 8)).apply(
        (img * 255).round().astype(np.uint8)
    ).astype(np.float32) / 255.0
    # same quantization/LUT scheme; small interpolation differences at borders
    assert np.mean(np.abs(ours - ref)) < 0.02
    assert np.percentile(np.abs(ours - ref), 95) < 0.06


def test_clahe_flat_image_is_stable():
    img = np.full((32, 32), 0.5, dtype=np.float32)
    out = np.asarray(clahe(img))
    assert np.all(np.isfinite(out))
    assert out.std() < 0.05


def test_sobel_magnitude_vs_cv2(rng):
    img = rng.uniform(0, 1, (40, 40)).astype(np.float32)
    ours = np.asarray(sobel_magnitude_normalized(img))
    sx = cv2.Sobel(img, cv2.CV_32F, 1, 0, ksize=3)
    sy = cv2.Sobel(img, cv2.CV_32F, 0, 1, ksize=3)
    mag = np.sqrt(sx**2 + sy**2)
    ref = (mag - mag.min()) / (mag.max() - mag.min() + 1e-6)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_canny_finds_step_edge():
    img = np.zeros((32, 32), dtype=np.float32)
    img[:, 16:] = 1.0
    edges = np.asarray(canny_edges(img, 50.0, 150.0))
    assert edges[:, 15:17].sum() > 20  # edge along the step
    assert edges[:, :12].sum() == 0  # nothing in flat regions
    assert edges[:, 20:].sum() == 0


def test_bilateral_preserves_edges_smooths_noise(rng):
    img = np.zeros((32, 32), dtype=np.float32)
    img[:, 16:] = 1.0
    noisy = img + rng.normal(0, 0.05, img.shape).astype(np.float32)
    out = np.asarray(bilateral_filter(noisy, d=9, sigma_color=0.3, sigma_space=75.0))
    # noise reduced
    assert np.std(out[:, :12] - img[:, :12]) < np.std(noisy[:, :12] - img[:, :12]) * 0.6
    # edge preserved
    assert abs(float(out[:, 20:].mean() - out[:, :12].mean())) > 0.9


def test_guided_filter_vs_reference_impl(rng):
    """Against a direct numpy He-et-al implementation with the same box."""
    guide = rng.uniform(0, 1, (32, 32)).astype(np.float32)
    src = guide + rng.normal(0, 0.1, guide.shape).astype(np.float32)
    ours = np.asarray(guided_filter(guide, src, radius=4, eps=1e-3))

    def box(x, r):
        k = 2 * r + 1
        p = np.pad(x, r, mode="reflect")
        out = np.zeros_like(x)
        for dy in range(k):
            for dx in range(k):
                out += p[dy : dy + x.shape[0], dx : dx + x.shape[1]]
        return out / (k * k)

    mi, mp = box(guide, 4), box(src, 4)
    a = (box(guide * src, 4) - mi * mp) / (box(guide * guide, 4) - mi * mi + 1e-3)
    b = mp - a * mi
    ref = box(a, 4) * guide + box(b, 4) * src * 0 + box(b, 4)
    np.testing.assert_allclose(ours, box(a, 4) * guide + box(b, 4), atol=1e-4)


def test_remove_depth_outliers_matches_loop_oracle(rng):
    """Oracle: the reference's per-pixel loop (…for_experiment.py:330-356)."""
    depth = rng.uniform(5, 10, (20, 20)).astype(np.float32)
    depth[5, 5] = 100.0  # spike outlier
    depth[12, 3] = -40.0

    mean, std = depth.mean(), depth.std()
    outlier = np.abs(depth - mean) > 3 * std
    oracle = depth.copy()
    k = 5
    for i in range(depth.shape[0]):
        for j in range(depth.shape[1]):
            if outlier[i, j]:
                i0, i1 = max(0, i - k // 2), min(depth.shape[0], i + k // 2 + 1)
                j0, j1 = max(0, j - k // 2), min(depth.shape[1], j + k // 2 + 1)
                hood = depth[i0:i1, j0:j1][~outlier[i0:i1, j0:j1]]
                oracle[i, j] = np.median(hood) if hood.size else mean

    ours = np.asarray(remove_depth_outliers(depth, kernel_size=5, n_sigma=3.0))
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_fire_scene_pipeline_shapes(rng):
    from thermal3d.preprocess.fire_scene import (
        advanced_fire_scene_processing,
        preprocess_fire_scene_thermal,
    )

    img = rng.uniform(0, 1, (64, 64)).astype(np.float32)
    img[20:30, 20:30] = 0.99  # "fire"
    out = np.asarray(preprocess_fire_scene_thermal(img))
    assert out.shape == (64, 64, 3)
    assert out.min() >= 0 and out.max() <= 1
    out2 = np.asarray(advanced_fire_scene_processing(img))
    assert out2.shape == (64, 64, 3)
    assert np.all(np.isfinite(out2))


def test_refine_depth_pipeline(rng):
    from thermal3d.preprocess.refine import refine_depth

    depth = rng.uniform(5, 10, (32, 32)).astype(np.float32)
    depth[10, 10] = 200.0
    thermal = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    out = np.asarray(refine_depth(depth, thermal))
    assert out.shape == depth.shape
    assert abs(float(out[10, 10])) < 50  # spike removed
