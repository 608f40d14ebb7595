"""Fire-scene thermal preprocessing (experiment pipeline).

TPU re-design of thermal_dustr_inference_for_experiment.py:62-282. The
reference chains OpenCV C++ calls (CLAHE, Canny, Sobel, bilateral) with numpy;
here the per-pixel work is jnp kernels (thermal3d.kernels.filters) fused under
jit, and only the data-dependent histogram-peak analysis of the "advanced"
variant stays on host (it decides mask COUNT, i.e. program structure).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from thermal3d.kernels.filters import (
    bilateral_filter,
    canny_edges,
    clahe,
    sobel_magnitude_normalized,
)
from thermal3d.preprocess.enhance import rgb_to_gray


@functools.partial(jax.jit, static_argnames=("fire_threshold",))
def preprocess_fire_scene_thermal(
    img: jnp.ndarray, key: Optional[jax.Array] = None, fire_threshold: float = 0.7
) -> jnp.ndarray:
    """Fire-as-foreground encoding (…for_experiment.py:62-154).

    img: [H, W] or [H, W, C] float in [0,1]. Returns [H, W, 3].
    Steps: 5/95-percentile normalize → fire mask (>0.7) → inverted
    contrast-boosted base + CLAHE(3.0, 8×8) → fire colorization (0.8/0.3/0.1)
    → noise texture on fire pixels → Canny(50,150) edge blend (0.15/0.3).
    """
    gray = rgb_to_gray(img) if img.ndim == 3 else img
    flat = gray.reshape(-1)
    p = jnp.percentile(flat, jnp.array([5.0, 95.0]))
    norm = (jnp.clip(gray, p[0], p[1]) - p[0]) / (p[1] - p[0] + 1e-6)

    fire = norm > fire_threshold
    base = jnp.clip((1.0 - norm) * 1.2, 0.0, 1.0)
    base = clahe(base, clip_limit=3.0, grid=(8, 8))

    fire_color = jnp.array([0.8, 0.3, 0.1], dtype=base.dtype)
    result = jnp.where(fire[..., None], fire_color, base[..., None])

    if key is None:
        key = jax.random.key(0)
    noise = jax.random.uniform(key, gray.shape, dtype=base.dtype) * 0.1
    result = jnp.where(fire[..., None], result + noise[..., None], result)

    edges = canny_edges(norm, low=50.0, high=150.0)
    ew = jnp.where(fire, 0.3, 0.15)[..., None]
    result = result * (1.0 - ew) + edges[..., None] * ew
    return jnp.clip(result, 0.0, 1.0)


def _find_histogram_peaks(hist: np.ndarray, height: float, distance: int) -> np.ndarray:
    """Minimal scipy.signal.find_peaks(height, distance) replacement:
    strict local maxima above `height`, greedily thinned by prominence order
    so surviving peaks are >= `distance` apart."""
    n = len(hist)
    cand = [i for i in range(1, n - 1) if hist[i] > hist[i - 1] and hist[i] > hist[i + 1]
            and hist[i] >= height]
    cand.sort(key=lambda i: -hist[i])
    kept: list[int] = []
    for i in cand:
        if all(abs(i - j) >= distance for j in kept):
            kept.append(i)
    return np.array(sorted(kept), dtype=np.int64)


@functools.partial(jax.jit, static_argnames=("n_thresholds",))
def _advanced_fire_core(gray: jnp.ndarray, thresholds: jnp.ndarray, key: jax.Array,
                        n_thresholds: int) -> jnp.ndarray:
    """Jitted body of advanced_fire_scene_processing given static threshold
    count (…for_experiment.py:218-276)."""
    inverted = 1.0 - gray
    base = clahe(inverted, clip_limit=2.5, grid=(8, 8))

    edges1 = canny_edges(gray, low=30.0, high=150.0)
    sobel = sobel_magnitude_normalized(gray)
    combined_edges = jnp.maximum(edges1, sobel)

    result = jnp.repeat(base[..., None], 3, axis=-1)

    # highest-temperature region (fire): darken/saturate + noise texture
    hottest = gray > thresholds[n_thresholds - 1] if n_thresholds > 0 else gray > 0.7
    scale = jnp.array([0.5, 0.3, 0.2], dtype=base.dtype)
    result = jnp.where(hottest[..., None], base[..., None] * scale, result)
    noise = jax.random.uniform(key, gray.shape, dtype=base.dtype) * 0.15
    result = jnp.where(hottest[..., None], result + noise[..., None], result)

    es = jnp.where(hottest, 0.4, 0.2)[..., None]
    result = result * (1.0 - es) + combined_edges[..., None] * es

    result = bilateral_filter(result, d=9, sigma_color=75.0 / 255.0, sigma_space=75.0)
    return jnp.clip(result, 0.0, 1.0)


def advanced_fire_scene_processing(img, key: Optional[jax.Array] = None) -> jnp.ndarray:
    """Structure-preserving fire-scene preprocessing
    (…for_experiment.py:156-282). img: [H,W] or [H,W,C] float [0,1].

    The histogram-peak multi-thresholding runs on host (it determines the
    number of temperature regions — program structure); everything per-pixel
    is jitted.
    """
    img = jnp.asarray(img, dtype=jnp.float32)
    gray = rgb_to_gray(img) if img.ndim == 3 else img
    gray_np = np.asarray(gray)

    hist, bins = np.histogram(gray_np.ravel(), bins=100, range=(0, 1))
    peaks = _find_histogram_peaks(hist.astype(np.float64), height=hist.max() * 0.3, distance=10)
    peak_values = np.sort(bins[peaks])
    if len(peak_values) >= 2:
        thresholds = np.array(
            [(peak_values[i] + peak_values[i + 1]) / 2 for i in range(len(peak_values) - 1)],
            dtype=np.float32,
        )
    else:
        thresholds = np.array([0.7], dtype=np.float32)

    if key is None:
        key = jax.random.key(0)
    return _advanced_fire_core(gray, jnp.asarray(thresholds), key, len(thresholds))
