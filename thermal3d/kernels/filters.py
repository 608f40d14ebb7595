"""Image-filter kernels: CLAHE, edge detection, bilateral/guided filters,
outlier-median depth cleaning.

These are the TPU-native equivalents of the reference's native (OpenCV C++ /
scipy) surfaces (SURVEY.md §2, C15): `cv2.createCLAHE`, `cv2.Canny`,
`cv2.bilateralFilter`, `cv2.ximgproc.guidedFilter`, and the O(H·W) Python
outlier-median loop at thermal_dustr_inference_for_experiment.py:340-356 (the
slowest code in the reference). All are static-shape jnp, jit/vmap-friendly,
fused by XLA; windows are unrolled shifts (stencils), integral-image box sums
for the guided filter.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# CLAHE (cv2.createCLAHE semantics on 8-bit quantized values)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("clip_limit", "grid"))
def clahe(gray01: jnp.ndarray, clip_limit: float = 3.0, grid: Tuple[int, int] = (8, 8)) -> jnp.ndarray:
    """Contrast-limited adaptive histogram equalization on [0,1] grayscale.

    Mirrors cv2.createCLAHE(clipLimit, tileGridSize).apply on the 8-bit
    quantization of the input: per-tile 256-bin histograms, clip +
    uniform-excess redistribution, CDF LUTs, bilinear LUT interpolation
    between the 4 neighboring tile centers. Returns float [0,1].
    """
    h, w = gray01.shape
    gh, gw = grid
    th = -(-h // gh)  # tile size (ceil), image padded with edge replicate
    tw = -(-w // gw)
    ph, pw = gh * th, gw * tw
    img8 = jnp.clip(jnp.round(gray01 * 255.0), 0, 255).astype(jnp.int32)
    padded = jnp.pad(img8, ((0, ph - h), (0, pw - w)), mode="edge")

    tiles = padded.reshape(gh, th, gw, tw).transpose(0, 2, 1, 3).reshape(gh * gw, th * tw)
    hist = jax.vmap(lambda t: jnp.bincount(t, length=256))(tiles).astype(jnp.float32)

    tile_area = float(th * tw)
    clip = max(1.0, clip_limit * tile_area / 256.0)
    excess = jnp.sum(jnp.maximum(hist - clip, 0.0), axis=-1, keepdims=True)
    hist = jnp.minimum(hist, clip) + excess / 256.0

    cdf = jnp.cumsum(hist, axis=-1)
    lut = jnp.round(cdf * (255.0 / tile_area)).reshape(gh, gw, 256)  # [gh, gw, 256]

    # bilinear interpolation across tile centers
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    ty = ys / th - 0.5
    tx = xs / tw - 0.5
    ty0 = jnp.clip(jnp.floor(ty), 0, gh - 1).astype(jnp.int32)
    tx0 = jnp.clip(jnp.floor(tx), 0, gw - 1).astype(jnp.int32)
    ty1 = jnp.clip(ty0 + 1, 0, gh - 1)
    tx1 = jnp.clip(tx0 + 1, 0, gw - 1)
    wy = jnp.clip(ty - ty0, 0.0, 1.0)[:, None]
    wx = jnp.clip(tx - tx0, 0.0, 1.0)[None, :]

    def gather(tyi, txi):
        # lut[tyi[y], txi[x], img8[y,x]]
        return lut[tyi[:, None], txi[None, :], img8]

    v00 = gather(ty0, tx0)
    v01 = gather(ty0, tx1)
    v10 = gather(ty1, tx0)
    v11 = gather(ty1, tx1)
    out = (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
           + v10 * wy * (1 - wx) + v11 * wy * wx)
    return out / 255.0


# ---------------------------------------------------------------------------
# Sobel / gradient-magnitude edges (cv2.Sobel ksize=3 on [0,1] grayscale)
# ---------------------------------------------------------------------------

def sobel_xy(gray: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """3×3 Sobel gx, gy with reflect-101 borders (cv2 BORDER_DEFAULT)."""
    p = jnp.pad(gray, 1, mode="reflect")

    def sh(dy, dx):
        return p[1 + dy : 1 + dy + gray.shape[0], 1 + dx : 1 + dx + gray.shape[1]]

    gx = (sh(-1, 1) + 2 * sh(0, 1) + sh(1, 1)) - (sh(-1, -1) + 2 * sh(0, -1) + sh(1, -1))
    gy = (sh(1, -1) + 2 * sh(1, 0) + sh(1, 1)) - (sh(-1, -1) + 2 * sh(-1, 0) + sh(-1, 1))
    return gx, gy


@jax.jit
def sobel_magnitude_normalized(gray: jnp.ndarray) -> jnp.ndarray:
    """sqrt(gx²+gy²) min-max rescaled to [0,1] (…for_experiment.py:233-237)."""
    gx, gy = sobel_xy(gray)
    mag = jnp.sqrt(gx * gx + gy * gy)
    return (mag - mag.min()) / (mag.max() - mag.min() + 1e-6)


@functools.partial(jax.jit, static_argnames=("low", "high", "hysteresis_iters"))
def canny_edges(gray01: jnp.ndarray, low: float = 50.0, high: float = 150.0,
                hysteresis_iters: int = 32) -> jnp.ndarray:
    """Canny-style edge map on [0,1] grayscale; thresholds in 8-bit units
    (cv2.Canny(img*255, low, high) semantics, L1 gradient norm, aperture 3).

    Hysteresis is realized as a fixed number of 3×3 max-pool propagation steps
    masked to weak pixels — a compiler-friendly fixpoint that converges for
    any edge chain shorter than `hysteresis_iters`. Returns {0,1} float32.
    """
    g = gray01 * 255.0
    gx, gy = sobel_xy(g)
    mag = jnp.abs(gx) + jnp.abs(gy)  # cv2 default L2gradient=False

    # non-maximum suppression: quantize direction to 4 sectors
    angle = jnp.arctan2(gy, gx)  # [-pi, pi]
    deg = jnp.rad2deg(angle) % 180.0
    sector = jnp.where(
        (deg < 22.5) | (deg >= 157.5), 0,
        jnp.where(deg < 67.5, 1, jnp.where(deg < 112.5, 2, 3)),
    )
    p = jnp.pad(mag, 1, mode="constant")
    h, w = mag.shape

    def sh(dy, dx):
        return p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]

    neigh = [
        (sh(0, 1), sh(0, -1)),    # 0: horizontal gradient -> compare E/W
        (sh(1, 1), sh(-1, -1)),   # 1: 45°
        (sh(1, 0), sh(-1, 0)),    # 2: vertical
        (sh(1, -1), sh(-1, 1)),   # 3: 135°
    ]
    keep = jnp.zeros_like(mag, dtype=bool)
    for s, (n1, n2) in enumerate(neigh):
        keep = jnp.where(sector == s, (mag >= n1) & (mag >= n2), keep)
    nms = jnp.where(keep, mag, 0.0)

    strong = nms >= high
    weak = nms >= low

    def body(_, edges):
        grown = jax.lax.reduce_window(
            edges.astype(jnp.float32), -jnp.inf, jax.lax.max,
            (3, 3), (1, 1), "SAME",
        ) > 0
        return (grown & weak) | strong

    edges = jax.lax.fori_loop(0, hysteresis_iters, body, strong)
    return edges.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Bilateral filter (cv2.bilateralFilter float path)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("d", "sigma_color", "sigma_space"))
def bilateral_filter(img: jnp.ndarray, d: int = 9, sigma_color: float = 75.0,
                     sigma_space: float = 75.0) -> jnp.ndarray:
    """Edge-preserving smoothing. img: [H, W] or [H, W, C] float.

    cv2 semantics: circular neighborhood of radius d//2, spatial Gaussian,
    range Gaussian on the L1 color distance ACROSS channels, reflect-101
    borders. For float inputs cv2 scales the color sigma by 255 only for
    8-bit images, so sigmas here are in the input's units — callers using
    [0,1] images pass sigma_color/255-scaled values (see fire_scene.py).
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    r = d // 2
    p = jnp.pad(img, ((r, r), (r, r), (0, 0)), mode="reflect")
    inv_2sc2 = -0.5 / (sigma_color * sigma_color)
    inv_2ss2 = -0.5 / (sigma_space * sigma_space)

    num = jnp.zeros_like(img)
    den = jnp.zeros((h, w, 1), dtype=img.dtype)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            dist2 = dy * dy + dx * dx
            if dist2 > r * r:
                continue  # circular window, as cv2
            shifted = p[r + dy : r + dy + h, r + dx : r + dx + w, :]
            cdist = jnp.sum(jnp.abs(shifted - img), axis=-1, keepdims=True)
            wgt = jnp.exp(dist2 * inv_2ss2 + cdist * cdist * inv_2sc2)
            num = num + wgt * shifted
            den = den + wgt
    out = num / den
    return out[..., 0] if squeeze else out


# ---------------------------------------------------------------------------
# Guided filter (He et al.; cv2.ximgproc.guidedFilter(radius, eps))
# ---------------------------------------------------------------------------

def _box_filter(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Mean over (2r+1)² clamped-at-border windows via integral image.

    Matches cv2 boxFilter(normalize=True, BORDER_REFLECT) closely in the
    interior; border windows use the reflected pad.
    """
    k = 2 * r + 1
    p = jnp.pad(x, ((r, r), (r, r)), mode="reflect")
    # integral image with a leading zero row/col
    ii = jnp.cumsum(jnp.cumsum(p, axis=0), axis=1)
    ii = jnp.pad(ii, ((1, 0), (1, 0)))
    h, w = x.shape
    s = (ii[k : k + h, k : k + w] - ii[0:h, k : k + w]
         - ii[k : k + h, 0:w] + ii[0:h, 0:w])
    return s / (k * k)


@functools.partial(jax.jit, static_argnames=("radius", "eps"))
def guided_filter(guide: jnp.ndarray, src: jnp.ndarray, radius: int = 8,
                  eps: float = 1e-4) -> jnp.ndarray:
    """Gray-guide guided filter (cv2.ximgproc.guidedFilter(r=8, eps=1e-4),
    used for depth refinement at …for_experiment.py:364-370)."""
    mean_i = _box_filter(guide, radius)
    mean_p = _box_filter(src, radius)
    corr_ip = _box_filter(guide * src, radius)
    corr_ii = _box_filter(guide * guide, radius)
    var_i = corr_ii - mean_i * mean_i
    cov_ip = corr_ip - mean_i * mean_p
    a = cov_ip / (var_i + eps)
    b = mean_p - a * mean_i
    mean_a = _box_filter(a, radius)
    mean_b = _box_filter(b, radius)
    return mean_a * guide + mean_b


# ---------------------------------------------------------------------------
# Outlier removal with local masked median
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("kernel_size", "n_sigma"))
def remove_depth_outliers(depth: jnp.ndarray, kernel_size: int = 5,
                          n_sigma: float = 3.0) -> jnp.ndarray:
    """Replace >n_sigma outliers with the median of non-outlier neighbors.

    Vectorized equivalent of the reference's per-pixel Python double loop
    (…for_experiment.py:330-356): for each outlier pixel, take the
    kernel_size² neighborhood clipped at borders, drop outlier neighbors,
    use their median (even count → mean of middles, like np.median);
    fall back to the global mean when no valid neighbor exists.
    """
    h, w = depth.shape
    mean = jnp.nanmean(depth)
    std = jnp.nanstd(depth)
    outlier = jnp.abs(depth - mean) > n_sigma * std

    r = kernel_size // 2
    pd = jnp.pad(depth, r, mode="constant")
    pv = jnp.pad(~outlier, r, mode="constant", constant_values=False)

    vals = []
    valid = []
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            vals.append(pd[r + dy : r + dy + h, r + dx : r + dx + w])
            valid.append(pv[r + dy : r + dy + h, r + dx : r + dx + w])
    vals = jnp.stack(vals, axis=-1)  # [H, W, k²]
    valid = jnp.stack(valid, axis=-1)
    # border handling: padded (out-of-image) entries have valid=False already

    big = jnp.where(valid, vals, jnp.inf)
    srt = jnp.sort(big, axis=-1)
    n = jnp.sum(valid, axis=-1)  # valid count per pixel
    k2 = vals.shape[-1]
    idx_hi = jnp.clip(n // 2, 0, k2 - 1)
    idx_lo = jnp.clip((n - 1) // 2, 0, k2 - 1)
    med = 0.5 * (
        jnp.take_along_axis(srt, idx_lo[..., None], axis=-1)[..., 0]
        + jnp.take_along_axis(srt, idx_hi[..., None], axis=-1)[..., 0]
    )
    med = jnp.where(n > 0, med, mean)
    return jnp.where(outlier, med, depth)
