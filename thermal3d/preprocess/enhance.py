"""Thermal contrast enhancement — jit-compiled image kernels.

TPU re-design of utils/preprocessing.py: the reference round-trips every frame
through numpy on the host (preprocessing.py:12); here the whole enhancement is
a fused XLA kernel over batched NHWC images, differentiable and shardable.

Numerical parity notes:
  * The reference collapses 3 identical channels by taking channel 0, else
    luma-grayscales (preprocessing.py:15-19). Since luma weights sum to 1,
    luma of identical channels IS channel 0 (up to f32 roundoff), so we always
    apply luma — one branch-free kernel, bit-comparable outputs.
  * percentiles use linear interpolation like np.percentile. On TPU the
    default percentile path is the Pallas histogram kernel
    (kernels/image_ops.py): inputs are min/max-normalized per image (the
    rescale is affine-invariant, so this changes nothing), giving the 65536
    histogram bins the full data span — worst-case percentile error is
    ~2/65536 of the span, orders of magnitude below the enhancement's own
    quantization. impl='sort' forces the exact O(N log N) path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from thermal3d.core.config import FREIBURG_RAW_MAX, FREIBURG_RAW_MIN
from thermal3d.core.platform import default_compute_platform
from thermal3d.kernels.image_ops import percentile_enhance_pallas

LUMA = jnp.array([0.299, 0.587, 0.114])


def rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, C] → [..., H, W] luma grayscale (C=1 or 3)."""
    if img.ndim >= 3 and img.shape[-1] == 3:
        return jnp.tensordot(img, LUMA.astype(img.dtype), axes=[[-1], [0]])
    if img.ndim >= 3 and img.shape[-1] == 1:
        return img[..., 0]
    return img


def _percentile_rescale_pallas(gray: jnp.ndarray, lo: float, hi: float,
                               interpret: bool = False) -> jnp.ndarray:
    """[..., H, W] → per-image percentile rescale via the Pallas histogram
    kernel. Images are min/max-normalized first so the 65536 bins cover the
    actual data span (the rescale is affine-invariant, so this is exact)."""
    batch_shape = gray.shape[:-2]
    h, w = gray.shape[-2:]
    x = gray.reshape((-1, h, w)).astype(jnp.float32)
    g_min = jnp.min(x, axis=(1, 2), keepdims=True)
    g_max = jnp.max(x, axis=(1, 2), keepdims=True)
    span = g_max - g_min
    x = jnp.where(span > 0, (x - g_min) / jnp.where(span > 0, span, 1.0), 0.0)
    out = percentile_enhance_pallas(x, lo=lo, hi=hi, interpret=interpret)
    return out.reshape(batch_shape + (h, w)).astype(gray.dtype)


def percentile_rescale(gray: jnp.ndarray, lo: float = 2.0, hi: float = 98.0,
                       impl: str = "auto") -> jnp.ndarray:
    """Clip to (lo, hi) percentiles of each image and rescale to [0, 1].

    gray: [..., H, W]; percentiles computed per image over the trailing 2 axes
    (the reference computes them over the whole single image,
    preprocessing.py:22-23).

    impl: 'auto' (Pallas histogram kernel on TPU, exact sort elsewhere),
    'pallas', or 'sort'.
    """
    if impl == "auto":
        impl = "pallas" if default_compute_platform() == "tpu" else "sort"
    if impl == "pallas":
        return _percentile_rescale_pallas(gray, lo, hi)
    flat = gray.reshape(gray.shape[:-2] + (-1,))
    p = jnp.percentile(flat, jnp.array([lo, hi]), axis=-1)
    p_lo = p[0][..., None, None]
    p_hi = p[1][..., None, None]
    # Zero-range guard (deliberate robustness fix over the reference, which
    # divides unguarded and NaNs a constant frame): flat images map to 0.
    span = p_hi - p_lo
    scaled = jnp.where(span > 0, (gray - p_lo) / jnp.where(span > 0, span, 1.0), 0.0)
    return jnp.clip(scaled, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("lo", "hi", "impl"))
def enhance_thermal_contrast(img: jnp.ndarray, lo: float = 2.0, hi: float = 98.0,
                             impl: str = "auto") -> jnp.ndarray:
    """Percentile contrast enhancement (utils/preprocessing.py:6-30).

    img: [H, W], [H, W, C], or [B, H, W, C]. Returns 3-channel images of the
    same leading rank: grayscale → clip to (p2, p98) → [0,1] → repeat ×3.

    impl: 'auto' picks the Pallas histogram-percentile kernel on TPU (no
    O(N log N) sort; error bounded by the 1/65536 bin width) and the exact
    sort path elsewhere; 'sort'/'pallas' force one.
    """
    gray = rgb_to_gray(img) if img.ndim >= 3 else img
    enhanced = percentile_rescale(gray, lo, hi, impl=impl)
    return jnp.repeat(enhanced[..., None], 3, axis=-1)


@functools.partial(jax.jit, static_argnames=("normalized",))
def enhance_thermal_fixed_range(img: jnp.ndarray, normalized: bool = True) -> jnp.ndarray:
    """Freiburg fixed-range normalization (utils/preprocessing.py:32-73).

    normalized=True: values are [0,1] from a uint16 frame; rescale ×65535,
    clip to [21800, 25000] raw counts, renormalize. normalized=False: clip
    raw counts directly. Channel count is preserved (the reference mirrors
    the input format, preprocessing.py:67-72).
    """
    had_channels = img.ndim >= 3
    gray = rgb_to_gray(img) if had_channels else img
    if normalized:
        raw = gray * 65535.0
    else:
        raw = gray
    raw = jnp.clip(raw, float(FREIBURG_RAW_MIN), float(FREIBURG_RAW_MAX))
    out = (raw - FREIBURG_RAW_MIN) / float(FREIBURG_RAW_MAX - FREIBURG_RAW_MIN)
    if had_channels:
        out = jnp.repeat(out[..., None], img.shape[-1], axis=-1)
    return out
