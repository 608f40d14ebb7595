"""Thermal contrast enhancement — jit-compiled image kernels.

TPU re-design of utils/preprocessing.py: the reference round-trips every frame
through numpy on the host (preprocessing.py:12); here the whole enhancement is
a fused XLA kernel over batched NHWC images, differentiable and shardable.

Numerical parity notes:
  * The reference collapses 3 identical channels by taking channel 0, else
    luma-grayscales (preprocessing.py:15-19). Since luma weights sum to 1,
    luma of identical channels IS channel 0 (up to f32 roundoff), so we always
    apply luma — one branch-free kernel, bit-comparable outputs.
  * percentiles use linear interpolation like np.percentile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from thermal3d.core.config import FREIBURG_RAW_MAX, FREIBURG_RAW_MIN

LUMA = jnp.array([0.299, 0.587, 0.114])


def rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, C] → [..., H, W] luma grayscale (C=1 or 3)."""
    if img.ndim >= 3 and img.shape[-1] == 3:
        return jnp.tensordot(img, LUMA.astype(img.dtype), axes=[[-1], [0]])
    if img.ndim >= 3 and img.shape[-1] == 1:
        return img[..., 0]
    return img


def percentile_rescale(gray: jnp.ndarray, lo: float = 2.0, hi: float = 98.0) -> jnp.ndarray:
    """Clip to (lo, hi) percentiles of each image and rescale to [0, 1].

    gray: [..., H, W]; percentiles computed per image over the trailing 2 axes
    (the reference computes them over the whole single image,
    preprocessing.py:22-23).
    """
    flat = gray.reshape(gray.shape[:-2] + (-1,))
    p = jnp.percentile(flat, jnp.array([lo, hi]), axis=-1)
    p_lo = p[0][..., None, None]
    p_hi = p[1][..., None, None]
    # Zero-range guard (deliberate robustness fix over the reference, which
    # divides unguarded and NaNs a constant frame): flat images map to 0.
    span = p_hi - p_lo
    scaled = jnp.where(span > 0, (gray - p_lo) / jnp.where(span > 0, span, 1.0), 0.0)
    return jnp.clip(scaled, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("lo", "hi"))
def enhance_thermal_contrast(img: jnp.ndarray, lo: float = 2.0, hi: float = 98.0) -> jnp.ndarray:
    """Percentile contrast enhancement (utils/preprocessing.py:6-30).

    img: [H, W], [H, W, C], or [B, H, W, C]. Returns 3-channel images of the
    same leading rank: grayscale → clip to (p2, p98) → [0,1] → repeat ×3.
    """
    gray = rgb_to_gray(img) if img.ndim >= 3 else img
    enhanced = percentile_rescale(gray, lo, hi)
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
