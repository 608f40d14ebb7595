"""Pallas fused percentile-enhancement kernel.

The percentile contrast enhancement (utils/preprocessing.py:6-30) is the hot
per-frame preprocessing op (SURVEY.md C3). The jnp path computes exact
percentiles with a full sort; this kernel instead builds a two-level
(coarse 256 → fine 256) histogram over the 16-bit quantization of the image
entirely in VMEM — O(N) streaming adds on the VPU instead of an O(N log N)
sort — and applies the clip-rescale in the same kernel, so raw frames go to
enhanced [0,1] in one pass without HBM round-trips.

Exactness: Freiburg thermal frames are uint16 raw counts, so the 65536-bin
histogram percentile is exact up to the linear-interpolation convention;
np.percentile's interpolation between adjacent order statistics differs by at
most one 16-bit quantization step (tested < 2^-15 against the jnp/sort path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_BINS = 256  # per histogram level; two levels = 65536 effective bins


def _hist_counts(q: jnp.ndarray, lo: jnp.ndarray, width: jnp.ndarray) -> jnp.ndarray:
    """Count of elements of q in each of _BINS equal bins of [lo, lo+_BINS*width).

    q: [N] f32 quantized values; returns [1, _BINS] f32 counts. Elements
    outside the range fall into no bin.
    """
    bin_idx = jnp.floor((q - lo) / width)
    ids = jax.lax.broadcasted_iota(jnp.float32, (1, _BINS), 1)
    # [N, BINS] one-hot compare, summed over N in chunks handled by the caller
    onehot = (bin_idx[:, None] == ids).astype(jnp.float32)
    return jnp.sum(onehot, axis=0, keepdims=True)


def _percentile_from_hist(counts: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Index of the first bin whose cumulative count reaches target. [1,_BINS]→scalar."""
    csum = jnp.cumsum(counts[0])
    reached = csum >= target
    idx = jnp.argmax(reached)  # first True
    return idx.astype(jnp.float32)


def _enhance_kernel(x_ref, o_ref, *, lo_frac: float, hi_frac: float, chunk: int):
    img = x_ref[0]  # [H, W] f32, values in [0, 1]
    h, w = img.shape
    n = h * w
    q = img.reshape(n) * 65535.0  # 16-bit quantization grid

    def hist_level(lo, width):
        def body(i, acc):
            sl = jax.lax.dynamic_slice(q, (i * chunk,), (chunk,))
            return acc + _hist_counts(sl, lo, width)

        return jax.lax.fori_loop(0, n // chunk, body,
                                 jnp.zeros((1, _BINS), jnp.float32))

    def two_level_percentile(frac):
        target = frac / 100.0 * n
        coarse = hist_level(jnp.float32(0.0), jnp.float32(65536.0 / _BINS))
        cidx = _percentile_from_hist(coarse, target)
        # count below the chosen coarse bin
        csum = jnp.cumsum(coarse[0])
        below = jnp.where(cidx > 0, csum[jnp.maximum(cidx.astype(jnp.int32) - 1, 0)], 0.0)
        lo = cidx * (65536.0 / _BINS)
        fine = hist_level(lo, jnp.float32(65536.0 / (_BINS * _BINS)))
        fidx = _percentile_from_hist(fine, target - below)
        return lo + fidx * (65536.0 / (_BINS * _BINS))

    p_lo = two_level_percentile(lo_frac) / 65535.0
    p_hi = two_level_percentile(hi_frac) / 65535.0
    scale = 1.0 / jnp.maximum(p_hi - p_lo, 1e-12)
    o_ref[0] = jnp.clip((img - p_lo) * scale, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("lo", "hi", "interpret"))
def percentile_enhance_pallas(gray: jnp.ndarray, lo: float = 2.0, hi: float = 98.0,
                              interpret: bool = False) -> jnp.ndarray:
    """[B, H, W] grayscale in [0,1] → percentile-rescaled [B, H, W] in [0,1].

    Histogram-based equivalent of preprocess.enhance.percentile_rescale
    (which uses an exact sort); one grid program per image, image-resident in
    VMEM.
    """
    b, h, w = gray.shape
    n = h * w
    chunk = w  # one row at a time; [w, 256] compare tiles fit VMEM comfortably
    kernel = functools.partial(_enhance_kernel, lo_frac=lo, hi_frac=hi, chunk=chunk)
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=max(8 * n * 4, 4 * 1024 * 1024))

    def bspec():
        if _HAS_PLTPU:
            return pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, h, w), lambda i: (i, 0, 0))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w), gray.dtype),
        grid=(b,),
        in_specs=[bspec()],
        out_specs=bspec(),
        interpret=interpret,
    )(gray)
