"""Pallas fused percentile-enhancement kernel.

The percentile contrast enhancement (utils/preprocessing.py:6-30) is the hot
per-frame preprocessing op (SURVEY.md C3). The jnp path computes exact
percentiles with a full sort; this kernel instead binary-searches the 16-bit
quantization grid for each percentile — 16 whole-image compare+reduce passes
on the VPU per percentile, all VMEM-resident — and applies the clip-rescale
in the same kernel, so raw frames go to enhanced [0,1] in one pass without
HBM round-trips and without the O(N log N) sort.

Exactness: the caller (preprocess.enhance) min/max-normalizes each image
first, so the 65536-step grid covers the actual data span. The search returns
the smallest grid value whose cumulative count reaches the target rank — a
single order statistic — while np.percentile linearly interpolates between
the two neighboring order statistics. The results therefore agree to within
one ORDER-STATISTIC GAP, not one grid step: on a pathological bimodal image
whose percentile rank falls between two far-apart pixel values, the deviation
can be the full gap between them. On real thermal frames the neighboring
order statistics are dense and the parity test against the exact sort path
bounds the post-rescale difference < 2e-3 (far below bf16 quantization);
that test, not the grid resolution, is the practical accuracy bound.
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

_GRID = 65535.0  # 16-bit quantization grid for values in [0, 1]
_SEARCH_STEPS = 16  # ceil(log2(65536))


def _enhance_kernel(x_ref, o_ref, *, lo_frac: float, hi_frac: float):
    img = x_ref[0]  # [H, W] f32, values in [0, 1]
    h, w = img.shape
    n = h * w
    q = jnp.floor(img * _GRID)  # quantized grid values in [0, 65535]

    def percentile(frac):
        """Smallest grid value v with count(q <= v) >= frac% of N — the same
        'first bin reaching the target rank' convention as a 65536-bin
        histogram, found in 16 whole-image passes instead of a histogram
        build (Pallas TPU has no dynamic_slice to chunk one)."""
        target = frac / 100.0 * n

        def body(_, lohi):
            lo, hi = lohi
            mid = jnp.floor((lo + hi) * 0.5)
            c = jnp.sum((q <= mid).astype(jnp.float32))
            ok = c >= target
            return jnp.where(ok, lo, mid + 1.0), jnp.where(ok, mid, hi)

        lo, _ = jax.lax.fori_loop(
            0, _SEARCH_STEPS, body, (jnp.float32(0.0), jnp.float32(_GRID)))
        return lo / _GRID

    p_lo = percentile(lo_frac)
    p_hi = percentile(hi_frac)
    scale = 1.0 / jnp.maximum(p_hi - p_lo, 1e-12)
    o_ref[0] = jnp.clip((img - p_lo) * scale, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("lo", "hi", "interpret"))
def percentile_enhance_pallas(gray: jnp.ndarray, lo: float = 2.0, hi: float = 98.0,
                              interpret: bool = False) -> jnp.ndarray:
    """[B, H, W] grayscale in [0,1] → percentile-rescaled [B, H, W] in [0,1].

    Binary-search equivalent of preprocess.enhance.percentile_rescale (which
    uses an exact sort); one grid program per image, image-resident in VMEM.
    """
    b, h, w = gray.shape
    n = h * w
    kernel = functools.partial(_enhance_kernel, lo_frac=lo, hi_frac=hi)
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=max(8 * n * 4, 4 * 1024 * 1024))

    def bspec():
        if _HAS_PLTPU:
            return pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, h, w), lambda i: (i, 0, 0))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w), gray.dtype),
        grid=(b,),
        in_specs=[bspec()],
        out_specs=bspec(),
        cost_estimate=pl.CostEstimate(
            flops=(2 * _SEARCH_STEPS + 4) * n,
            bytes_accessed=2 * b * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
        **kwargs,
    )(gray)
