#!/usr/bin/env python3
"""Microbench the serving step's PREPROCESSING stages (docs/PERF.md puts
resize + percentile-enhance + Sobel head at ~5 ms of the 48.5 ms batch-32
step — ~10%; the percentile kernel itself measures 0.9 ms, so ~4 ms is
unattributed). Locates where those ms live and measures a matmul-based
bilinear resize against jax.image.resize.

Methodology (same as bench.py --chained): every stage runs its iterations
inside ONE jitted lax.fori_loop with a TRACED trip count and a scalar
feedback dependency; timing the difference between two trip counts cancels
this harness's per-dispatch relay overhead exactly.

Usage: python scripts/preproc_breakdown.py [batch] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from thermal3d.core.cache import enable_compilation_cache

RAW_H, RAW_W = 320, 416  # bench.py serving input dims
H, W = 224, 224


def resize_matrix(n_in: int, n_out: int, antialias: bool) -> np.ndarray:
    """Dense [n_in, n_out] bilinear interpolation matrix matching
    jax.image.resize's half-pixel-center convention (antialias widens the
    triangle kernel by the downscale factor, as jax does)."""
    scale = n_out / n_in
    inv = max(1.0 / scale, 1.0) if antialias else 1.0
    out_idx = np.arange(n_out, dtype=np.float64)
    src = (out_idx + 0.5) / scale - 0.5
    w = np.zeros((n_in, n_out), np.float64)
    for j in range(n_out):
        lo = int(np.floor(src[j] - inv)) ; hi = int(np.ceil(src[j] + inv))
        for i in range(lo, hi + 1):
            t = abs(i - src[j]) / inv
            if t < 1.0:
                w[np.clip(i, 0, n_in - 1), j] += 1.0 - t
    w /= w.sum(axis=0, keepdims=True)
    return w.astype(np.float32)


def resize_mm(raw, wh, ww):
    """[B, RAW_H, RAW_W] -> [B, H, W] as two dense GEMMs (MXU path)."""
    x = jnp.einsum("byx,yh->bhx", raw, wh)
    return jnp.einsum("bhx,xw->bhw", x, ww)


def timed_stage(name, body, x0, iters):
    @jax.jit
    def run(x, n):
        return jax.lax.fori_loop(0, n, lambda _, c: body(c), x)

    def t(n):
        t0 = time.perf_counter()
        r = run(x0, n)
        float(jnp.mean(r.astype(jnp.float32)))  # fetch → full chain executed
        return time.perf_counter() - t0

    t(1)  # warm (compile)
    n_small = 4
    d = t(n_small + iters) - t(n_small)
    print(f"{name:28s} {d / iters * 1e6:10.1f} us/iter")
    return d / iters


def main():
    enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    from thermal3d.models.thermal_wrap import ThermalPreprocessHead
    from thermal3d.preprocess.enhance import (enhance_thermal_contrast,
                                              percentile_rescale, rgb_to_gray)

    raw = jnp.linspace(21000.0, 26000.0, batch * RAW_H * RAW_W).reshape(
        batch, RAW_H, RAW_W) / 65535.0
    small = jnp.linspace(0.0, 1.0, batch * H * W).reshape(batch, H, W)
    small3 = jnp.tile(small[..., None], (1, 1, 1, 3))

    head = ThermalPreprocessHead()
    head_params = head.init(jax.random.key(1), jnp.zeros((1, H, W, 3)))["params"]

    wh = jnp.asarray(resize_matrix(RAW_H, H, antialias=True))
    ww = jnp.asarray(resize_matrix(RAW_W, W, antialias=True))

    def fb(c, out):
        return c * (1.0 + 1e-6 * jnp.tanh(jnp.mean(out.astype(jnp.float32))))

    print(f"batch={batch} iters={iters} platform={jax.devices()[0].platform} "
          f"({jax.devices()[0].device_kind})")

    # numeric sanity: matmul resize vs jax.image.resize
    ref = jax.image.resize(raw[:2], (2, H, W), method="bilinear")
    got = resize_mm(raw[:2], wh, ww)
    print(f"resize_mm vs jax.image.resize: max|d| = "
          f"{float(jnp.max(jnp.abs(ref - got))):.3e}")

    timed_stage("resize (jax.image bilinear)",
                lambda c: fb(c, jax.image.resize(c, (batch, H, W), method="bilinear")),
                raw, iters)
    timed_stage("resize (matmul)",
                lambda c: fb(c, resize_mm(c, wh, ww)), raw, iters)
    timed_stage("gray (luma collapse)",
                lambda c: fb(c, rgb_to_gray(jnp.tile(c[..., None], (1, 1, 1, 3)))),
                small, iters)
    timed_stage("percentile_rescale (auto)",
                lambda c: fb(c, percentile_rescale(c)), small, iters)
    timed_stage("enhance_thermal_contrast",
                lambda c: fb(c, enhance_thermal_contrast(c)), small, iters)
    timed_stage("thermal head (sobel)",
                lambda c: fb(c, head.apply({"params": head_params}, c)),
                small3, iters)
    timed_stage("preproc full (resize+enh+head)",
                lambda c: fb(c, head.apply(
                    {"params": head_params},
                    enhance_thermal_contrast(
                        jax.image.resize(c, (batch, H, W), method="bilinear")))),
                raw, iters)
    from thermal3d.preprocess.resize import resize_bilinear_hw
    timed_stage("resize (library matmul)",
                lambda c: fb(c, resize_bilinear_hw(c, (H, W))), raw, iters)
    timed_stage("preproc full (library path)",
                lambda c: fb(c, head.apply(
                    {"params": head_params},
                    enhance_thermal_contrast(resize_bilinear_hw(c, (H, W))))),
                raw, iters)


if __name__ == "__main__":
    main()
