"""Depth evaluation metrics — jit-compiled (SURVEY.md C20; BASELINE.json).

Formulas from utils/metrics.py:4-69: valid mask (gt>0 & finite), optional
median scaling (pred ·= median(gt)/median(pred) over the mask), then AbsRel,
SqRel, RMSE, RMSE-log and δ<1.25/1.25²/1.25³ accuracies. Masked reductions
are computed with where-sums (no boolean indexing — static shapes under jit).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    n = jnp.sum(mask)
    return jnp.sum(jnp.where(mask, x, 0.0)) / jnp.maximum(n, 1)


def _masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.nanmedian(jnp.where(mask, x, jnp.nan))


@functools.partial(jax.jit, static_argnames=("median_scaling",))
def compute_depth_metrics_jit(
    pred_depth: jnp.ndarray,
    gt_depth: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    median_scaling: bool = True,
) -> Dict[str, jnp.ndarray]:
    """pred/gt: [H, W] (or any equal shape). Returns dict of scalars.

    With an empty mask the accuracy metrics are 0 and error metrics NaN,
    matching the reference's empty-pixel early-out (metrics.py:34-43).
    """
    pred = pred_depth.astype(jnp.float32)
    gt = gt_depth.astype(jnp.float32)
    if mask is None:
        mask = (gt > 0) & jnp.isfinite(gt)
    else:
        mask = mask.astype(bool)
    n = jnp.sum(mask)
    safe = n > 0

    if median_scaling:
        scale = _masked_median(gt, mask) / _masked_median(pred, mask)
        pred = pred * scale

    # guard divisions on masked-out pixels
    gt_s = jnp.where(mask, gt, 1.0)
    pred_s = jnp.where(mask, pred, 1.0)

    thresh = jnp.maximum(gt_s / pred_s, pred_s / gt_s)
    a1 = _masked_mean((thresh < 1.25).astype(jnp.float32), mask)
    a2 = _masked_mean((thresh < 1.25**2).astype(jnp.float32), mask)
    a3 = _masked_mean((thresh < 1.25**3).astype(jnp.float32), mask)

    abs_rel = _masked_mean(jnp.abs(gt_s - pred_s) / gt_s, mask)
    sq_rel = _masked_mean((gt_s - pred_s) ** 2 / gt_s, mask)
    rmse = jnp.sqrt(_masked_mean((gt_s - pred_s) ** 2, mask))
    rmse_log = jnp.sqrt(_masked_mean((jnp.log(gt_s) - jnp.log(pred_s)) ** 2, mask))

    nan = jnp.float32(jnp.nan)
    return {
        "abs_rel": jnp.where(safe, abs_rel, nan),
        "sq_rel": jnp.where(safe, sq_rel, nan),
        "rmse": jnp.where(safe, rmse, nan),
        "rmse_log": jnp.where(safe, rmse_log, nan),
        "acc_1": jnp.where(safe, a1, 0.0),
        "acc_2": jnp.where(safe, a2, 0.0),
        "acc_3": jnp.where(safe, a3, 0.0),
    }


def compute_depth_metrics(pred_depth, gt_depth, mask=None, median_scaling=True):
    """Host-friendly wrapper returning python floats (reference API shape)."""
    out = compute_depth_metrics_jit(
        jnp.asarray(np.asarray(pred_depth)),
        jnp.asarray(np.asarray(gt_depth)),
        None if mask is None else jnp.asarray(np.asarray(mask)),
        median_scaling,
    )
    return {k: float(v) for k, v in out.items()}


batched_depth_metrics = jax.jit(
    jax.vmap(lambda p, g: compute_depth_metrics_jit(p, g)), static_argnums=()
)
