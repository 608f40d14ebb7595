"""Training losses — confidence-weighted pointmap regression + thermal-aware
edge/smoothness/detail terms.

Pure-jnp re-implementations of utils/loss.py, preserving every numerical
quirk that affects the optimum:
  * v1's edge and smoothness terms are the SAME expression (loss.py:43-46 vs
    :55-58) — intentional-to-replicate;
  * asymmetric gradient clamps 0.4 (view1) / 0.5 (view2) (loss.py:253-256);
  * conf clamp [1e-5, 10] (loss.py:91-92);
  * multi-scale weights 1.0 and 0.7/scale (loss.py:288);
  * v2's zero-padded finite differences (zeros_like + [:-1] assignment,
    loss.py:184-237) vs v1's unpadded slices (loss.py:29-40).

All functions take per-sample arrays (pts: [H,W,3], conf/thermal: [H,W] or
[H,W,3]) and return (loss, components); `batched_enhanced_loss` vmaps over the
leading batch axis — replacing the reference's per-sample Python loop
(train_thermal_dustr.py:182-352) with one fused batched kernel.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from thermal3d.core.config import LossConfig
from thermal3d.preprocess.enhance import rgb_to_gray


def confidence_weighted_regression_loss(
    pred_pts1: jnp.ndarray,
    pred_pts2: jnp.ndarray,
    gt_pts1: jnp.ndarray,
    gt_pts2: jnp.ndarray,
    confidences1: Optional[jnp.ndarray] = None,
    confidences2: Optional[jnp.ndarray] = None,
    alpha: float = 0.2,
) -> jnp.ndarray:
    """DUSt3R objective: mean(conf·L1 − α·log conf) per view, summed
    (utils/loss.py:75-98)."""
    loss1 = jnp.mean(jnp.abs(pred_pts1 - gt_pts1), axis=-1)  # [H, W]
    loss2 = jnp.mean(jnp.abs(pred_pts2 - gt_pts2), axis=-1)
    if confidences1 is None:
        confidences1 = jnp.ones_like(loss1)
    if confidences2 is None:
        confidences2 = jnp.ones_like(loss2)
    c1 = jnp.clip(confidences1, 1e-5, 10.0)
    c2 = jnp.clip(confidences2, 1e-5, 10.0)
    w1 = jnp.mean(c1 * loss1 - alpha * jnp.log(c1))
    w2 = jnp.mean(c2 * loss2 - alpha * jnp.log(c2))
    return w1 + w2


def _gray(img: jnp.ndarray) -> jnp.ndarray:
    return rgb_to_gray(img) if img.ndim == 3 else img


def thermal_aware_loss(
    pred_pts1, pred_pts2, gt_pts1, gt_pts2,
    confidences1=None, confidences2=None,
    thermal_img1=None, thermal_img2=None,
    alpha: float = 0.2, edge_weight: float = 0.5, smoothness_weight: float = 0.3,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """v1 loss (utils/loss.py:4-72). NOTE: edge and smoothness terms are the
    identical expression in the reference; we replicate that."""
    basic = confidence_weighted_regression_loss(
        pred_pts1, pred_pts2, gt_pts1, gt_pts2, confidences1, confidences2, alpha
    )
    edge = jnp.asarray(0.0)
    if thermal_img1 is not None and thermal_img2 is not None:
        tg1, tg2 = _gray(thermal_img1), _gray(thermal_img2)
        gtx1 = jnp.abs(tg1[:, 1:] - tg1[:, :-1])
        gty1 = jnp.abs(tg1[1:, :] - tg1[:-1, :])
        gtx2 = jnp.abs(tg2[:, 1:] - tg2[:, :-1])
        gty2 = jnp.abs(tg2[1:, :] - tg2[:-1, :])
        d1, d2 = pred_pts1[..., 2], pred_pts2[..., 2]
        gdx1 = jnp.abs(d1[:, 1:] - d1[:, :-1])
        gdy1 = jnp.abs(d1[1:, :] - d1[:-1, :])
        gdx2 = jnp.abs(d2[:, 1:] - d2[:, :-1])
        gdy2 = jnp.abs(d2[1:, :] - d2[:-1, :])
        edge = (
            jnp.mean(gdx1 * jnp.exp(-gtx1 * 10))
            + jnp.mean(gdy1 * jnp.exp(-gty1 * 10))
            + jnp.mean(gdx2 * jnp.exp(-gtx2 * 10))
            + jnp.mean(gdy2 * jnp.exp(-gty2 * 10))
        )
    smooth = edge  # duplicated expression, loss.py:55-58
    total = basic + edge_weight * edge + smoothness_weight * smooth
    return total, {"basic_loss": basic, "edge_loss": edge, "smoothness_loss": smooth}


def _grad_xy_padded(t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """|forward difference| with zero in the last column/row (v2 style)."""
    gx = jnp.pad(jnp.abs(t[:, 1:] - t[:, :-1]), ((0, 0), (0, 1)))
    gy = jnp.pad(jnp.abs(t[1:, :] - t[:-1, :]), ((0, 1), (0, 0)))
    return gx, gy


def _avg_pool2(t: jnp.ndarray, s: int) -> jnp.ndarray:
    """F.avg_pool2d(kernel=s, stride=s) on a 2-D map (floor division sizes)."""
    h, w = t.shape
    hh, ww = h // s, w // s
    return t[: hh * s, : ww * s].reshape(hh, s, ww, s).mean(axis=(1, 3))


def _huber_mean(diff: jnp.ndarray, delta: float) -> jnp.ndarray:
    return jnp.mean(
        jnp.where(diff < delta, 0.5 * diff * diff, delta * (diff - 0.5 * delta))
    )


def enhanced_thermal_aware_loss(
    pred_pts1, pred_pts2, gt_pts1, gt_pts2,
    confidences1=None, confidences2=None,
    thermal_img1=None, thermal_img2=None,
    alpha: float = 0.2, edge_weight: float = 0.5, smoothness_weight: float = 0.3,
    detail_weight: float = 0.3, multi_scale: bool = True,
    cfg: Optional[LossConfig] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """v2 loss used by training (utils/loss.py:100-305)."""
    if cfg is None:
        cfg = LossConfig()
    basic = confidence_weighted_regression_loss(
        pred_pts1, pred_pts2, gt_pts1, gt_pts2, confidences1, confidences2, alpha
    )
    edge = jnp.asarray(0.0)
    smooth = jnp.asarray(0.0)
    detail = jnp.asarray(0.0)

    if thermal_img1 is not None and thermal_img2 is not None:
        tg1, tg2 = _gray(thermal_img1), _gray(thermal_img2)
        d1, d2 = pred_pts1[..., 2], pred_pts2[..., 2]
        g1, g2 = gt_pts1[..., 2], gt_pts2[..., 2]
        scales = cfg.scales if multi_scale else (1,)

        for scale in scales:
            if scale > 1:
                t1s, t2s = _avg_pool2(tg1, scale), _avg_pool2(tg2, scale)
                d1s, d2s = _avg_pool2(d1, scale), _avg_pool2(d2, scale)
                g1s, g2s = _avg_pool2(g1, scale), _avg_pool2(g2, scale)
            else:
                t1s, t2s, d1s, d2s, g1s, g2s = tg1, tg2, d1, d2, g1, g2

            gtx1, gty1 = _grad_xy_padded(t1s)
            gtx2, gty2 = _grad_xy_padded(t2s)
            gdx1, gdy1 = _grad_xy_padded(d1s)
            gdx2, gdy2 = _grad_xy_padded(d2s)
            ggx1, ggy1 = _grad_xy_padded(g1s)
            ggx2, ggy2 = _grad_xy_padded(g2s)

            eps = cfg.grad_norm_eps
            ntx1 = gtx1 / (jnp.mean(gtx1) + eps)
            nty1 = gty1 / (jnp.mean(gty1) + eps)
            ntx2 = gtx2 / (jnp.mean(gtx2) + eps)
            nty2 = gty2 / (jnp.mean(gty2) + eps)

            tf = cfg.thermal_factor
            c1, c2 = cfg.grad_clamp_view1, cfg.grad_clamp_view2
            ew1 = jnp.exp(-jnp.clip(ntx1, 0, c1) * tf) * jnp.exp(-jnp.clip(nty1, 0, c1) * tf)
            ew2 = jnp.exp(-jnp.clip(ntx2, 0, c2) * tf) * jnp.exp(-jnp.clip(nty2, 0, c2) * tf)

            se1 = jnp.mean(gdx1 * (1 - ew1)) + jnp.mean(gdy1 * (1 - ew1))
            se2 = jnp.mean(gdx2 * (1 - ew2)) + jnp.mean(gdy2 * (1 - ew2))

            ss1 = jnp.mean(gdx1**2 * ew1) + jnp.mean(gdy1**2 * ew1)
            ss2 = jnp.mean(gdx2**2 * ew2) + jnp.mean(gdy2**2 * ew2)

            delta = cfg.huber_delta
            sd1 = _huber_mean(jnp.abs(gdx1 - ggx1), delta) + _huber_mean(jnp.abs(gdy1 - ggy1), delta)
            sd2 = _huber_mean(jnp.abs(gdx2 - ggx2), delta) + _huber_mean(jnp.abs(gdy2 - ggy2), delta)

            sw = 1.0 if scale == 1 else 0.7 / scale
            edge = edge + sw * (se1 + se2)
            smooth = smooth + sw * (ss1 + ss2)
            detail = detail + sw * (sd1 + sd2)

    total = basic + edge_weight * edge + smoothness_weight * smooth + detail_weight * detail
    return total, {
        "basic_loss": basic,
        "edge_loss": edge,
        "smoothness_loss": smooth,
        "detail_loss": detail,
    }


@functools.partial(jax.jit, static_argnames=("alpha", "edge_weight", "smoothness_weight",
                                             "detail_weight", "multi_scale"))
def batched_enhanced_loss(
    pred_pts1, pred_pts2, gt_pts1, gt_pts2,
    confidences1, confidences2, thermal1, thermal2,
    alpha: float = 0.2, edge_weight: float = 0.5, smoothness_weight: float = 0.3,
    detail_weight: float = 0.3, multi_scale: bool = True,
):
    """Whole-batch v2 loss: vmap over samples, mean-reduce — the sharded-jit
    replacement for the reference's per-sample accumulation
    (train_thermal_dustr.py:182-363, sum of per-sample losses / valid count)."""

    def per_sample(p1, p2, g1, g2, c1, c2, t1, t2):
        return enhanced_thermal_aware_loss(
            p1, p2, g1, g2, c1, c2, t1, t2,
            alpha=alpha, edge_weight=edge_weight,
            smoothness_weight=smoothness_weight, detail_weight=detail_weight,
            multi_scale=multi_scale,
        )

    losses, comps = jax.vmap(per_sample)(
        pred_pts1, pred_pts2, gt_pts1, gt_pts2,
        confidences1, confidences2, thermal1, thermal2,
    )
    return jnp.mean(losses), {k: jnp.mean(v) for k, v in comps.items()}
