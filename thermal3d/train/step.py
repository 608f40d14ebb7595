"""Sharded jit train/eval steps.

This is the reference's per-sample Python loop with try/except error-eating
(train_thermal_dustr.py:182-363) re-designed as ONE fused, batched, sharded
program (SURVEY.md §2.3 — the single biggest architectural delta):

  * the raw thermal frames are percentile-enhanced ON DEVICE (the reference
    enhances per sample on host via numpy);
  * the 512² pseudo-GT pointmaps/confidences are resized to the prediction
    resolution in-graph (bilinear, half-pixel = F.interpolate
    align_corners=False; train:234-271);
  * confidence comes from the model's predicted conf (the reference's
    pred→GT→ones priority always resolves to pred, train:274-279), floored at
    1e-5 (train:278-279);
  * loss: enhanced thermal-aware v2 or plain confidence-weighted L1
    (train:281-317); whole batch via vmap, mean-reduced;
  * grads: global-norm clip 1.0 + AdamW (train:357-363).

Sharding: batch arrays arrive sharded over the 'data' mesh axis; params are
replicated. XLA inserts the gradient all-reduce over ICI from the shardings —
no explicit collectives.
"""

from __future__ import annotations


from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from thermal3d.core.config import TrainConfig
from thermal3d.losses.losses import (
    confidence_weighted_regression_loss,
    enhanced_thermal_aware_loss,
)
from thermal3d.preprocess.enhance import enhance_thermal_contrast, rgb_to_gray
from thermal3d.preprocess.resize import resize_bilinear_hw, resize_bilinear_hwc


def _resize_gt_to(pred_hw: Tuple[int, int], gt: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-resize batched GT ([B,Hg,Wg,C] or [B,Hg,Wg]) to pred res."""
    if gt.shape[1:3] == pred_hw:
        return gt
    if gt.ndim == 4:
        return resize_bilinear_hwc(gt, pred_hw)
    return resize_bilinear_hw(gt, pred_hw)


def _batch_loss(pred1, pred2, batch, pred_hw, cfg: TrainConfig):
    gt1 = _resize_gt_to(pred_hw, batch["pointmap1"])
    gt2 = _resize_gt_to(pred_hw, batch["pointmap2"])
    conf1 = jnp.maximum(pred1["conf"], 1e-5)
    conf2 = jnp.maximum(pred2["conf"], 1e-5)
    thermal1 = rgb_to_gray(batch["thermal1_enh"])
    thermal2 = rgb_to_gray(batch["thermal2_enh"])
    lc = cfg.loss

    if cfg.use_enhanced_loss:
        def per_sample(p1, p2, g1, g2, c1, c2, t1, t2):
            return enhanced_thermal_aware_loss(
                p1, p2, g1, g2, c1, c2, t1, t2,
                alpha=lc.alpha, edge_weight=lc.edge_weight,
                smoothness_weight=lc.smoothness_weight,
                detail_weight=lc.detail_weight, multi_scale=lc.multi_scale, cfg=lc,
            )

        losses, comps = jax.vmap(per_sample)(
            pred1["pts3d"], pred2["pts3d_in_other_view"], gt1, gt2,
            conf1, conf2, thermal1, thermal2,
        )
        return jnp.mean(losses), {k: jnp.mean(v) for k, v in comps.items()}

    def per_sample(p1, p2, g1, g2, c1, c2):
        return confidence_weighted_regression_loss(p1, p2, g1, g2, c1, c2, lc.alpha)

    losses = jax.vmap(per_sample)(
        pred1["pts3d"], pred2["pts3d_in_other_view"], gt1, gt2, conf1, conf2
    )
    loss = jnp.mean(losses)
    return loss, {"basic_loss": loss}


def _prepare_views(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Device-side percentile enhancement of the raw thermal frames
    (utils/preprocessing.py:6-30, applied per sample in dataset_loader:110)."""
    out = dict(batch)
    out["thermal1_enh"] = enhance_thermal_contrast(rgb_to_gray(batch["thermal1"]))
    out["thermal2_enh"] = enhance_thermal_contrast(rgb_to_gray(batch["thermal2"]))
    return out


def make_train_step(model, cfg: TrainConfig, mesh: Optional[Mesh] = None,
                    state_shardings=None) -> Callable:
    def train_step(state, batch):
        batch = _prepare_views(batch)

        def loss_and_sample(params):
            pred1, pred2 = model.apply(
                {"params": params}, batch["thermal1_enh"], batch["thermal2_enh"]
            )
            pred_hw = pred1["pts3d"].shape[1:3]
            loss, comps = _batch_loss(pred1, pred2, batch, pred_hw, cfg)
            # first-sample depths for wandb panels (train:325-347); tiny
            comps = dict(comps)
            comps["sample_pred_depth"] = pred1["pts3d"][0, :, :, 2]
            comps["sample_gt_depth"] = _resize_gt_to(pred_hw, batch["pointmap1"])[0, :, :, 2]
            return loss, comps

        (loss, comps), grads = jax.value_and_grad(loss_and_sample, has_aux=True)(
            state.params)
        new_state = state.apply_gradients(grads=grads)
        metrics = dict(comps)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax_global_norm(grads)
        return new_state, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    # state_shardings: per-leaf NamedShardings (core.mesh.state_sharding) for
    # tensor-parallel runs — params/moments carry 'model'-axis specs and XLA
    # inserts the per-sublayer all-reduces. Default: replicated params (DP).
    state_shd = state_shardings if state_shardings is not None else repl
    return jax.jit(
        train_step,
        in_shardings=(state_shd, data),
        out_shardings=(state_shd, repl),
        donate_argnums=(0,),
    )


def make_eval_step(model, cfg: TrainConfig, mesh: Optional[Mesh] = None) -> Callable:
    """Validation loss: plain L1, (mean1 + mean2)/2 PER SAMPLE
    (train_thermal_dustr.py:487-492). Returns [B] per-sample losses so the
    caller can average over real (non-padded) samples only."""

    def eval_step(params, batch):
        batch = _prepare_views(batch)
        pred1, pred2 = model.apply(
            {"params": params}, batch["thermal1_enh"], batch["thermal2_enh"]
        )
        pred_hw = pred1["pts3d"].shape[1:3]
        gt1 = _resize_gt_to(pred_hw, batch["pointmap1"])
        gt2 = _resize_gt_to(pred_hw, batch["pointmap2"])
        l1 = jnp.mean(jnp.abs(pred1["pts3d"] - gt1), axis=(1, 2, 3))
        l2 = jnp.mean(jnp.abs(pred2["pts3d_in_other_view"] - gt2), axis=(1, 2, 3))
        return (l1 + l2) / 2

    if mesh is None:
        return jax.jit(eval_step)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(eval_step, in_shardings=(repl, data), out_shardings=data)


def optax_global_norm(grads) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
