"""Train state, optimizer, and LR schedule.

Optimizer: AdamW(lr=5e-4, wd=1e-4, torch-default betas/eps) behind global-norm
clipping at 1.0 (train_thermal_dustr.py:91,361).

LR schedule reproduces the reference's EPOCH-stepped
SequentialLR(LinearLR(start_factor=0.1, total_iters=warmup_epochs),
CosineAnnealingLR(T_max=epochs-warmup, eta_min=1e-7)) — train:99-118 — the LR
is a function of the epoch index (scheduler.step() once per epoch, :386), so
our per-step schedule quantizes step→epoch.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from thermal3d.core.config import TrainConfig


class TrainState(train_state.TrainState):
    pass


def make_lr_schedule(cfg: TrainConfig, steps_per_epoch: int) -> Callable:
    warmup_epochs = int(cfg.epochs * cfg.warmup_frac)
    base = cfg.lr
    eta_min = cfg.eta_min
    t_max = max(1, cfg.epochs - warmup_epochs)

    def schedule(step):
        epoch = step // max(1, steps_per_epoch)
        if warmup_epochs > 0:
            lin = base * (cfg.warmup_start_factor
                          + (1.0 - cfg.warmup_start_factor)
                          * jnp.minimum(epoch, warmup_epochs) / warmup_epochs)
        else:
            lin = jnp.asarray(base)
        t = jnp.maximum(epoch - warmup_epochs, 0)
        cos = eta_min + (base - eta_min) * 0.5 * (1 + jnp.cos(jnp.pi * t / t_max))
        return jnp.where(epoch < warmup_epochs, lin, cos)

    return schedule


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    schedule = make_lr_schedule(cfg, steps_per_epoch)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay=cfg.weight_decay,
                    mu_dtype=getattr(cfg, "mu_dtype", None)),
    )
    if getattr(cfg, "flatten_optimizer", False):
        # one flat-vector AdamW instead of ~600 per-leaf updates; numerics
        # identical up to f32 reduction order in the global-norm clip
        tx = optax.flatten(tx)
    if cfg.accumulation_steps > 1:
        # real gradient accumulation — the reference parses the flag but never
        # uses it (train:50-51; SURVEY §2.3)
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulation_steps)
    return tx


def create_train_state(model, params, cfg: TrainConfig, steps_per_epoch: int) -> TrainState:
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=make_optimizer(cfg, steps_per_epoch)
    )
