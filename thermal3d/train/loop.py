"""Training driver: epochs, validation, early stopping, checkpoints.

Mirrors train_thermal_dustr.py:120-556 at the orchestration level (0.8/0.2
split, per-epoch scheduler, best-on-val checkpoint, early-stop patience 10,
--max_batches quick-test cap) on top of the sharded batched step.
"""

from __future__ import annotations

import time
from typing import Dict, Optional


import numpy as np

from thermal3d.core.config import TrainConfig
from thermal3d.core.mesh import make_mesh, shard_batch, shard_batch_multihost
from thermal3d.data.pipeline import BatchLoader, split_index
from thermal3d.train.checkpoint import CheckpointManager
from thermal3d.train.logging import MetricLogger
from thermal3d.train.state import create_train_state, make_lr_schedule
from thermal3d.train.step import make_eval_step, make_train_step


def train_and_evaluate(
    model,
    params,
    dataset,
    cfg: TrainConfig,
    checkpoint_dir: Optional[str] = None,
    logger: Optional[MetricLogger] = None,
    mesh=None,
    resume: bool = False,
) -> Dict[str, float]:
    """Returns summary dict with best_val_loss / epochs_run / final step."""
    if mesh is None:
        mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axes)
    n_data = mesh.shape.get("data", 1)
    if cfg.batch_size % n_data:
        # batch must divide evenly across the data axis; fall back to the
        # largest compatible device count (e.g. reference default batch 4 on
        # an 8-device host → 4-way DP)
        best = max(d for d in range(1, n_data + 1) if cfg.batch_size % d == 0)
        print(f"[thermal3d] batch_size {cfg.batch_size} not divisible by "
              f"{n_data} devices; using {best}-way data parallelism")
        devs = mesh.devices.reshape(-1)[:best]
        mesh = make_mesh((best,), ("data",), devices=list(devs))
    if logger is None:
        logger = MetricLogger(use_wandb=False)

    # Multi-host DP (core/distributed.py): every process runs this same loop;
    # the loaders each feed the process-local slice of the global batch and
    # shard_batch_multihost assembles the logically-global arrays over DCN.
    import jax

    pid, pcount = jax.process_index(), jax.process_count()
    place_batch = shard_batch if pcount == 1 else shard_batch_multihost

    train_idx, val_idx = split_index(len(dataset), cfg.val_fraction, cfg.seed)
    train_loader = BatchLoader(dataset, train_idx, cfg.batch_size, shuffle=True,
                               seed=cfg.seed, process_id=pid,
                               process_count=pcount)
    val_loader = BatchLoader(dataset, val_idx, cfg.batch_size, shuffle=False,
                             drop_last=False, process_id=pid,
                             process_count=pcount)

    steps_per_epoch = max(1, len(train_loader))
    state = create_train_state(model, params, cfg, steps_per_epoch)
    lr_schedule = make_lr_schedule(cfg, steps_per_epoch)

    ckpt = CheckpointManager(checkpoint_dir) if checkpoint_dir else None
    start_epoch = 0
    best_val = float("inf")
    patience_counter = 0
    if resume and ckpt is not None and ckpt.latest_step() is not None:
        state, meta = ckpt.restore(state)
        start_epoch = int(meta.get("epoch", 0))
        # early-stop bookkeeping rides in the meta so a resumed run stops at
        # the same epoch the uninterrupted run would
        best_val = float(meta.get("best_val", meta.get("val_loss", float("inf"))))
        patience_counter = int(meta.get("patience", 0))

    state_shardings = None
    if cfg.zero1 and mesh.shape.get("data", 1) > 1:
        # ZeRO-1: jit's in/out shardings carry the sharded optimizer slots;
        # params stay replicated, so eval_step and checkpointing are
        # unaffected — orbax saves/restores the logical arrays regardless of
        # sharding.
        from thermal3d.core.mesh import state_sharding

        state_shardings = state_sharding(mesh, state, zero1=True)
        # Re-place the state onto the mesh explicitly: ckpt.restore returns
        # COMMITTED SingleDeviceSharding arrays, and jit refuses committed
        # inputs whose sharding mismatches in_shardings ("Sharding passed to
        # jit does not match the sharding on the respective arg"), so a
        # resumed --zero1 run would crash on its first step (ADVICE r4).
        if pcount == 1:
            state = jax.tree_util.tree_map(jax.device_put, state,
                                           state_shardings)
        else:
            # Multi-host: device_put onto shardings spanning non-addressable
            # devices is rejected, so assemble each leaf as a GLOBAL array —
            # every process holds the identical full host value (same init
            # seed / same restored checkpoint) and contributes its
            # addressable shards by global index (tests/_multihost_worker.py
            # exercises this 2-process).
            def _globalize(x, sh):
                x = np.asarray(x)
                return jax.make_array_from_callback(
                    x.shape, sh, lambda idx: x[idx])

            state = jax.tree_util.tree_map(_globalize, state, state_shardings)
    train_step = make_train_step(model, cfg, mesh,
                                 state_shardings=state_shardings)
    eval_step = make_eval_step(model, cfg, mesh)

    global_step = int(state.step)
    epochs_run = 0
    scalar_keys = ("loss", "basic_loss", "edge_loss", "smoothness_loss",
                   "detail_loss")

    def flush_logs(pending):
        """One host fetch for a window of per-step device scalars — keeps the
        per-batch wandb metric stream (train:374-378) WITHOUT a host sync on
        every step serializing device work."""
        if not pending:
            return 0.0, 0
        import jax

        fetched = jax.device_get([m for _, m in pending])
        run, n = 0.0, 0
        for (gs, _), vals in zip(pending, fetched):
            loss = float(vals["loss"])
            if np.isfinite(loss):
                run += loss
                n += 1
            logger.log({
                "batch_loss": loss,
                "basic_loss": float(vals.get("basic_loss", np.nan)),
                "edge_loss": float(vals.get("edge_loss", 0.0)) * cfg.loss.edge_weight,
                "smoothness_loss": float(vals.get("smoothness_loss", 0.0))
                * cfg.loss.smoothness_weight,
                "detail_loss": float(vals.get("detail_loss", 0.0)) * cfg.loss.detail_weight,
                "learning_rate": float(lr_schedule(gs - 1)),
                "global_step": gs,
            })
        pending.clear()
        return run, n

    for epoch in range(start_epoch, cfg.epochs):
        epoch_t0 = time.time()
        running, nb = 0.0, 0
        pending = []  # (global_step, device-scalar dict) awaiting one fetch
        for bi, batch in enumerate(train_loader):
            if cfg.max_batches is not None and bi >= cfg.max_batches:
                break
            if "pointmap1" not in batch:
                continue
            state, metrics = train_step(state, place_batch(mesh, batch))
            pending.append((global_step + 1,
                            {k: metrics[k] for k in scalar_keys if k in metrics}))
            global_step += 1
            # fires on the FIRST batch then every log_interval, matching the
            # reference's `batch_idx % log_interval == 0` (train:325)
            if cfg.log_interval and (global_step - 1) % cfg.log_interval == 0:
                r, n = flush_logs(pending)
                running += r
                nb += n
                # wandb sample panels every log_interval steps (train:325-347)
                try:
                    from thermal3d.viz.panels import (
                        log_sample_images, log_sample_images_with_edges)

                    log_fn = (log_sample_images_with_edges if cfg.use_enhanced_loss
                              else log_sample_images)
                    log_fn(logger, batch["thermal1"][0] / max(batch["thermal1"][0].max(), 1e-6),
                           batch["thermal2"][0] / max(batch["thermal2"][0].max(), 1e-6),
                           np.asarray(metrics["sample_pred_depth"]),
                           np.asarray(metrics["sample_gt_depth"]),
                           f"sample_ep{epoch + 1}_step{global_step}")
                except Exception:
                    pass  # visualization must never kill training

        r, n = flush_logs(pending)
        running += r
        nb += n
        if nb:
            logger.log({"epoch": epoch + 1, "train_loss": running / nb,
                        "epoch_seconds": time.time() - epoch_t0})

        # validation (plain L1, train:389-504); remainder batches are padded
        # to the full batch size (static shapes) and averaged over the real
        # samples only
        val_sum, val_n = 0.0, 0
        for bi, batch in enumerate(val_loader):
            if cfg.max_batches is not None and bi >= cfg.max_batches:
                break
            if "pointmap1" not in batch:
                continue
            n_rows = batch["thermal1"].shape[0]
            n_real = n_rows
            if hasattr(val_loader, "local_real_count"):
                # the loader pads partial final batches (incl. empty high-rank
                # multihost slices) with duplicate rows; count only real ones
                n_real = min(n_real, val_loader.local_real_count(bi))
            local_bs = cfg.batch_size // pcount
            if n_rows < local_bs:
                # pad the ROWS up to the static shape — only single-process
                # loaders yield short batches (the multi-process loader
                # pre-pads every slice); padding by n_real here would
                # double-pad an already-padded multihost batch to an
                # indivisible global size (caught by the 2-process loop test)
                pad = local_bs - n_rows
                batch = {k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
                         for k, v in batch.items()}
            per_sample = eval_step(state.params, place_batch(mesh, batch))
            if pcount == 1:
                per_sample = np.asarray(per_sample)
            else:
                # data-sharded output: this process's addressable shards ARE
                # its local samples (assembled in loader order)
                shards = sorted(per_sample.addressable_shards,
                                key=lambda s: s.index[0].start or 0)
                per_sample = np.concatenate([np.asarray(s.data) for s in shards])
            val_sum += float(per_sample[:n_real].sum())
            val_n += n_real
        epochs_run = epoch + 1
        if pcount > 1:
            # global val loss: every process must see the SAME value so the
            # early-stop / checkpoint decisions below stay in lockstep
            # (orbax saves are collective in multi-process)
            from jax.experimental import multihost_utils

            parts = multihost_utils.process_allgather(
                np.array([val_sum, float(val_n)]))
            val_sum = float(parts[:, 0].sum())
            val_n = int(parts[:, 1].sum())
        if not val_n:
            continue
        val_loss = val_sum / val_n
        logger.log({"epoch": epoch + 1, "val_loss": val_loss})

        improved = val_loss < best_val
        if improved:
            best_val = val_loss
            patience_counter = 0
        else:
            patience_counter += 1
        if ckpt is not None:
            meta = {"epoch": epoch + 1, "best_val": best_val,
                    "patience": patience_counter}
            if improved:
                ckpt.save_best(epoch + 1, state, val_loss, meta)
            # rolling last checkpoint every epoch → exact resume even when
            # the epoch didn't improve
            ckpt.save_last(epoch + 1, state, val_loss, meta)
        if patience_counter >= cfg.early_stop_patience:
            break

    if ckpt is not None:
        ckpt.close()
    return {"best_val_loss": best_val, "epochs_run": epochs_run,
            "final_step": global_step}
