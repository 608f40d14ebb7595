"""Fine-tune DUSt3R on thermal pairs — `python -m thermal3d.cli.train`.

CLI surface mirrors train_thermal_dustr.py:25-58 (all 19 flags plus the
TPU-specific additions: --mesh_shape, --resume, --checkpoint_dir, --no_wandb).
"""

from __future__ import annotations

import argparse
import dataclasses




def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Fine-tune DUSt3R on thermal images with pseudo-GT")
    p.add_argument("--dataset_dir", type=str, required=True)
    p.add_argument("--pseudo_gt_dir", type=str, required=True)
    p.add_argument("--weights", type=str, required=True,
                   help="DUSt3R .pth checkpoint (converted on the fly)")
    p.add_argument("--output_model", type=str, required=True,
                   help="Orbax checkpoint directory")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--img_size", type=int, nargs=2, default=[224, 224])
    p.add_argument("--frame_skip", type=int, default=3)
    p.add_argument("--log_interval", type=int, default=100)
    p.add_argument("--use_thermal_aware_loss", action="store_true")
    p.add_argument("--edge_weight", type=float, default=0.5)
    p.add_argument("--smoothness_weight", type=float, default=0.3)
    p.add_argument("--detail_weight", type=float, default=0.4)
    p.add_argument("--accumulation_steps", type=int, default=1)
    p.add_argument("--multi_scale", action="store_true")
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument("--debug_loading", type=int, default=None, metavar="IDX",
                   help="print the index diagnostic for sample IDX (paths, "
                        "file existence, loaded shapes — the reference's "
                        "FreiburgDataset.debug_loading) and exit")
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--mesh_shape", type=int, nargs="*", default=[-1],
                   help="data-parallel mesh shape over available devices")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--no_wandb", action="store_true")
    p.add_argument("--zero1", action="store_true",
                   help="ZeRO-1: shard the AdamW mu/nu buffers over the "
                        "data axis (per-chip optimizer HBM / DP size; "
                        "numerics unchanged — core/mesh.py)")
    p.add_argument("--mu_bf16", action="store_true",
                   help="store the AdamW first moment in bfloat16 (halves "
                        "its HBM bytes; second moment stays f32 — "
                        "docs/PERF.md round-4 optimizer-dtype note)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize transformer blocks in the backward "
                        "pass — trades ~24%% throughput for activation "
                        "memory (only needed at batches that overflow HBM)")
    p.add_argument("--multihost", action="store_true",
                   help="join a multi-host DP job via jax.distributed."
                        "initialize; coordinator/rank come from --coordinator/"
                        "--num_processes/--process_id or the "
                        "THERMAL3D_COORDINATOR/_NUM_PROCESSES/_PROCESS_ID "
                        "env vars (all omitted = Cloud TPU autodetection)")
    p.add_argument("--coordinator", type=str, default=None,
                   help="host:port of process 0 (multi-host only)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    from thermal3d.cli.common import add_preset_flag

    return add_preset_flag(p)


def main(argv=None):
    args = build_parser().parse_args(argv)

    if args.multihost:
        # must run before ANY other jax call in this process
        from thermal3d.core.distributed import initialize_multihost

        pid, pcount = initialize_multihost(
            args.coordinator, args.num_processes, args.process_id)
        print(f"[thermal3d] multihost: process {pid}/{pcount}")
        if pid != 0:
            args.no_wandb = True  # side-effect logging on the coordinator only

    from thermal3d.core.config import DUSTR_224_LINEAR, LossConfig, TrainConfig
    from thermal3d.convert.torch_to_flax import convert_checkpoint
    from thermal3d.core.mesh import make_mesh
    from thermal3d.data.freiburg import FreiburgPairDataset
    from thermal3d.models.dustr import AsymmetricCroCo3DStereo
    from thermal3d.train.logging import MetricLogger
    from thermal3d.train.loop import train_and_evaluate

    from thermal3d.cli.common import apply_preset

    import dataclasses

    model_cfg = apply_preset(DUSTR_224_LINEAR, args.model_preset, args.img_size,
                             args.compute_dtype)
    if args.remat:
        model_cfg = dataclasses.replace(model_cfg, remat=True)
    cfg = TrainConfig(
        lr=args.lr, weight_decay=args.weight_decay, epochs=args.epochs,
        batch_size=args.batch_size, accumulation_steps=args.accumulation_steps,
        use_enhanced_loss=args.use_thermal_aware_loss, seed=args.seed,
        log_interval=args.log_interval, max_batches=args.max_batches,
        loss=LossConfig(edge_weight=args.edge_weight,
                        smoothness_weight=args.smoothness_weight,
                        detail_weight=args.detail_weight,
                        multi_scale=args.multi_scale),
        mesh_shape=tuple(args.mesh_shape),
        mu_dtype="bfloat16" if args.mu_bf16 else None,
        zero1=args.zero1,
    )

    dataset = FreiburgPairDataset(
        args.dataset_dir, img_size=tuple(args.img_size),
        pseudo_gt_dir=args.pseudo_gt_dir, frame_skip=args.frame_skip)
    print(f"Created {len(dataset)} validated thermal pairs")

    if args.debug_loading is not None:
        dataset.debug_loading(args.debug_loading)
        return

    converted, report = convert_checkpoint(args.weights, model_cfg)
    print(f"Converted checkpoint: {len(report['converted'])} tensors "
          f"({len(report['skipped'])} skipped, {len(report['unknown'])} unknown)")
    params = converted["params"]
    from thermal3d.cli.common import apply_scan

    # --scan_layers: restack converted params and build the scan-mode model
    # (the converter always emits the checkpoint-native unrolled layout)
    model_cfg, params = apply_scan(model_cfg, params, args.scan_layers)
    model = AsymmetricCroCo3DStereo(model_cfg)

    mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axes)
    logger = MetricLogger(
        run_name=f"DUSt3R_thermal_ft_ep{args.epochs}_bs{args.batch_size}_lr{args.lr}",
        config=vars(args), use_wandb=not args.no_wandb)
    summary = train_and_evaluate(model, params, dataset, cfg,
                                 checkpoint_dir=args.output_model, logger=logger,
                                 mesh=mesh, resume=args.resume)
    print(f"Training done: {summary}")
    logger.finish()
    return summary


if __name__ == "__main__":
    main()
