"""Evaluate thermal depth vs pseudo-GT — `python -m thermal3d.cli.evaluate`.

Mirrors utils/evaluate_depth_metrics.py:247-401 (and fixes the reference's
dead run_evaluate_thermal_dustr.sh reference to a missing script —
SURVEY.md C27).
"""

from __future__ import annotations

import argparse
import glob
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Evaluate Thermal DUSt3R on a test set")
    p.add_argument("--model", type=str, default=None, help=".pth checkpoint (converted)")
    p.add_argument("--thermal_dir", type=str, required=True)
    p.add_argument("--pseudo_gt_dir", type=str, required=True,
                   help="directory with *_depth.npy pseudo-GT files")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--img_size", type=int, nargs=2, default=[224, 224])
    p.add_argument("--num_samples", type=int, default=0, help="0 = all")
    p.add_argument("--batch_size", type=int, default=36,
                   help="36 = the measured v5e throughput optimum (M=7056 "
                        "token rows, docs/PERF.md); final partial batch is "
                        "padded")
    p.add_argument("--no_thermal_model", action="store_true")
    p.add_argument("--no_vis", action="store_true")
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--ndev", type=int, default=1,
                   help="data-parallel evaluation over N devices (params "
                        "replicated, batches sharded over a 1-D mesh; "
                        "batch_size must be a multiple of N) — the reference "
                        "eval loop is single-GPU "
                        "(utils/evaluate_depth_metrics.py:247-401)")
    from thermal3d.cli.common import add_preset_flag

    return add_preset_flag(p)


def main(argv=None):
    import dataclasses

    from thermal3d.core.config import DUSTR_224_LINEAR
    from thermal3d.evaluation.evaluator import evaluate_test_set
    from thermal3d.infer.engine import InferenceEngine

    args = build_parser().parse_args(argv)
    from thermal3d.cli.common import apply_preset

    config = apply_preset(DUSTR_224_LINEAR, args.model_preset, args.img_size,
                          args.compute_dtype)
    params = head_params = None
    if args.model:
        from thermal3d.cli.infer import _load_params

        params, head_params = _load_params(args.model, config)
    from thermal3d.cli.common import apply_scan

    config, params = apply_scan(config, params, args.scan_layers)
    from thermal3d.cli.common import make_dp_mesh

    mesh = make_dp_mesh(args.ndev, args.batch_size, build_parser().error)
    engine = InferenceEngine(config, params=params,
                             use_thermal_head=not args.no_thermal_model,
                             thermal_head_params=head_params, mesh=mesh)

    thermal_paths = sorted(glob.glob(os.path.join(args.thermal_dir, "*.png")))
    if args.num_samples:
        thermal_paths = thermal_paths[: args.num_samples]
    summary = evaluate_test_set(engine, thermal_paths, args.pseudo_gt_dir,
                                output_dir=args.output_dir,
                                save_visualizations=not args.no_vis,
                                batch_size=args.batch_size)
    if summary:
        print("\nAverage metrics:")
        print(f"RMSE: {summary['rmse']:.4f}")
        print(f"Acc[<1.25]: {summary['acc_1']:.4f}")
        print(f"Acc[<1.25^2]: {summary['acc_2']:.4f}")
    else:
        print("No valid metrics computed")
    return summary


if __name__ == "__main__":
    main()
