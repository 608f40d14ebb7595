"""Grid search over thermal-loss weights — `python -m thermal3d.cli.grid_search`.

Python re-design of run_grid_search_thermal_parameters.sh: sweeps
edge_weight × smoothness_weight (defaults {0.3,0.5,0.7}×{0.1,0.3,0.5},
grid-search script:13-14) with short truncated trainings, picks the best val
loss, and writes best_params.json + a ready-to-run training command (the
reference emits a shell script, :74-140). No log scraping — val losses come
back from the training loop directly.
"""

from __future__ import annotations

import argparse
import dataclasses
import itertools
import json
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Grid search thermal loss weights")
    p.add_argument("--dataset_dir", type=str, required=True)
    p.add_argument("--pseudo_gt_dir", type=str, required=True)
    p.add_argument("--weights", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="grid_search_results")
    p.add_argument("--edge_weights", type=float, nargs="*", default=[0.3, 0.5, 0.7])
    p.add_argument("--smoothness_weights", type=float, nargs="*", default=[0.1, 0.3, 0.5])
    p.add_argument("--epochs", type=int, default=2)  # cheap evaluations (:15)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument("--frame_skip", type=int, default=3)
    p.add_argument("--img_size", type=int, nargs=2, default=[224, 224])
    return p


def main(argv=None):
    from thermal3d.core.config import DUSTR_224_LINEAR, LossConfig, TrainConfig
    from thermal3d.convert.torch_to_flax import convert_checkpoint
    from thermal3d.data.freiburg import FreiburgPairDataset
    from thermal3d.models.dustr import AsymmetricCroCo3DStereo
    from thermal3d.train.loop import train_and_evaluate

    args = build_parser().parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    model_cfg = dataclasses.replace(DUSTR_224_LINEAR, img_size=tuple(args.img_size),
                                    compute_dtype="bfloat16")
    model = AsymmetricCroCo3DStereo(model_cfg)
    converted, _ = convert_checkpoint(args.weights, model_cfg)
    base_params = converted["params"]
    dataset = FreiburgPairDataset(args.dataset_dir, img_size=tuple(args.img_size),
                                  pseudo_gt_dir=args.pseudo_gt_dir,
                                  frame_skip=args.frame_skip)

    results = []
    for ew, sw in itertools.product(args.edge_weights, args.smoothness_weights):
        cfg = TrainConfig(
            epochs=args.epochs, batch_size=args.batch_size,
            max_batches=args.max_batches, use_enhanced_loss=True,
            loss=LossConfig(edge_weight=ew, smoothness_weight=sw))
        summary = train_and_evaluate(model, base_params, dataset, cfg)
        results.append({"edge_weight": ew, "smoothness_weight": sw,
                        "val_loss": summary["best_val_loss"]})
        print(f"edge={ew} smooth={sw} -> val_loss {summary['best_val_loss']:.4f}")

    best = min(results, key=lambda r: r["val_loss"])
    payload = {"results": results, "best": best}
    with open(os.path.join(args.output_dir, "best_params.json"), "w") as f:
        json.dump(payload, f, indent=2)
    cmd = (f"python -m thermal3d.cli.train --dataset_dir {args.dataset_dir} "
           f"--pseudo_gt_dir {args.pseudo_gt_dir} --weights {args.weights} "
           f"--output_model thermal_dustr_best --use_thermal_aware_loss --multi_scale "
           f"--edge_weight {best['edge_weight']} "
           f"--smoothness_weight {best['smoothness_weight']}")
    with open(os.path.join(args.output_dir, "run_best_params.sh"), "w") as f:
        f.write("#!/bin/bash\n" + cmd + "\n")
    print(f"Best: {best}")
    return payload


if __name__ == "__main__":
    main()
