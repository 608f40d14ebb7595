"""Test-set evaluation driver (utils/evaluate_depth_metrics.py:199-401) and
model-level evaluator (utils/metrics.py:72-137).

Filename-matching heuristics are reproduced exactly (timestamp extraction,
trailing-'0' RGB/IR suffix repair, glob fallback, fuzzy scan); inference runs
batched through the jit engine; metrics are the jit kernels; per-image
comparison PNGs and the metrics_summary.txt layout match the reference so
downstream tooling keeps working.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional

import numpy as np

from thermal3d.evaluation.metrics import compute_depth_metrics
from thermal3d.infer.engine import InferenceEngine


def find_matching_depth_file(thermal_path: str, depth_dir: str) -> Optional[str]:
    """evaluate_depth_metrics.py:199-245."""
    thermal_name = os.path.splitext(os.path.basename(thermal_path))[0]
    parts = thermal_name.split("_")
    if len(parts) < 3:
        return None
    timestamp = "_".join(parts[2:-1])
    rgb_numeric = parts[-2] + "0"  # IR stamps drop a trailing 0 vs RGB
    rgb_basename = f"fl_ir_aligned_{timestamp}_{rgb_numeric}_rgb"

    direct = os.path.join(depth_dir, f"{rgb_basename}_depth.npy")
    if os.path.exists(direct):
        return direct
    matches = glob.glob(os.path.join(depth_dir, f"*{timestamp}*_depth.npy"))
    if matches:
        return sorted(matches)[0]
    for filename in sorted(os.listdir(depth_dir)):
        if not filename.endswith("_depth.npy"):
            continue
        fparts = filename.split("_")
        if len(fparts) < 3:
            continue
        file_timestamp = "_".join(fparts[2:4])
        if timestamp in file_timestamp or file_timestamp in timestamp:
            return os.path.join(depth_dir, filename)
    return None


def _resize_nearest(img: np.ndarray, hw) -> np.ndarray:
    try:
        import cv2

        return cv2.resize(img, (hw[1], hw[0]), interpolation=cv2.INTER_NEAREST)
    except Exception:
        import jax
        import jax.numpy as jnp

        return np.asarray(jax.image.resize(jnp.asarray(img), hw, method="nearest"))


def evaluate_test_set(engine: InferenceEngine, thermal_paths: List[str],
                      pseudo_gt_depth_dir: str, output_dir: Optional[str] = None,
                      save_visualizations: bool = True,
                      batch_size: int = 16) -> Dict[str, float]:
    """Batched monocular eval. Per-image metrics/PNGs + metrics_summary.txt
    (evaluate_depth_metrics.py:329-396). Returns the averaged metrics."""
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)

    matched = [(t, find_matching_depth_file(t, pseudo_gt_depth_dir))
               for t in thermal_paths]
    matched = [(t, d) for t, d in matched if d is not None]
    if not matched:
        return {}

    results = engine.infer_paths([t for t, _ in matched], batch_size=batch_size)
    pred_depths = results["depth"]
    # re-pair via the surviving paths: decode failures are dropped inside
    # infer_paths, so zipping `matched` directly would shift every row after
    # the first bad file
    gt_by_thermal = dict(matched)
    matched = [(t, gt_by_thermal[t]) for t in results["paths"]]

    all_metrics = []
    for (thermal_path, gt_path), pred in zip(matched, pred_depths):
        gt = np.load(gt_path)
        if gt.shape != pred.shape:
            gt = _resize_nearest(gt, pred.shape)  # INTER_NEAREST (eval:320-323)
        m = compute_depth_metrics(pred, gt, median_scaling=True)
        all_metrics.append(m)
        if output_dir:
            base = os.path.splitext(os.path.basename(thermal_path))[0]
            with open(os.path.join(output_dir, f"{base}_metrics.txt"), "w") as f:
                f.write(f"RMSE: {m['rmse']:.4f}\n")
                f.write(f"Acc[<1.25]: {m['acc_1']:.4f}\n")
                f.write(f"Acc[<1.25^2]: {m['acc_2']:.4f}\n")
            if save_visualizations:
                from thermal3d.viz.panels import save_comparison_panel

                save_comparison_panel(
                    thermal_path, pred, gt, m["rmse"],
                    os.path.join(output_dir, f"{base}_comparison.png"))

    avg = {
        "n_images": len(all_metrics),
        "rmse": float(np.mean([m["rmse"] for m in all_metrics
                               if np.isfinite(m["rmse"])])),
        "acc_1": float(np.mean([m["acc_1"] for m in all_metrics])),
        "acc_2": float(np.mean([m["acc_2"] for m in all_metrics])),
        "abs_rel": float(np.mean([m["abs_rel"] for m in all_metrics
                                  if np.isfinite(m["abs_rel"])])),
    }
    if output_dir:
        with open(os.path.join(output_dir, "metrics_summary.txt"), "w") as f:
            f.write(f"Number of images evaluated: {avg['n_images']}\n")
            f.write(f"Average RMSE: {avg['rmse']:.4f}\n")
            f.write(f"Average Acc[<1.25]: {avg['acc_1']:.4f}\n")
            f.write(f"Average Acc[<1.25^2]: {avg['acc_2']:.4f}\n")
    return avg


def evaluate_thermal_depth(engine: InferenceEngine, dataset, indices=None,
                           batch_size: int = 8) -> Dict[str, float]:
    """Model-level evaluator (utils/metrics.py:72-137): monocular forward
    over samples with GT depth, accumulate finite metrics, average."""
    import jax.numpy as jnp

    from thermal3d.preprocess.enhance import enhance_thermal_contrast, rgb_to_gray

    keys = ["abs_rel", "sq_rel", "rmse", "rmse_log", "acc_1", "acc_2", "acc_3"]
    sums = {k: 0.0 for k in keys}
    count = 0
    idxs = list(indices if indices is not None else range(len(dataset)))
    for i in idxs:
        sample = dataset[i]
        if sample is None or "depth1" not in sample and "pointmap1" not in sample:
            continue
        gt_depth = sample.get("depth1")
        if gt_depth is None:
            gt_depth = sample["pointmap1"][..., 2]
        enhanced = np.asarray(enhance_thermal_contrast(
            rgb_to_gray(jnp.asarray(sample["thermal1"]))))
        out = engine.infer(enhanced[None], preprocessed=True)
        pred = out["depth"][0]
        if gt_depth.shape != pred.shape:
            gt_depth = _resize_nearest(gt_depth, pred.shape)
        m = compute_depth_metrics(pred, gt_depth, median_scaling=True)
        for k in keys:
            if np.isfinite(m[k]):
                sums[k] += m[k]
        count += 1
    return {k: (v / count if count else float("nan")) for k, v in sums.items()}
