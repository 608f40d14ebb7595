"""Staged out-of-distribution (AIS drone / fire scene) investigation —
`python -m thermal3d.cli.ais_investigate`.

One-command equivalent of the reference's qualitative AIS workflow
(notebooks/ais_thermal_image_investigation.ipynb + the stage directories it
renders from submission/AIS_DATA/FLIR_BOSON/s*/): run the SAME frames
through the pipeline stages the notebook converged on, write each stage's
depth + visualization into the notebook's directory layout, and emit a
quantitative per-stage report (the notebook's observations — "maximum depth
it acquired is at 5.5 units" → "recognized the depth upto 14 units", "blocky
structure" → outlier removal — as measured numbers instead of prose).

Stages (names match the AIS_DATA folders):
  original      — fine-tuned model, no OOD preprocessing
                  (notebook: ".../original/", pixelated + depth-range capped)
  preprocessed  — fire-scene thermal enhancement before the model
                  (".../preprocess_for_colour_inversion/";
                  thermal_dustr_inference_for_experiment.py:62-154)
  final         — enhancement + outlier-removal depth refinement
                  (".../second_preprocess_with_outlier_removed/", ".../final/";
                  …for_experiment.py:284-377)
  advanced      — optional: histogram-peak multi-threshold variant
                  (…for_experiment.py:156-282) + refinement

Each stage is exactly one `cli.infer` flag set (docs/FIRE_WORKFLOW.md maps
them); this driver just sequences the stages over one frame set and writes
`investigation.md` + per-frame stage strips so an OOD sensor can be triaged
with a single command.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

# stage name -> extra cli.infer flags (ordering = the notebook's progression)
STAGES = {
    "original": [],
    "preprocessed": ["--fire_scene"],
    "final": ["--fire_scene", "--refine_depth"],
    "advanced": ["--advanced_fire", "--refine_depth"],
}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Staged OOD thermal investigation (AIS workflow)")
    p.add_argument("--img_path", type=str, required=True,
                   help="OOD thermal frame or directory of .png frames")
    p.add_argument("--output_dir", type=str, default="ais_investigation")
    p.add_argument("--weights", type=str, default=None,
                   help=".pth (converted) or orbax dir; random init if omitted")
    p.add_argument("--img_size", type=int, nargs=2, default=None)
    p.add_argument("--stages", type=str, nargs="+",
                   default=["original", "preprocessed", "final"],
                   choices=list(STAGES),
                   help="which pipeline stages to run (default: the "
                        "notebook's three-stage progression)")
    p.add_argument("--model_variant", type=str, default="dustr224_linear",
                   choices=["dustr224_linear", "dustr512_dpt",
                            "mastr512_catmlpdpt"])
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--no_vis", action="store_true",
                   help="skip per-stage vis PNGs and the per-frame stage "
                        "strip (depth .npy + report only)")
    from thermal3d.cli.common import add_preset_flag

    return add_preset_flag(p)


def _stage_stats(depth: np.ndarray) -> dict:
    """The notebook's qualitative observations as numbers.

    * depth range — "maximum depth it acquired is at 5.5 units" vs "upto 14
      units" after preprocessing: OOD saturation compresses predicted range.
    * blockiness — "generating images in a blocky structure": patch-boundary
      discontinuity = mean |∇depth| on the 16-px patch grid vs off-grid
      (≈1 for smooth output; the refinement stage should pull it down).
    """
    finite = np.isfinite(depth)
    fin = depth[finite] if finite.any() else np.zeros(1, depth.dtype)
    # gradients still use a zero-filled map (diff needs the grid), but the
    # range stats are masked — a single NaN pixel must not inject a fake
    # 0.0 into the min/range headline the stages are compared on
    d = np.where(finite, depth, 0.0)
    gx = np.abs(np.diff(d, axis=1))
    grid = gx[:, 15::16]  # columns crossing a ViT patch boundary
    off = np.delete(gx, np.s_[15::16], axis=1)
    blockiness = float(grid.mean() / max(off.mean(), 1e-12))
    return {
        "min": float(fin.min()), "max": float(fin.max()),
        "mean": float(fin.mean()),
        "range": float(fin.max() - fin.min()),
        "finite_frac": float(finite.mean()),
        "blockiness": blockiness,
    }


def _stage_strip(thermal: np.ndarray, depths: dict, save_path: str) -> None:
    """One row per frame: thermal + each stage's depth, shared color scale."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = 1 + len(depths)
    fig, axes = plt.subplots(1, n, figsize=(4 * n, 4))
    axes[0].imshow(thermal, cmap="gray")
    axes[0].set_title("Thermal")
    vmax = max(np.nanmax(d) for d in depths.values())
    for ax, (name, d) in zip(axes[1:], depths.items()):
        im = ax.imshow(d, cmap="viridis", vmin=0.0, vmax=vmax)
        ax.set_title(f"{name} (max {np.nanmax(d):.2f})")
        plt.colorbar(im, ax=ax, fraction=0.046)
    for ax in axes:
        ax.axis("off")
    plt.tight_layout()
    plt.savefig(save_path, dpi=100, bbox_inches="tight")
    plt.close(fig)


def main(argv=None):
    from thermal3d.cli import infer

    args = build_parser().parse_args(argv)

    if os.path.isdir(args.img_path):
        paths = sorted(glob.glob(os.path.join(args.img_path, "*.png")))
    else:
        paths = [args.img_path]
    if not paths:
        build_parser().error(f"no .png frames under {args.img_path}")

    common = ["--img_path", args.img_path,
              "--model_variant", args.model_variant,
              "--compute_dtype", args.compute_dtype,
              "--model_preset", args.model_preset]
    if args.scan_layers:  # from add_preset_flag — forward, don't drop
        common += ["--scan_layers"]
    if args.weights:
        common += ["--weights", args.weights]
    if args.img_size:
        common += ["--img_size", str(args.img_size[0]), str(args.img_size[1])]
    if args.no_vis:
        common += ["--no_vis"]

    for stage in args.stages:
        stage_dir = os.path.join(args.output_dir, stage)
        print(f"[ais_investigate] stage '{stage}' -> {stage_dir}")
        infer.main(common + ["--output_dir", stage_dir] + STAGES[stage])

    # aggregate: per-frame, per-stage depth stats + comparison strip
    rows = []
    for path in paths:
        base = os.path.splitext(os.path.basename(path))[0]
        depths = {}
        for stage in args.stages:
            f = os.path.join(args.output_dir, stage, f"{base}_depth.npy")
            if os.path.exists(f):
                depths[stage] = np.load(f)
        if not depths:
            continue  # frame failed to decode in every stage
        for stage, d in depths.items():
            rows.append({"frame": base, "stage": stage, **_stage_stats(d)})
        if not args.no_vis:
            from thermal3d.preprocess.io import load_thermal_image

            gray = load_thermal_image(path, normalize=True)
            if gray is not None:
                import jax
                import jax.numpy as jnp

                shape = next(iter(depths.values())).shape
                gray = np.asarray(jax.image.resize(
                    jnp.asarray(gray), shape, "bilinear", antialias=False))
                _stage_strip(gray, depths,
                             os.path.join(args.output_dir,
                                          f"{base}_stages.png"))

    report = os.path.join(args.output_dir, "investigation.md")
    with open(report, "w") as f:
        f.write("# OOD thermal investigation\n\n")
        f.write(f"frames: {len(paths)}  ·  stages: {', '.join(args.stages)}  "
                f"·  variant: {args.model_variant}\n\n")
        f.write("| frame | stage | depth min | max | range | blockiness |\n")
        f.write("|---|---|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['frame']} | {r['stage']} | {r['min']:.3f} | "
                    f"{r['max']:.3f} | {r['range']:.3f} | "
                    f"{r['blockiness']:.2f} |\n")
        f.write("\n## Per-stage summary (mean over frames)\n\n")
        f.write("| stage | depth range | blockiness |\n|---|---|---|\n")
        for stage in args.stages:
            sr = [r for r in rows if r["stage"] == stage]
            if sr:
                f.write(f"| {stage} | "
                        f"{np.mean([r['range'] for r in sr]):.3f} | "
                        f"{np.mean([r['blockiness'] for r in sr]):.2f} |\n")
        f.write("\nReading guide (mirrors the notebook's findings): a larger "
                "depth range after `preprocessed` means the enhancement "
                "recovered dynamic range the OOD sensor saturated away; "
                "blockiness → 1.0 after `final` means the outlier-removal "
                "refinement erased the ViT patch-grid artifacts.\n")
    print(f"[ais_investigate] report -> {report}")
    return len(rows)


if __name__ == "__main__":
    main()
