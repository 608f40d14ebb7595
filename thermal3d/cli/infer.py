"""Thermal depth inference — `python -m thermal3d.cli.infer`.

Mirrors thermal_dustr_inference.py:297-376 (single image or directory-batch
monocular depth; saves {base}_depth.npy + visualization PNG) plus the
experiment variant's stereo/--img_path2, fire-scene preprocessing and depth
refinement options (thermal_dustr_inference_for_experiment.py:379-502).
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Thermal DUSt3R depth inference")
    p.add_argument("--weights", type=str, default=None,
                   help=".pth (converted) or orbax checkpoint dir; random init if omitted")
    p.add_argument("--img_path", type=str, required=True,
                   help="thermal image or directory of .png frames")
    p.add_argument("--img_path2", type=str, default=None, help="second view (stereo)")
    p.add_argument("--img_size", type=int, nargs=2, default=None,
                   help="defaults to the model variant's native resolution "
                        "(224 224 for dustr224_linear)")
    p.add_argument("--output_dir", type=str, default="inference_results")
    p.add_argument("--batch_size", type=int, default=36,
                   help="36 = the measured v5e throughput optimum (M=7056 "
                        "token rows, docs/PERF.md); final partial batch is "
                        "padded")
    p.add_argument("--no_thermal_model", action="store_true",
                   help="skip the ThermalDUSt3R preprocessing head")
    p.add_argument("--fire_scene", action="store_true",
                   help="fire-scene preprocessing (experiment pipeline)")
    p.add_argument("--advanced_fire", action="store_true")
    p.add_argument("--refine_depth", action="store_true",
                   help="outlier-median + guided + bilateral refinement")
    p.add_argument("--no_vis", action="store_true")
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--int8_scope", type=str, default="all",
                   choices=["all", "mlp", "fc1"],
                   help="which trunk GEMMs the int8 mode quantizes: 'all' "
                        "(fastest, ~2.7%% depth drift), 'mlp' (fc1+fc2, "
                        "~1.5%%), 'fc1' (~1.0%% — meets the 1%% BASELINE "
                        "bar; docs/INT8_SWEEP.md frontier)")
    p.add_argument("--int8_group_size", type=int, default=None,
                   help="int8 grouped-scale quantization (e.g. 128). NOTE: "
                        "measured NOT to reduce drift on this model (2.79%% "
                        "grouped vs 2.67%% flat — docs/INT8_SWEEP.md); use "
                        "--int8_scope to control drift instead")
    p.add_argument("--int8", action="store_true",
                   help="int8 MXU serving mode (~1.2x faster; opt-in, "
                        "drift-gated — see PARITY.md)")
    p.add_argument("--int8_equalize", action="store_true",
                   help="SmoothQuant-style LN-to-GEMM equalization before "
                        "quantizing (exact, zero runtime cost; damps trained "
                        "activation outlier channels — docs/INT8_SWEEP.md)")
    p.add_argument("--int8_static_acts", action="store_true",
                   help="calibrate STATIC per-GEMM activation scales on the "
                        "first input batch (one float forward), so int8 "
                        "serving skips the per-token dynamic absmax pass — "
                        "docs/INT8_SWEEP.md static-acts section")
    p.add_argument("--model_variant", type=str, default="dustr224_linear",
                   choices=["dustr224_linear", "dustr512_dpt",
                            "mastr512_catmlpdpt"],
                   help="model family member (checkpoint architecture)")
    p.add_argument("--dpt_f32", action="store_true",
                   help="pin the DPT/catmlpdpt head in f32 (pre-round-4 "
                        "default; no effect on the linear head, which is "
                        "always f32). By default the head follows "
                        "--compute_dtype — docs/PERF.md round-4 MFU section")
    p.add_argument("--ndev", type=int, default=1,
                   help="data-parallel serving over the first N local "
                        "devices (params replicated, batch sharded on a "
                        "1-D mesh; batch_size must be a multiple of N)")
    from thermal3d.cli.common import add_preset_flag

    return add_preset_flag(p)


def _load_params(weights, config):
    if weights is None:
        return None
    if weights.endswith(".pth"):
        from thermal3d.convert.torch_to_flax import convert_checkpoint

        converted, _ = convert_checkpoint(weights, config)
        tree = converted["params"]
        return tree.get("model", tree), tree.get("thermal_preprocess")
    if os.path.isdir(weights):  # orbax checkpoint dir from cli.train
        from thermal3d.train.checkpoint import load_params_from_checkpoint_dir

        tree, _ = load_params_from_checkpoint_dir(weights)
        return tree.get("model", tree), tree.get("thermal_preprocess")
    raise ValueError(f"unsupported weights format: {weights}")


def main(argv=None):
    import dataclasses

    import jax.numpy as jnp

    from thermal3d.core.config import (DUSTR_224_LINEAR, DUSTR_512_DPT,
                                       MASTR_512_CATMLPDPT)
    from thermal3d.infer.engine import InferenceEngine
    from thermal3d.kernels.quant import SCOPE_TO_ONLY
    from thermal3d.preprocess.io import load_thermal_image
    from thermal3d.viz.panels import visualize_depth_result

    args = build_parser().parse_args(argv)
    if (args.int8_equalize or args.int8_static_acts) and not args.int8:
        # these only act inside the int8 branch — alone they would be
        # silent no-ops (fail-loud convention, matching cli.parity)
        build_parser().error(
            "--int8_equalize/--int8_static_acts require --int8")
    if args.int8_static_acts and args.int8_group_size:
        # quantize_params_int8 rejects this pair anyway, but only after the
        # model is built and a full calibration forward has run — fail at
        # the parser instead (static act scales are per-tensor; grouped
        # weight scales would need per-group act ranges)
        build_parser().error(
            "--int8_static_acts is incompatible with --int8_group_size")
    if args.ndev > 1 and (args.img_path2 or args.fire_scene
                          or args.advanced_fire):
        # stereo and fire-scene modes run single-frame batches through
        # engine.infer, which cannot be sharded over >1 device — without
        # this guard they crash with a raw divisibility ValueError after
        # the full model load/compile
        build_parser().error(
            "--ndev > 1 supports only the directory-batch monocular path "
            "(stereo/--fire_scene/--advanced_fire run batch-1 programs)")
    from thermal3d.cli.common import apply_preset

    base = {"dustr224_linear": DUSTR_224_LINEAR,
            "dustr512_dpt": DUSTR_512_DPT,
            "mastr512_catmlpdpt": MASTR_512_CATMLPDPT}[args.model_variant]
    if args.img_size is None:
        args.img_size = list(base.img_size)  # variant's native resolution
    config = apply_preset(base, args.model_preset, args.img_size,
                          args.compute_dtype)
    if args.dpt_f32:
        config = dataclasses.replace(
            config, head=dataclasses.replace(config.head, dpt_dtype="float32"))
    loaded = _load_params(args.weights, config)
    params, head_params = (loaded if loaded else (None, None))
    from thermal3d.cli.common import apply_scan

    config, params = apply_scan(config, params, args.scan_layers)

    if os.path.isdir(args.img_path):
        paths = sorted(glob.glob(os.path.join(args.img_path, "*.png")))
    else:
        paths = [args.img_path]

    int8_calibration = None
    if args.int8_static_acts:
        # the first batch is decoded once more inside infer_paths — a
        # one-time ~6 ms/frame host cost, dwarfed by the calibration
        # forward + int8 compile this run already pays
        from thermal3d.preprocess.io import load_thermal_images_batch

        grays, _ = load_thermal_images_batch(
            paths[: args.batch_size], normalize=True,
            out_hw=tuple(args.img_size))
        if not grays:
            build_parser().error("--int8_static_acts: no decodable frames "
                                 "to calibrate on")
        int8_calibration = np.stack(grays)

    from thermal3d.cli.common import make_dp_mesh

    mesh = make_dp_mesh(args.ndev, args.batch_size, build_parser().error)
    engine = InferenceEngine(config, params=params,
                             use_thermal_head=not args.no_thermal_model,
                             thermal_head_params=head_params,
                             quantize_int8=args.int8,
                             int8_group_size=args.int8_group_size,
                             int8_only=SCOPE_TO_ONLY[args.int8_scope],
                             int8_equalize=args.int8_equalize,
                             int8_calibration=int8_calibration,
                             mesh=mesh)
    os.makedirs(args.output_dir, exist_ok=True)

    if args.img_path2:  # stereo pair mode
        g1 = load_thermal_image(args.img_path, normalize=True)
        g2 = load_thermal_image(args.img_path2, normalize=True)
        out = engine.infer(np.stack([g1]), np.stack([g2]))
        _save_one(args, out, 0, args.img_path, engine)
        return

    if args.fire_scene or args.advanced_fire:
        from thermal3d.preprocess.fire_scene import (
            advanced_fire_scene_processing, preprocess_fire_scene_thermal)

        fn = advanced_fire_scene_processing if args.advanced_fire else \
            preprocess_fire_scene_thermal
        for i, path in enumerate(paths):
            gray = load_thermal_image(path, normalize=True)
            if gray is None:
                continue
            import jax

            resized = np.asarray(jax.image.resize(jnp.asarray(gray), tuple(args.img_size),
                                                  "bilinear", antialias=False))
            proc = np.asarray(fn(resized))
            out = engine.infer(proc[None], preprocessed=True)
            _save_one(args, out, 0, path, engine)
        return

    # depth-only device fetch when no visualization is wanted (~7× less
    # device→host traffic; confidence is only read by the vis panel)
    outputs = ("depth",) if args.no_vis else ("depth", "confidence1")
    out = engine.infer_paths(paths, batch_size=args.batch_size,
                             outputs=outputs)
    # zip against the SURVIVING paths (failed decodes are dropped, so pairing
    # with the input list would save depths under wrong basenames)
    for i, path in enumerate(out.get("paths", [])):
        _save_one(args, out, i, path, engine)
    print(f"Processed {len(out.get('paths', []))}/{len(paths)} frames "
          f"-> {args.output_dir}")


def _save_one(args, out, i, path, engine):
    base = os.path.splitext(os.path.basename(path))[0]
    depth = out["depth"][i]
    if args.refine_depth:
        from thermal3d.preprocess.io import load_thermal_image
        from thermal3d.preprocess.refine import refine_depth

        import jax
        import jax.numpy as jnp

        gray = load_thermal_image(path, normalize=True)
        gray = np.asarray(jax.image.resize(jnp.asarray(gray), depth.shape, "bilinear", antialias=False))
        depth = np.asarray(refine_depth(jnp.asarray(depth), jnp.asarray(gray)))
    np.save(os.path.join(args.output_dir, f"{base}_depth.npy"), depth)
    if not args.no_vis:
        from thermal3d.viz.panels import visualize_depth_result

        visualize_depth_result(
            _thermal_vis(path, depth), depth, out["confidence1"][i],
            save_path=os.path.join(args.output_dir, f"{base}_depth_vis.png"))


def _thermal_vis(path, depth):
    from thermal3d.preprocess.io import preprocess_thermal_for_model

    img = preprocess_thermal_for_model(path, depth.shape)
    return img if img is not None else np.zeros((*depth.shape, 3), np.float32)


if __name__ == "__main__":
    main()
