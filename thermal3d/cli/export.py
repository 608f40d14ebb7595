"""Export a self-contained serving artifact — `python -m thermal3d.cli.export`.

Packages the full serving pipeline (preprocess → thermal head → model →
depth) as serialized StableHLO + weights in one .npz (infer/export.py). The
reference has no deployment story beyond shipping the source tree + .pth
(README.md run instructions); this produces an artifact a serving host runs
with jax + numpy alone:

    python -m thermal3d.cli.export --weights ckpt.pth --out serving.npz \
        --batch_sizes 36 1
    # on the serving host (no thermal3d install needed beyond this class):
    from thermal3d.infer.export import ServingArtifact
    art = ServingArtifact.load("serving.npz")
    depth = art.infer(raw_frames)["depth"]
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Export an AOT serving artifact (StableHLO + weights)")
    p.add_argument("--weights", type=str, default=None,
                   help=".pth (converted) or orbax checkpoint dir; random "
                        "init if omitted (plumbing tests)")
    p.add_argument("--out", type=str, required=True, help="output .npz path")
    p.add_argument("--batch_sizes", type=int, nargs="+", default=[36],
                   help="one exported program per batch size (36 = the "
                        "measured v5e serving optimum; add 1 for latency-"
                        "sensitive endpoints)")
    p.add_argument("--input_hw", type=int, nargs=2, default=None,
                   help="raw frame resolution fed to the program (resized "
                        "to the model's img_size inside); defaults to the "
                        "model img_size")
    p.add_argument("--platforms", type=str, default="cpu,tpu",
                   help="comma-separated lowering platforms (portable "
                        "program: XLA attention + exact sort enhance), or "
                        "'native' for the current backend only with the "
                        "engine's exact program incl. Pallas kernels (max "
                        "TPU throughput; required to keep the fused "
                        "attention win at S >= 512)")
    p.add_argument("--stereo", action="store_true",
                   help="export the two-view program instead of monocular")
    p.add_argument("--img_size", type=int, nargs=2, default=None)
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--params_dtype", type=str, default=None,
                   help="store weights in this dtype in the artifact (e.g. "
                        "'bfloat16': halves the artifact and skips the "
                        "per-step f32→bf16 cast, ~1 GB HBM/step at ViT-L — "
                        "the bench serving configuration)")
    p.add_argument("--no_thermal_model", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="quantize the trunk GEMMs to int8 before exporting "
                        "(drift-gated, see PARITY.md)")
    p.add_argument("--int8_scope", type=str, default="all",
                   choices=["all", "mlp", "fc1"])
    p.add_argument("--model_variant", type=str, default="dustr224_linear",
                   choices=["dustr224_linear", "dustr512_dpt",
                            "mastr512_catmlpdpt"])
    from thermal3d.cli.common import add_preset_flag

    return add_preset_flag(p)


def main(argv=None):
    from thermal3d.cli.common import apply_preset, apply_scan
    from thermal3d.cli.infer import _load_params
    from thermal3d.core.config import (DUSTR_224_LINEAR, DUSTR_512_DPT,
                                       MASTR_512_CATMLPDPT)
    from thermal3d.infer.engine import InferenceEngine
    from thermal3d.infer.export import save_serving_artifact
    from thermal3d.kernels.quant import SCOPE_TO_ONLY

    args = build_parser().parse_args(argv)
    base = {"dustr224_linear": DUSTR_224_LINEAR,
            "dustr512_dpt": DUSTR_512_DPT,
            "mastr512_catmlpdpt": MASTR_512_CATMLPDPT}[args.model_variant]
    if args.img_size is None:
        args.img_size = list(base.img_size)
    config = apply_preset(base, args.model_preset, args.img_size,
                          args.compute_dtype)
    loaded = _load_params(args.weights, config)
    params, head_params = (loaded if loaded else (None, None))
    config, params = apply_scan(config, params, args.scan_layers)

    engine = InferenceEngine(config, params=params,
                             use_thermal_head=not args.no_thermal_model,
                             thermal_head_params=head_params,
                             params_dtype=args.params_dtype,
                             quantize_int8=args.int8,
                             int8_only=SCOPE_TO_ONLY[args.int8_scope])
    platforms = (None if args.platforms == "native"
                 else tuple(s for s in args.platforms.split(",") if s))
    meta = save_serving_artifact(
        args.out, engine, batch_sizes=args.batch_sizes,
        input_hw=tuple(args.input_hw) if args.input_hw else None,
        platforms=platforms, stereo=args.stereo)
    import os

    size_mb = os.path.getsize(args.out) / 1e6
    print(f"Exported {args.out} ({size_mb:.1f} MB): "
          f"batch sizes {meta['batch_sizes']}, platforms "
          f"{meta['platforms']}, input {meta['input_hw']}, "
          f"{meta['num_weights']} weight arrays"
          + (", int8" if meta["int8"] else ""))


if __name__ == "__main__":
    main()
