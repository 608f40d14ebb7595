"""Generate pseudo-GT with frozen MASt3R — `python -m thermal3d.cli.pseudo_gt`.

Mirrors scripts/pseudo_gt.py:613-661 (+ the test-set variant,
scripts/test_pseudo_gt.py, via --test_set).
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Generate pseudo-GT from RGB pairs with MASt3R")
    p.add_argument("--dataset_dir", type=str, required=True)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--weights", type=str, default=None,
                   help="MASt3R .pth checkpoint (converted); random init if omitted")
    p.add_argument("--img_size", type=int, nargs=2, default=[512, 512])
    p.add_argument("--frame_skip", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--visualize", action="store_true")
    p.add_argument("--calib_file", type=str, default=None)
    p.add_argument("--max_pairs", type=int, default=None)
    p.add_argument("--test_set", action="store_true",
                   help="monocular test-set mode (test_pseudo_gt.py layout)")
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--int8", action="store_true",
                   help="int8-MXU the trunk GEMMs (opt-in, +9.9%% at 512 but "
                        "8%% depth drift — for heavily-filtered candidate "
                        "generation ONLY; gate outputs with cli.parity)")
    p.add_argument("--int8_scope", type=str, default="all",
                   help="int8 scope; at S=1024 only 'all' wins — fc1 is "
                        "speed-neutral there (docs/INT8_SWEEP.md 512 section)")
    p.add_argument("--int8_equalize", action="store_true",
                   help="SmoothQuant-style LN-to-GEMM fold before quantizing "
                        "(exact, zero cost; helps with trained weights)")
    p.add_argument("--int8_static_acts", action="store_true",
                   help="calibrate static per-GEMM activation scales on the "
                        "first pair batch (one float forward) — skips the "
                        "dynamic absmax pass in int8 mode")
    p.add_argument("--ndev", type=int, default=1,
                   help="data-parallel generation over the first N local "
                        "devices (params replicated, pair batches sharded; "
                        "batch_size must be a multiple of N)")
    p.add_argument("--dpt_f32", action="store_true",
                   help="pin the DPT/catmlpdpt head in f32 (pre-round-4 "
                        "default). By default the head follows "
                        "--compute_dtype (bf16 head: +18%% pairs/s at 512 — "
                        "docs/PERF.md; drift bound in docs/INT8_SWEEP.md)")
    p.add_argument("--num_shards", type=int, default=1,
                   help="split the pair/frame index into N deterministic "
                        "shards for independent processes or hosts (each "
                        "shard is a standalone run over index[i::N]; pair "
                        "filenames are disjoint, so shards can share one "
                        "--output_dir)")
    p.add_argument("--shard_id", type=int, default=0,
                   help="which shard this process generates (0..N-1)")
    from thermal3d.cli.common import add_preset_flag

    return add_preset_flag(p)


def main(argv=None):
    import dataclasses

    from thermal3d.core.config import MASTR_512_CATMLPDPT
    from thermal3d.data.freiburg import build_rgb_pair_index, build_rgb_thermal_index
    from thermal3d.pseudo_gt.generator import PseudoGTGenerator, generate_pseudo_gt
    from thermal3d.pseudo_gt.test_set import generate_test_set_pseudo_gt

    args = build_parser().parse_args(argv)
    if (args.int8_equalize or args.int8_static_acts) and not args.int8:
        # these only act inside the int8 branch — alone they would be
        # silent no-ops (fail-loud convention, matching cli.parity)
        build_parser().error(
            "--int8_equalize/--int8_static_acts require --int8")
    from thermal3d.cli.common import apply_preset

    config = apply_preset(MASTR_512_CATMLPDPT, args.model_preset, args.img_size,
                          args.compute_dtype)
    if args.dpt_f32:
        config = dataclasses.replace(
            config, head=dataclasses.replace(config.head, dpt_dtype="float32"))
    params = None
    if args.weights:
        from thermal3d.convert.torch_to_flax import convert_checkpoint

        converted, report = convert_checkpoint(args.weights, config)
        print(f"Converted MASt3R checkpoint: {len(report['converted'])} tensors")
        params = converted["params"]
    from thermal3d.cli.common import apply_scan

    config, params = apply_scan(config, params, args.scan_layers)

    # build the input index up-front (also feeds --int8_static_acts
    # calibration, which needs the first pair batch before the generator
    # compiles)
    if not (0 <= args.shard_id < args.num_shards):
        build_parser().error(
            f"--shard_id {args.shard_id} out of range for "
            f"--num_shards {args.num_shards}")
    if args.test_set:
        frames = build_rgb_thermal_index(args.dataset_dir)
        if args.num_shards > 1:
            frames = frames[args.shard_id::args.num_shards]
            print(f"Shard {args.shard_id}/{args.num_shards}: "
                  f"{len(frames)} frames")
    else:
        pairs = build_rgb_pair_index(args.dataset_dir, frame_skip=args.frame_skip)
        print(f"Created {len(pairs)} RGB pairs")
        if args.num_shards > 1:
            # strided slice: deterministic, load-balanced across day/night
            # sequences, and every output filename is pair-derived so shards
            # writing into one output_dir never collide
            pairs = pairs[args.shard_id::args.num_shards]
            print(f"Shard {args.shard_id}/{args.num_shards}: "
                  f"{len(pairs)} pairs")

    int8_kw = {}
    if args.int8:
        from thermal3d.kernels.quant import SCOPE_TO_ONLY

        int8_kw = {"quantize_int8": True,
                   "int8_only": SCOPE_TO_ONLY[args.int8_scope],
                   "int8_equalize": args.int8_equalize}
        if args.int8_static_acts:
            import numpy as np

            from thermal3d.preprocess.io import load_rgb_image
            from thermal3d.pseudo_gt.generator import _resize_rgb

            hw = tuple(config.img_size)
            r1s, r2s = [], []
            src = frames if args.test_set else pairs
            for entry in src:
                if len(r1s) >= args.batch_size:
                    break
                if args.test_set:
                    a = b = load_rgb_image(entry["rgb"])
                else:
                    a = load_rgb_image(entry["rgb_path1"])
                    b = load_rgb_image(entry["rgb_path2"])
                if a is None or b is None:
                    continue
                r1s.append(_resize_rgb(a, hw))
                r2s.append(_resize_rgb(b, hw))
            if not r1s:
                build_parser().error("--int8_static_acts: no decodable RGB "
                                     "pairs to calibrate on")
            int8_kw["int8_calibration"] = (np.stack(r1s), np.stack(r2s))
    from thermal3d.cli.common import make_dp_mesh

    mesh = make_dp_mesh(args.ndev, args.batch_size, build_parser().error)
    gen = PseudoGTGenerator(config, params=params, batch_size=args.batch_size,
                            calib_file=args.calib_file, mesh=mesh, **int8_kw)

    if args.test_set:
        n = generate_test_set_pseudo_gt(frames, args.output_dir, gen,
                                        max_frames=args.max_pairs)
    else:
        n = generate_pseudo_gt(pairs, args.output_dir, gen,
                               visualize=args.visualize, max_pairs=args.max_pairs)
    print(f"Pseudo-GT generation complete: {n} items -> {args.output_dir}")
    return n


if __name__ == "__main__":
    main()
