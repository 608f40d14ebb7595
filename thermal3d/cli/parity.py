"""Parity gate vs the PyTorch reference — `python -m thermal3d.cli.parity`.

The BASELINE.md acceptance criterion ("AbsRel within 1% of the PyTorch
reference", reference eval protocol utils/evaluate_depth_metrics.py:247-401)
is unprovable in this environment because the released DUSt3R/MASt3R weights
are not available (PARITY.md). This CLI is the gate kept ready for the moment
they are: one command, nonzero exit on failure, so it can sit in CI.

Modes (combinable):
  * --ours_dir/--theirs_dir: compare saved *_depth.npy trees frame by frame
    (ours = this framework's outputs, theirs = the reference's outputs on the
    same frames). Gates on per-frame median-scaled AbsRel <= --gate.
  * --model/--golden_dir: run the InferenceEngine on the thermal frames
    recorded in a pseudo_gt_test_set-style golden directory and report depth
    metrics vs the golden depths; with --reference_metrics (a JSON file of
    the reference's own metrics on the same set, e.g. {"abs_rel": 0.08}),
    gates on relative AbsRel drift <= --gate.
  * --int8 (with --model/--golden_dir): additionally build the int8 engine
    (optionally scoped, docs/INT8_SWEEP.md) and gate ITS AbsRel drift vs the
    bf16 engine on the same frames — the automatic int8 accuracy gate.
"""

from __future__ import annotations

import argparse
import json


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Reference-parity gate (1% AbsRel)")
    p.add_argument("--ours_dir", type=str, default=None)
    p.add_argument("--theirs_dir", type=str, default=None,
                   help="reference depth .npy dir matched to --ours_dir by filename")
    p.add_argument("--model", type=str, default=None, help=".pth checkpoint")
    p.add_argument("--golden_dir", type=str, default=None,
                   help="pseudo_gt_test_set-style dir (*_depth.npy + *_thermal_path.txt)")
    p.add_argument("--remap", type=str, nargs="*", default=[],
                   help="OLD=NEW path-prefix substitutions for *_thermal_path.txt entries")
    p.add_argument("--reference_metrics", type=str, default=None,
                   help="JSON of the reference's metrics on the same golden set")
    p.add_argument("--int8", action="store_true")
    p.add_argument("--int8_scope", type=str, default="fc1")
    p.add_argument("--gate", type=float, default=0.01,
                   help="maximum allowed AbsRel (dir mode) / relative AbsRel drift")
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--model_variant", type=str, default="dustr224_linear",
                   choices=["dustr224_linear", "dustr512_dpt",
                            "mastr512_catmlpdpt"],
                   help="architecture of --model (mirrors cli.infer), so the "
                        "gate can also load the 512 DPT/catmlpdpt reference "
                        "checkpoints it is kept ready for")
    p.add_argument("--img_size", type=int, nargs=2, default=None,
                   help="defaults to the model variant's native resolution")
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--report", type=str, default=None, help="write full JSON report here")
    from thermal3d.cli.common import add_preset_flag

    return add_preset_flag(p)


def _make_engine(args, config, params, head_params, int8: bool):
    from thermal3d.infer.engine import InferenceEngine

    kw = {}
    if int8:
        from thermal3d.kernels.quant import SCOPE_TO_ONLY

        kw = {"quantize_int8": True,
              "int8_only": SCOPE_TO_ONLY[args.int8_scope]}
    return InferenceEngine(config, params=params, use_thermal_head=True,
                           thermal_head_params=head_params, **kw)


def main(argv=None):
    from thermal3d.evaluation.parity import (compare_depth_dirs,
                                             compare_engine_to_golden)

    args = build_parser().parse_args(argv)
    # a CI gate must fail loudly on a half-specified comparison — a silently
    # skipped mode would print PASS for a check that never ran
    if bool(args.ours_dir) != bool(args.theirs_dir):
        build_parser().error("--ours_dir and --theirs_dir must be given together")
    if (args.int8 or args.reference_metrics or args.model) and not args.golden_dir:
        build_parser().error(
            "--int8/--reference_metrics/--model require --golden_dir "
            "(they gate the golden-engine mode)")
    report, failures = {}, []

    if args.ours_dir and args.theirs_dir:
        r = compare_depth_dirs(args.ours_dir, args.theirs_dir)
        report["dirs"] = r
        s = r["summary"]
        ok = bool(s["n_compared"]) and s["n_missing"] == 0 and all(
            v.get("abs_rel_vs_reference", float("inf")) <= args.gate
            for v in r["per_frame"].values() if not v.get("missing"))
        print(f"dir parity: {s['n_compared']}/{s['n_frames']} frames, "
              f"mean AbsRel {s['mean_abs_rel']:.5f}, "
              f"bit-equal {s['all_bit_equal']} -> {'PASS' if ok else 'FAIL'}")
        if not ok:
            failures.append("dir-mode AbsRel gate")

    if args.golden_dir:
        from thermal3d.cli.common import apply_preset
        from thermal3d.core.config import (DUSTR_224_LINEAR, DUSTR_512_DPT,
                                           MASTR_512_CATMLPDPT)

        base = {"dustr224_linear": DUSTR_224_LINEAR,
                "dustr512_dpt": DUSTR_512_DPT,
                "mastr512_catmlpdpt": MASTR_512_CATMLPDPT}[args.model_variant]
        if args.img_size is None:
            args.img_size = list(base.img_size)
        config = apply_preset(base, args.model_preset,
                              args.img_size, args.compute_dtype)
        params = head_params = None  # no --model: random init (harness tests)
        if args.model:
            from thermal3d.cli.infer import _load_params

            params, head_params = _load_params(args.model, config)
        from thermal3d.cli.common import apply_scan

        config, params = apply_scan(config, params, args.scan_layers)
        remap = dict(s.split("=", 1) for s in args.remap) or None
        engine = _make_engine(args, config, params, head_params, int8=False)
        m = compare_engine_to_golden(engine, args.golden_dir,
                                     thermal_root_remap=remap,
                                     max_frames=args.max_frames,
                                     batch_size=args.batch_size)
        report["golden_bf16"] = m
        if "error" in m or "abs_rel" not in m:
            # {} = thermal frames resolved but no *_depth.npy matched — as
            # much a gate failure as unresolvable frames (no KeyError below)
            print(f"golden: {m.get('error', 'no golden depth files matched')}")
            failures.append("golden frames unresolvable")
        else:
            print(f"golden AbsRel (bf16): {m['abs_rel']:.5f}")
            if args.reference_metrics:
                ref = json.load(open(args.reference_metrics))["abs_rel"]
                drift = abs(m["abs_rel"] - ref) / max(ref, 1e-9)
                report["abs_rel_drift_vs_reference"] = drift
                ok = drift <= args.gate
                print(f"vs reference AbsRel {ref:.5f}: drift {drift:.2%} "
                      f"-> {'PASS' if ok else 'FAIL'} (gate {args.gate:.0%})")
                if not ok:
                    failures.append("reference AbsRel drift gate")
            if args.int8 and "abs_rel" in m:
                m8 = compare_engine_to_golden(
                    _make_engine(args, config, params, head_params, int8=True),
                    args.golden_dir, thermal_root_remap=remap,
                    max_frames=args.max_frames, batch_size=args.batch_size)
                report["golden_int8"] = m8
                drift8 = abs(m8["abs_rel"] - m["abs_rel"]) / max(m["abs_rel"], 1e-9)
                report["int8_abs_rel_drift"] = drift8
                ok8 = drift8 <= args.gate
                print(f"int8[{args.int8_scope}] AbsRel {m8['abs_rel']:.5f}: "
                      f"drift {drift8:.2%} -> {'PASS' if ok8 else 'FAIL'}")
                if not ok8:
                    failures.append("int8 drift gate")

    if not report:
        build_parser().error("need --ours_dir/--theirs_dir and/or --golden_dir")
    if args.report:
        with open(args.report, "w") as f:
            json.dump(report, f, indent=2, default=float)
    if failures:
        print(f"PARITY GATE FAILED: {', '.join(failures)}")
        raise SystemExit(1)
    print("PARITY GATE PASSED")
    return report


if __name__ == "__main__":
    main()
