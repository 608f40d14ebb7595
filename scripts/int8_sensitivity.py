#!/usr/bin/env python3
"""Int8 drift sensitivity sweep at production dims (VERDICT r2 item 6).

Measures relative depth-RMS drift of the int8-served engine vs the f32 engine
(ViT-L/224, random init, batch 2 — the same protocol as
scripts/parity_report.py --int8) across quantization configs:

  * whole-column scales (the round-2 default: 2.7% drift)
  * grouped scales (group_size 128 / 256)
  * leave-one-out over trunk layers (--loo) to rank layer sensitivity
  * cumulative skip of the top-k most sensitive layers (--loo)

Writes one JSON line per config to stdout and a summary table to
docs/INT8_SWEEP.md. Run on CPU: JAX_PLATFORMS=cpu python scripts/int8_sensitivity.py [--loo]
"""

import dataclasses
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from thermal3d.core.cache import enable_compilation_cache  # noqa: E402
from thermal3d.core.config import DUSTR_224_LINEAR  # noqa: E402
from thermal3d.infer.engine import InferenceEngine  # noqa: E402

enable_compilation_cache()


def main():
    loo = "--loo" in sys.argv
    cfg = dataclasses.replace(DUSTR_224_LINEAR, compute_dtype="float32")
    rng = np.random.default_rng(0)
    raw = rng.uniform(21000, 26000, (2, 320, 416)).astype(np.float32)
    eng_f = InferenceEngine(cfg, use_thermal_head=False, rng_seed=0)
    depth_f = eng_f.infer(raw)["depth"]
    norm_f = np.linalg.norm(depth_f)

    results = []

    def measure(tag, **kw):
        t0 = time.time()
        eng = InferenceEngine(cfg, params=eng_f.params, use_thermal_head=False,
                              quantize_int8=True, **kw)
        dq = eng.infer(raw)["depth"]
        rel = float(np.linalg.norm(dq - depth_f) / norm_f)
        rec = {"config": tag, "rel_rms_drift": round(rel, 5),
               "seconds": round(time.time() - t0, 1), **{
                   k: (list(v) if isinstance(v, tuple)
                       else f"array{getattr(v, 'shape', '')}"
                       if isinstance(v, np.ndarray) else v)
                   for k, v in kw.items()}}
        print(json.dumps(rec), flush=True)
        results.append(rec)
        return rel

    if "--static" in sys.argv:
        # static activation-scale calibration (kernels/quant.py act_scales):
        # per-tensor scales from ONE float forward replace the per-token
        # dynamic absmax. Two calibration regimes bound the cost:
        #   *+cal=same  — calibrated on the measured input (zero mismatch:
        #                 isolates the per-token→per-tensor coarsening)
        #   *+cal=held  — calibrated on a DIFFERENT random sample (the
        #                 realistic deployment regime)
        held = rng.uniform(21000, 26000, (4, 320, 416)).astype(np.float32)
        measure("flat")
        measure("flat+cal=same", int8_calibration=raw)
        measure("flat+cal=held", int8_calibration=held)
        measure("fc1_only", int8_only=("fc1",))
        measure("fc1_only+cal=same", int8_only=("fc1",), int8_calibration=raw)
        measure("fc1_only+cal=held", int8_only=("fc1",), int8_calibration=held)
        _write(results)
        return

    if "--equalize" in sys.argv:
        # SmoothQuant-style LN→GEMM fold (kernels/quant.py equalize_ln_gemm):
        # exact reparameterization — does damping activation outlier channels
        # reduce the dynamic-quant noise at production dims?
        measure("flat")
        measure("flat+eq", int8_equalize=True)
        measure("mlp_only", int8_only=("fc1", "fc2"))
        measure("mlp_only+eq", int8_only=("fc1", "fc2"), int8_equalize=True)
        measure("fc1_only", int8_only=("fc1",))
        measure("fc1_only+eq", int8_only=("fc1",), int8_equalize=True)
        _write(results)
        return

    base = measure("flat")
    if "--pareto" in sys.argv:
        # partial-quantization frontier: drift vs fraction of GEMMs on int8.
        # (full sweep showed drift is accumulated activation-quant noise
        # spread evenly — scale granularity and single-layer skips barely
        # move it, so the fraction quantized is the real lever)
        measure("mlp_only", int8_only=("fc1", "fc2"))
        measure("attn_only", int8_only=("qkv", "proj", "projq", "projk",
                                        "projv"))
        measure("enc_only", int8_skip=tuple(
            [f"dec_blocks_{i}" for i in range(cfg.dec_depth)]
            + [f"dec_blocks2_{i}" for i in range(cfg.dec_depth)]
            + ["decoder_embed"]))
        measure("fc1_only", int8_only=("fc1",))
        _write(results)
        return
    measure("group256", int8_group_size=256)
    g128 = measure("group128", int8_group_size=128)

    if loo:
        layers = ([f"enc_blocks_{i}" for i in range(cfg.enc_depth)]
                  + [f"dec_blocks_{i}" for i in range(cfg.dec_depth)]
                  + [f"dec_blocks2_{i}" for i in range(cfg.dec_depth)]
                  + ["decoder_embed"])
        sens = []
        for name in layers:
            rel = measure(f"loo:{name}", int8_skip=(name,))
            sens.append((base - rel, name))  # drift REDUCTION when kept float
        sens.sort(reverse=True)
        print(json.dumps({"ranking": [(n, round(d, 5)) for d, n in sens[:10]]}),
              flush=True)
        for k in (1, 2, 4):
            skip = tuple(n for _, n in sens[:k])
            measure(f"group128+skip{k}", int8_group_size=128, int8_skip=skip)

    _write(results)


def _write(results):
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "INT8_SWEEP.md")
    mode = "a" if os.path.exists(out) else "w"
    with open(out, mode) as f:
        if mode == "w":
            f.write("# Int8 drift sweep (production dims, f32 reference, "
                    "random init)\n\nProtocol: scripts/int8_sensitivity.py — "
                    "relative depth RMS drift vs the float engine.\n")
        f.write("\n| config | rel RMS drift |\n|---|---|\n")
        for r in results:
            f.write(f"| {r['config']} | {r['rel_rms_drift']} |\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
