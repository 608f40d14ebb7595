#!/usr/bin/env python3
"""Train-step cost ablation on TPU (VERDICT r2 item 4).

bench.py --train measures one configuration; this script isolates WHERE the
step time goes by differencing configurations (each its own jitted step,
serialized through the donated-state chain, 10 iters):

  full        — the production step: enhance → two-view fwd → enhanced
                multi-scale loss vs 512² GT (in-graph resize) → bwd → AdamW
  gt224       — same but GT arrives pre-resized to 224² (what a loader-side
                resize would give the device): full − gt224 = in-graph
                bilinear resize cost of 4× [B,512,512,*] tensors
  plain_loss  — confidence-weighted L1 only (no edge/smoothness/detail,
                no multi-scale): gt224 − plain_loss ≈ enhanced-loss extras
  fwd_only    — two-view forward + plain loss value, NO backward: the
                backward share

Usage: python scripts/train_ablation.py [batch] [iters]
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from thermal3d.core.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    batch = int(args[0]) if args else 16
    n_iters = int(args[1]) if len(args) > 1 else 10

    from thermal3d.core.config import DUSTR_224_LINEAR, LossConfig, TrainConfig
    from thermal3d.models.dustr import AsymmetricCroCo3DStereo
    from thermal3d.train.state import create_train_state
    from thermal3d.train.step import make_train_step

    config = dataclasses.replace(DUSTR_224_LINEAR, compute_dtype="bfloat16")
    model = AsymmetricCroCo3DStereo(config)
    h, w = config.img_size
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    params = jax.jit(lambda k: model.init(k, dummy, dummy))(
        jax.random.key(0))["params"]

    ks = jax.random.split(jax.random.key(1), 4)

    def batch_for(gt_hw):
        return {
            "thermal1": jax.random.uniform(ks[0], (batch, h, w, 3),
                                           minval=21000., maxval=26000.),
            "thermal2": jax.random.uniform(ks[1], (batch, h, w, 3),
                                           minval=21000., maxval=26000.),
            "pointmap1": jax.random.uniform(ks[2], (batch, *gt_hw, 3),
                                            minval=0.1, maxval=5.),
            "pointmap2": jax.random.uniform(ks[3], (batch, *gt_hw, 3),
                                            minval=0.1, maxval=5.),
        }

    def timed_step(cfg, batch_data, fwd_only=False):
        state = create_train_state(model, params, cfg, steps_per_epoch=1000)
        if fwd_only:
            from thermal3d.train.step import make_eval_step

            step_e = make_eval_step(model, cfg, mesh=None)

            def run():
                return step_e(state.params, batch_data)

            out = run()
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(n_iters):
                out = run()
            jax.block_until_ready(out)
            return (time.perf_counter() - t0) / n_iters
        step = make_train_step(model, cfg, mesh=None)
        nonlocal_state = [state]

        def run():
            s, m = step(nonlocal_state[0], batch_data)
            nonlocal_state[0] = s
            return m

        m = run()
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(n_iters):
            m = run()
        float(m["loss"])
        return (time.perf_counter() - t0) / n_iters

    results = {}
    cfg_full = TrainConfig(batch_size=batch, use_enhanced_loss=True)
    cfg_plain = TrainConfig(batch_size=batch, use_enhanced_loss=False)
    plan = [
        ("full", cfg_full, (512, 512), False),
        ("gt224", cfg_full, (224, 224), False),
        ("plain_loss", cfg_plain, (224, 224), False),
        ("fwd_only", cfg_plain, (224, 224), True),
    ]
    # --only NAME runs a single config and exits: once the dev harness's TPU
    # relay drops a compile, the process's backend is poisoned (every later
    # eager op fails), so retries must come from a FRESH process — drive each
    # config as its own invocation and the compile cache makes reruns cheap
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a.split("=", 1)[1]
    for name, cfg, gt_hw, fwd in plan:
        if only and name != only:
            continue
        results[name] = timed_step(cfg, batch_for(gt_hw), fwd_only=fwd)
        print(json.dumps({"config": name, "ms": round(results[name] * 1000, 1)}),
              flush=True)
    if only:
        return

    report = {k: round(v * 1000, 1) for k, v in results.items()}
    report["resize_ms"] = round((results["full"] - results["gt224"]) * 1000, 1)
    report["enhanced_loss_extra_ms"] = round(
        (results["gt224"] - results["plain_loss"]) * 1000, 1)
    report["bwd_optimizer_ms"] = round(
        (results["plain_loss"] - results["fwd_only"]) * 1000, 1)
    report["batch"] = batch
    report["fps_full"] = round(batch / results["full"], 1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
