#!/usr/bin/env python3
"""Profile the serving step on-chip and print a per-fusion time breakdown.

Runs the bench.py forward pipeline under jax.profiler, then parses the
Perfetto trace JSON for TPU op events and aggregates duration by HLO op name.
Usage: python scripts/profile_step.py [batch] [iters]
"""

import dataclasses
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from thermal3d.core.cache import enable_compilation_cache


def build_step(batch, attn="auto"):
    from thermal3d.core.config import DUSTR_224_LINEAR
    from thermal3d.models.dustr import AsymmetricCroCo3DStereo
    from thermal3d.models.thermal_wrap import ThermalPreprocessHead
    from thermal3d.preprocess.enhance import enhance_thermal_contrast

    config = dataclasses.replace(DUSTR_224_LINEAR, compute_dtype="bfloat16",
                                 attention_impl=attn)
    model = AsymmetricCroCo3DStereo(config)
    head = ThermalPreprocessHead()
    h, w = config.img_size
    raw0 = jnp.linspace(21000.0, 26000.0, batch * 320 * 416).reshape(
        batch, 320, 416) / 65535.0
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    params = jax.jit(lambda k: model.init(k, dummy, dummy))(
        jax.random.key(0))["params"]
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    head_params = jax.jit(lambda k: head.init(k, jnp.zeros((1, h, w, 3))))(
        jax.random.key(1))["params"]

    @jax.jit
    def step(params, head_params, raw):
        resized = jax.image.resize(raw, (batch, h, w), method="bilinear")
        enhanced = enhance_thermal_contrast(resized)
        x = head.apply({"params": head_params}, enhanced)
        pred1, _ = model.apply({"params": params}, x, None)
        return pred1["pts3d"][..., 2]

    return step, params, head_params, raw0


def build_train_step(batch):
    """bench.py --train equivalent: one jitted train step (two-view fwd +
    enhanced loss vs in-graph-resized 512² GT + bwd + clip/AdamW)."""
    from thermal3d.core.config import DUSTR_224_LINEAR, TrainConfig
    from thermal3d.models.dustr import AsymmetricCroCo3DStereo
    from thermal3d.train.state import create_train_state
    from thermal3d.train.step import make_train_step

    config = dataclasses.replace(DUSTR_224_LINEAR, compute_dtype="bfloat16")
    model = AsymmetricCroCo3DStereo(config)
    cfg = TrainConfig(batch_size=batch, use_enhanced_loss=True)
    h, w = config.img_size
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    params = jax.jit(lambda k: model.init(k, dummy, dummy))(jax.random.key(0))["params"]
    state = create_train_state(model, params, cfg, steps_per_epoch=1000)
    step = make_train_step(model, cfg, mesh=None)
    ks = jax.random.split(jax.random.key(1), 4)
    batch_data = {
        "thermal1": jax.random.uniform(ks[0], (batch, h, w, 3), minval=21000., maxval=26000.),
        "thermal2": jax.random.uniform(ks[1], (batch, h, w, 3), minval=21000., maxval=26000.),
        "pointmap1": jax.random.uniform(ks[2], (batch, 512, 512, 3), minval=0.1, maxval=5.),
        "pointmap2": jax.random.uniform(ks[3], (batch, 512, 512, 3), minval=0.1, maxval=5.),
    }
    return step, state, batch_data


def build_pseudo_gt_step(batch, attn="auto"):
    """bench.py --pseudo-gt equivalent: frozen MASt3R-512 two-view forward
    + on-device intrinsics/Umeyama, one jitted step (scan_layers — the
    unrolled 512 program exceeds the compile relay's request size)."""
    from thermal3d.core.config import MASTR_512_CATMLPDPT
    from thermal3d.pseudo_gt.generator import PseudoGTGenerator

    config = dataclasses.replace(MASTR_512_CATMLPDPT,
                                 compute_dtype="bfloat16",
                                 attention_impl=attn, scan_layers=True)
    h, w = config.img_size
    gen = PseudoGTGenerator(config, batch_size=batch,
                            params_dtype="bfloat16")
    ks = jax.random.split(jax.random.key(1), 2)
    rgb1 = jax.random.uniform(ks[0], (batch, h, w, 3))
    rgb2 = jax.random.uniform(ks[1], (batch, h, w, 3))

    @jax.jit
    def step(params, _unused, __unused):
        out = gen._step_impl(params, gen.quant, rgb1, rgb2)
        return out["depth1"].mean() + out["poses"].sum()

    return step, gen.params


def parse_trace(logdir, iters):
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace under {logdir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    # find TPU op track pids (process names like "/device:TPU:0" or "TPU:0")
    tpu_pids = set()
    for ev in data["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            if "TPU" in name.upper() and "host" not in name.lower():
                tpu_pids.add(ev["pid"])
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for ev in data["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in tpu_pids:
            continue
        name = ev.get("name", "?")
        dur = ev.get("dur", 0) / 1e3  # us → ms
        # skip track-level wrappers and per-iteration step markers ("0".."N")
        if name.startswith(("XLA Modules", "XLA Ops", "Steps")) or name.isdigit():
            continue
        agg[name] += dur
        cnt[name] += 1
        total += dur
    return agg, cnt, total, path


def main():
    enable_compilation_cache()
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(pos[0]) if len(pos) > 0 else 32
    iters = int(pos[1]) if len(pos) > 1 else 5
    attn = pos[2] if len(pos) > 2 else "auto"
    train = "--train" in sys.argv
    pgt = "--pseudo-gt" in sys.argv
    print("backend:", jax.default_backend(), "attn:", attn, "train:", train,
          "pseudo_gt:", pgt)
    if pgt:
        pstep, pparams = build_pseudo_gt_step(batch, attn)

        def step(*_):
            return pstep(pparams, None, None)

        params = head_params = raw = None
    elif train:
        tstep, state, batch_data = build_train_step(batch)

        def step(*_):
            nonlocal state
            state, metrics = tstep(state, batch_data)
            return metrics["loss"]

        params = head_params = raw = None
    else:
        step, params, head_params, raw = build_step(batch, attn)
    out = step(params, head_params, raw)
    out.block_until_ready()

    logdir = "/tmp/t3d_profile"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for _ in range(iters):
        out = step(params, head_params, raw)
    out.block_until_ready()
    jax.profiler.stop_trace()

    agg, cnt, total, path = parse_trace(logdir, iters)
    print(f"trace: {path}")
    print(f"total device time: {total:.1f} ms over {iters} iters "
          f"({total/iters:.2f} ms/step)")
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:60]
    for name, ms in rows:
        print(f"{ms/iters:8.3f} ms/step  x{cnt[name]//iters:<4d} {name[:110]}")

    # family view: aggregate instances that differ only by a trailing .N
    fam_ms, fam_n = defaultdict(float), defaultdict(int)
    for name, ms in agg.items():
        base, _, suf = name.rpartition(".")
        fam = base if suf.isdigit() and base else name
        fam_ms[fam] += ms
        fam_n[fam] += cnt[name]
    print("\nby fusion family:")
    for name, ms in sorted(fam_ms.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{ms/iters:8.3f} ms/step  x{fam_n[name]//iters:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
