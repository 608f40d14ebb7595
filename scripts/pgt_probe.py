#!/usr/bin/env python3
"""Probe which piece of the MASt3R-512 pseudo-GT step is slow on-chip.

Uses the chained-feedback methodology (each iteration's output perturbs the
next iteration's input; clock stops on a scalar host fetch) because
block_until_ready is not reliable through this harness's TPU relay.

Usage: python scripts/pgt_probe.py [attn] [batch] [iters]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from thermal3d.core.cache import enable_compilation_cache

enable_compilation_cache()
print("backend:", jax.default_backend())

from thermal3d.core.config import MASTR_512_CATMLPDPT
from thermal3d.geometry.intrinsics import estimate_camera_intrinsics_jit
from thermal3d.geometry.umeyama import extract_relative_pose_jit
from thermal3d.models.dustr import AsymmetricCroCo3DStereo

scan = "--scan" in sys.argv
if scan:  # the unrolled 512 program exceeds the compile relay's request
    sys.argv.remove("--scan")  # size limit (HTTP 413) — scan-roll the stacks
attn = sys.argv[1] if len(sys.argv) > 1 else "xla"
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4
iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
config = dataclasses.replace(MASTR_512_CATMLPDPT, compute_dtype="bfloat16",
                             attention_impl=attn, scan_layers=scan)
model = AsymmetricCroCo3DStereo(config)
h, w = config.img_size
dummy = jnp.zeros((1, h, w, 3), jnp.float32)
params = jax.jit(lambda k: model.init(k, dummy, dummy))(jax.random.key(0))["params"]
params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)

ks = jax.random.split(jax.random.key(1), 2)
rgb1 = jax.random.uniform(ks[0], (batch, h, w, 3))
rgb2 = jax.random.uniform(ks[1], (batch, h, w, 3))


def chain(name, f):
    """f(params, x) -> scalar-ish feedback array; chained via x*(1+fb*1e-4).

    params MUST be a jit argument, not a closure: closed-over arrays embed
    as HLO constants and the 1.3 GB of ViT-L weights blow the remote-compile
    relay's request-size limit (HTTP 413)."""
    @jax.jit
    def step(params, x):
        fb = f(params, x)
        return x * (1.0 + jnp.tanh(fb) * 1e-4)

    t0 = time.perf_counter()
    x = step(params, rgb1)
    float(x[0, 0, 0, 0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(params, x)
    float(x[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / iters
    # XLA's own FLOP count for the compiled program -> MFU decomposition
    # (docs/PERF.md MASt3R-512 section); tolerate both cost_analysis forms.
    # CAVEAT under --scan: cost_analysis counts a while_loop BODY once, not
    # xL — scan-rolled trunk flops read ~L x too low; use the analytic GEMM
    # counts in docs/PERF.md for trunk MFU, and this figure for the
    # unscanned parts (heads/geometry)
    try:
        ca = step.lower(params, rgb1).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
    except Exception:
        flops = float("nan")
    tfs = flops / dt / 1e12
    print(f"{name:28s} compile={compile_s:7.1f}s  run={dt*1000:9.1f} ms  "
          f"flops={flops/1e9:9.1f} G  ({tfs:6.1f} TF/s)")


# every variant folds a scalar from EVERY live output into the feedback so
# XLA cannot DCE part of the stage under measurement (the first probe run
# measured exactly this: fb_full using only pred1 let XLA delete view 2's
# whole DPT head, which then showed up as phantom "geometry" cost)


def _fold(*arrays):
    return sum(jnp.mean(a.astype(jnp.float32)) for a in arrays)  # scalar


def fb_full(params, x):
    pred1, pred2 = model.apply({"params": params}, x, rgb2)
    return _fold(*pred1.values(), *pred2.values())


def fb_nodesc(params, x):
    # production shape: pseudo_gt/generator.py::_geometry consumes only
    # pts3d + conf, so XLA DCEs the catmlpdpt desc/desc_conf branch —
    # fb_full minus this isolates the desc branch's cost
    pred1, pred2 = model.apply({"params": params}, x, rgb2)
    return _fold(pred1["pts3d"], pred1["conf"],
                 pred2["pts3d_in_other_view"], pred2["conf"])


def fb_geom(params, x):
    # the full production step (matches gen._step_impl: geometry on
    # pts3d/conf only; desc branch DCE'd)
    pred1, pred2 = model.apply({"params": params}, x, rgb2)
    pm1 = pred1["pts3d"].astype(jnp.float32)
    pm2 = pred2["pts3d_in_other_view"].astype(jnp.float32)
    k = jax.vmap(estimate_camera_intrinsics_jit)(pm1, pm1[..., 2])
    pose = jax.vmap(extract_relative_pose_jit)(pm1, pm2)
    return _fold(pred1["pts3d"], pred1["conf"], pm2, pred2["conf"], k, pose)


def fb_enc(params, x):
    feats, pos, grid = model.apply({"params": params},
                                   jnp.concatenate([x, rgb2], 0),
                                   method=AsymmetricCroCo3DStereo.encode)
    return _fold(feats)


def fb_encdec(params, x):
    def run(m, a, b):
        feats, pos, grid = m.encode(jnp.concatenate([a, b], 0))
        outs1, outs2 = m.decode(feats[:batch], feats[batch:], pos)
        return outs1[-1], outs2[-1]

    l1, l2 = model.apply({"params": params}, x, rgb2, method=run)
    return _fold(l1, l2)


chain("encoder only", fb_enc)
chain("encoder+decoder", fb_encdec)
chain("forward (all head outputs)", fb_full)
chain("forward (no desc = prod)", fb_nodesc)
chain("forward+geometry (prod step)", fb_geom)
