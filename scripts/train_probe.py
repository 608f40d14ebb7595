#!/usr/bin/env python3
"""Probe which piece of the DUSt3R-224 TRAIN step is slow on-chip — the
train-side counterpart of scripts/pgt_probe.py (VERDICT r4 #4). Stages:

  enhance            device percentile enhancement of both views
  forward            two-view model forward (pred outputs folded)
  forward+loss       + enhanced thermal-aware v2 multi-scale loss
  forward+backward   + value_and_grad wrt params (grads folded)
  full train step    + global-norm clip + AdamW update (the production
                     program, train/step.py::make_train_step)

Differencing consecutive stages isolates each component; XLA cost_analysis
FLOPs give a per-stage MFU. Chained-feedback methodology (params as jit args,
all live outputs folded into the carry so nothing DCEs; clock stops on a
scalar fetch) — block_until_ready is unreliable through this harness's relay.

Usage: python scripts/train_probe.py [batch] [iters] [--basic-loss]
Reference workload: train_thermal_dustr.py:182-363.
"""

import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from thermal3d.core.cache import enable_compilation_cache

enable_compilation_cache()
print("backend:", jax.default_backend())

from thermal3d.core.config import DUSTR_224_LINEAR, TrainConfig
from thermal3d.models.dustr import AsymmetricCroCo3DStereo
from thermal3d.preprocess.enhance import enhance_thermal_contrast, rgb_to_gray
from thermal3d.train.state import create_train_state
from thermal3d.train.step import _batch_loss, _prepare_views

basic = "--basic-loss" in sys.argv
if basic:
    sys.argv.remove("--basic-loss")
positional = [a for a in sys.argv[1:] if not a.startswith("-")]
batch = int(positional[0]) if positional else 18  # measured M=7056 optimum
iters = int(positional[1]) if len(positional) > 1 else 10

config = dataclasses.replace(DUSTR_224_LINEAR, compute_dtype="bfloat16")
model = AsymmetricCroCo3DStereo(config)
cfg = TrainConfig(batch_size=batch, use_enhanced_loss=not basic)
h, w = config.img_size
dummy = jnp.zeros((1, h, w, 3), jnp.float32)
params = jax.jit(lambda k: model.init(k, dummy, dummy))(jax.random.key(0))["params"]

ks = jax.random.split(jax.random.key(1), 4)
batch_data = {
    "thermal1": jax.random.uniform(ks[0], (batch, h, w, 3), minval=21000., maxval=26000.),
    "thermal2": jax.random.uniform(ks[1], (batch, h, w, 3), minval=21000., maxval=26000.),
    "pointmap1": jax.random.uniform(ks[2], (batch, 512, 512, 3), minval=0.1, maxval=5.),
    "pointmap2": jax.random.uniform(ks[3], (batch, 512, 512, 3), minval=0.1, maxval=5.),
}


def _fold(*arrays):
    return sum(jnp.mean(a.astype(jnp.float32)) for a in arrays)


def chain(name, f, *, thread_state=False):
    """f(params_or_state, batch) -> scalar feedback; the feedback perturbs
    thermal1 for the next iteration (serializes the chain). With
    thread_state, f returns (new_state, fb) and the state threads through
    iterations instead (donated, like the production loop)."""
    if thread_state:
        state0 = create_train_state(
            model,
            jax.tree_util.tree_map(lambda x: jnp.array(x), params),
            cfg, steps_per_epoch=1000)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, b):
            new_state, fb = f(state, b)
            b = dict(b)
            b["thermal1"] = b["thermal1"] * (1.0 + jnp.tanh(fb) * 1e-6)
            return new_state, b

        t0 = time.perf_counter()
        state, b = step(state0, batch_data)
        float(b["thermal1"][0, 0, 0, 0])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            state, b = step(state, b)
        float(b["thermal1"][0, 0, 0, 0])
        lower_args = (state, b)
    else:
        @jax.jit
        def step(params, b):
            fb = f(params, b)
            b = dict(b)
            b["thermal1"] = b["thermal1"] * (1.0 + jnp.tanh(fb) * 1e-6)
            return b

        t0 = time.perf_counter()
        b = step(params, batch_data)
        float(b["thermal1"][0, 0, 0, 0])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            b = step(params, b)
        float(b["thermal1"][0, 0, 0, 0])
        lower_args = (params, batch_data)
    dt = (time.perf_counter() - t0) / iters
    try:
        ca = step.lower(*lower_args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
    except Exception:
        flops = float("nan")
    tfs = flops / dt / 1e12
    print(f"{name:22s} compile={compile_s:7.1f}s  run={dt*1000:9.1f} ms  "
          f"flops={flops/1e9:9.1f} G  ({tfs:6.1f} TF/s)  "
          f"fps={batch/dt:7.1f}")
    return dt


def fb_enhance(params, b):
    e1 = enhance_thermal_contrast(rgb_to_gray(b["thermal1"]))
    e2 = enhance_thermal_contrast(rgb_to_gray(b["thermal2"]))
    return _fold(e1, e2)


def fb_forward(params, b):
    b = _prepare_views(b)
    pred1, pred2 = model.apply({"params": params},
                               b["thermal1_enh"], b["thermal2_enh"])
    return _fold(pred1["pts3d"], pred1["conf"],
                 pred2["pts3d_in_other_view"], pred2["conf"])


def fb_fwd_loss(params, b):
    b = _prepare_views(b)
    pred1, pred2 = model.apply({"params": params},
                               b["thermal1_enh"], b["thermal2_enh"])
    loss, comps = _batch_loss(pred1, pred2, b,
                              pred1["pts3d"].shape[1:3], cfg)
    return _fold(loss, *comps.values())


def fb_fwd_bwd(params, b):
    def loss_fn(p):
        b2 = _prepare_views(b)
        pred1, pred2 = model.apply({"params": p},
                                   b2["thermal1_enh"], b2["thermal2_enh"])
        loss, _ = _batch_loss(pred1, pred2, b2,
                              pred1["pts3d"].shape[1:3], cfg)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    gfold = sum(jnp.sum(g.astype(jnp.float32)) for g in
                jax.tree_util.tree_leaves(grads))
    return _fold(loss, gfold)


def fb_full_step(state, b):
    from thermal3d.train.step import make_train_step

    # the production step body (same code path, no mesh)
    new_state, metrics = _FULL_STEP(state, b)
    return new_state, _fold(metrics["loss"], metrics["grad_norm"])


from thermal3d.train.step import make_train_step  # noqa: E402

_FULL_STEP = make_train_step(model, cfg, mesh=None)

d_enh = chain("enhance", fb_enhance)
d_fwd = chain("forward", fb_forward)
d_fl = chain("forward+loss", fb_fwd_loss)
d_fb = chain("forward+backward", fb_fwd_bwd)
# The full-step stage OOMs at b18 when run in the SAME process as the stages
# above (their param copies + this stage's fresh TrainState + fwd residuals
# exceed the 16G HBM). The full step is exactly what `bench.py --train`
# measures (same make_train_step program, donated chain) — take total step
# ms from there; optimizer(+clip) = that minus forward+backward here.
d_full = None
if "--full" in sys.argv:
    d_full = chain("full train step", fb_full_step, thread_state=True)

print("\nstage budget (differences):")
print(f"  enhance         {d_enh*1000:8.1f} ms")
print(f"  forward         {(d_fwd - d_enh)*1000:8.1f} ms")
print(f"  loss            {(d_fl - d_fwd)*1000:8.1f} ms")
print(f"  backward        {(d_fb - d_fl)*1000:8.1f} ms")
if d_full is not None:
    print(f"  optimizer(+clip){(d_full - d_fb)*1000:8.1f} ms")
    print(f"  total step      {d_full*1000:8.1f} ms  = {batch/d_full:.1f} fps")
else:
    print(f"  fwd+bwd total   {d_fb*1000:8.1f} ms  "
          f"(optimizer stage = bench.py --train step_ms minus this)")
