#!/usr/bin/env python3
"""Benchmark: thermal frames/sec/chip for DUSt3R-224 monocular depth inference
— the north-star path (SURVEY.md §3.2): percentile-enhance → learnable thermal
head → ViT-L/dual-decoder forward → depth extraction, all one jitted program.

Measurement is device-throughput-honest: iterations are serialized by feeding
each step's depth output back into the next step's raw input (defeats async
dispatch), and the clock stops on a host fetch of the final scalar. Host PNG
decode is excluded (it is not chip work; on this harness host↔device moves
through a slow TCP relay that would measure the tunnel, not the chip).

Prints ONE JSON line {"metric","value","unit","vs_baseline"};
baseline = 500 fps/chip (BASELINE.json north-star target — the reference
publishes no numbers, BASELINE.md).
"""

import dataclasses
import json
import sys
import time


def main():
    import jax
    import jax.numpy as jnp

    from thermal3d.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from thermal3d.core.config import DUSTR_224_LINEAR
    from thermal3d.models.dustr import AsymmetricCroCo3DStereo
    from thermal3d.models.thermal_wrap import ThermalPreprocessHead
    from thermal3d.preprocess.enhance import enhance_thermal_contrast

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    bf16_params = "--f32-params" not in sys.argv  # bf16 weight storage default
    attn = "auto"
    if "--attn-xla" in sys.argv:
        attn = "xla"
    elif "--attn-pallas" in sys.argv:
        attn = "pallas"
    elif "--attn-fast" in sys.argv:
        attn = "xla_bf16_scores"

    config = dataclasses.replace(DUSTR_224_LINEAR, compute_dtype="bfloat16",
                                 attention_impl=attn)
    model = AsymmetricCroCo3DStereo(config)
    head = ThermalPreprocessHead()

    h, w = config.img_size
    raw0 = jnp.linspace(21000.0, 26000.0, batch * 320 * 416).reshape(batch, 320, 416) / 65535.0
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    params = jax.jit(lambda k: model.init(k, dummy, dummy))(jax.random.key(0))["params"]
    if bf16_params:  # store weights in compute dtype: no per-step f32→bf16 cast
        params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    head_params = jax.jit(lambda k: head.init(k, jnp.zeros((1, h, w, 3))))(
        jax.random.key(1))["params"]

    @jax.jit
    def step(params, head_params, raw):
        # full serving pipeline (thermal_dustr_inference.py:25-159)
        resized = jax.image.resize(raw, (batch, h, w), method="bilinear")
        enhanced = enhance_thermal_contrast(resized)  # [B,H,W,3]
        x = head.apply({"params": head_params}, enhanced)
        pred1, _ = model.apply({"params": params}, x, None)  # monocular
        depth = pred1["pts3d"][..., 2]
        # dependency chain: mix depth stats back into the next raw input
        feedback = jnp.tanh(jnp.mean(depth, axis=(1, 2)))[:, None, None] * 1e-4
        return depth, raw0 * (1.0 + feedback)

    # compile + warmup; retry transient remote-compile transport failures
    # (this harness's compile service can drop long-lived connections)
    last_err = None
    for attempt in range(4):
        try:
            depth, raw = step(params, head_params, raw0)
            float(depth[0, 0, 0])
            break
        except Exception as e:  # jax.errors.JaxRuntimeError UNAVAILABLE
            last_err = e
            if "UNAVAILABLE" not in str(e) and "transport" not in str(e):
                raise
            time.sleep(60)
    else:
        raise last_err

    t0 = time.perf_counter()
    for _ in range(n_iters):
        depth, raw = step(params, head_params, raw)
    final = float(depth[0, 0, 0])  # forces the whole chain
    dt = time.perf_counter() - t0

    fps = batch * n_iters / dt
    print(json.dumps({
        "metric": "thermal_frames_per_sec_per_chip_dustr224",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 500.0, 3),
    }))


if __name__ == "__main__":
    main()
