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


def _warmup_with_retry(fn):
    """Run `fn` once, retrying transient remote-compile transport failures
    (this harness's compile service can drop long-lived connections)."""
    last_err = None
    for attempt in range(4):
        try:
            return fn()
        except Exception as e:  # jax.errors.JaxRuntimeError UNAVAILABLE
            last_err = e
            if "UNAVAILABLE" not in str(e) and "transport" not in str(e):
                raise
            if attempt < 3:  # no point sleeping before the final re-raise
                time.sleep(60)
    raise last_err


def bench_train(batch: int, n_iters: int, remat: bool, scan: bool = False,
                emit: bool = True):
    """Training-step throughput (the reference's actual workload,
    train_thermal_dustr.py:182-363): device-enhance → two-view forward →
    enhanced thermal-aware loss vs 512² pseudo-GT (in-graph resize) →
    backward → clip+AdamW, one jitted step. Steps serialize through the
    donated TrainState dependency chain; clock stops on a loss fetch.
    emit=False returns the result dict instead of printing it (the default
    serving bench embeds it as a secondary metric)."""
    import jax
    import jax.numpy as jnp

    from thermal3d.core.config import DUSTR_224_LINEAR, TrainConfig
    from thermal3d.models.dustr import AsymmetricCroCo3DStereo
    from thermal3d.train.state import create_train_state
    from thermal3d.train.step import make_train_step

    # --scan: lax.scan over stacked block params — fewer optimizer leaves
    # (per-leaf AdamW small-op DMA is ~18 ms/step unrolled, docs/PERF.md)
    config = dataclasses.replace(DUSTR_224_LINEAR, compute_dtype="bfloat16",
                                 remat=remat, scan_layers=scan)
    model = AsymmetricCroCo3DStereo(config)
    cfg = TrainConfig(batch_size=batch, use_enhanced_loss=True,
                      flatten_optimizer="--flatten-opt" in sys.argv,
                      mu_dtype="bfloat16" if "--mu-bf16" in sys.argv else None)
    h, w = config.img_size
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    params = jax.jit(lambda k: model.init(k, dummy, dummy))(jax.random.key(0))["params"]
    state = create_train_state(model, params, cfg, steps_per_epoch=1000)
    step = make_train_step(model, cfg, mesh=None)

    key = jax.random.key(1)
    ks = jax.random.split(key, 4)
    batch_data = {
        "thermal1": jax.random.uniform(ks[0], (batch, h, w, 3), minval=21000., maxval=26000.),
        "thermal2": jax.random.uniform(ks[1], (batch, h, w, 3), minval=21000., maxval=26000.),
        # pseudo-GT arrives at MASt3R's 512² and is resized in-graph (train:234-271)
        "pointmap1": jax.random.uniform(ks[2], (batch, 512, 512, 3), minval=0.1, maxval=5.),
        "pointmap2": jax.random.uniform(ks[3], (batch, 512, 512, 3), minval=0.1, maxval=5.),
    }

    def once():
        nonlocal state
        state, metrics = step(state, batch_data)
        return float(metrics["loss"])

    _warmup_with_retry(once)

    # best of two passes (relay-contention protection, same as serving)
    dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            state, metrics = step(state, batch_data)
        final = float(metrics["loss"])
        dt = min(dt, time.perf_counter() - t0)
    fps = batch * n_iters / dt
    result = {
        "metric": "train_frames_per_sec_per_chip_dustr224",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": None,  # the reference publishes no training throughput
        "loss": round(final, 4),
        "step_ms": round(1000 * dt / n_iters, 1),
    }
    if emit:
        print(json.dumps(result))
    return result


def bench_pseudo_gt(batch: int, n_iters: int, attn: str, scan: bool = False,
                    split: bool = False, chained: bool = False,
                    tiny: bool = False, int8_only=None,
                    static_acts: bool = False, emit: bool = True):
    """Pseudo-GT generation throughput (scripts/pseudo_gt.py:507-611 is the
    reference's second production workload): frozen MASt3R-512 two-view
    forward + on-device intrinsics + Umeyama pose, one jitted step.
    Serialized via a depth→input feedback chain; reports PAIRS/s/chip.

    --scan rolls the layer stacks into lax.scan (config.scan_layers): same
    numerics, ~10× smaller HLO — the knob that lets this program compile
    through the dev harness's slow relay (docs/PERF.md)."""
    if chained and split:
        # the chain jits the whole step into ONE fori_loop program, which
        # would inline (and so defeat) the split's two smaller compiles
        raise SystemExit("--chained and --split are incompatible: the "
                         "chained driver compiles one whole-step program; "
                         "use --scan for small chained compiles instead")
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from thermal3d.core.config import MASTR_512_CATMLPDPT
    from thermal3d.pseudo_gt.generator import PseudoGTGenerator

    config = dc.replace(MASTR_512_CATMLPDPT, compute_dtype="bfloat16",
                        attention_impl=attn, scan_layers=scan)
    if tiny:
        # CPU-verifiable shrink of the same program shape (not a perf mode);
        # reuse the CLI tiny preset so the dims live in exactly one place
        from thermal3d.cli.common import apply_preset

        config = apply_preset(config, "tiny", (64, 64), "float32")
    h, w = config.img_size
    ks = jax.random.split(jax.random.key(0), 2)
    rgb1 = jax.random.uniform(ks[0], (batch, h, w, 3))
    rgb2 = jax.random.uniform(ks[1], (batch, h, w, 3))
    gen = PseudoGTGenerator(config, batch_size=batch, split_programs=split,
                            params_dtype="bfloat16",
                            quantize_int8=int8_only is not None,
                            int8_only=int8_only or (),
                            # calibrate static act scales on the bench input
                            # itself (same protocol as cli.pseudo_gt)
                            int8_calibration=(rgb1, rgb2) if static_acts
                            else None)
    params, quant = gen.params, gen.quant

    if chained:
        # All iterations INSIDE one jitted program, with a TRACED iteration
        # count (fori_loop lowers to while_loop): one compile serves every n.
        # Timing two different n values and differencing cancels the
        # per-dispatch cost completely — on this dev harness a single program
        # dispatch through the TPU relay costs seconds, which at batch 4
        # dwarfs the device step and is what the non-chained mode measures
        # (docs/PERF.md "pseudo-GT" section).
        @jax.jit
        def run_chain(params, rgb1, rgb2, n):
            def body(_, carry):
                r1, acc = carry
                out = gen._step_impl(params, quant, r1, rgb2)
                fb = jnp.tanh(jnp.mean(out["depth1"], axis=(1, 2)))
                r1 = r1 * (1.0 + fb[:, None, None, None] * 1e-4)
                # fold a scalar from EVERY output tensor into the carry so
                # XLA cannot dead-code-eliminate any part of the production
                # step (intrinsics/pose/confidences are not on the depth1
                # feedback path and would otherwise be compiled away)
                probe = sum(jnp.mean(v.astype(jnp.float32))
                            for v in out.values())
                return r1, acc + probe
            _, acc = jax.lax.fori_loop(0, n, body, (rgb1, jnp.float32(0.0)))
            return acc

        def timed(n):
            t0 = time.perf_counter()
            acc = run_chain(params, rgb1, rgb2, n)
            final = float(acc)
            return time.perf_counter() - t0, final

        _warmup_with_retry(lambda: timed(1))
        n_small = 2
        n_big = n_small + n_iters
        # best of two per trip count (relay-contention protection) before
        # differencing; dispatch + h2d overhead cancels in the difference
        dt_small = min(timed(n_small)[0], timed(n_small)[0])
        (dt_big, final), dt_big2 = timed(n_big), timed(n_big)[0]
        dt_big = min(dt_big, dt_big2)
        for _ in range(2):
            if dt_big > dt_small:
                break
            # dt_big <= dt_small means contention inflated the SMALL passes
            # (the big-pass min can only shrink, so retrying it could never
            # satisfy the guard) — re-time the small pass, whose min can
            # only decrease, and it is also the cheapest measurement
            dt_small = min(dt_small, timed(n_small)[0])
        if dt_big <= dt_small:
            raise SystemExit(
                f"chained measurement corrupted: big-pass time {dt_big:.3f}s "
                f"<= small-pass time {dt_small:.3f}s after retries — rerun "
                "on a quieter host")
        dt = dt_big - dt_small
        pps = batch * n_iters / dt
        result = {
            "metric": "pseudo_gt_pairs_per_sec_per_chip_mastr512",
            "value": round(pps, 3),
            "unit": "pairs/s",
            "vs_baseline": None,
            "step_ms": round(1000 * dt / n_iters, 1),
            "dispatch_s": round(dt_small - 2 * dt / n_iters, 2),
            "pose_acc": round(final, 4),
            "attn": attn,
            "chained": True,
            **({"scan": True} if scan else {}),
            **({"int8": list(int8_only) or "all"} if int8_only is not None else {}),
            **({"static_acts": True} if static_acts else {}),
        }
        if emit:
            print(json.dumps(result))
        return result

    if split:
        # two compiled programs (encoder / decoder+heads+geometry): each XLA
        # compile is ~half the size — for environments where the single 512
        # program compiles too slowly through the remote-compile relay
        @jax.jit
        def tail_fb(params, feats, pos, rgb1):
            out = gen._tail_impl(params, quant, feats, pos)
            fb = jnp.tanh(jnp.mean(out["depth1"], axis=(1, 2)))[:, None, None, None]
            return out, rgb1 * (1.0 + fb * 1e-4)

        def once(rgb1):
            feats, pos, grid = gen._enc(params, quant, rgb1, rgb2)
            return tail_fb(params, feats, pos, rgb1)
    else:
        @jax.jit
        def once(rgb1):
            # feedback computed INSIDE the jitted program: eager ops
            # dispatched through this harness's TPU relay cost seconds each
            out = gen._step_impl(params, quant, rgb1, rgb2)
            fb = jnp.tanh(jnp.mean(out["depth1"], axis=(1, 2)))[:, None, None, None]
            return out, rgb1 * (1.0 + fb * 1e-4)

    _, rgb1 = _warmup_with_retry(lambda: once(rgb1))
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out, rgb1 = once(rgb1)
    final = float(out["poses"][0, 0, 0])
    dt = time.perf_counter() - t0
    pps = batch * n_iters / dt
    result = {
        "metric": "pseudo_gt_pairs_per_sec_per_chip_mastr512",
        "value": round(pps, 3),
        "unit": "pairs/s",
        "vs_baseline": None,  # the reference publishes no numbers
        "step_ms": round(1000 * dt / n_iters, 1),
        "pose00": round(final, 4),
        "attn": attn,
        **({"scan": True} if scan else {}),
        **({"split": True} if split else {}),
        **({"int8": list(int8_only) or "all"} if int8_only is not None else {}),
        **({"static_acts": True} if static_acts else {}),
    }
    if emit:
        print(json.dumps(result))
    return result


def main():
    t_start = time.perf_counter()

    import jax
    import jax.numpy as jnp

    from thermal3d.core.cache import enable_compilation_cache

    enable_compilation_cache()

    attn_flag = "auto"
    for a in list(sys.argv):
        if a.startswith("--attn="):
            attn_flag = a.split("=", 1)[1]
            sys.argv.remove(a)

    ndev = 1
    for a in list(sys.argv):
        if a.startswith("--ndev="):
            ndev = int(a.split("=", 1)[1])
            sys.argv.remove(a)

    use_int8 = "--int8" in sys.argv
    # static per-GEMM activation scales calibrated from one float forward
    # (kernels/quant.py act_scales): int8_dense skips the per-token dynamic
    # absmax pass — the measurement behind docs/INT8_SWEEP.md "static acts"
    static_acts = "--int8-static-acts" in sys.argv
    if static_acts and not use_int8:
        raise SystemExit("--int8-static-acts requires --int8")
    int8_scope = "all"
    for a in list(sys.argv):
        if a.startswith("--int8-scope="):
            int8_scope = a.split("=", 1)[1]
            sys.argv.remove(a)

    def int8_only():
        from thermal3d.kernels.quant import SCOPE_TO_ONLY

        return SCOPE_TO_ONLY[int8_scope]

    # positionals = non-flag args, so flag order never breaks int() parsing
    positional = [a for a in sys.argv[1:] if not a.startswith("-")]

    if "--train" in sys.argv:
        # 18 is the measured round-3 optimum (107.4-107.8 vs 101.5-102.3 at
        # 16 same-day; 20→97, 24→92 — docs/PERF.md train sweep)
        batch = int(positional[0]) if positional else 18
        n_iters = int(positional[1]) if len(positional) > 1 else 10
        # no-remat default: ViT-L/224 activations fit HBM at these batches
        # and remat costs 24% (101 -> 82 fps at b16, docs/PERF.md)
        bench_train(batch, n_iters, remat="--remat" in sys.argv,
                    scan="--scan" in sys.argv)
        return

    if "--pseudo-gt" in sys.argv:
        batch = int(positional[0]) if positional else 4
        n_iters = int(positional[1]) if len(positional) > 1 else 10
        bench_pseudo_gt(batch, n_iters, attn_flag, scan="--scan" in sys.argv,
                        split="--split" in sys.argv,
                        chained="--chained" in sys.argv,
                        tiny="--tiny" in sys.argv,
                        int8_only=int8_only() if use_int8 else None,
                        static_acts=static_acts)
        return

    from thermal3d.core.config import DUSTR_224_LINEAR
    from thermal3d.models.dustr import AsymmetricCroCo3DStereo
    from thermal3d.models.thermal_wrap import ThermalPreprocessHead
    from thermal3d.preprocess.enhance import enhance_thermal_contrast

    import numpy as np

    serving_int8_only = int8_only() if use_int8 else ()
    # batch 36 is the measured round-3 optimum (median 732 vs 724 at 32;
    # 24->720, 28->708, 40->710 -- docs/PERF.md round-3 sweep). --ndev=N
    # scales the default to 36*N so per-chip work is unchanged in aggregate
    # data-parallel mode.
    batch = int(positional[0]) if positional else 36 * ndev
    # 30 chained iterations: enough to amortize this harness's per-run relay
    # dispatch/fetch overhead so the number measures the chip's steady state
    n_iters = int(positional[1]) if len(positional) > 1 else 30
    bf16_params = "--f32-params" not in sys.argv  # bf16 weight storage default
    attn = attn_flag
    if "--attn-xla" in sys.argv:
        attn = "xla"
    elif "--attn-pallas" in sys.argv:
        attn = "pallas"
    elif "--attn-fast" in sys.argv:
        attn = "xla_bf16_scores"

    # --branch: branch-batched dual decoder (config.branch_batch) -- both
    # decoder branches as one 2x-batch dispatch per layer (VERDICT r3 #3)
    branch = "--branch" in sys.argv
    from thermal3d.kernels.quant import (pin_attention_for_int8,
                                         quantize_params_int8)
    from thermal3d.preprocess.resize import resize_bilinear_hw

    head = ThermalPreprocessHead()
    serving_base = DUSTR_224_LINEAR
    tiny = "--tiny" in sys.argv
    if tiny:
        # CPU-verifiable shrink of the same program shape (not a perf mode):
        # lets the secondary-metrics/drift plumbing run in tests without TPU
        from thermal3d.cli.common import apply_preset

        serving_base = apply_preset(serving_base, "tiny", (64, 64), "float32")
    h, w = serving_base.img_size
    head_params = jax.jit(lambda k: head.init(k, jnp.zeros((1, h, w, 3))))(
        jax.random.key(1))["params"]

    _model_cache = {}
    _init_cache = []  # one fixed-seed f32 tree shared by every variant

    def build_variant(int8_only_cfg, variant_static_acts):
        """(model, params, quant) for one serving config. int8_only_cfg is
        None for the bf16 path, else the SCOPE_TO_ONLY tuple. Base params
        come from ONE fixed-seed init (attention_impl doesn't change the
        param tree) so every variant quantizes the SAME weights (drift below
        is purely the quantization) and the ViT-L init program runs once,
        not once per secondary metric."""
        vattn = attn if int8_only_cfg is None else pin_attention_for_int8(attn)
        key = (vattn, branch)
        if key not in _model_cache:
            cfg = dataclasses.replace(serving_base,
                                      compute_dtype="bfloat16"
                                      if not tiny else "float32",
                                      attention_impl=vattn,
                                      branch_batch=branch)
            _model_cache[key] = AsymmetricCroCo3DStereo(cfg)
        vmodel = _model_cache[key]
        dummy = jnp.zeros((1, h, w, 3), jnp.float32)
        if not _init_cache:
            _init_cache.append(jax.jit(lambda k: vmodel.init(k, dummy, dummy))(
                jax.random.key(0))["params"])
        vparams = _init_cache[0]
        if bf16_params and not tiny:  # store weights in compute dtype:
            # no per-step f32->bf16 cast (tiny mode computes in f32)
            vparams = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16), vparams)
        vquant = None
        if int8_only_cfg is not None:  # int8 MXU mode (tests/test_quant.py)
            act_scales = None
            if variant_static_acts:
                # ONE float forward over a serving-shaped sample with the
                # 'calib' collection mutable (engine's int8_calibration
                # path): QuantDense sows per-GEMM input absmax → static
                # activation scales
                raw = jnp.linspace(21000.0, 26000.0, 4 * 320 * 416
                                   ).reshape(4, 320, 416) / 65535.0
                xc = enhance_thermal_contrast(resize_bilinear_hw(raw, (h, w)))
                xc = head.apply({"params": head_params}, xc)
                _, mut = vmodel.apply({"params": vparams}, xc, None,
                                      mutable=["calib"])
                act_scales = mut["calib"]
            vparams, vquant = quantize_params_int8(
                vparams, only=int8_only_cfg, act_scales=act_scales)
        return vmodel, vparams, vquant

    model, params, quant = build_variant(
        serving_int8_only if use_int8 else None, static_acts)

    mesh = None
    if ndev > 1:
        # aggregate data-parallel serving over an N-device mesh: params
        # replicated, batch sharded on 'data' (the InferenceEngine mesh path)
        from thermal3d.core.mesh import make_mesh, replicated_sharding

        devs = jax.devices()
        if len(devs) < ndev:
            raise SystemExit(f"--ndev={ndev} but only {len(devs)} devices")
        mesh = make_mesh((ndev,), ("data",), devices=devs[:ndev])
        repl = replicated_sharding(mesh)
        put = lambda x: jax.device_put(x, repl)  # noqa: E731
        params = jax.tree_util.tree_map(put, params)
        head_params = jax.tree_util.tree_map(put, head_params)
        if quant is not None:
            quant = jax.tree_util.tree_map(put, quant)

    def serving_fps(b, vmodel, vparams, vquant):
        """End-to-end device serving fps at batch b (fresh compile per b).
        Returns (fps, depth-on-raw0): the warmup depth is computed on the
        UNPERTURBED raw0, identical across variants, so int8-vs-bf16 drift
        below compares outputs for the same input."""
        raw0 = jnp.linspace(21000.0, 26000.0, b * 320 * 416).reshape(b, 320, 416) / 65535.0
        if mesh is not None:
            from thermal3d.core.mesh import data_sharding

            if b % ndev:
                raise SystemExit(f"batch {b} must be a multiple of --ndev={ndev}")
            raw0 = jax.device_put(np.asarray(raw0), data_sharding(mesh, 3))

        @jax.jit
        def step(params, quant, head_params, raw):
            # full serving pipeline (thermal_dustr_inference.py:25-159);
            # resize matches the engine path (matmul bilinear, no antialias
            # -- cv2.resize semantics, thermal_dustr_inference.py:47)
            resized = resize_bilinear_hw(raw, (h, w))
            enhanced = enhance_thermal_contrast(resized)  # [B,H,W,3]
            x = head.apply({"params": head_params}, enhanced)
            variables = {"params": params}
            if quant is not None:
                variables["quant"] = quant
            pred1, _ = vmodel.apply(variables, x, None)  # monocular
            depth = pred1["pts3d"][..., 2]
            # dependency chain: mix depth stats back into the next raw input
            feedback = jnp.tanh(jnp.mean(depth, axis=(1, 2)))[:, None, None] * 1e-4
            return depth, raw0 * (1.0 + feedback)

        def warm():
            depth, raw = step(vparams, vquant, head_params, raw0)
            float(depth[0, 0, 0])
            return depth, raw

        depth0, raw = _warmup_with_retry(warm)
        depth0 = np.asarray(depth0, np.float64)

        # best of two passes: this harness's TPU relay occasionally steals a
        # chunk of one measurement window (observed: a 636 run amid 730-734s
        # at identical config) -- the MIN time is the contention-free estimate
        dt = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(n_iters):
                depth, raw = step(vparams, vquant, head_params, raw)
            float(depth[0, 0, 0])  # forces the whole chain
            dt = min(dt, time.perf_counter() - t0)
        return b * n_iters / dt, depth0

    fps, depth_headline = serving_fps(batch, model, params, quant)

    # The int8 serving frontier, recorded in the SAME driver artifact as the
    # bf16 headline (VERDICT r4 #2): fc1-scope + static act scales (the
    # ~1%-drift configuration PARITY.md recommends) and the full-trunk int8
    # ceiling, each tagged with TWO machine-measured drift numbers vs the
    # bf16 engine on the same input — median-scaled AbsRel (the
    # evaluation/parity.py golden-fixture protocol; BASELINE.json's 1%
    # criterion gates THIS one) and raw depth rel RMS (the stricter
    # docs/INT8_SWEEP.md number, no median rescue). Skipped when a specific
    # config was requested explicitly (--int8/--branch/--ndev measure that
    # one config) or via --no-secondary.
    secondary = []
    if (not use_int8 and not branch and ndev == 1
            and "--no-secondary" not in sys.argv):
        from thermal3d.evaluation.metrics import compute_depth_metrics
        from thermal3d.kernels.quant import SCOPE_TO_ONLY

        secondary.append({"config": "bf16", "fps": round(fps, 2),
                          "abs_rel_drift": 0.0, "depth_drift_rel_rms": 0.0,
                          "drift_ok": True})
        ref_norm = float(np.linalg.norm(depth_headline))
        for scope_name in ("fc1", "all"):
            vm, vp, vq = build_variant(SCOPE_TO_ONLY[scope_name], True)
            vfps, vdepth = serving_fps(batch, vm, vp, vq)
            rel_rms = float(np.linalg.norm(vdepth - depth_headline) / ref_norm)
            # the parity protocol: int8 depths scored against the bf16
            # depths as reference (positive-depth mask, median scaling)
            abs_rel = float(compute_depth_metrics(
                vdepth, depth_headline, median_scaling=True)["abs_rel"])
            secondary.append({
                "config": f"int8_{scope_name}_static_acts",
                "fps": round(vfps, 2),
                "vs_baseline": round(vfps / 500.0, 3),
                "abs_rel_drift": round(abs_rel, 5),
                "depth_drift_rel_rms": round(rel_rms, 5),
                "drift_ok": bool(abs_rel <= 0.01),
            })

        # The OTHER two production workloads, recorded in the same artifact
        # (the round-4 pseudo-GT/train wins were invisible in BENCH_r04.json
        # — VERDICT r4 weak #2). Wall-clock-budget-guarded so a cold compile
        # cache can never push the headline past a driver timeout, and
        # try/except-guarded so a relay hiccup in a secondary stage cannot
        # redden the headline artifact.
        for label, fn in () if tiny else (
            ("train_dustr224_b18",
             lambda: bench_train(18, 6, remat=False, emit=False)),
            ("pseudo_gt_mastr512_b4",
             lambda: bench_pseudo_gt(4, 6, "auto", scan=True, chained=True,
                                     emit=False)),
        ):
            if time.perf_counter() - t_start > 1500:
                print(f"secondary {label} skipped: wall-clock budget",
                      file=sys.stderr)
                continue
            try:
                r = fn()
                secondary.append({"config": label, **r})
            except (Exception, SystemExit) as e:  # noqa: BLE001 — the
                # headline must survive; bench_pseudo_gt's chained mode
                # raises SystemExit on a contention-corrupted measurement
                print(f"secondary {label} failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": ("thermal_frames_per_sec_per_chip_dustr224" if ndev == 1
                   else "thermal_frames_per_sec_aggregate_dustr224"),
        "value": round(fps, 2),
        "unit": "frames/s",
        # the 500-fps BASELINE target is per chip; aggregate mode compares
        # its per-chip share so the ratio stays meaningful at any N
        "vs_baseline": round(fps / ndev / 500.0, 3),
        **({"ndev": ndev, "per_chip": round(fps / ndev, 2)} if ndev > 1 else {}),
        **({"int8": True} if use_int8 else {}),
        **({"static_acts": True} if static_acts else {}),
        **({"branch": True} if branch else {}),
        **({"secondary_metrics": secondary} if secondary else {}),
    }))

    if "--resweep" in sys.argv:
        # staleness guard for the hard-coded batch-36 optimum (an XLA
        # per-shape tiling artifact, docs/PERF.md): re-measure the +-2
        # neighbors and warn on stderr when the default is no longer optimal
        # -- run after any XLA/libtpu upgrade. stdout stays ONE json line.
        step_sz = 2 * ndev
        for nb in (batch - step_sz, batch + step_sz):
            if nb <= 0:
                continue
            nfps, _ = serving_fps(nb, model, params, quant)
            verdict = "OK" if nfps <= fps * 1.01 else "BEATS DEFAULT"
            print(f"resweep: batch {nb} -> {nfps:.1f} fps [{verdict}]",
                  file=sys.stderr)
            if nfps > fps * 1.01:
                print(f"WARNING: batch {nb} beats the default {batch} "
                      f"({nfps:.1f} vs {fps:.1f} fps) -- the compiled-shape "
                      "optimum moved; re-run the fine sweep and update the "
                      "defaults (docs/PERF.md)", file=sys.stderr)

if __name__ == "__main__":
    main()
