"""scan_layers mode: identical numerics to the unrolled model.

The scan mode exists to shrink compiled-HLO size (one block body instead of
enc_depth+2·dec_depth unrolled copies) for the MASt3R-512 program; it must be
a pure compile-time refactor with no numeric effect.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import TINY_KW


def _models(head_type="linear"):
    from thermal3d.core.config import DustrModelConfig, HeadConfig
    from thermal3d.models.dustr import AsymmetricCroCo3DStereo

    head = HeadConfig(head_type=head_type)
    base = DustrModelConfig(**TINY_KW, head=head)
    scan = dataclasses.replace(base, scan_layers=True)
    return AsymmetricCroCo3DStereo(base), AsymmetricCroCo3DStereo(scan), base


@pytest.mark.heavy
@pytest.mark.parametrize("head_type", ["linear", "catmlpdpt"])
def test_scan_forward_matches_unrolled(head_type, rng):
    from thermal3d.models.scan_params import from_scan_params, to_scan_params

    unrolled, scanned, cfg = _models(head_type)
    img1 = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    img2 = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    params = unrolled.init(jax.random.key(0), img1, img2)["params"]
    sparams = to_scan_params(params, cfg)

    p1, p2 = unrolled.apply({"params": params}, img1, img2)
    s1, s2 = scanned.apply({"params": sparams}, img1, img2)
    for a, b in ((p1, s1), (p2, s2)):
        assert set(a) == set(b)
        for k in a:
            # f32 reduction-order drift through 2+2·2 blocks, amplified by the
            # expm1 head activation — measured max |Δ| ≈ 3e-5 at tiny dims
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       rtol=1e-4, atol=2e-4, err_msg=k)

    # round-trip back to the checkpoint-native layout is exact
    back = from_scan_params(sparams, cfg)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
        params, back)


def test_scan_init_shapes_match_stacked_layout(rng):
    """scan model's own init produces the stacked layout to_scan_params emits
    (so either init or conversion can seed it)."""
    from thermal3d.models.scan_params import to_scan_params

    unrolled, scanned, cfg = _models()
    img = np.zeros((1, 32, 32, 3), np.float32)
    params = unrolled.init(jax.random.key(0), img, img)["params"]
    native = scanned.init(jax.random.key(0), img, img)["params"]
    converted = to_scan_params(params, cfg)
    shapes = lambda t: jax.tree_util.tree_map(lambda x: tuple(x.shape), t)
    assert shapes(native) == shapes(converted)


@pytest.mark.heavy
def test_scan_with_remat_gradients(rng):
    """remat composes with scan (the 512-training memory configuration):
    gradients still match the plain unrolled model."""
    from thermal3d.core.config import DustrModelConfig
    from thermal3d.models.dustr import AsymmetricCroCo3DStereo
    from thermal3d.models.scan_params import to_scan_params

    base = DustrModelConfig(**TINY_KW)
    remat_scan = dataclasses.replace(base, scan_layers=True, remat=True)
    unrolled = AsymmetricCroCo3DStereo(base)
    scanned = AsymmetricCroCo3DStereo(remat_scan)
    img = np.random.default_rng(1).uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    params = unrolled.init(jax.random.key(0), img, img)["params"]
    sparams = to_scan_params(params, base)

    def loss(m, p):
        p1, _ = m.apply({"params": p}, img, img)
        return jnp.mean(p1["pts3d"] ** 2)

    gu = jax.grad(lambda p: loss(unrolled, p))(params)["patch_embed"]
    gs = jax.grad(lambda p: loss(scanned, p))(sparams)["patch_embed"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-5), gu, gs)


def test_scan_gradients_match_unrolled(rng):
    from thermal3d.models.scan_params import from_scan_params, to_scan_params

    unrolled, scanned, cfg = _models()
    img1 = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    img2 = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    params = unrolled.init(jax.random.key(0), img1, img2)["params"]
    sparams = to_scan_params(params, cfg)

    def loss_u(p):
        p1, p2 = unrolled.apply({"params": p}, img1, img2)
        return jnp.mean(p1["pts3d"] ** 2) + jnp.mean(p2["pts3d_in_other_view"])

    def loss_s(p):
        p1, p2 = scanned.apply({"params": p}, img1, img2)
        return jnp.mean(p1["pts3d"] ** 2) + jnp.mean(p2["pts3d_in_other_view"])

    gu = jax.grad(loss_u)(params)
    gs = from_scan_params(jax.grad(loss_s)(sparams), cfg)
    flat_u = jax.tree_util.tree_leaves_with_path(gu)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(gs))
    for path, leaf in flat_u:
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat_s[path]),
                                   rtol=5e-5, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(path))


@pytest.mark.parametrize("head_type", ["linear", "catmlpdpt"])
def test_branch_batch_forward_matches_unrolled(head_type, rng):
    """branch_batch mode (both decoder branches as one vmapped 2x-batch
    dispatch per layer, VERDICT r3 next-#3) is a pure dispatch refactor:
    numerics match the unrolled dual-branch loop."""
    from thermal3d.core.config import DustrModelConfig, HeadConfig
    from thermal3d.models.dustr import AsymmetricCroCo3DStereo
    from thermal3d.models.scan_params import (from_branch_params,
                                              to_branch_params)

    head = HeadConfig(head_type=head_type)
    cfg = DustrModelConfig(**TINY_KW, head=head)
    unrolled = AsymmetricCroCo3DStereo(cfg)
    branched = AsymmetricCroCo3DStereo(
        dataclasses.replace(cfg, branch_batch=True))
    img1 = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    img2 = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    params = unrolled.init(jax.random.key(0), img1, img2)["params"]
    bparams = to_branch_params(params, cfg)

    p1, p2 = unrolled.apply({"params": params}, img1, img2)
    b1, b2 = branched.apply({"params": bparams}, img1, img2)
    np.testing.assert_allclose(b1["pts3d"], p1["pts3d"], rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(b2["pts3d_in_other_view"],
                               p2["pts3d_in_other_view"], rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(b1["conf"], p1["conf"], rtol=2e-5, atol=1e-6)

    # adapter roundtrip is exact
    rt = from_branch_params(bparams, cfg)
    jax.tree_util.tree_map(np.testing.assert_array_equal, rt, params)

    # monocular mode too (the serving path this mode targets)
    pm, _ = unrolled.apply({"params": params}, img1, None)
    bm, _ = branched.apply({"params": bparams}, img1, None)
    np.testing.assert_allclose(bm["pts3d"], pm["pts3d"], rtol=2e-5, atol=1e-6)


def test_branch_batch_init_shapes_are_stacked(rng):
    """Direct init of the branch model produces [2, ...]-stacked dec_dual
    leaves matching the adapter layout."""
    from thermal3d.core.config import DustrModelConfig
    from thermal3d.models.dustr import AsymmetricCroCo3DStereo

    cfg = DustrModelConfig(**TINY_KW, branch_batch=True)
    model = AsymmetricCroCo3DStereo(cfg)
    img = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.key(0), img, img)["params"]
    assert "dec_dual_0" in params and "dec_blocks_0" not in params
    k = params["dec_dual_0"]["attn"]["qkv"]["kernel"]
    assert k.shape[0] == 2 and k.ndim == 3


def test_branch_batch_int8_quantizes_stacked(rng):
    """int8 quantization handles the branch-stacked [2,K,N] kernels (scales
    stacked so nn.vmap's variable_axes slices them per branch)."""
    from thermal3d.core.config import DustrModelConfig
    from thermal3d.kernels.quant import quantize_params_int8
    from thermal3d.models.dustr import AsymmetricCroCo3DStereo

    cfg = DustrModelConfig(**TINY_KW, branch_batch=True)
    model = AsymmetricCroCo3DStereo(cfg)
    img1 = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    params = model.init(jax.random.key(0), img1, img1)["params"]
    pq, quant = quantize_params_int8(params)
    assert pq["dec_dual_0"]["attn"]["qkv"]["kernel"].dtype == jnp.int8
    o1, _ = model.apply({"params": pq, "quant": quant}, img1, img1)
    f1, _ = model.apply({"params": params}, img1, img1)
    # int8 noise bound, tiny model (mirrors test_quant tolerances)
    assert np.isfinite(np.asarray(o1["pts3d"])).all()
    rel = np.abs(np.asarray(o1["pts3d"]) - np.asarray(f1["pts3d"])).mean()
    assert rel < 0.5 * (np.abs(np.asarray(f1["pts3d"])).mean() + 1e-6)
