"""Model forward shape/contract tests on tiny configs (CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thermal3d.core.config import DustrModelConfig, HeadConfig
from thermal3d.models.dustr import AsymmetricCroCo3DStereo
from thermal3d.models.thermal_wrap import ThermalDUSt3R, ThermalPreprocessHead


def _forward(cfg, batch=2):
    model = AsymmetricCroCo3DStereo(cfg)
    h, w = cfg.img_size
    img1 = jnp.linspace(0, 1, batch * h * w * 3).reshape(batch, h, w, 3)
    img2 = img1[:, :, ::-1, :]
    params = model.init(jax.random.key(0), img1, img2)
    return model.apply(params, img1, img2), params


def test_linear_head_contract(tiny_config):
    (pred1, pred2), _ = _forward(tiny_config)
    h, w = tiny_config.img_size
    assert pred1["pts3d"].shape == (2, h, w, 3)
    assert pred1["conf"].shape == (2, h, w)
    assert pred2["pts3d_in_other_view"].shape == (2, h, w, 3)
    assert pred2["conf"].shape == (2, h, w)
    # conf activation is 1 + exp(x) >= 1 (dust3r conf_mode ('exp', 1, inf))
    assert float(np.min(np.asarray(pred1["conf"]))) >= 1.0
    assert np.all(np.isfinite(np.asarray(pred1["pts3d"])))


def test_dpt_head_contract(tiny_config):
    cfg = dataclasses.replace(
        tiny_config,
        head=HeadConfig(head_type="dpt", feature_dim=32, last_dim=16,
                        dpt_layer_dims=(8, 16, 24, 32)),
    )
    (pred1, pred2), _ = _forward(cfg, batch=1)
    h, w = cfg.img_size
    assert pred1["pts3d"].shape == (1, h, w, 3)
    assert pred1["conf"].shape == (1, h, w)


def test_catmlpdpt_head_contract(tiny_config):
    cfg = dataclasses.replace(
        tiny_config,
        head=HeadConfig(head_type="catmlpdpt", feature_dim=32, last_dim=16,
                        dpt_layer_dims=(8, 16, 24, 32), local_feat_dim=6),
    )
    (pred1, pred2), _ = _forward(cfg, batch=1)
    h, w = cfg.img_size
    assert pred1["desc"].shape == (1, h, w, 6)
    assert pred1["desc_conf"].shape == (1, h, w)
    # desc is L2-normalized
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(pred1["desc"]), axis=-1), 1.0, atol=1e-4
    )
    assert pred2["pts3d_in_other_view"].shape == (1, h, w, 3)


def test_dpt_head_dtype_param_tree_invariant(tiny_config):
    """dpt_dtype is a COMPUTE dtype: the param tree (shapes, values, dtypes)
    must be identical between 'compute' and 'float32' so checkpoints and the
    torch converter are unaffected."""
    head = HeadConfig(head_type="catmlpdpt", feature_dim=32, last_dim=16,
                      dpt_layer_dims=(8, 16, 24, 32), local_feat_dim=6)
    h, w = tiny_config.img_size
    img = jnp.zeros((1, h, w, 3))
    trees = []
    for dd in ("compute", "float32"):
        cfg = dataclasses.replace(
            tiny_config, compute_dtype="bfloat16",
            head=dataclasses.replace(head, dpt_dtype=dd))
        model = AsymmetricCroCo3DStereo(cfg)
        trees.append(model.init(jax.random.key(0), img, img))
    flat0 = jax.tree_util.tree_leaves_with_path(trees[0])
    flat1 = jax.tree_util.tree_leaves_with_path(trees[1])
    assert [p for p, _ in flat0] == [p for p, _ in flat1]
    for (_, a), (_, b) in zip(flat0, flat1):
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dpt_head_compute_dtype_matches_f32_pin(tiny_config):
    """With f32 compute, 'compute' and 'float32' are the SAME program; with
    bf16 compute the bf16 head must stay close to the f32-pinned head
    (regression activations are f32 in both)."""
    head = HeadConfig(head_type="catmlpdpt", feature_dim=32, last_dim=16,
                      dpt_layer_dims=(8, 16, 24, 32), local_feat_dim=6)

    def run(compute, dd):
        cfg = dataclasses.replace(
            tiny_config, compute_dtype=compute,
            head=dataclasses.replace(head, dpt_dtype=dd))
        model = AsymmetricCroCo3DStereo(cfg)
        h, w = cfg.img_size
        img1 = jnp.linspace(0, 1, h * w * 3).reshape(1, h, w, 3)
        img2 = img1[:, :, ::-1, :]
        params = model.init(jax.random.key(0), img1, img2)
        pred1, _ = model.apply(params, img1, img2)
        return np.asarray(pred1["pts3d"], np.float64)

    np.testing.assert_array_equal(run("float32", "compute"),
                                  run("float32", "float32"))
    a, b = run("bfloat16", "compute"), run("bfloat16", "float32")
    rel = np.linalg.norm(a - b) / np.linalg.norm(b)
    assert rel < 0.02, rel


def test_asymmetric_heads_differ(tiny_config):
    """head1 and head2 have independent weights (asymmetric model)."""
    (pred1, pred2), params = _forward(tiny_config, batch=1)
    p = params["params"]
    assert "downstream_head1" in p and "downstream_head2" in p
    k1 = np.asarray(p["downstream_head1"]["proj"]["kernel"])
    k2 = np.asarray(p["downstream_head2"]["proj"]["kernel"])
    assert not np.allclose(k1, k2)


def test_monocular_symmetry(tiny_config):
    """view2 = view1 (monocular mode, thermal_dustr_inference.py:87-92) runs."""
    model = AsymmetricCroCo3DStereo(tiny_config)
    h, w = tiny_config.img_size
    img = jnp.ones((1, h, w, 3)) * 0.5
    params = model.init(jax.random.key(1), img, img)
    pred1, pred2 = jax.jit(lambda p, a, b: model.apply(p, a, b))(params, img, img)
    assert np.all(np.isfinite(np.asarray(pred1["pts3d"])))


def test_thermal_preprocess_head(rng):
    x = rng.uniform(0.2, 0.8, (2, 16, 16, 3)).astype(np.float32)
    head = ThermalPreprocessHead()
    params = head.init(jax.random.key(0), x)
    out = np.asarray(head.apply(params, x))
    assert out.shape == x.shape
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert float(params["params"]["edge_weight"]) == 0.5
    assert float(params["params"]["temp_scale"]) == 1.0
    # after local normalization the per-image max is pulled to ~1
    assert out.max() > 0.9


def test_thermal_wrapper_forward(tiny_config):
    model = ThermalDUSt3R(tiny_config)
    h, w = tiny_config.img_size
    img = jnp.full((1, h, w, 3), 0.25)
    img = img.at[:, : h // 2].set(0.75)  # some structure for sobel
    params = model.init(jax.random.key(0), img, img)
    pred1, pred2 = model.apply(params, img, img)
    assert pred1["pts3d"].shape == (1, h, w, 3)
    assert "thermal_preprocess" in params["params"]
    assert "model" in params["params"]


def test_encoder_batches_both_views(tiny_config):
    """Encoding is order-equivariant: swapping inputs swaps encoder feats."""
    model = AsymmetricCroCo3DStereo(tiny_config)
    h, w = tiny_config.img_size
    a = jnp.linspace(0, 1, h * w * 3).reshape(1, h, w, 3)
    b = a * 0.5
    params = model.init(jax.random.key(0), a, b)
    p1, p2 = model.apply(params, a, b)
    q1, q2 = model.apply(params, b, a)
    # asymmetric decoder/heads → results differ, but both must be finite
    assert np.all(np.isfinite(np.asarray(q1["pts3d"])))
    assert not np.allclose(np.asarray(p1["pts3d"]), np.asarray(q1["pts3d"]))


def test_monocular_single_encode_equals_two_view(tiny_config, rng):
    """The serving-path optimization (img2=None → encode once) must produce
    exactly the two-view result for identical inputs."""
    model = AsymmetricCroCo3DStereo(tiny_config)
    h, w = tiny_config.img_size
    img = rng.uniform(0, 1, (2, h, w, 3)).astype(np.float32)
    params = model.init(jax.random.key(0), img, img)
    p1a, p2a = model.apply(params, img, img)
    p1b, p2b = model.apply(params, img, None)
    # tolerance: f32 reduction-order noise only (the two paths fuse the
    # encoder batch differently); semantics are identical
    np.testing.assert_allclose(np.asarray(p1a["pts3d"]), np.asarray(p1b["pts3d"]),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(p2a["pts3d_in_other_view"]),
                               np.asarray(p2b["pts3d_in_other_view"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(p1a["conf"]), np.asarray(p1b["conf"]),
                               atol=2e-4)


def test_rectangular_input_linear_head(tiny_config):
    """landscape_only=False semantics (thermal_dustr_model.py:44): the network
    is H≠W-general — RoPE grid, patch embed, and heads all key off the actual
    patch grid, not a square assumption."""
    cfg = dataclasses.replace(tiny_config, img_size=(32, 64))
    (pred1, pred2), _ = _forward(cfg, batch=1)
    assert pred1["pts3d"].shape == (1, 32, 64, 3)
    assert pred1["conf"].shape == (1, 32, 64)
    assert pred2["pts3d_in_other_view"].shape == (1, 32, 64, 3)
    assert np.all(np.isfinite(np.asarray(pred1["pts3d"])))


def test_rectangular_input_dpt_head(tiny_config):
    cfg = dataclasses.replace(
        tiny_config,
        img_size=(64, 32),
        head=HeadConfig(head_type="dpt", feature_dim=32, last_dim=16,
                        dpt_layer_dims=(8, 16, 24, 32)),
    )
    (pred1, _), _ = _forward(cfg, batch=1)
    assert pred1["pts3d"].shape == (1, 64, 32, 3)
    assert np.all(np.isfinite(np.asarray(pred1["pts3d"])))


@pytest.mark.parametrize("hw", [(48, 32), (80, 48)])
def test_odd_patch_grid_dpt_head(tiny_config, hw):
    """Odd patch grids (e.g. dust3r's 512×336 bucket → 21-row grid): the DPT
    pyramid's act4_down emits ceil(h/2) rows, so each refinenet 2× upsample
    must be cropped to the next skip's size (croco DPTOutputAdapter crops
    path_4 to layer_3's shape) — uncropped, the skip-add throws at trace
    time. 48 and 80 give 3- and 5-row grids at patch 16."""
    cfg = dataclasses.replace(
        tiny_config,
        img_size=hw,
        head=HeadConfig(head_type="catmlpdpt", feature_dim=32, last_dim=16,
                        dpt_layer_dims=(8, 16, 24, 32), local_feat_dim=6),
    )
    (pred1, pred2), _ = _forward(cfg, batch=1)
    assert pred1["pts3d"].shape == (1, hw[0], hw[1], 3)
    assert pred2["pts3d_in_other_view"].shape == (1, hw[0], hw[1], 3)
    assert np.all(np.isfinite(np.asarray(pred1["pts3d"])))


def test_catmlpdpt_single_conf_aliases_desc_conf(tiny_config):
    """mast3r postprocess with two_confs=False emits desc_conf = conf (the
    pointmap confidence doubles as the descriptor confidence)."""
    cfg = dataclasses.replace(
        tiny_config,
        head=HeadConfig(head_type="catmlpdpt", feature_dim=32, last_dim=16,
                        dpt_layer_dims=(8, 16, 24, 32), local_feat_dim=6,
                        two_confs=False),
    )
    (pred1, _), _ = _forward(cfg, batch=1)
    np.testing.assert_array_equal(np.asarray(pred1["desc_conf"]),
                                  np.asarray(pred1["conf"]))


def test_rectangular_rope_orientation(tiny_config):
    """A rectangular RoPE grid must distinguish the two axes: transposing the
    input image is NOT equivalent to transposing the output (positions encode
    (y, x) separately)."""
    cfg = dataclasses.replace(tiny_config, img_size=(32, 64))
    cfg_t = dataclasses.replace(tiny_config, img_size=(64, 32))
    model = AsymmetricCroCo3DStereo(cfg)
    model_t = AsymmetricCroCo3DStereo(cfg_t)
    img = jnp.linspace(0, 1, 32 * 64 * 3).reshape(1, 32, 64, 3)
    img_t = img.transpose(0, 2, 1, 3)
    params = model.init(jax.random.key(0), img, img)
    p1, _ = model.apply(params, img, img)
    p1t, _ = model_t.apply(params, img_t, img_t)  # same params, transposed grid
    assert not np.allclose(np.asarray(p1["pts3d"]).transpose(0, 2, 1, 3),
                           np.asarray(p1t["pts3d"]), atol=1e-3)


def test_sobel_stencil_matches_grouped_conv(rng):
    """sobel_edge_magnitude's separable pad/slice form must match the
    reference's grouped 3×3 conv (thermal_dustr_model.py:96-101: zero
    padding, cross-correlation) to f32 rounding."""
    from thermal3d.models.thermal_wrap import (SOBEL_X, SOBEL_Y,
                                               sobel_edge_magnitude)

    x = rng.uniform(0, 1, (2, 17, 23, 3)).astype(np.float32)
    c = x.shape[-1]
    kx = jnp.tile(SOBEL_X[:, :, None, None], (1, 1, 1, c))
    ky = jnp.tile(SOBEL_Y[:, :, None, None], (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kx.shape, ("NHWC", "HWIO", "NHWC"))
    ex = jax.lax.conv_general_dilated(jnp.asarray(x), kx, (1, 1), [(1, 1), (1, 1)],
                                      dimension_numbers=dn, feature_group_count=c)
    ey = jax.lax.conv_general_dilated(jnp.asarray(x), ky, (1, 1), [(1, 1), (1, 1)],
                                      dimension_numbers=dn, feature_group_count=c)
    ref = np.asarray(jnp.sqrt(ex * ex + ey * ey))
    got = np.asarray(sobel_edge_magnitude(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-5)
