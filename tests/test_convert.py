"""Checkpoint conversion: structure/shape round-trip + full numeric parity
against an independently written torch oracle of the DUSt3R architecture
(SURVEY.md §7 hard part 1 — per-layer activation parity)."""

import dataclasses
import math

import jax
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from thermal3d.convert.torch_to_flax import convert_state_dict, expected_torch_keys
from thermal3d.core.config import HeadConfig
from thermal3d.models.dustr import AsymmetricCroCo3DStereo
from tests.test_rope import torch_rope2d_oracle  # noqa: F401 (re-export)
from tests.torch_oracle import TorchDustr


def _tree_shapes(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_shapes(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(v.shape)
    return out


def _synthetic_state(config, rng):
    return {k: rng.standard_normal(s).astype(np.float32) * 0.05
            for k, s in expected_torch_keys(config).items()}


@pytest.mark.parametrize("head_type", ["linear", "dpt", "catmlpdpt"])
def test_convert_structure_matches_init(tiny_config, rng, head_type):
    cfg = dataclasses.replace(
        tiny_config,
        head=HeadConfig(head_type=head_type, feature_dim=32, last_dim=16,
                        dpt_layer_dims=(8, 16, 24, 32), local_feat_dim=6),
    )
    state = _synthetic_state(cfg, rng)
    tree, report = convert_state_dict(state, cfg)
    assert not report["unknown"], report["unknown"][:5]
    # only the dead refinenet4.resConfUnit1 weights may be skipped
    assert all("refinenet4.resConfUnit1" in k for k in report["skipped"])

    model = AsymmetricCroCo3DStereo(cfg)
    h, w = cfg.img_size
    img = np.zeros((1, h, w, 3), dtype=np.float32)
    ref = model.init(jax.random.key(0), img, img)["params"]
    assert _tree_shapes(tree) == _tree_shapes(ref)

    # converted params actually run
    pred1, _ = model.apply({"params": tree}, img + 0.5, img + 0.25)
    assert np.all(np.isfinite(np.asarray(pred1["pts3d"])))


def test_deeper_checkpoint_into_shallower_model(tiny_config, rng):
    """The official 12-block-decoder ckpt loads into the reference's 8-block
    model with strict=False (thermal_dustr_model.py:44-56) — extra blocks
    must be skipped, not errored."""
    deep = dataclasses.replace(tiny_config, dec_depth=4)
    state = _synthetic_state(deep, rng)
    tree, report = convert_state_dict(state, tiny_config)  # tiny has dec_depth=2
    assert any("dec_blocks.3" in k for k in report["skipped"])
    assert not report["unknown"]
    ref = AsymmetricCroCo3DStereo(tiny_config).init(
        jax.random.key(0), np.zeros((1, 32, 32, 3), np.float32),
        np.zeros((1, 32, 32, 3), np.float32))["params"]
    assert _tree_shapes(tree) == _tree_shapes(ref)


def test_wrapper_checkpoint(tiny_config, rng):
    """ThermalDUSt3R checkpoints: 'model.'-prefixed keys + learnable scalars
    + sobel buffers (thermal_dustr_model.py:96-107,180-185)."""
    from thermal3d.models.thermal_wrap import ThermalDUSt3R

    state = {"model." + k: v for k, v in _synthetic_state(tiny_config, rng).items()}
    state["edge_weight"] = np.asarray(0.37, np.float32)
    state["temp_scale"] = np.asarray(1.21, np.float32)
    state["sobel_x"] = np.zeros((3, 1, 3, 3), np.float32)
    state["sobel_y"] = np.zeros((3, 1, 3, 3), np.float32)
    tree, report = convert_state_dict(state, tiny_config, wrapper=True)
    assert not report["unknown"]
    assert float(tree["thermal_preprocess"]["edge_weight"]) == pytest.approx(0.37)

    model = ThermalDUSt3R(tiny_config)
    img = np.full((1, 32, 32, 3), 0.5, np.float32)
    ref = model.init(jax.random.key(0), img, img)["params"]
    assert _tree_shapes(tree) == _tree_shapes(ref)


# ---------------------------------------------------------------------------
# Full numeric parity: torch oracle of a tiny AsymmetricCroCo3DStereo
# ---------------------------------------------------------------------------

_TorchTinyDustr = TorchDustr  # shared oracle (tests/torch_oracle.py)


def test_full_model_numeric_parity(tiny_config, rng):
    """Convert a torch model's weights; outputs must match to f32 precision."""
    torch.manual_seed(0)
    oracle = _TorchTinyDustr(tiny_config).eval()
    state = {k: v for k, v in oracle.state_dict().items()}
    tree, report = convert_state_dict(state, tiny_config)
    assert not report["unknown"], report["unknown"][:8]

    h, w = tiny_config.img_size
    img1 = rng.uniform(0, 1, (2, h, w, 3)).astype(np.float32)
    img2 = rng.uniform(0, 1, (2, h, w, 3)).astype(np.float32)

    with torch.no_grad():
        (tpts1, tconf1), (tpts2, tconf2) = oracle(
            torch.from_numpy(img1.transpose(0, 3, 1, 2)),
            torch.from_numpy(img2.transpose(0, 3, 1, 2)),
        )

    model = AsymmetricCroCo3DStereo(tiny_config)
    pred1, pred2 = model.apply({"params": tree}, img1, img2)

    np.testing.assert_allclose(np.asarray(pred1["pts3d"]), tpts1.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(pred1["conf"]), tconf1.numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(pred2["pts3d_in_other_view"]), tpts2.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(pred2["conf"]), tconf2.numpy(), atol=2e-4)


@pytest.mark.parametrize("head_type", ["linear", "catmlpdpt"])
def test_roundtrip_torch_flax_torch(tiny_config, rng, head_type):
    """torch → flax → torch is the identity on every surviving tensor."""
    from thermal3d.convert.flax_to_torch import export_state_dict
    from thermal3d.convert.torch_to_flax import convert_state_dict, expected_torch_keys

    cfg = dataclasses.replace(
        tiny_config,
        head=HeadConfig(head_type=head_type, feature_dim=32, last_dim=16,
                        dpt_layer_dims=(8, 16, 24, 32), local_feat_dim=6),
    )
    state = {k: rng.standard_normal(s).astype(np.float32)
             for k, s in expected_torch_keys(cfg).items()}
    tree, report = convert_state_dict(state, cfg)
    back = export_state_dict(tree, cfg)
    skipped = set(report["skipped"])
    assert set(back) == set(state) - skipped
    for k in back:
        np.testing.assert_array_equal(back[k], state[k], err_msg=k)


def test_roundtrip_wrapper(tiny_config, rng):
    from thermal3d.convert.flax_to_torch import export_state_dict
    from thermal3d.convert.torch_to_flax import convert_state_dict, expected_torch_keys

    state = {"model." + k: rng.standard_normal(s).astype(np.float32)
             for k, s in expected_torch_keys(tiny_config).items()}
    state["edge_weight"] = np.asarray(0.4, np.float32)
    state["temp_scale"] = np.asarray(1.5, np.float32)
    tree, _ = convert_state_dict(state, tiny_config, wrapper=True)
    back = export_state_dict(tree, tiny_config, wrapper=True)
    assert float(back["edge_weight"]) == pytest.approx(0.4)
    for k in back:
        if k in state:
            np.testing.assert_array_equal(back[k], state[k], err_msg=k)


def test_strict_conversion_of_released_layout(tiny_config, rng):
    """A synthetic RELEASED-layout checkpoint (croco mask_token + the
    checkpoint's native, deeper decoder stacks — released_checkpoint_keys,
    VERDICT r3 #4) converts under strict=True: every tensor either converts
    or is a known skippable family, nothing unknown, nothing missing."""
    from thermal3d.convert.torch_to_flax import released_checkpoint_keys
    from thermal3d.models.dustr import AsymmetricCroCo3DStereo

    keys = released_checkpoint_keys(
        tiny_config, ckpt_dec_depth=tiny_config.dec_depth + 2)
    state = {k: rng.standard_normal(s).astype(np.float32) * 0.05
             for k, s in keys.items()}
    tree, report = convert_state_dict(state, tiny_config, strict=True)
    assert not report["unknown"]
    assert "mask_token" in report["skipped"]
    # the native-depth extra blocks truncate exactly like the reference's
    # strict=False load of the 12-block checkpoint into its 8-block model
    extra = [k for k in report["skipped"]
             if k.startswith(("dec_blocks.", "dec_blocks2."))]
    assert len(extra) == 2 * 2 * 24  # 2 stacks x 2 extra layers x 24 tensors

    model = AsymmetricCroCo3DStereo(tiny_config)
    img = np.full((1, *tiny_config.img_size, 3), 0.5, np.float32)
    pred1, _ = model.apply({"params": tree}, img, img)
    assert np.all(np.isfinite(np.asarray(pred1["pts3d"])))


def test_strict_conversion_fails_loudly(tiny_config, rng):
    """strict=True raises with an actionable diff on (a) keys the converter
    does not understand and (b) required tensors missing from the file."""
    state = _synthetic_state(tiny_config, rng)
    state["enc_blocks.0.attn.rope_freqs"] = np.zeros((4,), np.float32)
    with pytest.raises(ValueError, match="unknown key.*rope_freqs"):
        convert_state_dict(state, tiny_config, strict=True)

    state2 = _synthetic_state(tiny_config, rng)
    del state2["decoder_embed.weight"]
    with pytest.raises(ValueError, match="missing.*decoder_embed.weight"):
        convert_state_dict(state2, tiny_config, strict=True)

    # non-strict keeps the reference's forgiving behavior on the same inputs
    _, report = convert_state_dict(state, tiny_config)
    assert report["unknown"] == ["enc_blocks.0.attn.rope_freqs"]


def test_validate_released_layout_reports_clean(tiny_config, rng):
    """cli.model_info --validate reports clean against a full released-layout
    state dict (native decoder depth inferred from the file itself)."""
    from thermal3d.cli.model_info import validate_against_config
    from thermal3d.convert.torch_to_flax import released_checkpoint_keys

    keys = released_checkpoint_keys(tiny_config,
                                    ckpt_dec_depth=tiny_config.dec_depth + 2)
    state = {k: np.zeros(s, np.float32) for k, s in keys.items()}
    rep = validate_against_config(state, tiny_config)
    assert rep["missing"] == [] and rep["unexpected"] == []
    assert rep["shape_mismatches"] == {}
    # a re-saved fine-tune without mask_token is also clean
    state.pop("mask_token")
    rep2 = validate_against_config(state, tiny_config)
    assert rep2["missing"] == []


@pytest.mark.parametrize("head_type", ["dpt", "catmlpdpt"])
def test_full_model_numeric_parity_dpt_heads(tiny_config, rng, head_type):
    """NUMERIC oracle parity for the DPT-family heads (round 5 — previously
    structure-only): convert a torch model's weights (incl. the DPT pyramid
    convs, transposed convs, fusion blocks, output head, and the catmlpdpt
    local-feature MLP) and match every output map to f32 precision. This is
    the head the MASt3R-512 pseudo-GT model uses (scripts/pseudo_gt.py:17-34)
    — SURVEY hard part #2."""
    cfg = dataclasses.replace(
        tiny_config,
        head=HeadConfig(head_type=head_type, feature_dim=32, last_dim=16,
                        dpt_layer_dims=(8, 16, 24, 32), local_feat_dim=6),
    )
    torch.manual_seed(0)
    oracle = _TorchTinyDustr(cfg).eval()
    state = {k: v for k, v in oracle.state_dict().items()}
    tree, report = convert_state_dict(state, cfg)
    assert not report["unknown"], report["unknown"][:8]
    # only refinenet4.resConfUnit1 (dead weights — no skip input) may skip
    assert all("refinenet4.resConfUnit1" in k for k in report["skipped"])

    h, w = cfg.img_size
    img1 = rng.uniform(0, 1, (2, h, w, 3)).astype(np.float32)
    img2 = rng.uniform(0, 1, (2, h, w, 3)).astype(np.float32)

    with torch.no_grad():
        tout1, tout2 = oracle(
            torch.from_numpy(img1.transpose(0, 3, 1, 2)),
            torch.from_numpy(img2.transpose(0, 3, 1, 2)),
        )

    model = AsymmetricCroCo3DStereo(cfg)
    pred1, pred2 = model.apply({"params": tree}, img1, img2)

    np.testing.assert_allclose(np.asarray(pred1["pts3d"]),
                               tout1["pts3d"].numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(pred1["conf"]),
                               tout1["conf"].numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(pred2["pts3d_in_other_view"]),
                               tout2["pts3d"].numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(pred2["conf"]),
                               tout2["conf"].numpy(), atol=2e-4)
    if head_type == "catmlpdpt":
        np.testing.assert_allclose(np.asarray(pred1["desc"]),
                                   tout1["desc"].numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(pred1["desc_conf"]),
                                   tout1["desc_conf"].numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(pred2["desc"]),
                                   tout2["desc"].numpy(), atol=2e-4)
