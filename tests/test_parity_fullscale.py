"""Checkpoint-conversion parity at PRODUCTION dimensions (VERDICT r1 item 4).

Real DUSt3R_ViTLarge_BaseDecoder_224_linear weights are not downloadable in
this environment, so the strongest available proof is per-layer activation
parity between the Flax model (through the converter) and an independently
written torch oracle at the real ViT-L/224 dimensions
(/root/reference/thermal_dustr_model.py:34-47): enc 1024d/16h, dec 768d/12h,
patch 16, 224², linear head.

The fast test runs 2 encoder + 2 decoder blocks at those dims; the
RUN_SLOW-gated test runs the full 24+8 production depth (also the generator
behind PARITY.md via scripts/parity_report.py).
"""

import dataclasses
import os

import numpy as np
import pytest
import torch

from thermal3d.convert.torch_to_flax import convert_state_dict
from thermal3d.core.config import DUSTR_224_LINEAR
from thermal3d.models.dustr import AsymmetricCroCo3DStereo
from tests.torch_oracle import (
    TorchDustr,
    capture_flax_activations,
    capture_torch_activations,
    per_layer_drift,
)


def run_parity(cfg, batch=1, seed=0):
    torch.manual_seed(seed)
    oracle = TorchDustr(cfg).eval()
    tree, report = convert_state_dict(dict(oracle.state_dict()), cfg)
    assert not report["unknown"], report["unknown"][:8]

    rng = np.random.default_rng(seed)
    h, w = cfg.img_size
    img1 = rng.uniform(0, 1, (batch, h, w, 3)).astype(np.float32)
    img2 = rng.uniform(0, 1, (batch, h, w, 3)).astype(np.float32)

    t_acts, (tout1, tout2) = capture_torch_activations(oracle, img1, img2)
    model = AsymmetricCroCo3DStereo(cfg)
    f_acts, (pred1, pred2) = capture_flax_activations(model, tree, img1, img2)

    drift = per_layer_drift(t_acts, f_acts)
    # linear head returns (pts, conf) tuples; DPT family returns dicts
    # (incl. desc/desc_conf for catmlpdpt) — compare every field present
    if isinstance(tout1, dict):
        pairs = [("pts3d_1", pred1["pts3d"], tout1["pts3d"]),
                 ("conf_1", pred1["conf"], tout1["conf"]),
                 ("pts3d_2", pred2["pts3d_in_other_view"], tout2["pts3d"]),
                 ("conf_2", pred2["conf"], tout2["conf"])]
        for k in ("desc", "desc_conf"):
            if k in tout1:
                pairs.append((f"{k}_1", pred1[k], tout1[k]))
                pairs.append((f"{k}_2", pred2[k], tout2[k]))
    else:
        (tpts1, tconf1), (tpts2, tconf2) = tout1, tout2
        pairs = [("pts3d_1", pred1["pts3d"], tpts1),
                 ("conf_1", pred1["conf"], tconf1),
                 ("pts3d_2", pred2["pts3d_in_other_view"], tpts2),
                 ("conf_2", pred2["conf"], tconf2)]
    outs = {
        name: (float(np.abs(np.asarray(ours) - theirs.numpy()).max()),
               float(np.abs(theirs.numpy()).max()))
        for name, ours, theirs in pairs
    }
    return drift, outs


def assert_drift_ok(drift, outs, tol=2e-4):
    assert drift, "no layers captured — capture plumbing broke"
    for name, (delta, scale) in {**drift, **outs}.items():
        # relative to the layer's own activation magnitude, floored at 1
        assert delta <= tol * max(1.0, scale), (
            f"{name}: max|Δ|={delta:.3e} at scale {scale:.2f}")


def test_production_dims_parity_2enc_2dec():
    """Per-layer activation parity at REAL ViT-L/224 widths (truncated depth):
    every block output within f32 tolerance of the torch oracle."""
    cfg = dataclasses.replace(DUSTR_224_LINEAR, enc_depth=2, dec_depth=2)
    drift, outs = run_parity(cfg)
    # must include both encoder blocks, both decoder branches, norms
    for key in ("enc_blocks_0", "enc_blocks_1", "enc_norm", "decoder_embed",
                "dec_blocks_0", "dec_blocks2_1", "dec_norm"):
        assert key in drift, f"{key} not captured"
    assert_drift_ok(drift, outs)


@pytest.mark.slow
@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="full 24+8 ViT-L parity is slow; set RUN_SLOW=1 "
                           "(report lives in PARITY.md)")
def test_production_full_depth_parity():
    drift, outs = run_parity(DUSTR_224_LINEAR)
    assert len([k for k in drift if k.startswith("enc_blocks_")]) == 24
    assert len([k for k in drift if k.startswith("dec_blocks_")]) == 8
    assert_drift_ok(drift, outs, tol=5e-4)


@pytest.mark.heavy
def test_production_widths_parity_catmlpdpt():
    """Per-layer + head-output parity for the MASt3R catmlpdpt family at
    REAL production widths (enc 1024d, dec 768d, feature_dim 256, last_dim
    128, dpt_layer_dims (96,192,384,768) — scripts/pseudo_gt.py:17-34's
    model), truncated depth (2 enc / 4 dec: dpt hooks (0,2,3,4) all
    distinct) and 224² pixels to keep a 1-core run tractable. Covers the
    DPT pyramid convs, fusion blocks, align-corners resizes, output head,
    and the desc/desc_conf local-feature branch at real channel counts."""
    from thermal3d.core.config import MASTR_512_CATMLPDPT

    cfg = dataclasses.replace(MASTR_512_CATMLPDPT, enc_depth=2, dec_depth=4,
                              img_size=(224, 224))
    drift, outs = run_parity(cfg)
    for key in ("enc_blocks_0", "enc_norm", "decoder_embed",
                "dec_blocks_3", "dec_blocks2_3", "dec_norm"):
        assert key in drift, f"{key} not captured"
    assert {"pts3d_1", "conf_1", "desc_1", "desc_conf_1",
            "pts3d_2", "desc_2"} <= set(outs)
    assert_drift_ok(drift, outs, tol=5e-4)
