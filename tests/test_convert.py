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
from tests.test_rope import torch_rope2d_oracle


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

class _TorchAttention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.heads = heads

    def forward(self, x, pos):
        b, s, c = x.shape
        hd = c // self.heads
        qkv = self.qkv(x).reshape(b, s, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = torch_rope2d_oracle(q, pos)
        k = torch_rope2d_oracle(k, pos)
        attn = (q @ k.transpose(-2, -1)) / math.sqrt(hd)
        out = attn.softmax(dim=-1) @ v
        return self.proj(out.transpose(1, 2).reshape(b, s, c))


class _TorchCrossAttention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.projq = nn.Linear(dim, dim)
        self.projk = nn.Linear(dim, dim)
        self.projv = nn.Linear(dim, dim)
        self.proj = nn.Linear(dim, dim)
        self.heads = heads

    def forward(self, x, key, value, xpos, ypos):
        b, sq, c = x.shape
        sk = key.shape[1]
        hd = c // self.heads
        q = self.projq(x).reshape(b, sq, self.heads, hd).transpose(1, 2)
        k = self.projk(key).reshape(b, sk, self.heads, hd).transpose(1, 2)
        v = self.projv(value).reshape(b, sk, self.heads, hd).transpose(1, 2)
        q = torch_rope2d_oracle(q, xpos)
        k = torch_rope2d_oracle(k, ypos)
        attn = (q @ k.transpose(-2, -1)) / math.sqrt(hd)
        out = attn.softmax(dim=-1) @ v
        return self.proj(out.transpose(1, 2).reshape(b, sq, c))


class _TorchMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class _TorchEncBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = _TorchAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = _TorchMlp(dim, dim * mlp_ratio)

    def forward(self, x, pos):
        x = x + self.attn(self.norm1(x), pos)
        return x + self.mlp(self.norm2(x))


class _TorchDecBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = _TorchAttention(dim, heads)
        self.cross_attn = _TorchCrossAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.norm3 = nn.LayerNorm(dim, eps=1e-6)
        self.norm_y = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = _TorchMlp(dim, dim * mlp_ratio)

    def forward(self, x, y, xpos, ypos):
        x = x + self.attn(self.norm1(x), xpos)
        y_ = self.norm_y(y)
        x = x + self.cross_attn(self.norm2(x), y_, y_, xpos, ypos)
        return x + self.mlp(self.norm3(x))


class _TorchTinyDustr(nn.Module):
    """Independent torch re-statement of the architecture, linear head."""

    def __init__(self, cfg):
        super().__init__()
        e, d, p = cfg.enc_embed_dim, cfg.dec_embed_dim, cfg.patch_size
        self.cfg = cfg
        self.patch_embed = nn.ModuleDict(
            {"proj": nn.Conv2d(3, e, kernel_size=p, stride=p)})
        self.enc_blocks = nn.ModuleList(
            [_TorchEncBlock(e, cfg.enc_num_heads) for _ in range(cfg.enc_depth)])
        self.enc_norm = nn.LayerNorm(e, eps=1e-6)
        self.decoder_embed = nn.Linear(e, d)
        self.dec_blocks = nn.ModuleList(
            [_TorchDecBlock(d, cfg.dec_num_heads) for _ in range(cfg.dec_depth)])
        self.dec_blocks2 = nn.ModuleList(
            [_TorchDecBlock(d, cfg.dec_num_heads) for _ in range(cfg.dec_depth)])
        self.dec_norm = nn.LayerNorm(d, eps=1e-6)
        self.downstream_head1 = nn.ModuleDict({"proj": nn.Linear(d, 4 * p * p)})
        self.downstream_head2 = nn.ModuleDict({"proj": nn.Linear(d, 4 * p * p)})

    def _positions(self, h, w):
        return torch.cartesian_prod(torch.arange(h), torch.arange(w))

    def _encode(self, img):
        x = self.patch_embed["proj"](img)  # [B, E, h, w]
        b, e, h, w = x.shape
        x = x.flatten(2).transpose(1, 2)
        pos = self._positions(h, w)
        for blk in self.enc_blocks:
            x = blk(x, pos)
        return self.enc_norm(x), pos, (h, w)

    def _head(self, head, tokens, grid):
        b, s, _ = tokens.shape
        h, w = grid
        p = self.cfg.patch_size
        feat = head["proj"](tokens)
        feat = feat.transpose(-1, -2).view(b, -1, h, w)
        feat = F.pixel_shuffle(feat, p)  # [B, 4, H, W]
        fmap = feat.permute(0, 2, 3, 1)
        xyz, conf = fmap[..., :3], fmap[..., 3]
        n = xyz.norm(dim=-1, keepdim=True)
        pts = xyz / n.clamp(min=1e-8) * torch.expm1(n)
        return pts, 1 + conf.exp()

    def forward(self, img1, img2):
        b = img1.shape[0]
        feats, pos, grid = self._encode(torch.cat([img1, img2], dim=0))
        f1, f2 = feats[:b], feats[b:]
        x1, x2 = self.decoder_embed(f1), self.decoder_embed(f2)
        for blk1, blk2 in zip(self.dec_blocks, self.dec_blocks2):
            nx1 = blk1(x1, x2, pos, pos)
            nx2 = blk2(x2, x1, pos, pos)
            x1, x2 = nx1, nx2
        x1, x2 = self.dec_norm(x1), self.dec_norm(x2)
        pts1, conf1 = self._head(self.downstream_head1, x1, grid)
        pts2, conf2 = self._head(self.downstream_head2, x2, grid)
        return (pts1, conf1), (pts2, conf2)


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
