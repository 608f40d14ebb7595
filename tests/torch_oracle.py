"""Independent PyTorch re-statement of the DUSt3R architecture, used as a
numeric oracle for checkpoint-conversion parity (SURVEY.md §7 hard part 1).

This is NOT a copy of the reference (which imports the network from the
external naver/dust3r checkout, /root/reference/thermal_dustr_model.py:33);
it is written from the architecture contract so that agreement between this
oracle and the Flax model is evidence both are right.

Also provides per-layer activation capture on both frameworks so parity can
be reported as a per-layer max|Δ| table (PARITY.md) at production ViT-L
dimensions, the closest available proof to real released weights (which are
not downloadable in this environment).
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.test_rope import torch_rope2d_oracle


class TorchAttention(nn.Module):
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


class TorchCrossAttention(nn.Module):
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


class TorchMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class TorchEncBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TorchAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = TorchMlp(dim, int(dim * mlp_ratio))

    def forward(self, x, pos):
        x = x + self.attn(self.norm1(x), pos)
        return x + self.mlp(self.norm2(x))


class TorchDecBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TorchAttention(dim, heads)
        self.cross_attn = TorchCrossAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.norm3 = nn.LayerNorm(dim, eps=1e-6)
        self.norm_y = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = TorchMlp(dim, int(dim * mlp_ratio))

    def forward(self, x, y, xpos, ypos):
        x = x + self.attn(self.norm1(x), xpos)
        y_ = self.norm_y(y)
        x = x + self.cross_attn(self.norm2(x), y_, y_, xpos, ypos)
        return x + self.mlp(self.norm3(x))


class TorchDustr(nn.Module):
    """Independent torch re-statement of AsymmetricCroCo3DStereo, linear head
    (the production DUSt3R-224 configuration, thermal_dustr_model.py:34-47)."""

    def __init__(self, cfg):
        super().__init__()
        e, d, p = cfg.enc_embed_dim, cfg.dec_embed_dim, cfg.patch_size
        self.cfg = cfg
        self.patch_embed = nn.ModuleDict(
            {"proj": nn.Conv2d(3, e, kernel_size=p, stride=p)})
        self.enc_blocks = nn.ModuleList(
            [TorchEncBlock(e, cfg.enc_num_heads, cfg.mlp_ratio)
             for _ in range(cfg.enc_depth)])
        self.enc_norm = nn.LayerNorm(e, eps=1e-6)
        self.decoder_embed = nn.Linear(e, d)
        self.dec_blocks = nn.ModuleList(
            [TorchDecBlock(d, cfg.dec_num_heads, cfg.mlp_ratio)
             for _ in range(cfg.dec_depth)])
        self.dec_blocks2 = nn.ModuleList(
            [TorchDecBlock(d, cfg.dec_num_heads, cfg.mlp_ratio)
             for _ in range(cfg.dec_depth)])
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


# ---------------------------------------------------------------------------
# Per-layer activation capture + comparison
# ---------------------------------------------------------------------------

def capture_torch_activations(oracle: TorchDustr, img1, img2):
    """Run the oracle, hooking every block/norm; returns ({name: [np arrays
    per call]}, outputs). Names match the Flax module names."""
    acts: dict[str, list[np.ndarray]] = {}

    def hook(name):
        def fn(_mod, _inp, out):
            acts.setdefault(name, []).append(out.detach().numpy())
        return fn

    handles = []
    for i, blk in enumerate(oracle.enc_blocks):
        handles.append(blk.register_forward_hook(hook(f"enc_blocks_{i}")))
    handles.append(oracle.enc_norm.register_forward_hook(hook("enc_norm")))
    handles.append(oracle.decoder_embed.register_forward_hook(hook("decoder_embed")))
    for i, blk in enumerate(oracle.dec_blocks):
        handles.append(blk.register_forward_hook(hook(f"dec_blocks_{i}")))
    for i, blk in enumerate(oracle.dec_blocks2):
        handles.append(blk.register_forward_hook(hook(f"dec_blocks2_{i}")))
    handles.append(oracle.dec_norm.register_forward_hook(hook("dec_norm")))
    with torch.no_grad():
        out = oracle(torch.from_numpy(img1.transpose(0, 3, 1, 2)),
                     torch.from_numpy(img2.transpose(0, 3, 1, 2)))
    for h in handles:
        h.remove()
    return acts, out


def capture_flax_activations(model, tree, img1, img2):
    """Run the Flax model with capture_intermediates; returns ({name:
    [np arrays per call]}, (pred1, pred2)). Names match the torch hooks."""
    import re

    wanted = re.compile(
        r"^(enc_blocks_\d+|dec_blocks2?_\d+|enc_norm|dec_norm|decoder_embed)$")

    def _filter(mdl, method):
        return (method == "__call__" and mdl.name is not None
                and bool(wanted.match(mdl.name)))

    (pred1, pred2), state = model.apply(
        {"params": tree}, img1, img2, capture_intermediates=_filter,
        mutable=["intermediates"])
    inter = state["intermediates"]
    acts: dict[str, list[np.ndarray]] = {}
    for name, sub in inter.items():
        if not isinstance(sub, dict) or "__call__" not in sub:
            continue
        outs = sub["__call__"]
        arrs = []
        for o in outs:
            if isinstance(o, tuple):  # patch_embed returns (tokens, grid)
                o = o[0]
            arrs.append(np.asarray(o))
        acts[name] = arrs
    return acts, (pred1, pred2)


def per_layer_drift(torch_acts, flax_acts):
    """{layer: (max_abs_delta, activation_scale)} over matching call indices.

    The flax model encodes both views in ONE batched pass while the torch
    oracle also concatenates (same layout), so arrays align directly; modules
    called twice (decoder_embed, dec_norm) compare call-by-call.
    """
    rows = {}
    for name, t_calls in sorted(torch_acts.items()):
        f_calls = flax_acts.get(name)
        if f_calls is None:
            continue
        deltas, scales = [], []
        for t, f in zip(t_calls, f_calls):
            if t.shape != f.shape:
                # torch dec_norm is called once on cat? no — guard anyway
                continue
            deltas.append(float(np.abs(t - f).max()))
            scales.append(float(np.abs(t).max()))
        if deltas:
            rows[name] = (max(deltas), max(scales))
    return rows
