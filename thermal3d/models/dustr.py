"""AsymmetricCroCo3DStereo — the DUSt3R/MASt3R two-view pointmap network, in Flax.

The reference imports this network from the external naver/dust3r checkout
(thermal_dustr_model.py:33) and configures it as ViT-L encoder (1024/24/16),
base dual decoder (768/8/12), patch 16, linear pts3d head, 224² input
(thermal_dustr_model.py:34-47). This module re-implements the architecture
TPU-first:

  * NHWC layout, static shapes, whole forward jittable;
  * both views batched through the shared encoder in ONE pass (the reference's
    patched `_encode_image` loop at thermal_dustr_model.py:67-74 runs per view);
  * attention through the fused Pallas kernel on TPU;
  * heads computed in f32 (the reference disables autocast for heads).

I/O contract (consumed all over the reference, e.g.
thermal_dustr_inference.py:103-121, train_thermal_dustr.py:192-223):
  model(img1, img2) -> (pred1, pred2)
  pred1 = {"pts3d": [B,H,W,3], "conf": [B,H,W]}
  pred2 = {"pts3d_in_other_view": [B,H,W,3], "conf": [B,H,W]}
MASt3R configs add "desc" [B,H,W,24] and "desc_conf" [B,H,W].
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from thermal3d.core.config import DustrModelConfig
from thermal3d.models.heads import (
    CatMLPDPTHead,
    DPTPts3dHead,
    LinearPts3dHead,
    dpt_hook_indices,
)
from thermal3d.models.layers import (DecoderBlock, EncoderBlock, PatchEmbed,
                                     QuantDense)
from thermal3d.models.rope import make_grid_positions


class _EncScanBody(nn.Module):
    """lax.scan body for one encoder block (params stacked on axis 0)."""

    num_heads: int
    mlp_ratio: float
    rope_base: float
    dtype: jnp.dtype
    attention_impl: str
    remat: bool

    @nn.compact
    def __call__(self, x, pos):
        cls = nn.remat(EncoderBlock) if self.remat else EncoderBlock
        x = cls(self.num_heads, self.mlp_ratio, self.rope_base, self.dtype,
                self.attention_impl, name="blk")(x, pos)
        return x, ()


class _DecScanBody(nn.Module):
    """lax.scan body for one dual-decoder layer pair: blk1 attends view1 to
    view2's PREVIOUS tokens and blk2 vice versa (croco interleaving —
    dustr.decode's unrolled loop). Emits both views' tokens as scan outputs
    so the DPT heads can hook intermediate layers."""

    num_heads: int
    mlp_ratio: float
    rope_base: float
    dtype: jnp.dtype
    attention_impl: str
    remat: bool

    @nn.compact
    def __call__(self, carry, pos):
        x1, x2 = carry
        cls = nn.remat(DecoderBlock) if self.remat else DecoderBlock
        nx1 = cls(self.num_heads, self.mlp_ratio, self.rope_base, self.dtype,
                  self.attention_impl, name="blk1")(x1, x2, pos, None)
        nx2 = cls(self.num_heads, self.mlp_ratio, self.rope_base, self.dtype,
                  self.attention_impl, name="blk2")(x2, x1, pos, None)
        return (nx1, nx2), (nx1, nx2)


class AsymmetricCroCo3DStereo(nn.Module):
    config: DustrModelConfig

    def setup(self):
        cfg = self.config
        dt = cfg.dtype
        enc_cls = nn.remat(EncoderBlock) if cfg.remat else EncoderBlock
        dec_cls = nn.remat(DecoderBlock) if cfg.remat else DecoderBlock
        self.patch_embed = PatchEmbed(cfg.patch_size, cfg.enc_embed_dim, dt, name="patch_embed")
        if cfg.branch_batch and cfg.scan_layers:
            raise ValueError("branch_batch and scan_layers are mutually "
                             "exclusive (pick one param layout)")
        if cfg.branch_batch:
            # both decoder branches as ONE vmapped block per layer: params
            # stacked [2, ...] (blk1, blk2), tokens stacked [2, B, S, C] —
            # every Dense lowers to a single batched dot_general and every
            # attention to a single 2B-batch dispatch, halving launches in
            # the launch-bound S=196 complex (VERDICT r3 next-#3)
            DualBlock = nn.vmap(
                dec_cls,
                variable_axes={"params": 0, "quant": 0, "calib": 0},
                split_rngs={"params": True},
                in_axes=(0, 0, None, None),
            )
            self.dec_dual = [
                DualBlock(cfg.dec_num_heads, cfg.mlp_ratio, cfg.rope_base,
                          dt, cfg.attention_impl, name=f"dec_dual_{i}")
                for i in range(cfg.dec_depth)
            ]
        if cfg.scan_layers:
            scan_kw = dict(variable_axes={"params": 0, "quant": 0,
                                          "calib": 0},
                           split_rngs={"params": True}, in_axes=nn.broadcast)
            EncScan = nn.scan(_EncScanBody, length=cfg.enc_depth, **scan_kw)
            DecScan = nn.scan(_DecScanBody, length=cfg.dec_depth, **scan_kw)
            self.enc_scan = EncScan(
                cfg.enc_num_heads, cfg.mlp_ratio, cfg.rope_base, dt,
                cfg.attention_impl, cfg.remat, name="enc_scan")
            self.dec_scan = DecScan(
                cfg.dec_num_heads, cfg.mlp_ratio, cfg.rope_base, dt,
                cfg.attention_impl, cfg.remat, name="dec_scan")
        else:
            self.enc_blocks = [
                enc_cls(
                    cfg.enc_num_heads, cfg.mlp_ratio, cfg.rope_base, dt, cfg.attention_impl,
                    name=f"enc_blocks_{i}",
                )
                for i in range(cfg.enc_depth)
            ]
            if not cfg.branch_batch:
                self.dec_blocks = [
                    dec_cls(
                        cfg.dec_num_heads, cfg.mlp_ratio, cfg.rope_base, dt, cfg.attention_impl,
                        name=f"dec_blocks_{i}",
                    )
                    for i in range(cfg.dec_depth)
                ]
                self.dec_blocks2 = [
                    dec_cls(
                        cfg.dec_num_heads, cfg.mlp_ratio, cfg.rope_base, dt, cfg.attention_impl,
                        name=f"dec_blocks2_{i}",
                    )
                    for i in range(cfg.dec_depth)
                ]
        self.enc_norm = nn.LayerNorm(epsilon=1e-6, dtype=dt, name="enc_norm")
        self.decoder_embed = QuantDense(cfg.dec_embed_dim, dtype=dt, name="decoder_embed")
        self.dec_norm = nn.LayerNorm(epsilon=1e-6, dtype=dt, name="dec_norm")

        head_type = cfg.head.head_type
        # DPT/catmlpdpt head compute dtype: 'compute' follows the model
        # compute dtype (bf16 → MXU-native convs; the f32-pinned head was
        # 48% of the 512 pseudo-GT step at 17% MFU — docs/PERF.md round-4
        # MFU section). Regression activations stay f32 inside the heads.
        if cfg.head.dpt_dtype == "compute":
            dt_head = dt
        elif cfg.head.dpt_dtype == "float32":
            dt_head = jnp.float32
        else:
            raise ValueError(f"unknown head dpt_dtype {cfg.head.dpt_dtype}")
        if head_type == "linear":
            self.head1 = LinearPts3dHead(cfg.patch_size, cfg.head, name="downstream_head1")
            self.head2 = LinearPts3dHead(cfg.patch_size, cfg.head, name="downstream_head2")
        elif head_type == "dpt":
            self.head1 = DPTPts3dHead(cfg.head, dtype=dt_head,
                                      name="downstream_head1")
            self.head2 = DPTPts3dHead(cfg.head, dtype=dt_head,
                                      name="downstream_head2")
        elif head_type == "catmlpdpt":
            self.head1 = CatMLPDPTHead(cfg.patch_size, cfg.head, dtype=dt_head,
                                       name="downstream_head1")
            self.head2 = CatMLPDPTHead(cfg.patch_size, cfg.head, dtype=dt_head,
                                       name="downstream_head2")
        else:
            raise ValueError(f"unknown head_type {head_type}")

    def encode(self, img: jnp.ndarray):
        """Encode one (possibly stacked) image batch. img: [B, H, W, 3]."""
        x, grid = self.patch_embed(img.astype(self.config.dtype))
        pos = make_grid_positions(*grid)
        if self.config.scan_layers:
            x, _ = self.enc_scan(x, pos)
        else:
            for blk in self.enc_blocks:
                x = blk(x, pos)
        x = self.enc_norm(x)
        return x, pos, grid

    def decode(self, f1: jnp.ndarray, f2: jnp.ndarray, pos: jnp.ndarray):
        """Dual-branch decoder. Returns per-view lists of hook tokens:
        [encoder_out, dec_1, ..., dec_L(dec_norm'ed)] (croco _decoder layout
        after its duplicate-removal: final_output[1] is dropped)."""
        outs1 = [f1]
        outs2 = [f2]
        x1 = self.decoder_embed(f1)
        x2 = self.decoder_embed(f2)
        if self.config.branch_batch:
            # tokens stacked on a leading branch axis; the "other view" each
            # branch cross-attends to is the opposite branch's PREVIOUS
            # tokens — exactly x flipped on the branch axis (croco
            # interleaving preserved)
            x = jnp.stack([x1, x2])  # [2, B, S, C]
            for blk in self.dec_dual:
                x = blk(x, x[::-1], pos, None)
                outs1.append(x[0])
                outs2.append(x[1])
        elif self.config.scan_layers:
            _, (ys1, ys2) = self.dec_scan((x1, x2), pos)
            # ys: [L, B, S, C] stacked per-layer outputs → same hook list the
            # unrolled loop builds (DPT heads index into it)
            outs1 += [ys1[i] for i in range(self.config.dec_depth)]
            outs2 += [ys2[i] for i in range(self.config.dec_depth)]
        else:
            for blk1, blk2 in zip(self.dec_blocks, self.dec_blocks2):
                # ypos=None: shared patch grid (remat-safe fused-dispatch signal)
                nx1 = blk1(x1, x2, pos, None)
                nx2 = blk2(x2, x1, pos, None)
                x1, x2 = nx1, nx2
                outs1.append(x1)
                outs2.append(x2)
        outs1[-1] = self.dec_norm(outs1[-1])
        outs2[-1] = self.dec_norm(outs2[-1])
        return outs1, outs2

    def _run_head(self, head, outs, grid):
        cfg = self.config
        outs_f32 = [t.astype(jnp.float32) for t in outs]
        if cfg.head.head_type == "linear":
            return head(outs_f32, grid)
        hooks = dpt_hook_indices(cfg.dec_depth)
        hooked = [outs_f32[i] for i in hooks]
        if cfg.head.head_type == "dpt":
            return head(hooked, grid)
        return head(hooked, grid, outs_f32[0], outs_f32[-1])

    def decode_with_heads(self, f1: jnp.ndarray, f2: jnp.ndarray,
                          pos: jnp.ndarray, grid: Tuple[int, int]
                          ) -> Tuple[Dict, Dict]:
        """Decoder + heads as a standalone apply-method: lets callers split
        the forward into two compiled programs (encoder / rest), halving the
        largest single XLA compile — the knob that gets the MASt3R-512
        program through slow-compile environments (bench.py --split). Same
        numerics as __call__ after encode()."""
        outs1, outs2 = self.decode(f1, f2, pos)
        res1 = self._run_head(self.head1, outs1, grid)
        res2 = self._run_head(self.head2, outs2, grid)
        pred2 = dict(res2)
        pred2["pts3d_in_other_view"] = pred2.pop("pts3d")
        return res1, pred2

    def __call__(self, img1: jnp.ndarray, img2: Optional[jnp.ndarray] = None
                 ) -> Tuple[Dict, Dict]:
        """img1/img2: [B, H, W, 3] in [0, 1] (the reference feeds [0,1] thermal
        frames straight into the network — no (-1,1) renorm in its pipeline).

        img2=None → monocular mode (view2 = view1,
        thermal_dustr_inference.py:87-92): the shared encoder runs ONCE — the
        reference encodes the identical image twice; skipping the duplicate
        halves encoder FLOPs on the serving path."""
        b = img1.shape[0]
        if img2 is None:
            f1, pos, grid = self.encode(img1)
            f2 = f1
        else:
            # encode both views in a single batched pass (shared weights)
            feats, pos, grid = self.encode(jnp.concatenate([img1, img2], axis=0))
            f1, f2 = feats[:b], feats[b:]
        return self.decode_with_heads(f1, f2, pos, grid)
