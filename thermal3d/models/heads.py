"""Downstream heads: linear pointmap head, DPT head, MASt3R cat-MLP+DPT head.

Re-implementations (TPU/NHWC; DPT/catmlpdpt compute in the model dtype with
f32 regression activations — HeadConfig.dpt_dtype; the linear head is tiny
and always f32) of the dust3r/mast3r head zoo that the reference drives
through its external checkout:
  * linear head — DUSt3R-224 training/inference model
    (head_type='linear', thermal_dustr_model.py:36; keys `downstream_head*.proj`
    per model_info.py:296-300)
  * DPT regression head + MASt3R catmlpdpt metric head — pseudo-GT model
    (`MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric`, scripts/pseudo_gt.py:17-34)

Activation contract (dust3r postprocess):
  pts3d = unit(xyz) * expm1(|xyz|)        depth_mode ('exp', -inf, inf)
  conf  = 1 + exp(c)                      conf_mode  ('exp', 1, inf)
  desc  = x / |x|                         desc_mode  'norm'
The loss-side clamp at utils/loss.py:91-92 (conf in [1e-5, 10]) assumes this
conf >= 1 convention.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from thermal3d.core.config import HeadConfig


# ---------------------------------------------------------------------------
# postprocess activations
# ---------------------------------------------------------------------------

def reg_dense_pts3d(xyz: jnp.ndarray, mode=("exp", float("-inf"), float("inf"))) -> jnp.ndarray:
    """dust3r reg_dense_depth: direction * expm1(norm)."""
    kind, vmin, vmax = mode
    if kind != "exp":
        raise NotImplementedError(f"depth mode {kind}")
    d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    unit = xyz / jnp.clip(d, 1e-8)
    if vmin == float("-inf") and vmax == float("inf"):
        return unit * jnp.expm1(d)
    return unit * jnp.clip(jnp.expm1(d), vmin, vmax)


def reg_dense_conf(x: jnp.ndarray, mode=("exp", 1.0, float("inf"))) -> jnp.ndarray:
    """dust3r reg_dense_conf: vmin + min(exp(x), vmax - vmin)."""
    kind, vmin, vmax = mode
    if kind != "exp":
        raise NotImplementedError(f"conf mode {kind}")
    e = jnp.exp(x)
    if vmax != float("inf"):
        e = jnp.minimum(e, vmax - vmin)
    return vmin + e


def reg_desc(x: jnp.ndarray, mode: str = "norm") -> jnp.ndarray:
    if mode != "norm":
        raise NotImplementedError(f"desc mode {mode}")
    return x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)


def pixel_shuffle_tokens(feat: jnp.ndarray, grid: Tuple[int, int], p: int) -> jnp.ndarray:
    """[B, S, C*p*p] tokens → [B, h*p, w*p, C] image, matching
    torch `feat.transpose(-1,-2).view(B,-1,h,w)` + `F.pixel_shuffle(p)`:
    the per-token channel layout is (c, dy, dx)."""
    b, s, cpp = feat.shape
    h, w = grid
    c = cpp // (p * p)
    feat = feat.reshape(b, h, w, c, p, p)
    feat = feat.transpose(0, 1, 4, 2, 5, 3)  # b, h, dy, w, dx, c
    return feat.reshape(b, h * p, w * p, c)


# ---------------------------------------------------------------------------
# Linear head (dust3r heads/linear.py LinearPts3d)
# ---------------------------------------------------------------------------

class LinearPts3dHead(nn.Module):
    patch_size: int
    cfg: HeadConfig

    @nn.compact
    def __call__(self, dec_outputs: Sequence[jnp.ndarray], patch_grid: Tuple[int, int]):
        tokens = dec_outputs[-1].astype(jnp.float32)  # heads run in f32
        p = self.patch_size
        feat = nn.Dense(4 * p * p, dtype=jnp.float32, name="proj")(tokens)
        fmap = pixel_shuffle_tokens(feat, patch_grid, p)  # [B, H, W, 4]
        return {
            "pts3d": reg_dense_pts3d(fmap[..., 0:3], self.cfg.depth_mode),
            "conf": reg_dense_conf(fmap[..., 3], self.cfg.conf_mode),
        }


# ---------------------------------------------------------------------------
# DPT head (croco dpt_block.DPTOutputAdapter via dust3r PixelwiseTaskWithDPT)
# ---------------------------------------------------------------------------

class _ResidualConvUnit(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = nn.relu(x)
        out = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                      name="conv1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                      name="conv2")(out)
        return out + x


def _resize_bilinear(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with align_corners=True (torch Interpolate in DPT),
    as two small GEMMs (matmul-formulation resize, preprocess/resize.py) —
    the gather formulation it replaced moved ~4-5× the output bytes through
    HBM at the pyramid resolutions (up to 512×384×256); the interpolation
    matrices ride the MXU instead. f32 inputs use HIGHEST precision (exact
    to ~1e-7 vs the gather form); bf16 head compute uses DEFAULT, which
    rounds operands to bf16 exactly like the gather form's bf16 arithmetic.
    """
    import jax

    from thermal3d.preprocess.resize import resize_bilinear_hwc

    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    return resize_bilinear_hwc(x, out_hw, align_corners=True, precision=prec)


class _FeatureFusionBlock(nn.Module):
    """MiDaS FeatureFusionBlock_custom (deconv=False, bn=False, expand=False,
    align_corners=True). out_hw crops the 2× upsample to the next skip
    branch's spatial size — croco's DPTOutputAdapter crops path_4 to
    layer_3's shape, which matters when the patch grid is odd (e.g. the
    512×336 bucket → 21-row grid: act4_down emits ceil(h/2) rows and the
    2× upsample overshoots by one)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, out_hw=None):
        if skip is not None:
            x = x + _ResidualConvUnit(self.features, self.dtype,
                                      name="resConfUnit1")(skip)
        x = _ResidualConvUnit(self.features, self.dtype,
                              name="resConfUnit2")(x)
        b, h, w, c = x.shape
        x = _resize_bilinear(x, (2 * h, 2 * w))
        if out_hw is not None:
            x = x[:, :out_hw[0], :out_hw[1], :]
        x = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                    name="out_conv")(x)
        return x


class DPTHead(nn.Module):
    """DPT regression head over 4 hooked token sets.

    hooks (caller-supplied): [encoder_out, dec[2L/4], dec[3L/4], dec[L]],
    dims [enc_dim, dec_dim, dec_dim, dec_dim] (dust3r create_dpt_head).
    Produces [B, H, W, num_channels] at full image resolution.
    """

    cfg: HeadConfig
    num_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hooked_tokens: Sequence[jnp.ndarray], patch_grid: Tuple[int, int]):
        h, w = patch_grid
        fd = self.cfg.feature_dim
        dims = self.cfg.dpt_layer_dims
        dt = self.dtype

        def tokens_to_map(t):
            b, s, d = t.shape
            return t.astype(dt).reshape(b, h, w, d)

        t0, t1, t2, t3 = (tokens_to_map(t) for t in hooked_tokens)

        # act_*_postprocess: project + resample to pyramid scales
        l1 = nn.Conv(dims[0], (1, 1), dtype=dt, name="act1_proj")(t0)
        l1 = nn.ConvTranspose(
            dims[0], (4, 4), strides=(4, 4), padding="VALID", dtype=dt,
            name="act1_up"
        )(l1)  # ×4
        l2 = nn.Conv(dims[1], (1, 1), dtype=dt, name="act2_proj")(t1)
        l2 = nn.ConvTranspose(
            dims[1], (2, 2), strides=(2, 2), padding="VALID", dtype=dt,
            name="act2_up"
        )(l2)  # ×2
        l3 = nn.Conv(dims[2], (1, 1), dtype=dt, name="act3_proj")(t2)  # ×1
        l4 = nn.Conv(dims[3], (1, 1), dtype=dt, name="act4_proj")(t3)
        l4 = nn.Conv(dims[3], (3, 3), strides=(2, 2), padding=1, dtype=dt,
                     name="act4_down")(l4)  # ÷2

        # scratch.layer*_rn
        r1 = nn.Conv(fd, (3, 3), padding=1, use_bias=False, dtype=dt,
                     name="layer1_rn")(l1)
        r2 = nn.Conv(fd, (3, 3), padding=1, use_bias=False, dtype=dt,
                     name="layer2_rn")(l2)
        r3 = nn.Conv(fd, (3, 3), padding=1, use_bias=False, dtype=dt,
                     name="layer3_rn")(l3)
        r4 = nn.Conv(fd, (3, 3), padding=1, use_bias=False, dtype=dt,
                     name="layer4_rn")(l4)

        p4 = _FeatureFusionBlock(fd, dt, name="refinenet4")(
            r4, out_hw=r3.shape[1:3])
        p3 = _FeatureFusionBlock(fd, dt, name="refinenet3")(
            p4, r3, out_hw=r2.shape[1:3])
        p2 = _FeatureFusionBlock(fd, dt, name="refinenet2")(
            p3, r2, out_hw=r1.shape[1:3])
        p1 = _FeatureFusionBlock(fd, dt, name="refinenet1")(p2, r1)

        # output head: conv3x3 → ×2 upsample → conv3x3 → relu → conv1x1
        x = nn.Conv(fd // 2, (3, 3), padding=1, dtype=dt, name="head0")(p1)
        b, hh, ww, _ = x.shape
        x = _resize_bilinear(x, (2 * hh, 2 * ww))
        x = nn.Conv(self.cfg.last_dim, (3, 3), padding=1, dtype=dt,
                    name="head2")(x)
        x = nn.relu(x)
        x = nn.Conv(self.num_channels, (1, 1), dtype=dt, name="head4")(x)
        return x  # [B, H, W, num_channels]


class DPTPts3dHead(nn.Module):
    """PixelwiseTaskWithDPT: DPT → (pts3d, conf). (No patch_size: the DPT
    pyramid derives every resolution from the token grid.)"""

    cfg: HeadConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hooked_tokens: Sequence[jnp.ndarray], patch_grid: Tuple[int, int]):
        fmap = DPTHead(self.cfg, num_channels=4, dtype=self.dtype,
                       name="dpt")(hooked_tokens, patch_grid)
        fmap = fmap.astype(jnp.float32)  # regression activations in f32
        return {
            "pts3d": reg_dense_pts3d(fmap[..., 0:3], self.cfg.depth_mode),
            "conf": reg_dense_conf(fmap[..., 3], self.cfg.conf_mode),
        }


# ---------------------------------------------------------------------------
# MASt3R cat-MLP + DPT head (mast3r catmlp_dpt_head.Cat_MLP_LocalFeatures_DPT_Pts3d)
# ---------------------------------------------------------------------------

class CatMLPDPTHead(nn.Module):
    """DPT branch for pts3d/conf + MLP local-feature branch on cat(enc, dec).

    Used by the MASt3R-512 metric pseudo-GT model. The local-feature branch
    consumes [enc_out ‖ dec_out] tokens through a 1-hidden-layer MLP and
    pixel-shuffles to (desc, desc_conf) maps.
    """

    patch_size: int
    cfg: HeadConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hooked_tokens: Sequence[jnp.ndarray], patch_grid: Tuple[int, int],
                 enc_tokens: jnp.ndarray, dec_tokens: jnp.ndarray):
        out = DPTPts3dHead(self.cfg, dtype=self.dtype,
                           name="dpt_head")(hooked_tokens, patch_grid)
        p = self.patch_size
        dt = self.dtype
        cat = jnp.concatenate(
            [enc_tokens.astype(dt), dec_tokens.astype(dt)], axis=-1
        )
        idim = cat.shape[-1]
        ldim = self.cfg.local_feat_dim
        nout = (ldim + int(self.cfg.two_confs)) * p * p
        x = nn.Dense(int(self.cfg.desc_hidden_dim_factor * idim), dtype=dt,
                     name="mlp_fc1")(cat)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(nout, dtype=dt, name="mlp_fc2")(x)
        fmap = pixel_shuffle_tokens(x, patch_grid, p)  # [B, H, W, ldim(+1)]
        fmap = fmap.astype(jnp.float32)  # regression activations in f32
        out["desc"] = reg_desc(fmap[..., :ldim])
        if self.cfg.two_confs:
            out["desc_conf"] = reg_dense_conf(fmap[..., ldim], self.cfg.desc_conf_mode)
        else:
            # mast3r postprocess: with a single confidence the pointmap conf
            # doubles as the descriptor conf (desc_conf = conf)
            out["desc_conf"] = out["conf"]
        return out


def dpt_hook_indices(dec_depth: int) -> Tuple[int, int, int, int]:
    """dust3r create_dpt_head hooks: [0, 2L/4, 3L/4, L] into
    [encoder_out, dec_1..dec_L]."""
    return (0, dec_depth * 2 // 4, dec_depth * 3 // 4, dec_depth)
