"""Configuration dataclasses for thermal3d.

Every hard-coded constant of the reference is promoted to a named config field
with the reference value as default (see SURVEY.md §5 "Config / flag system").

Reference parity notes (citations into /root/reference):
  * DUSt3R-224 model hyperparameters: thermal_dustr_model.py:34-47
  * Freiburg fixed thermal range 21800..25000: utils/preprocessing.py:53-54
  * Loss constants (alpha=0.2, thermal_factor=8, huber_delta=0.1, clamps):
    utils/loss.py:75-305, train_thermal_dustr.py:310
  * Optimizer/schedule defaults: train_thermal_dustr.py:25-58,91-118
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp

# Freiburg thermal camera raw-count normalization window
# (reference: utils/preprocessing.py:53-54, utils/visualize.py:347)
FREIBURG_RAW_MIN = 21800
FREIBURG_RAW_MAX = 25000
# Visualization-only upper bound used by the reference IR colormap
# (utils/visualize.py:577-596)
FREIBURG_VIZ_MAX = 23700


@dataclasses.dataclass(frozen=True)
class HeadConfig:
    """Downstream head configuration.

    head_type 'linear' reproduces dust3r's LinearPts3d (proj + pixel-shuffle),
    'dpt' reproduces the DPT regression head, 'catmlpdpt' the MASt3R head that
    concatenates encoder+decoder tokens into an MLP local-feature branch on top
    of the DPT pts3d branch.
    """

    head_type: str = "linear"  # 'linear' | 'dpt' | 'catmlpdpt'
    # activation modes, mirroring dust3r postprocess:
    #   pts3d = unit(x) * expm1(|x|)   ('exp', -inf, inf)
    #   conf  = 1 + exp(c)             ('exp', 1, inf)
    depth_mode: Tuple[str, float, float] = ("exp", float("-inf"), float("inf"))
    conf_mode: Tuple[str, float, float] = ("exp", 1.0, float("inf"))
    # DPT-specific
    feature_dim: int = 256
    last_dim: int = 128
    dpt_layer_dims: Tuple[int, int, int, int] = (96, 192, 384, 768)
    # MASt3R catmlpdpt-specific
    local_feat_dim: int = 24
    desc_conf_mode: Tuple[str, float, float] = ("exp", 0.0, float("inf"))
    two_confs: bool = True
    desc_hidden_dim_factor: float = 4.0
    # DPT/catmlpdpt head compute dtype: 'compute' follows the model compute
    # dtype (bf16 in production — the conv pyramid + desc MLP hit the MXU's
    # native bf16 path; the head stage was 48% of the 512 pseudo-GT step at
    # 17% MFU when pinned f32 — docs/PERF.md round-4 MFU section);
    # 'float32' pins the whole head in f32 (pre-round-4 behavior). The final
    # regression activations (expm1/exp/normalize) are f32 either way, and
    # the linear head is tiny and always f32.
    dpt_dtype: str = "compute"  # 'compute' | 'float32'


@dataclasses.dataclass(frozen=True)
class DustrModelConfig:
    """AsymmetricCroCo3DStereo architecture (thermal_dustr_model.py:34-47)."""

    img_size: Tuple[int, int] = (224, 224)
    patch_size: int = 16
    in_channels: int = 3
    enc_embed_dim: int = 1024
    enc_depth: int = 24
    enc_num_heads: int = 16
    dec_embed_dim: int = 768
    dec_depth: int = 8
    dec_num_heads: int = 12
    mlp_ratio: float = 4.0
    rope_base: float = 100.0  # croco 'RoPE100' positional encoding
    head: HeadConfig = dataclasses.field(default_factory=HeadConfig)
    output_mode: str = "pts3d"
    landscape_only: bool = False
    # numerics
    compute_dtype: str = "float32"  # 'float32' | 'bfloat16'
    attention_impl: str = "auto"  # 'auto' | 'pallas' | 'xla'
    # rematerialize transformer blocks in the backward pass (trade FLOPs for
    # HBM — lets bigger per-chip batches train at ViT-L scale)
    remat: bool = False
    # roll the encoder / dual-decoder layer stacks into lax.scan over stacked
    # per-layer params: the compiled HLO contains ONE block body instead of
    # 24+12+12 unrolled copies, cutting XLA compile time by ~an order of
    # magnitude (the lever that makes the MASt3R-512 program compile through
    # this harness's slow relay). Numerics identical (tests/test_scan.py);
    # param trees convert with models.scan_params.{to,from}_scan_params.
    # Not combined with tensor parallelism (stacked kernels are rank-3; the
    # 'model'-axis partition specs in core/mesh.py only cover rank-2).
    scan_layers: bool = False
    # branch-batched dual decoder: evaluate the two decoder branches
    # (dec_blocks / dec_blocks2 — the per-view stacks the reference's model
    # dispatches separately every layer, scripts/model_info.py:209,296-300)
    # as ONE 2×-batch dispatch per attention/MLP via nn.vmap over stacked
    # branch params [2, ...]. Halves kernel launches in the launch-bound
    # S=196 serving regime (docs/PERF.md round-4 measurement). Param trees
    # convert with models.scan_params.{to,from}_branch_params. Mutually
    # exclusive with scan_layers.
    branch_batch: bool = False

    @property
    def patch_grid(self) -> Tuple[int, int]:
        return (self.img_size[0] // self.patch_size, self.img_size[1] // self.patch_size)

    @property
    def num_patches(self) -> int:
        h, w = self.patch_grid
        return h * w

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


# The exact model the reference fine-tunes (thermal_dustr_model.py:34-47).
# NOTE: the reference builds an 8-block decoder and loads the official 12-block
# checkpoint with strict=False, silently dropping dec blocks 8..11 — we keep
# dec_depth=8 to match that behavior bit-for-bit.
DUSTR_224_LINEAR = DustrModelConfig()

# The frozen pseudo-GT model (scripts/pseudo_gt.py:17-34):
# MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric — ViT-L encoder, 12-block
# base decoder, 512 input, catmlpdpt metric head with two confidences.
MASTR_512_CATMLPDPT = DustrModelConfig(
    img_size=(512, 512),
    dec_depth=12,
    head=HeadConfig(
        head_type="catmlpdpt",
        local_feat_dim=24,
        two_confs=True,
    ),
)

# The released DUSt3R-512 DPT variant (DUSt3R_ViTLarge_BaseDecoder_512_dpt
# .pth) — not driven by any reference script (the reference fine-tunes the
# 224-linear model and uses MASt3R for pseudo-GT), but part of the model
# family a DUSt3R user expects; same 12-block decoder, plain DPT pts3d head.
DUSTR_512_DPT = DustrModelConfig(
    img_size=(512, 512),
    dec_depth=12,
    head=HeadConfig(head_type="dpt"),
)


@dataclasses.dataclass(frozen=True)
class PreprocessConfig:
    """Thermal preprocessing knobs (utils/preprocessing.py)."""

    percentile_low: float = 2.0  # preprocessing.py:22
    percentile_high: float = 98.0
    raw_min: int = FREIBURG_RAW_MIN
    raw_max: int = FREIBURG_RAW_MAX
    uint16_scale: float = 65535.0
    # ThermalDUSt3R wrapper init values (thermal_dustr_model.py:104-107)
    edge_weight_init: float = 0.5
    temp_scale_init: float = 1.0
    # fire-scene CLAHE (thermal_dustr_inference_for_experiment.py:83)
    clahe_clip_limit: float = 3.0
    clahe_grid: Tuple[int, int] = (8, 8)
    fire_mask_threshold: float = 0.7


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Thermal-aware loss constants (utils/loss.py)."""

    alpha: float = 0.2  # log-conf regularizer (loss.py:76; train:310)
    conf_clamp_min: float = 1e-5  # loss.py:91
    conf_clamp_max: float = 10.0
    edge_weight: float = 0.5  # loss.py:7,103
    smoothness_weight: float = 0.3
    detail_weight: float = 0.3
    multi_scale: bool = True
    scales: Tuple[int, ...] = (1, 2)  # loss.py:133
    thermal_factor: float = 8.0  # loss.py:252
    grad_clamp_view1: float = 0.4  # asymmetric clamp (loss.py:253-256)
    grad_clamp_view2: float = 0.5
    huber_delta: float = 0.1  # loss.py:267
    grad_norm_eps: float = 1e-5  # loss.py:240


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (train_thermal_dustr.py:25-58,91-118)."""

    lr: float = 5e-4
    weight_decay: float = 1e-4
    epochs: int = 50
    batch_size: int = 4
    warmup_frac: float = 0.1  # LinearLR over 10% of epochs (train:101-104)
    warmup_start_factor: float = 0.1
    eta_min: float = 1e-7  # cosine floor (train:108)
    grad_clip_norm: float = 1.0  # train:361
    early_stop_patience: int = 10  # train:124
    accumulation_steps: int = 1
    # run AdamW over ONE flat parameter vector (optax.flatten) instead of
    # ~600 per-leaf updates — trades a grad concat/unflatten for the
    # small-op overhead the train profile shows (docs/PERF.md round 3)
    flatten_optimizer: bool = False
    # AdamW first-moment dtype: 'bfloat16' halves the m-buffer HBM bytes
    # (~1.2 GB at ViT-L f32) against the per-leaf update DMA the round-3
    # train profile measured; None keeps optax's default (param dtype, f32).
    # The second moment stays f32 (bf16 v loses too much precision around
    # eps). Opt-in measurement lever — bench.py --train --mu-bf16.
    mu_dtype: Optional[str] = None
    use_enhanced_loss: bool = True
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    seed: int = 0
    val_fraction: float = 0.2  # 0.8/0.2 random split (train:78-81)
    log_interval: int = 100
    max_batches: Optional[int] = None  # quick-test cap (train:56-57)
    # sharding
    mesh_shape: Tuple[int, ...] = (-1,)
    mesh_axes: Tuple[str, ...] = ("data",)
    # ZeRO-1: shard the AdamW mu/nu (and grad-accumulation) buffers over the
    # 'data' mesh axis — per-chip optimizer HBM drops by the DP size (~2.4 GB
    # f32 moments at ViT-L → 300 MB on an 8-chip slice); XLA rewrites the
    # grad all-reduce + update into reduce-scatter → shard update →
    # all-gather (core/mesh.py). Params stay replicated (it's ZeRO-1, not 3).
    zero1: bool = False


def steps_for_schedule(cfg: TrainConfig, steps_per_epoch: int) -> Tuple[int, int]:
    """(warmup_steps, total_steps) mirroring SequentialLR(LinearLR, Cosine)."""
    total = cfg.epochs * steps_per_epoch
    warmup = max(1, int(cfg.warmup_frac * cfg.epochs) * steps_per_epoch)
    return warmup, total
