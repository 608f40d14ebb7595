"""Shared CLI helpers: model presets and smoke-test sizing.

`--model_preset tiny` shrinks the architecture for CPU smoke runs — the
framework's analogue of the reference's quick-test affordances
(--max_batches, run_test_preprocessing.sh).
"""

from __future__ import annotations

import dataclasses

from thermal3d.core.config import DustrModelConfig, HeadConfig


def apply_preset(base: DustrModelConfig, preset: str, img_size, compute_dtype: str
                 ) -> DustrModelConfig:
    if preset == "tiny":
        return dataclasses.replace(
            base,
            img_size=tuple(img_size),
            compute_dtype=compute_dtype,
            enc_embed_dim=64, enc_depth=2, enc_num_heads=2,
            dec_embed_dim=48, dec_depth=2, dec_num_heads=2,
            head=dataclasses.replace(
                base.head, feature_dim=32, last_dim=16,
                dpt_layer_dims=(8, 16, 24, 32), local_feat_dim=6)
            if base.head.head_type != "linear" else base.head,
        )
    return dataclasses.replace(base, img_size=tuple(img_size),
                               compute_dtype=compute_dtype)


def add_preset_flag(parser):
    parser.add_argument("--model_preset", type=str, default="full",
                        choices=["full", "tiny"],
                        help="'tiny' shrinks the model for smoke tests")
    return parser
