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
    parser.add_argument("--scan_layers", action="store_true",
                        help="roll the transformer stacks into lax.scan: "
                             "identical numerics, ~10x smaller compiled "
                             "program (fast first-compile for the 512 "
                             "models; see DustrModelConfig.scan_layers)")
    return parser


def apply_scan(config: DustrModelConfig, params, scan_layers: bool):
    """Apply --scan_layers: flip the config and restack converted
    (checkpoint-native, unrolled) params into the scan layout."""
    if not scan_layers:
        return config, params
    config = dataclasses.replace(config, scan_layers=True)
    if params is not None:
        from thermal3d.models.scan_params import to_scan_params

        params = to_scan_params(params, config)
    return config, params


def make_dp_mesh(ndev: int, batch_size: int, error):
    """Shared --ndev plumbing for the infer/evaluate/pseudo_gt CLIs: validate
    divisibility + device count, build the 1-D data mesh over the first N
    local devices. Returns None for ndev <= 1. `error` is the parser's
    .error (exits with usage)."""
    if ndev <= 1:
        return None
    if batch_size % ndev:
        error(f"--batch_size {batch_size} must be a multiple of --ndev {ndev}")
    import jax

    from thermal3d.core.mesh import make_mesh

    devs = jax.devices()
    if len(devs) < ndev:
        error(f"--ndev={ndev} but only {len(devs)} devices available")
    return make_mesh((ndev,), ("data",), devices=devs[:ndev])
