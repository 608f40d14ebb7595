"""Param-tree adapters between the unrolled and scan_layers model layouts.

The unrolled model (checkpoint-native layout, matching the PyTorch key
structure via convert/torch_to_flax.py) stores per-layer subtrees
`enc_blocks_{i}`, `dec_blocks_{i}`, `dec_blocks2_{i}`. The scan_layers model
(core/config.py::DustrModelConfig.scan_layers) stores the same tensors
stacked on a leading depth axis under `enc_scan/blk`, `dec_scan/blk1`,
`dec_scan/blk2`. These adapters convert between the two so one converted
checkpoint serves both; numerics are identical (tests/test_scan.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from thermal3d.core.config import DustrModelConfig


def _stack(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def _unstack(tree, depth):
    return [jax.tree_util.tree_map(lambda x: x[i], tree) for i in range(depth)]


def to_scan_params(params: dict, cfg: DustrModelConfig) -> dict:
    """Unrolled layout → scan layout (stacked leading depth axis)."""
    layer_keys = {f"enc_blocks_{i}" for i in range(cfg.enc_depth)}
    layer_keys |= {f"dec_blocks_{i}" for i in range(cfg.dec_depth)}
    layer_keys |= {f"dec_blocks2_{i}" for i in range(cfg.dec_depth)}
    missing = layer_keys - set(params)
    if missing:
        raise ValueError(f"params missing layer subtrees: {sorted(missing)}")
    out = {k: v for k, v in params.items() if k not in layer_keys}
    out["enc_scan"] = {"blk": _stack(
        [params[f"enc_blocks_{i}"] for i in range(cfg.enc_depth)])}
    out["dec_scan"] = {
        "blk1": _stack([params[f"dec_blocks_{i}"] for i in range(cfg.dec_depth)]),
        "blk2": _stack([params[f"dec_blocks2_{i}"] for i in range(cfg.dec_depth)]),
    }
    return out


def to_branch_params(params: dict, cfg: DustrModelConfig) -> dict:
    """Unrolled layout → branch-batched layout: each layer's (dec_blocks_i,
    dec_blocks2_i) pair stacked on a leading axis of 2 under `dec_dual_i`
    (config.branch_batch — one vmapped dispatch serves both decoder
    branches). Encoder blocks and everything else pass through unchanged."""
    layer_keys = {f"dec_blocks_{i}" for i in range(cfg.dec_depth)}
    layer_keys |= {f"dec_blocks2_{i}" for i in range(cfg.dec_depth)}
    missing = layer_keys - set(params)
    if missing:
        raise ValueError(f"params missing layer subtrees: {sorted(missing)}")
    out = {k: v for k, v in params.items() if k not in layer_keys}
    for i in range(cfg.dec_depth):
        out[f"dec_dual_{i}"] = _stack(
            [params[f"dec_blocks_{i}"], params[f"dec_blocks2_{i}"]])
    return out


def from_branch_params(params: dict, cfg: DustrModelConfig) -> dict:
    """Branch-batched layout → unrolled (checkpoint-native) layout."""
    if "dec_dual_0" not in params:
        raise ValueError("params are not in branch layout (no dec_dual_0)")
    out = {k: v for k, v in params.items()
           if not k.startswith("dec_dual_")}
    for i in range(cfg.dec_depth):
        b1, b2 = _unstack(params[f"dec_dual_{i}"], 2)
        out[f"dec_blocks_{i}"] = b1
        out[f"dec_blocks2_{i}"] = b2
    return out


def from_scan_params(params: dict, cfg: DustrModelConfig) -> dict:
    """Scan layout → unrolled (checkpoint-native) layout."""
    if "enc_scan" not in params or "dec_scan" not in params:
        raise ValueError("params are not in scan layout (no enc_scan/dec_scan)")
    out = {k: v for k, v in params.items() if k not in ("enc_scan", "dec_scan")}
    for i, t in enumerate(_unstack(params["enc_scan"]["blk"], cfg.enc_depth)):
        out[f"enc_blocks_{i}"] = t
    for i, t in enumerate(_unstack(params["dec_scan"]["blk1"], cfg.dec_depth)):
        out[f"dec_blocks_{i}"] = t
    for i, t in enumerate(_unstack(params["dec_scan"]["blk2"], cfg.dec_depth)):
        out[f"dec_blocks2_{i}"] = t
    return out
