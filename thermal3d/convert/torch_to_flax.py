"""PyTorch .pth → Flax parameter-tree converter for the DUSt3R/MASt3R family.

The reference fine-tunes `DUSt3R_ViTLarge_BaseDecoder_224_linear.pth` and runs
`MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth` frozen
(run_train_thermal_dustr.sh:9, scripts/pseudo_gt.py:17). This module converts
those checkpoints (and ThermalDUSt3R fine-tuned ones,
thermal_dustr_model.py:191-200) into thermal3d's param pytree.

Key-layout evidence: scripts/model_info.py:209,228-261,296-300 (patch_embed.
proj, enc_blocks.N.attn.qkv, dec_blocks/dec_blocks2, norm_y/cross_attn,
downstream_head*). Value mappings (verified numerically in
tests/test_convert.py):
  Linear  w[out,in]            → kernel = w.T
  Conv2d  w[out,in,kh,kw]      → kernel = w.transpose(2,3,1,0)
  ConvT2d w[in,out,kh,kw]      → kernel = w.transpose(2,3,0,1)[::-1,::-1]
  LayerNorm weight/bias        → scale/bias

Checkpoint container layouts handled like thermal_dustr_model.py:49-56 and
:180-185: {'model': …}, {'state_dict': …}, raw; a leading 'model.' prefix
(ThermalDUSt3R wrapper) is honored, and 'edge_weight'/'temp_scale' map into
the thermal_preprocess head.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np

from thermal3d.core.config import DustrModelConfig


def _t(w: np.ndarray) -> np.ndarray:  # Linear
    return np.ascontiguousarray(w.T)


def _conv(w: np.ndarray) -> np.ndarray:  # Conv2d
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _convT(w: np.ndarray) -> np.ndarray:  # ConvTranspose2d
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1)[::-1, ::-1])


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


_LINEAR_LEAVES = {"qkv", "proj", "projq", "projk", "projv", "fc1", "fc2"}


def _map_block(prefix_parts, leaf, kind, value):
    """Map one torch tensor inside an encoder/decoder block to (path, array)."""
    *mods, last = prefix_parts
    name = ".".join(mods)
    # norms
    if mods and mods[-1].startswith("norm"):
        return tuple(mods) + ({"weight": "scale", "bias": "bias"}[leaf],), value
    if mods and mods[-1] in _LINEAR_LEAVES:
        arr = _t(value) if leaf == "weight" else value
        return tuple(mods) + ({"weight": "kernel", "bias": "bias"}[leaf],), arr
    return None


def _dpt_path(rest: str, leaf: str, value: np.ndarray):
    """Map 'dpt.<...>' torch subkeys to the flax DPTHead layout."""
    kindmap_actpost = {  # act_postprocess.{i}.{j}
        ("0", "0"): ("act1_proj", _conv),
        ("0", "1"): ("act1_up", _convT),
        ("1", "0"): ("act2_proj", _conv),
        ("1", "1"): ("act2_up", _convT),
        ("2", "0"): ("act3_proj", _conv),
        ("3", "0"): ("act4_proj", _conv),
        ("3", "1"): ("act4_down", _conv),
    }
    parts = rest.split(".")
    wb = {"weight": "kernel", "bias": "bias"}[leaf]
    if parts[0] == "act_postprocess":
        name, fn = kindmap_actpost[(parts[1], parts[2])]
        return (name, wb), fn(value) if leaf == "weight" else value
    if parts[0] == "scratch":
        if parts[1].endswith("_rn"):  # layer{i}_rn conv3x3 no-bias
            return (parts[1], wb), _conv(value) if leaf == "weight" else value
        if parts[1] == "refinenet4" and parts[2] == "resConfUnit1":
            # refinenet4 receives no skip input, so its resConfUnit1 is dead
            # weight in the torch checkpoint too — drop it.
            return "skip", None
        if parts[1].startswith("refinenet"):
            sub = parts[2]
            if sub == "out_conv":
                return (parts[1], "out_conv", wb), _conv(value) if leaf == "weight" else value
            # resConfUnit{1,2}.conv{1,2}
            return (parts[1], sub, parts[3], wb), _conv(value) if leaf == "weight" else value
    if parts[0] == "head":
        name = {"0": "head0", "2": "head2", "4": "head4"}[parts[1]]
        return (name, wb), _conv(value) if leaf == "weight" else value
    return None


def _head_path(rest: str, leaf: str, value: np.ndarray, head_type: str):
    wb = {"weight": "kernel", "bias": "bias"}[leaf]
    if head_type == "linear":
        if rest == "proj":
            return ("proj", wb), _t(value) if leaf == "weight" else value
        return None
    if rest.startswith("dpt."):
        mapped = _dpt_path(rest[len("dpt."):], leaf, value)
        if mapped is None or mapped[0] == "skip":
            return mapped
        path, arr = mapped
        if head_type == "catmlpdpt":
            return ("dpt_head", "dpt") + path, arr
        return ("dpt",) + path, arr
    if head_type == "catmlpdpt" and rest.startswith("head_local_features."):
        sub = rest.split(".")[1]
        name = {"fc1": "mlp_fc1", "fc2": "mlp_fc2"}[sub]
        return (name, wb), _t(value) if leaf == "weight" else value
    return None


def convert_state_dict(
    state: Dict[str, np.ndarray],
    config: DustrModelConfig,
    wrapper: bool = False,
    strict: bool = False,
) -> Tuple[Dict, Dict[str, list]]:
    """Convert a torch state dict (tensor or ndarray values) to a flax
    params tree for AsymmetricCroCo3DStereo (or ThermalDUSt3R if wrapper).

    Returns (params_tree, report) where report lists 'converted', 'skipped'
    (known-irrelevant: buffers, croco mask_token, out-of-depth blocks — the
    reference loads non-strict, thermal_dustr_model.py:51), and 'unknown'.

    strict=True fails loudly with an actionable diff when the checkpoint
    contains keys the converter does not understand ('unknown') or lacks
    tensors the model requires — the guard for real released checkpoints,
    whose key families (croco mask_token, 12-deep decoder stacks, both
    downstream_head naming families) are enumerated by
    released_checkpoint_keys()."""
    head_type = config.head.head_type
    tree: Dict = {}
    report = {"converted": [], "skipped": [], "unknown": []}

    def to_np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    for key, raw in state.items():
        value = to_np(raw).astype(np.float32)
        k = key
        dest_prefix: Tuple[str, ...] = ()
        if wrapper:
            if k in ("edge_weight", "temp_scale"):
                _set(tree, ("thermal_preprocess", k), value.reshape(()))
                report["converted"].append(key)
                continue
            if k in ("sobel_x", "sobel_y"):
                report["skipped"].append(key)  # fixed buffers
                continue
            if k.startswith("model."):
                k = k[len("model."):]
            dest_prefix = ("model",)

        parts = k.split(".")
        leaf = parts[-1]
        mapped = None

        if parts[0] == "patch_embed" and parts[1] == "proj":
            arr = _conv(value) if leaf == "weight" else value
            mapped = ("patch_embed", "proj", {"weight": "kernel", "bias": "bias"}[leaf]), arr
        elif parts[0] in ("enc_blocks", "dec_blocks", "dec_blocks2"):
            idx = int(parts[1])
            depth = config.enc_depth if parts[0] == "enc_blocks" else config.dec_depth
            if idx >= depth:
                report["skipped"].append(key)  # e.g. 12-block ckpt into 8-block model
                continue
            inner = _map_block(parts[2:], leaf, None, value)
            if inner is not None:
                path, arr = inner
                mapped = (f"{parts[0]}_{idx}",) + path, arr
        elif parts[0] in ("enc_norm", "dec_norm") and len(parts) == 2:
            mapped = (parts[0], {"weight": "scale", "bias": "bias"}[leaf]), value
        elif parts[0] == "decoder_embed":
            arr = _t(value) if leaf == "weight" else value
            mapped = ("decoder_embed", {"weight": "kernel", "bias": "bias"}[leaf]), arr
        elif parts[0] in ("downstream_head1", "downstream_head2"):
            rest = ".".join(parts[1:-1])
            inner = _head_path(rest, leaf, value, head_type)
            if inner is not None and inner[0] == "skip":
                report["skipped"].append(key)
                continue
            if inner is not None:
                path, arr = inner
                mapped = (parts[0],) + path, arr
        elif parts[0] in ("mask_token", "prediction_head"):
            report["skipped"].append(key)
            continue

        if mapped is None:
            report["unknown"].append(key)
            continue
        path, arr = mapped
        _set(tree, dest_prefix + path, arr)
        report["converted"].append(key)

    if strict:
        # source names PRESENT in the checkpoint (converted or intentionally
        # skipped — e.g. the dead refinenet4.resConfUnit1 weights real DPT
        # checkpoints carry), normalized to the bare-model namespace;
        # 'missing' means genuinely absent tensors only
        seen = {k[len("model."):] if wrapper and k.startswith("model.") else k
                for k in report["converted"] + report["skipped"]}
        missing = sorted(set(expected_torch_keys(config)) - seen)
        problems = []
        if report["unknown"]:
            problems.append(
                f"{len(report['unknown'])} unknown key(s) the converter does "
                f"not understand: {report['unknown'][:10]}"
                + (" …" if len(report["unknown"]) > 10 else ""))
        if missing:
            problems.append(
                f"{len(missing)} required tensor(s) missing from the "
                f"checkpoint: {missing[:10]}"
                + (" …" if len(missing) > 10 else ""))
        if problems:
            raise ValueError(
                "strict checkpoint conversion failed:\n  "
                + "\n  ".join(problems)
                + "\nCompare against convert.released_checkpoint_keys(config)"
                  " / expected_torch_keys(config), or convert with"
                  " strict=False to reproduce the reference's non-strict"
                  " loading (thermal_dustr_model.py:51).")

    return tree, report


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth and unwrap the {'model'|'state_dict'|raw} container
    (thermal_dustr_model.py:49-56)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt and isinstance(ckpt["model"], dict):
        return ckpt["model"]
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        return ckpt["state_dict"]
    return ckpt


def is_wrapper_state_dict(state: Dict) -> bool:
    """True when a state dict is a ThermalDUSt3R-wrapper checkpoint ('model.'
    prefixed keys plus learnable edge_weight/temp_scale,
    thermal_dustr_model.py:180-185). The single source of truth for wrapper
    auto-detection — convert_checkpoint and cli.parity both use it."""
    return any(k.startswith("model.") or k in ("edge_weight", "temp_scale")
               for k in state)


def convert_checkpoint(path: str, config: DustrModelConfig,
                       wrapper: Optional[bool] = None, strict: bool = False):
    """Full conversion: .pth file → {'params': tree}. wrapper=None
    auto-detects ThermalDUSt3R checkpoints by their 'model.'/edge_weight keys.
    strict=True fails loudly on unknown/missing keys (see convert_state_dict)."""
    state = load_torch_checkpoint(path)
    if wrapper is None:
        wrapper = is_wrapper_state_dict(state)
    tree, report = convert_state_dict(state, config, wrapper=wrapper,
                                      strict=strict)
    return {"params": tree}, report


# ---------------------------------------------------------------------------
# expected torch key inventory — used by tests and the model-info CLI
# ---------------------------------------------------------------------------

def expected_torch_keys(config: DustrModelConfig) -> Dict[str, Tuple[int, ...]]:
    """name → shape of every torch tensor the converter understands, for a
    given config. Serves as the synthetic-checkpoint spec in tests and as the
    conversion validator (SURVEY C25)."""
    e, d = config.enc_embed_dim, config.dec_embed_dim
    p = config.patch_size
    m = int(config.mlp_ratio)
    keys: Dict[str, Tuple[int, ...]] = {
        "patch_embed.proj.weight": (e, config.in_channels, p, p),
        "patch_embed.proj.bias": (e,),
        "enc_norm.weight": (e,), "enc_norm.bias": (e,),
        "decoder_embed.weight": (d, e), "decoder_embed.bias": (d,),
        "dec_norm.weight": (d,), "dec_norm.bias": (d,),
    }
    for i in range(config.enc_depth):
        pre = f"enc_blocks.{i}."
        keys.update({
            pre + "norm1.weight": (e,), pre + "norm1.bias": (e,),
            pre + "attn.qkv.weight": (3 * e, e), pre + "attn.qkv.bias": (3 * e,),
            pre + "attn.proj.weight": (e, e), pre + "attn.proj.bias": (e,),
            pre + "norm2.weight": (e,), pre + "norm2.bias": (e,),
            pre + "mlp.fc1.weight": (m * e, e), pre + "mlp.fc1.bias": (m * e,),
            pre + "mlp.fc2.weight": (e, m * e), pre + "mlp.fc2.bias": (e,),
        })
    for stack in ("dec_blocks", "dec_blocks2"):
        for i in range(config.dec_depth):
            pre = f"{stack}.{i}."
            keys.update({
                pre + "norm1.weight": (d,), pre + "norm1.bias": (d,),
                pre + "attn.qkv.weight": (3 * d, d), pre + "attn.qkv.bias": (3 * d,),
                pre + "attn.proj.weight": (d, d), pre + "attn.proj.bias": (d,),
                pre + "norm2.weight": (d,), pre + "norm2.bias": (d,),
                pre + "norm3.weight": (d,), pre + "norm3.bias": (d,),
                pre + "norm_y.weight": (d,), pre + "norm_y.bias": (d,),
                pre + "cross_attn.projq.weight": (d, d), pre + "cross_attn.projq.bias": (d,),
                pre + "cross_attn.projk.weight": (d, d), pre + "cross_attn.projk.bias": (d,),
                pre + "cross_attn.projv.weight": (d, d), pre + "cross_attn.projv.bias": (d,),
                pre + "cross_attn.proj.weight": (d, d), pre + "cross_attn.proj.bias": (d,),
                pre + "mlp.fc1.weight": (m * d, d), pre + "mlp.fc1.bias": (m * d,),
                pre + "mlp.fc2.weight": (d, m * d), pre + "mlp.fc2.bias": (d,),
            })

    hc = config.head
    for h in ("downstream_head1", "downstream_head2"):
        if hc.head_type == "linear":
            keys[f"{h}.proj.weight"] = (4 * p * p, d)
            keys[f"{h}.proj.bias"] = (4 * p * p,)
            continue
        fd = hc.feature_dim
        dims = hc.dpt_layer_dims
        hooks_dims = (e, d, d, d)
        dpt = f"{h}.dpt."
        keys.update({
            dpt + "act_postprocess.0.0.weight": (dims[0], hooks_dims[0], 1, 1),
            dpt + "act_postprocess.0.0.bias": (dims[0],),
            dpt + "act_postprocess.0.1.weight": (dims[0], dims[0], 4, 4),
            dpt + "act_postprocess.0.1.bias": (dims[0],),
            dpt + "act_postprocess.1.0.weight": (dims[1], hooks_dims[1], 1, 1),
            dpt + "act_postprocess.1.0.bias": (dims[1],),
            dpt + "act_postprocess.1.1.weight": (dims[1], dims[1], 2, 2),
            dpt + "act_postprocess.1.1.bias": (dims[1],),
            dpt + "act_postprocess.2.0.weight": (dims[2], hooks_dims[2], 1, 1),
            dpt + "act_postprocess.2.0.bias": (dims[2],),
            dpt + "act_postprocess.3.0.weight": (dims[3], hooks_dims[3], 1, 1),
            dpt + "act_postprocess.3.0.bias": (dims[3],),
            dpt + "act_postprocess.3.1.weight": (dims[3], dims[3], 3, 3),
            dpt + "act_postprocess.3.1.bias": (dims[3],),
        })
        for i, dim in enumerate(dims):
            keys[dpt + f"scratch.layer{i+1}_rn.weight"] = (fd, dim, 3, 3)
        for i in range(1, 5):
            rf = dpt + f"scratch.refinenet{i}."
            for rcu in ("resConfUnit1", "resConfUnit2"):
                for cv in ("conv1", "conv2"):
                    keys[rf + f"{rcu}.{cv}.weight"] = (fd, fd, 3, 3)
                    keys[rf + f"{rcu}.{cv}.bias"] = (fd,)
            keys[rf + "out_conv.weight"] = (fd, fd, 1, 1)
            keys[rf + "out_conv.bias"] = (fd,)
        keys.update({
            dpt + "head.0.weight": (fd // 2, fd, 3, 3), dpt + "head.0.bias": (fd // 2,),
            dpt + "head.2.weight": (hc.last_dim, fd // 2, 3, 3),
            dpt + "head.2.bias": (hc.last_dim,),
            dpt + "head.4.weight": (4, hc.last_dim, 1, 1), dpt + "head.4.bias": (4,),
        })
        if hc.head_type == "catmlpdpt":
            idim = e + d
            hid = int(hc.desc_hidden_dim_factor * idim)
            nout = (hc.local_feat_dim + int(hc.two_confs)) * p * p
            keys[f"{h}.head_local_features.fc1.weight"] = (hid, idim)
            keys[f"{h}.head_local_features.fc1.bias"] = (hid,)
            keys[f"{h}.head_local_features.fc2.weight"] = (nout, hid)
            keys[f"{h}.head_local_features.fc2.bias"] = (nout,)
    return keys


def released_checkpoint_keys(config: DustrModelConfig,
                             ckpt_dec_depth: Optional[int] = None
                             ) -> Dict[str, Tuple[int, ...]]:
    """name → shape inventory of a REAL released naver checkpoint for this
    architecture — expected_torch_keys() plus the key families a genuine
    `DUSt3R_ViTLarge_BaseDecoder_224_linear.pth` / MASt3R `.pth` carries that
    the model itself never consumes:

      * `mask_token` [1, 1, dec_embed_dim] — croco's masked-pretraining
        token, retained by dust3r's CroCoNet base (the reference loads it
        non-strict and never uses it, thermal_dustr_model.py:49-56);
      * the checkpoint's NATIVE decoder depth (default 12): the official
        224-linear checkpoint carries dec_blocks/dec_blocks2 0..11 while the
        reference builds dec_depth=8 and silently truncates (the strict=False
        quirk, core/config.py DUSTR_224_LINEAR note).

    RoPE is parameter-free in croco ('RoPE100'), so there are no pos-embed or
    rope buffer entries, and dust3r deletes croco's `prediction_head`; the
    converter still tolerates both names for croco-pretrained checkpoints.
    Use this inventory (not expected_torch_keys) to validate a real released
    file: `cli.model_info --validate` reports clean against it."""
    import dataclasses

    if ckpt_dec_depth is None:
        ckpt_dec_depth = max(config.dec_depth, 12)
    full = dataclasses.replace(config, dec_depth=ckpt_dec_depth)
    keys = expected_torch_keys(full)
    keys["mask_token"] = (1, 1, config.dec_embed_dim)
    return keys
