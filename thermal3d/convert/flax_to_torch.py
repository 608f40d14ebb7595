"""Flax → PyTorch state-dict export (inverse of torch_to_flax).

Lets fine-tuned thermal3d checkpoints be consumed by reference-ecosystem
tooling (thermal_dustr_model.py:164-188 loading conventions): exports the
torch key layout with inverse value transposes. Round-trip
torch → flax → torch is the identity (tested).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from thermal3d.core.config import DustrModelConfig


def _t(w):  # Linear kernel → torch weight
    return np.ascontiguousarray(np.asarray(w).T)


def _conv(w):  # HWIO → OIHW
    return np.ascontiguousarray(np.asarray(w).transpose(3, 2, 0, 1))


def _convT(w):  # flax convT kernel (flipped HWIO') → torch [in, out, kh, kw]
    w = np.asarray(w)[::-1, ::-1]
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1))


def _flatten(tree: Dict, prefix: Tuple[str, ...] = ()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), np.asarray(v)


_DPT_INverse = {
    "act1_proj": ("act_postprocess.0.0", _conv),
    "act1_up": ("act_postprocess.0.1", _convT),
    "act2_proj": ("act_postprocess.1.0", _conv),
    "act2_up": ("act_postprocess.1.1", _convT),
    "act3_proj": ("act_postprocess.2.0", _conv),
    "act4_proj": ("act_postprocess.3.0", _conv),
    "act4_down": ("act_postprocess.3.1", _conv),
    "head0": ("head.0", _conv),
    "head2": ("head.2", _conv),
    "head4": ("head.4", _conv),
}


def export_state_dict(params: Dict, config: DustrModelConfig,
                      wrapper: bool = False) -> Dict[str, np.ndarray]:
    """params: flax tree for AsymmetricCroCo3DStereo (or ThermalDUSt3R when
    wrapper). Returns a numpy state dict in the torch key layout."""
    out: Dict[str, np.ndarray] = {}
    wb = {"kernel": "weight", "bias": "bias", "scale": "weight"}

    for path, value in _flatten(params):
        parts = list(path)
        prefix = ""
        if wrapper:
            if parts[0] == "thermal_preprocess":
                out[parts[1]] = value.reshape(())
                continue
            if parts[0] == "model":
                prefix = "model."
                parts = parts[1:]

        leaf = parts[-1]
        mods = parts[:-1]
        key = None
        fn = None
        m0 = mods[0] if mods else ""
        if m0 == "patch_embed":
            key = "patch_embed.proj." + wb[leaf]
            fn = _conv if leaf == "kernel" else None
        elif m0.startswith(("enc_blocks_", "dec_blocks2_", "dec_blocks_")):
            stack, idx = m0.rsplit("_", 1)
            inner = ".".join(mods[1:])
            key = f"{stack}.{idx}.{inner}.{wb[leaf]}"
            fn = _t if leaf == "kernel" else None
        elif m0 in ("enc_norm", "dec_norm"):
            key = f"{m0}.{wb[leaf]}"
        elif m0 == "decoder_embed":
            key = f"decoder_embed.{wb[leaf]}"
            fn = _t if leaf == "kernel" else None
        elif m0 in ("downstream_head1", "downstream_head2"):
            rest = mods[1:]
            if rest == ["proj"]:  # linear head
                key = f"{m0}.proj.{wb[leaf]}"
                fn = _t if leaf == "kernel" else None
            elif rest and rest[0] in ("mlp_fc1", "mlp_fc2"):
                sub = {"mlp_fc1": "fc1", "mlp_fc2": "fc2"}[rest[0]]
                key = f"{m0}.head_local_features.{sub}.{wb[leaf]}"
                fn = _t if leaf == "kernel" else None
            else:
                # DPT subtree: [dpt_head,] dpt, <module...>
                r = rest[1:] if rest[0] == "dpt_head" else rest
                r = r[1:] if r and r[0] == "dpt" else r
                if r and r[0] in _DPT_INverse:
                    tname, tfn = _DPT_INverse[r[0]]
                    key = f"{m0}.dpt.{tname}.{wb[leaf]}"
                    fn = tfn if leaf == "kernel" else None
                elif r and r[0].endswith("_rn"):
                    key = f"{m0}.dpt.scratch.{r[0]}.{wb[leaf]}"
                    fn = _conv if leaf == "kernel" else None
                elif r and r[0].startswith("refinenet"):
                    inner = ".".join(r[1:])
                    key = f"{m0}.dpt.scratch.{r[0]}.{inner}.{wb[leaf]}"
                    fn = _conv if leaf == "kernel" else None
        if key is None:
            raise KeyError(f"cannot export flax param path {'.'.join(path)}")
        out[prefix + key] = fn(value) if fn else value
    return out
