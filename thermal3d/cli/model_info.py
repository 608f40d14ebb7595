"""Model/checkpoint introspection — `python -m thermal3d.cli.model_info`.

Re-design of scripts/model_info.py (SURVEY.md C25): parameter counting and
grouping (enc_/dec_/head), architecture reconstruction from key patterns, and
— new here — a conversion validator that diffs a torch state dict against
`expected_torch_keys` for a config (catches key/shape drift before training).
"""

from __future__ import annotations

import argparse
import re
from collections import OrderedDict
from typing import Dict

import numpy as np


def param_stats(tree_or_state: Dict) -> Dict:
    """Count/group parameters. Accepts a flax param tree or a flat torch-style
    state dict (scripts/model_info.py:8-157)."""
    flat = {}

    def flatten(node, prefix=""):
        if hasattr(node, "shape"):
            flat[prefix.rstrip(".")] = node
            return
        for k, v in node.items():
            flatten(v, f"{prefix}{k}.")

    flatten(tree_or_state)
    groups = {"encoder": 0, "decoder": 0, "head": 0, "other": 0}
    layer_types: Dict[str, int] = {}
    total = 0
    for key, value in flat.items():
        n = int(np.prod(value.shape)) if value.shape else 1
        total += n
        kl = key.lower()
        if "enc" in kl or "patch_embed" in kl:
            groups["encoder"] += n
        elif "dec" in kl:
            groups["decoder"] += n
        elif "head" in kl:
            groups["head"] += n
        else:
            groups["other"] += n
        leaf = key.split(".")[-1]
        layer_types[leaf] = layer_types.get(leaf, 0) + n
    return {"total": total, "groups": groups, "layer_types": layer_types, "n_tensors": len(flat)}


def reconstruct_architecture(state: Dict[str, np.ndarray]) -> Dict:
    """Infer block counts / dims / heads from a torch state dict's key layout
    (scripts/model_info.py:158-334). scan_layers trees (enc_scan/dec_scan
    stacked params) are recognized by their leading depth axis."""
    if any(k.startswith(("enc_scan.", "dec_scan.")) for k in state):
        state = dict(state)
        for prefix, targets in (("enc_scan.blk.", ("enc_blocks",)),
                                ("dec_scan.blk1.", ("dec_blocks",)),
                                ("dec_scan.blk2.", ("dec_blocks2",))):
            for k in [k for k in state if k.startswith(prefix)]:
                v = state.pop(k)
                rest = k[len(prefix):]
                for i in range(v.shape[0]):
                    state[f"{targets[0]}.{i}.{rest}"] = v[i]
    arch: Dict = OrderedDict()
    for comp in ("patch_embed", "enc_blocks", "dec_blocks", "dec_blocks2"):
        block_ids = set()
        pat = re.compile(rf"{comp}\.(\d+)\.")
        for k in state:
            m = pat.match(k)
            if m:
                block_ids.add(int(m.group(1)))
        if block_ids or any(k.startswith(comp) for k in state):
            arch[comp] = {"n_blocks": len(block_ids)}
    if "patch_embed.proj.weight" in state:
        w = state["patch_embed.proj.weight"]
        arch["patch_embed"].update(embed_dim=int(w.shape[0]), patch_size=int(w.shape[2]))
    for comp in ("enc_blocks", "dec_blocks"):
        qkv = f"{comp}.0.attn.qkv.weight"
        if qkv in state:
            dim = int(state[qkv].shape[1])
            arch[comp]["embed_dim"] = dim
            # head count isn't in shapes; report the standard dim/64 convention
            arch[comp]["num_heads_dim64"] = dim // 64
        if any("cross_attn" in k and comp in k for k in state):
            arch[comp]["attention"] = "Self + Cross Attention"
    arch["heads"] = sorted({k.split(".")[0] for k in state if "head" in k.split(".")[0]})
    return arch


def render_architecture_text(arch: Dict) -> str:
    """Reference-style architecture summary (the print layout of
    scripts/model_info.py:262-324: Encoder / Decoder / Output Heads
    sections)."""
    lines = ["DUSt3R Model Architecture", "===============================",
             "", "Encoder:"]
    pe = arch.get("patch_embed", {})
    if pe:
        ps, ed = pe.get("patch_size", "?"), pe.get("embed_dim", "?")
        lines.append(f"  Patch Embedding: {ps}x{ps} patches -> {ed} dim")
    eb = arch.get("enc_blocks", {})
    if eb:
        lines.append(f"  Transformer Encoder: {eb.get('n_blocks', '?')} blocks "
                     f"with {eb.get('embed_dim', '?')} dim")
        lines.append(f"  Attention Type: {eb.get('attention', 'Self Attention')}")
    lines += ["", "Decoder:"]
    db = arch.get("dec_blocks", {})
    if db:
        lines.append("  Decoder Embedding: Maps encoder features to decoder space")
        lines.append(f"  Transformer Decoder: {db.get('n_blocks', '?')} blocks "
                     f"with {db.get('embed_dim', '?')} dim")
        lines.append(f"  Attention Type: {db.get('attention', 'Self Attention')}")
    if arch.get("dec_blocks2"):
        lines.append(f"  Second Decoder Branch: "
                     f"{arch['dec_blocks2'].get('n_blocks', '?')} blocks")
        lines.append("  Dual-branch decoder structure (for processing two views)")
    lines += ["", "Output Heads:"]
    for h in arch.get("heads", []):
        lines.append(f"  {h}: Converts features to final outputs")
    return "\n".join(lines)


def draw_architecture_diagram(arch: Dict, save_path: str) -> None:
    """Box-diagram rendering of the reconstructed architecture (the mpl
    counterpart to visualize_model_architecture,
    scripts/model_info.py:158-334): patch embed -> encoder stack -> shared
    features fanning into the two interleaved decoder branches -> heads."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import FancyArrowPatch, FancyBboxPatch

    fig, ax = plt.subplots(figsize=(11, 5))
    ax.set_xlim(0, 11)
    ax.set_ylim(0, 5)
    ax.axis("off")

    def box(x, y, w, h, label, color):
        ax.add_patch(FancyBboxPatch(
            (x, y), w, h, boxstyle="round,pad=0.06",
            facecolor=color, edgecolor="#333333", linewidth=1.2))
        ax.text(x + w / 2, y + h / 2, label, ha="center", va="center",
                fontsize=9)

    def arrow(x0, y0, x1, y1):
        ax.add_patch(FancyArrowPatch((x0, y0), (x1, y1),
                                     arrowstyle="-|>", mutation_scale=14,
                                     color="#333333", linewidth=1.1))

    pe = arch.get("patch_embed", {})
    eb = arch.get("enc_blocks", {})
    db = arch.get("dec_blocks", {})
    db2 = arch.get("dec_blocks2", {})
    ps = pe.get("patch_size", "?")
    box(0.3, 2.0, 1.6, 1.0,
        f"Patch Embed\n{ps}x{ps} conv\n-> {pe.get('embed_dim', '?')}d", "#cfe3f7")
    arrow(1.9, 2.5, 2.5, 2.5)
    box(2.5, 2.0, 2.0, 1.0,
        f"ViT Encoder\n{eb.get('n_blocks', '?')} blocks, "
        f"{eb.get('embed_dim', '?')}d\n(shared, both views)", "#cfe3f7")
    arrow(4.5, 2.5, 5.2, 3.6)
    arrow(4.5, 2.5, 5.2, 1.4)
    dec_label = (f"{db.get('n_blocks', '?')} blocks, {db.get('embed_dim', '?')}d"
                 f"\nself + cross attn")
    box(5.2, 3.2, 2.4, 1.0, f"Decoder (view 1)\n{dec_label}", "#d9efd3")
    box(5.2, 0.9, 2.4, 1.0,
        f"Decoder 2 (view 2)\n{db2.get('n_blocks', '?')} blocks"
        "\ninterleaved cross attn", "#d9efd3")
    # cross-attention exchange between the two branches
    arrow(6.4, 3.2, 6.4, 1.9)
    arrow(6.8, 1.9, 6.8, 3.2)
    heads = arch.get("heads", []) or ["downstream_head1", "downstream_head2"]
    ys = (3.7, 1.4) if len(heads) >= 2 else (2.5,)
    for name, y in zip(heads, ys):
        arrow(7.6, y, 8.3, y)
        box(8.3, y - 0.5, 2.3, 1.0, f"{name}\npts3d + conf", "#f7e3cf")
    ax.set_title("AsymmetricCroCo3DStereo — reconstructed architecture")
    fig.savefig(save_path, dpi=110, bbox_inches="tight")
    plt.close(fig)


def validate_against_config(state: Dict[str, np.ndarray], config,
                            released: bool = True) -> Dict:
    """Diff a state dict against the key/shape spec. released=True validates
    against the REAL checkpoint inventory (released_checkpoint_keys: croco
    mask_token + the checkpoint's native decoder depth, inferred from the
    state itself) so a genuine naver .pth reports clean; released=False uses
    the bare model spec (expected_torch_keys)."""
    from thermal3d.convert.torch_to_flax import (expected_torch_keys,
                                                 released_checkpoint_keys)

    if released:
        dec_idx = [int(k.split(".")[1]) for k in state
                   if k.startswith(("dec_blocks.", "dec_blocks2."))]
        ckpt_depth = max(dec_idx) + 1 if dec_idx else config.dec_depth
        expected = released_checkpoint_keys(
            config, ckpt_dec_depth=max(ckpt_depth, config.dec_depth))
    else:
        expected = expected_torch_keys(config)
    # mask_token is optional: present in released naver checkpoints, absent
    # from re-saved fine-tunes (the model never consumes it either way)
    missing = sorted(set(expected) - set(state) - {"mask_token"})
    unexpected = sorted(set(state) - set(expected))
    shape_mismatches = {
        k: (tuple(np.asarray(state[k]).shape), expected[k])
        for k in set(expected) & set(state)
        if tuple(np.asarray(state[k]).shape) != expected[k]
    }
    return {"missing": missing, "unexpected": unexpected,
            "shape_mismatches": shape_mismatches}


def main(argv=None):
    parser = argparse.ArgumentParser(description="Inspect a DUSt3R checkpoint")
    parser.add_argument("--checkpoint", type=str, required=True, help=".pth file")
    parser.add_argument("--validate", action="store_true",
                        help="diff against the DUSt3R-224-linear key spec")
    parser.add_argument("--config", type=str, default="dustr224",
                        choices=["dustr224", "mastr512"])
    parser.add_argument("--diagram", type=str, default=None, metavar="PNG",
                        help="render the reconstructed architecture as a "
                             "box diagram to this file")
    args = parser.parse_args(argv)

    from thermal3d.convert.torch_to_flax import load_torch_checkpoint
    from thermal3d.core.config import DUSTR_224_LINEAR, MASTR_512_CATMLPDPT

    state = load_torch_checkpoint(args.checkpoint)
    state = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
             for k, v in state.items()}
    stats = param_stats(state)
    print(f"Total parameters: {stats['total']:,} in {stats['n_tensors']} tensors")
    for g, n in stats["groups"].items():
        print(f"  {g:<8}: {n:,} ({100 * n / max(stats['total'], 1):.1f}%)")
    arch = reconstruct_architecture(state)
    print()
    print(render_architecture_text(arch))
    print("\nArchitecture (raw):")
    for comp, info in arch.items():
        print(f"  {comp}: {info}")
    if args.diagram:
        draw_architecture_diagram(arch, args.diagram)
        print(f"\nDiagram saved to {args.diagram}")
    if args.validate:
        cfg = DUSTR_224_LINEAR if args.config == "dustr224" else MASTR_512_CATMLPDPT
        report = validate_against_config(state, cfg)
        print(f"\nValidation: {len(report['missing'])} missing, "
              f"{len(report['unexpected'])} unexpected, "
              f"{len(report['shape_mismatches'])} shape mismatches")
        return report
    return stats


if __name__ == "__main__":
    main()
