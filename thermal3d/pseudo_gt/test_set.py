"""Test-set pseudo-GT generation (scripts/test_pseudo_gt.py:26-171).

Runs MASt3R monocular (view, view) on test RGB frames at 512² and writes, per
frame, under <output>/depth/:
  {name}_depth.npy           [512,512] float32 depth
  {name}_thermal_path.txt    path of the corresponding thermal frame
  {name}_depth_vis.png       plasma-colormapped preview
— the exact layout of the checked-in pseudo_gt_test_set/{day,night}/depth/
golden fixtures (SURVEY.md C23).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from thermal3d.pseudo_gt.generator import PseudoGTGenerator, _resize_rgb
from thermal3d.preprocess.io import load_rgb_image


def generate_test_set_pseudo_gt(frames: List[Dict[str, str]], output_dir: str,
                                generator: Optional[PseudoGTGenerator] = None,
                                max_frames: Optional[int] = None) -> int:
    """frames: [{'rgb': path, 'thermal': path}]. Returns frames written."""
    if generator is None:
        generator = PseudoGTGenerator()
    depth_dir = os.path.join(output_dir, "depth")
    os.makedirs(depth_dir, exist_ok=True)
    hw = generator.config.img_size
    bs = generator.batch_size
    if max_frames is not None:
        frames = frames[:max_frames]

    n = 0
    for i in range(0, len(frames), bs):
        chunk = frames[i : i + bs]
        imgs, metas = [], []
        for fr in chunk:
            img = load_rgb_image(fr["rgb"])
            if img is None:
                continue
            imgs.append(_resize_rgb(img, hw))
            metas.append(fr)
        if not imgs:
            continue
        real = len(imgs)
        while len(imgs) < bs:
            imgs.append(imgs[-1])
        stack = np.stack(imgs)
        out = generator.run_pairs(stack, stack)  # monocular (test_pseudo_gt.py)
        for j, fr in enumerate(metas[:real]):
            name = os.path.splitext(os.path.basename(fr["rgb"]))[0]
            depth = out["depth1"][j]
            np.save(os.path.join(depth_dir, f"{name}_depth.npy"), depth)
            with open(os.path.join(depth_dir, f"{name}_thermal_path.txt"), "w") as f:
                f.write(fr.get("thermal", ""))
            _save_depth_vis(depth, os.path.join(depth_dir, f"{name}_depth_vis.png"))
            n += 1
    return n


def _save_depth_vis(depth: np.ndarray, path: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(6, 6))
    plt.imshow(depth, cmap="plasma")
    plt.colorbar(label="Depth")
    plt.axis("off")
    plt.tight_layout()
    plt.savefig(path, dpi=100)
    plt.close()
