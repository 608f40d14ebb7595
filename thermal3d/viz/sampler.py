"""Dataset sampling / pair visualizations (utils/visualize.py:463-818).

visualize_pair:        thermal pair side-by-side with enhanced versions
visualize_pair_merged: pair + pseudo-GT depths in one merged panel
sample_dataset:        grid of random dataset samples (visualize.py:620-694)
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from thermal3d.viz.panels import _depth_limits, _to_hwc  # noqa: E402


def visualize_pair(thermal1, thermal2, enhanced1=None, enhanced2=None,
                   save_path: Optional[str] = None):
    cols = 2 if enhanced1 is None else 4
    fig = plt.figure(figsize=(4 * cols, 4))
    panels = [(thermal1, "Thermal 1"), (thermal2, "Thermal 2")]
    if enhanced1 is not None:
        panels += [(enhanced1, "Enhanced 1"), (enhanced2, "Enhanced 2")]
    for i, (img, title) in enumerate(panels):
        plt.subplot(1, cols, i + 1)
        arr = _to_hwc(img)
        plt.imshow(arr if arr.ndim == 3 else arr, cmap=None if arr.ndim == 3 else "gray")
        plt.title(title)
        plt.axis("off")
    plt.tight_layout()
    if save_path:
        plt.savefig(save_path, dpi=150)
        plt.close(fig)
        return None
    return fig


def visualize_pair_merged(thermal1, thermal2, depth1=None, depth2=None,
                          pose=None, save_path: Optional[str] = None):
    rows = 1 if depth1 is None else 2
    fig = plt.figure(figsize=(9, 4 * rows))
    for i, (img, title) in enumerate([(thermal1, "Thermal 1"), (thermal2, "Thermal 2")]):
        plt.subplot(rows, 2, i + 1)
        arr = _to_hwc(img)
        plt.imshow(arr if arr.ndim == 3 else arr, cmap=None if arr.ndim == 3 else "gray")
        plt.title(title)
        plt.axis("off")
    if depth1 is not None:
        vmin, vmax = _depth_limits(depth1, depth2)
        for i, (d, title) in enumerate([(depth1, "Depth 1"), (depth2, "Depth 2")]):
            plt.subplot(rows, 2, 2 + i + 1)
            plt.imshow(np.asarray(d), cmap="plasma", vmin=vmin, vmax=vmax)
            plt.title(title)
            plt.axis("off")
    if pose is not None:
        t = np.asarray(pose)[:3, 3]
        fig.suptitle(f"relative translation ‖t‖ = {np.linalg.norm(t):.3f}")
    plt.tight_layout()
    if save_path:
        plt.savefig(save_path, dpi=150)
        plt.close(fig)
        return None
    return fig


def sample_dataset(dataset, n: int = 4, seed: int = 0,
                   save_path: Optional[str] = None):
    """Grid of n random samples: thermal pair + GT depth when present."""
    rng = np.random.default_rng(seed)
    idxs = rng.choice(len(dataset), size=min(n, len(dataset)), replace=False)
    fig = plt.figure(figsize=(12, 3 * len(idxs)))
    for row, idx in enumerate(idxs):
        s = dataset[int(idx)]
        if s is None:
            continue
        t1 = _to_hwc(s["thermal1"])
        t1n = (t1 - t1.min()) / (t1.max() - t1.min() + 1e-6)
        plt.subplot(len(idxs), 3, row * 3 + 1)
        plt.imshow(t1n)
        plt.title(f"sample {idx}: thermal1")
        plt.axis("off")
        t2 = _to_hwc(s["thermal2"])
        t2n = (t2 - t2.min()) / (t2.max() - t2.min() + 1e-6)
        plt.subplot(len(idxs), 3, row * 3 + 2)
        plt.imshow(t2n)
        plt.title("thermal2")
        plt.axis("off")
        if "pointmap1" in s:
            plt.subplot(len(idxs), 3, row * 3 + 3)
            plt.imshow(s["pointmap1"][..., 2], cmap="plasma")
            plt.title("GT depth")
            plt.axis("off")
    plt.tight_layout()
    if save_path:
        plt.savefig(save_path, dpi=120)
        plt.close(fig)
        return None
    return fig


def find_drive_folders(base_path: str):
    """Enumerate (sequence, drive, path) triples under <base>/train/<seq>/<NN>
    (visualize.py:543-557)."""
    import os

    train_dir = os.path.join(base_path, "train")
    if not os.path.isdir(train_dir):
        return []
    out = []
    for seq in sorted(os.listdir(train_dir)):
        seq_path = os.path.join(train_dir, seq)
        if not os.path.isdir(seq_path):
            continue
        for sub in sorted(os.listdir(seq_path)):
            drive = os.path.join(seq_path, sub)
            if os.path.isdir(drive):
                out.append((seq, sub, drive))
    return out


def load_images_from_drive(drive_path: str):
    """RGB / IR frame lists for a drive, with the reference's fallback glob
    families: *rgb*/*ir* → *color*/*thermal* → recursive (visualize.py:559-596)."""
    import glob
    import os

    def pair(rgb_pat, ir_pat, recursive=False):
        kw = {"recursive": True} if recursive else {}
        return (sorted(glob.glob(os.path.join(drive_path, rgb_pat), **kw)),
                sorted(glob.glob(os.path.join(drive_path, ir_pat), **kw)))

    for args in (("*rgb*.png", "*ir*.png"),
                 ("*color*.png", "*thermal*.png")):
        rgb, ir = pair(*args)
        if rgb or ir:
            return rgb, ir
    return pair("**/*rgb*.png", "**/*ir*.png", recursive=True)


def visualize_dataset(dataset_path: str, num_samples: int = 5,
                      output_dir: str = "freiburg_samples") -> int:
    """Sample RGB | IR | overlay panels across drive folders, preferring
    unseen sequences (visualize.py:620-694). Returns panels written."""
    import os

    import cv2

    from thermal3d.viz.panels import colorize_ir, overlay_rgb_thermal

    drives = find_drive_folders(dataset_path)
    if not drives:
        print(f"No drive folders found in {dataset_path}")
        return 0
    os.makedirs(output_dir, exist_ok=True)
    seen, count = set(), 0
    for seq, sub, drive in drives:
        if count >= num_samples and seq in seen:
            continue
        seen.add(seq)
        rgb_files, ir_files = load_images_from_drive(drive)
        if not rgb_files or not ir_files:
            continue
        for i in range(min(3, len(rgb_files), len(ir_files))):
            if count >= num_samples:
                break
            rgb = cv2.cvtColor(cv2.imread(rgb_files[i]), cv2.COLOR_BGR2RGB)
            ir_raw = cv2.imread(ir_files[i], cv2.IMREAD_ANYDEPTH)
            ir = colorize_ir(ir_raw)
            overlay = overlay_rgb_thermal(
                rgb.astype(np.float32) / 255.0, ir_raw.astype(np.float32))
            fig, axes = plt.subplots(1, 3, figsize=(18, 6))
            for ax, img, title in zip(
                    axes, (rgb, ir, overlay),
                    (f"RGB Image - {seq}/{sub}", f"Thermal Image - {seq}/{sub}",
                     f"Overlay - {seq}/{sub}")):
                ax.imshow(img)
                ax.set_title(title)
                ax.axis("off")
            plt.tight_layout()
            fig.savefig(os.path.join(output_dir, f"{seq}_{sub}_sample_{i}.png"))
            plt.close(fig)
            count += 1
    return count
