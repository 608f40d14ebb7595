"""Visualization suite — host-side matplotlib (SURVEY.md C24, L8).

Same panel layouts and colormaps as utils/visualize.py so artifacts are
directly comparable: plasma for depth, 'hot' for edge maps, JET with the fixed
Freiburg display window 21800..23700 for raw IR (visualize.py:577-596),
2×2 / 2×3 wandb sample grids (visualize.py:85-230), pseudo-GT 2×2 data panels
(pseudo_gt.py:345-377), 3-panel eval comparisons
(evaluate_depth_metrics.py:329-365), and 3-D point-cloud scatter with camera
frusta (visualize.py:396-461).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from thermal3d.core.config import FREIBURG_RAW_MIN, FREIBURG_VIZ_MAX  # noqa: E402


def _to_hwc(img) -> np.ndarray:
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[0] in (1, 3) and img.shape[-1] not in (1, 3):
        img = img.transpose(1, 2, 0)
    return img


def _depth_limits(*depths):
    vmin = min(float(np.min(d)) for d in depths)
    vmax = max(float(np.max(d)) for d in depths)
    if vmin == vmax:
        vmin, vmax = vmin - 0.1, vmax + 0.1
    return vmin, vmax


def _edge_map(thermal: np.ndarray) -> np.ndarray:
    gray = thermal.mean(axis=-1) if thermal.ndim == 3 else thermal
    gx = np.zeros_like(gray)
    gy = np.zeros_like(gray)
    gx[:, :-1] = np.abs(gray[:, 1:] - gray[:, :-1])
    gy[:-1, :] = np.abs(gray[1:, :] - gray[:-1, :])
    return gx + gy


def sample_figure(thermal1, thermal2, pred_depth1, gt_depth1, with_edges: bool = False):
    """2×2 (or 2×3 with edge/gradient maps) training sample panel."""
    t1, t2 = _to_hwc(thermal1), _to_hwc(thermal2)
    pd, gd = np.asarray(pred_depth1), np.asarray(gt_depth1)
    cols = 3 if with_edges else 2
    fig, axes = plt.subplots(2, cols, figsize=(5 * cols + 2, 10), constrained_layout=True)
    axes[0, 0].imshow(t1)
    axes[0, 0].set_title("Thermal Image 1")
    axes[0, 1].imshow(t2)
    axes[0, 1].set_title("Thermal Image 2")
    vmin, vmax = _depth_limits(pd, gd)
    im1 = axes[1, 0].imshow(pd, cmap="plasma", vmin=vmin, vmax=vmax)
    axes[1, 0].set_title("Predicted Depth 1")
    axes[1, 1].imshow(gd, cmap="plasma", vmin=vmin, vmax=vmax)
    axes[1, 1].set_title("GT Depth 1")
    if with_edges:
        axes[0, 2].imshow(_edge_map(t1), cmap="hot")
        axes[0, 2].set_title("Thermal Edges")
        dgrad = (np.abs(np.gradient(pd, axis=1)) + np.abs(np.gradient(pd, axis=0)))
        axes[1, 2].imshow(dgrad, cmap="hot")
        axes[1, 2].set_title("Depth Gradients")
    for ax in axes.ravel():
        ax.axis("off")
    cbar = fig.colorbar(im1, ax=axes.ravel().tolist(), shrink=0.6, pad=0.02)
    cbar.set_label("Depth")
    return fig


def log_sample_images(logger, thermal1, thermal2, pred_depth1, gt_depth1, sample_name):
    fig = sample_figure(thermal1, thermal2, pred_depth1, gt_depth1, with_edges=False)
    logger.log_images(sample_name, {"panel": fig})
    plt.close(fig)


def log_sample_images_with_edges(logger, thermal1, thermal2, pred_depth1, gt_depth1,
                                 sample_name):
    fig = sample_figure(thermal1, thermal2, pred_depth1, gt_depth1, with_edges=True)
    logger.log_images(sample_name, {"panel": fig})
    plt.close(fig)


def visualize_data(rgb1, rgb2, depth1, depth2, save_path: Optional[str] = None):
    """Pseudo-GT 2×2 panel: RGB pair over depth pair (pseudo_gt.py:345-377)."""
    fig = plt.figure(figsize=(12, 6))
    for i, (img, title) in enumerate([
        (_to_hwc(rgb1), "RGB Image 1"), (_to_hwc(rgb2), "RGB Image 2"),
    ]):
        plt.subplot(2, 2, i + 1)
        plt.imshow(np.clip(img, 0, 1))
        plt.title(title)
        plt.axis("off")
    vmin, vmax = _depth_limits(depth1, depth2)
    for i, (d, title) in enumerate([(depth1, "Depth 1"), (depth2, "Depth 2")]):
        plt.subplot(2, 2, i + 3)
        plt.imshow(np.asarray(d), cmap="plasma", vmin=vmin, vmax=vmax)
        plt.title(title)
        plt.axis("off")
        plt.colorbar(shrink=0.8)
    plt.tight_layout()
    if save_path:
        plt.savefig(save_path, dpi=150)
        plt.close(fig)
        return None
    return fig


def save_comparison_panel(thermal_path: str, pred_depth, gt_depth, rmse: float,
                          save_path: str):
    """3-panel thermal | predicted | GT (evaluate_depth_metrics.py:329-365)."""
    fig = plt.figure(figsize=(15, 5))
    plt.subplot(1, 3, 1)
    try:
        import cv2

        img = cv2.imread(thermal_path)
        if img is not None:
            if img.ndim == 2:
                plt.imshow(img, cmap="hot")
            else:
                plt.imshow(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
        else:
            plt.text(0.5, 0.5, "Image not available", ha="center", va="center")
    except Exception:
        plt.text(0.5, 0.5, "Image not available", ha="center", va="center")
    plt.title("Thermal Input")
    plt.axis("off")
    plt.subplot(1, 3, 2)
    plt.imshow(np.asarray(pred_depth), cmap="plasma")
    plt.title(f"Predicted Depth\nRMSE: {rmse:.4f}")
    plt.axis("off")
    plt.subplot(1, 3, 3)
    plt.imshow(np.asarray(gt_depth), cmap="plasma")
    plt.title("Pseudo-GT Depth")
    plt.axis("off")
    plt.tight_layout()
    plt.savefig(save_path, dpi=200)
    plt.close(fig)


def visualize_ir(thermal_raw: np.ndarray, save_path: Optional[str] = None):
    """Raw IR display: JET colormap over the fixed 21800..23700 window
    (visualize.py:577-596)."""
    fig = plt.figure(figsize=(8, 6))
    plt.imshow(np.asarray(thermal_raw), cmap="jet",
               vmin=FREIBURG_RAW_MIN, vmax=FREIBURG_VIZ_MAX)
    plt.colorbar(label="Raw counts")
    plt.axis("off")
    if save_path:
        plt.savefig(save_path, dpi=150)
        plt.close(fig)
        return None
    return fig


def remove_black_borders(img: np.ndarray, threshold: float = 100.0
                         ) -> np.ndarray:
    """Crop an IR frame to the bounding box of pixels above `threshold`
    (dead sensor borders read ~0 raw counts; visualize.py:250-264). Returns
    the input unchanged when everything is at/below threshold."""
    img = np.asarray(img)
    non_black = img > threshold
    rows, cols = np.any(non_black, axis=1), np.any(non_black, axis=0)
    if not rows.any() or not cols.any():
        return img
    r, c = np.where(rows)[0], np.where(cols)[0]
    return img[r[0]:r[-1] + 1, c[0]:c[-1] + 1]


def colorize_ir(ir, min_val: float = FREIBURG_RAW_MIN,
                max_val: float = FREIBURG_VIZ_MAX) -> np.ndarray:
    """IR raw counts → JET RGB uint8 array over the fixed display window
    (visualize_ir_standalone, visualize.py:347-378; the array-returning
    sibling of `visualize_ir`'s figure). Accepts a path or an array."""
    if isinstance(ir, str):
        import cv2

        ir = cv2.imread(ir, cv2.IMREAD_ANYDEPTH)
        if ir is None:
            raise FileNotFoundError(f"could not read IR image: {ir}")
    t = np.clip((np.asarray(ir, np.float32) - min_val)
                / max(max_val - min_val, 1e-6), 0, 1)
    return (plt.get_cmap("jet")(t)[..., :3] * 255).astype(np.uint8)


def visualize_ir_standalone(ir, min_val: float = FREIBURG_RAW_MIN,
                            max_val: float = FREIBURG_VIZ_MAX,
                            save_path: Optional[str] = None) -> np.ndarray:
    """Colorized IR with an optional before/after panel
    (visualize.py:347-378). Returns the colorized RGB uint8 array."""
    if isinstance(ir, str):
        import cv2

        ir = cv2.imread(ir, cv2.IMREAD_ANYDEPTH)
    ir = np.asarray(ir)
    colored = colorize_ir(ir, min_val, max_val)
    if save_path:
        fig, axes = plt.subplots(1, 2, figsize=(12, 5))
        axes[0].imshow(ir, cmap="gray")
        axes[0].set_title("Original")
        axes[1].imshow(colored)
        axes[1].set_title("Processed")
        for ax in axes:
            ax.axis("off")
        plt.tight_layout()
        fig.savefig(save_path, dpi=110)
        plt.close(fig)
    return colored


def visualize_enhanced_thermal(thermal_path: str, img_size=(224, 224),
                               min_val: Optional[float] = None,
                               max_val: Optional[float] = None,
                               cmap: str = "jet",
                               save_path: Optional[str] = None) -> np.ndarray:
    """Border-cropped + percentile-enhanced thermal display next to the raw
    JET view (visualize.py:236-345): load → remove black borders → the
    dataset-loader normalization (/65535) → resize → the SAME
    enhance_thermal_contrast the model sees → luma → 2/98-percentile display
    window → colormap. Returns the enhanced [H,W,3] float array (the model
    input), NHWC instead of the reference's CHW tensor."""
    import cv2

    import jax.numpy as jnp

    from thermal3d.preprocess.enhance import enhance_thermal_contrast

    raw = cv2.imread(thermal_path, cv2.IMREAD_ANYDEPTH)
    if raw is None:
        raise FileNotFoundError(f"could not read thermal image: {thermal_path}")
    cropped = remove_black_borders(raw)
    scale = 65535.0 if cropped.dtype == np.uint16 else 255.0
    img = cropped.astype(np.float32) / scale
    img = cv2.resize(img, tuple(img_size))
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    enhanced = np.asarray(enhance_thermal_contrast(jnp.asarray(img)))
    viz = (0.299 * enhanced[..., 0] + 0.587 * enhanced[..., 1]
           + 0.114 * enhanced[..., 2])
    if min_val is None or max_val is None:
        min_val, max_val = np.percentile(viz, (2, 98))
    viz = np.clip((viz - min_val) / (max_val - min_val + 1e-6), 0, 1)
    if save_path:
        fig, axes = plt.subplots(1, 2, figsize=(15, 6))
        axes[0].imshow(colorize_ir(raw))
        axes[0].set_title("Original Thermal Image")
        axes[1].imshow(viz, cmap=cmap)
        axes[1].set_title("Enhanced Thermal Image")
        for ax in axes:
            ax.axis("off")
        plt.tight_layout()
        fig.savefig(save_path, dpi=110)
        plt.close(fig)
    return enhanced


def overlay_rgb_thermal(rgb: np.ndarray, thermal: np.ndarray, alpha: float = 0.5
                        ) -> np.ndarray:
    """RGB/thermal blend (visualize.py:608-618). Returns [H,W,3] float."""
    rgb = np.clip(_to_hwc(rgb), 0, 1)
    t = np.asarray(thermal, dtype=np.float32)
    if t.ndim == 3:
        t = t.mean(axis=-1)
    t = (t - t.min()) / (t.max() - t.min() + 1e-6)
    heat = plt.get_cmap("jet")(t)[..., :3]
    return (1 - alpha) * rgb + alpha * heat


def plot_cameras(ax, pose1=None, pose2=None, size: float = 0.1):
    """Camera coordinate frames in an Axes3D (visualize.py:420-460): camera 1
    at the origin (identity reference frame), camera 2 at the relative pose,
    RGB-colored xyz quivers per camera and a dashed line linking the two."""
    origin = np.zeros(3)
    for vec, c in zip(np.eye(3) * size, "rgb"):
        ax.quiver(*origin, *vec, color=c)
    if pose2 is not None:
        pose2 = np.asarray(pose2)
        rot, t = pose2[:3, :3], pose2[:3, 3]
        for k, c in zip(range(3), "rgb"):
            vec = rot @ (np.eye(3)[k] * size)
            ax.quiver(*t, *vec, color=c)
        ax.plot([origin[0], t[0]], [origin[1], t[1]], [origin[2], t[2]], "k--")


def _scatter_pointmap(ax, pointmap, color_mode: str = "depth",
                      point_size: float = 1.0, color=None,
                      subsample: int = 1):
    """Valid-masked 3-D scatter of an [H,W,3] pointmap (visualize.py:396-418):
    depth-colored through viridis by default, or a fixed color."""
    pts = np.asarray(pointmap)[::subsample, ::subsample].reshape(-1, 3)
    valid = np.isfinite(pts).all(axis=1) & (pts[:, 2] > 0)
    pts = pts[valid]
    if color is not None:
        colors = color
    elif color_mode == "depth" and len(pts):
        depths = pts[:, 2]
        cmin, cmax = depths.min(), depths.max()
        denom = (cmax - cmin) if cmax > cmin else 1.0
        colors = plt.get_cmap("viridis")((depths - cmin) / denom)
    else:
        colors = "blue"
    ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=point_size, c=colors,
               marker=".")
    ax.set_xlabel("X")
    ax.set_ylabel("Y")
    ax.set_zlabel("Z")
    return pts


def plot_point_cloud(pointmap, color_img=None, pose=None, subsample: int = 4,
                     save_path: Optional[str] = None):
    """3-D scatter of a pointmap with full camera frames when a pose is given
    (visualize.py:396-461)."""
    pts = np.asarray(pointmap)[::subsample, ::subsample].reshape(-1, 3)
    valid = np.isfinite(pts).all(axis=1) & (pts[:, 2] > 0)
    pts = pts[valid]
    if color_img is not None:
        colors = np.clip(_to_hwc(color_img), 0, 1)[::subsample, ::subsample]
        colors = colors.reshape(-1, 3)[valid]
    else:
        colors = pts[:, 2]
    fig = plt.figure(figsize=(10, 8))
    ax = fig.add_subplot(111, projection="3d")
    sc = ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], c=colors, s=1,
                    cmap=None if color_img is not None else "plasma")
    if color_img is None:
        fig.colorbar(sc, shrink=0.6, label="Depth")
    if pose is not None:
        scale = float(np.percentile(pts[:, 2], 50)) * 0.15 if len(pts) else 1.0
        plot_cameras(ax, pose1=np.eye(4), pose2=np.asarray(pose), size=scale)
    ax.set_xlabel("X")
    ax.set_ylabel("Y")
    ax.set_zlabel("Z")
    if save_path:
        plt.savefig(save_path, dpi=150)
        plt.close(fig)
        return None
    return fig


def visualize_pair_full(rgb1, depth1, pointmap1, rgb2, depth2, pointmap2,
                        pose=None, intrinsics=None,
                        title: str = "Pair Visualization",
                        camera_size: float = 100.0,
                        save_path: Optional[str] = None):
    """Full pair panel (visualize.py:463-541): 2×3 grid with RGB1/Depth1,
    RGB2/Depth2, and a COMBINED 3-D view — pointmap1 depth-colored,
    pointmap2 in red, plus both camera frames and their link."""
    if intrinsics is not None:
        print("Intrinsics:\n", np.asarray(intrinsics))
    if pose is not None:
        print("Relative Pose:\n", np.asarray(pose))
    fig = plt.figure(figsize=(16, 10))
    fig.suptitle(title, fontsize=16)
    for idx, (img, name) in ((1, (rgb1, "RGB Image 1")),
                             (4, (rgb2, "RGB Image 2"))):
        ax = fig.add_subplot(2, 3, idx)
        ax.imshow(np.clip(_to_hwc(img), 0, 1))
        ax.set_title(name)
        ax.axis("off")
    for idx, (d, name) in ((2, (depth1, "Depth 1")), (5, (depth2, "Depth 2"))):
        ax = fig.add_subplot(2, 3, idx)
        im = ax.imshow(np.asarray(d), cmap="plasma")
        ax.set_title(name)
        ax.axis("off")
        fig.colorbar(im, ax=ax, fraction=0.046, pad=0.04, label="Depth")
    ax3 = fig.add_subplot(2, 3, 3, projection="3d")
    _scatter_pointmap(ax3, pointmap1, color_mode="depth", point_size=0.5)
    _scatter_pointmap(ax3, pointmap2, point_size=0.5, color="red")
    plot_cameras(ax3, pose1=np.eye(4), pose2=pose, size=camera_size)
    ax3.set_title("3D View with Combined Camera Poses")
    plt.tight_layout()
    if save_path:
        plt.savefig(save_path, dpi=150)
        plt.close(fig)
        return None
    return fig


def visualize_pair_merged_full(rgb1, depth1, pointmap1, rgb2, depth2,
                               pointmap2, title: str = "Pair Visualization",
                               save_path: Optional[str] = None):
    """Merged pair panel (visualize.py:725-818): 2×3 grid where each view
    gets its OWN 3-D pointmap subplot (RGB | depth | cloud per row)."""
    fig = plt.figure(figsize=(16, 10))
    fig.suptitle(title, fontsize=16)
    rows = [(rgb1, depth1, pointmap1, "1", 0), (rgb2, depth2, pointmap2, "2", 3)]
    for rgb, depth, pm, n, off in rows:
        ax = fig.add_subplot(2, 3, off + 1)
        ax.imshow(np.clip(_to_hwc(rgb), 0, 1))
        ax.set_title(f"RGB Image {n}")
        ax.axis("off")
        ax = fig.add_subplot(2, 3, off + 2)
        im = ax.imshow(np.asarray(depth), cmap="plasma")
        ax.set_title(f"Depth {n}")
        ax.axis("off")
        fig.colorbar(im, ax=ax, fraction=0.046, pad=0.04, label="Depth")
        ax = fig.add_subplot(2, 3, off + 3, projection="3d")
        _scatter_pointmap(ax, pm, color_mode="depth", point_size=0.5)
        ax.set_title(f"3D Pointmap {n}")
    plt.tight_layout()
    if save_path:
        plt.savefig(save_path, dpi=150)
        plt.close(fig)
        return None
    return fig


def visualize_pair_from_dir(pseudo_gt_dir: str, pair_name: str,
                            rgb1=None, rgb2=None, merged: bool = False,
                            save_path: Optional[str] = None):
    """Drive the full pair panels from the 8-directory pseudo-GT layout the
    generator writes (pseudo_gt.py:519-592): loads pointmap/depth/intrinsics/
    pose npys by pair name. rgb1/rgb2 default to depth-shaped gray frames
    when the original RGB files are unavailable."""
    import glob
    import os

    def load(sub, name):
        p = os.path.join(pseudo_gt_dir, sub, name + ".npy")
        if not os.path.exists(p):
            # pointmap1 files carry a base-name prefix before the pair name
            # (dataset_loader.py:147-165 glob heuristics)
            hits = sorted(glob.glob(
                os.path.join(pseudo_gt_dir, sub, f"*{name}.npy")))
            if not hits:
                raise FileNotFoundError(p)
            p = hits[0]
        return np.load(p)

    pm1 = load("pointmap1", pair_name)
    pm2 = load("pointmap2", pair_name)
    d1, d2 = pm1[..., 2], pm2[..., 2]
    pose = load("poses", pair_name)
    intr = load("intrinsics", pair_name)

    def gray(d):
        span = float(np.ptp(d)) + 1e-6
        return np.repeat(((d - d.min()) / span)[..., None], 3, -1)

    if rgb1 is None:
        rgb1 = gray(d1)
    if rgb2 is None:
        rgb2 = gray(d2)
    if merged:
        return visualize_pair_merged_full(rgb1, d1, pm1, rgb2, d2, pm2,
                                          title=pair_name, save_path=save_path)
    return visualize_pair_full(rgb1, d1, pm1, rgb2, d2, pm2, pose=pose,
                               intrinsics=intr, title=pair_name,
                               save_path=save_path)


def visualize_depth_result(thermal_img, depth, confidence=None,
                           save_path: Optional[str] = None):
    """Inference result panel: input | depth | confidence
    (thermal_dustr_inference.py:162-294)."""
    n = 3 if confidence is not None else 2
    fig = plt.figure(figsize=(5 * n, 5))
    plt.subplot(1, n, 1)
    plt.imshow(np.clip(_to_hwc(thermal_img), 0, 1))
    plt.title("Thermal Input")
    plt.axis("off")
    plt.subplot(1, n, 2)
    plt.imshow(np.asarray(depth), cmap="plasma")
    plt.colorbar(shrink=0.8)
    plt.title("Predicted Depth")
    plt.axis("off")
    if confidence is not None:
        plt.subplot(1, n, 3)
        plt.imshow(np.asarray(confidence), cmap="viridis")
        plt.colorbar(shrink=0.8)
        plt.title("Confidence")
        plt.axis("off")
    plt.tight_layout()
    if save_path:
        plt.savefig(save_path, dpi=150)
        plt.close(fig)
        return None
    return fig
