"""Freiburg Thermal dataset indexing and sample loading.

Host-side re-design of data/dataset_loader.py, data/freiburg_dataset.py and
scripts/pseudo_gt.py:379-505. Index building keeps the reference's directory
walk and path-derivation rules exactly (train/<seq>/<drive>/fl_ir_aligned/*.png,
fl_ir_aligned→fl_rgb substitution, temporal pairs with frame_skip, pseudo-GT
glob matching). Sample loading returns fixed-shape float32 numpy — the
None-returning loaders + skip_none_collate of the reference are replaced by
EAGER index validation (SURVEY.md §5 failure-detection plan): bad files are
dropped up front, so the jitted train step never sees a ragged batch.

Percentile enhancement happens ON DEVICE inside the jitted step (the loader
ships raw resized frames), so the host does decode+resize only.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from thermal3d.preprocess.io import load_rgb_image, load_thermal_image

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False


def _list_dirs(path: str) -> List[str]:
    return sorted(d for d in os.listdir(path) if os.path.isdir(os.path.join(path, d)))


def day_night_filter(sequences: Sequence[str], day_only: bool = False,
                     night_only: bool = False) -> List[str]:
    """'day'/'night' substring filtering (freiburg_dataset.py:178-183)."""
    if day_only:
        return [s for s in sequences if "day" in s]
    if night_only:
        return [s for s in sequences if "night" in s]
    return list(sequences)


def build_pair_index(root_dir: str, sequences: Optional[Sequence[str]] = None,
                     frame_skip: int = 1) -> List[Dict[str, str]]:
    """Thermal temporal-pair index (dataset_loader.py:36-93)."""
    train_dir = os.path.join(root_dir, "train")
    if sequences is None:
        sequences = _list_dirs(train_dir)
    pairs = []
    for seq_name in sequences:
        seq_dir = os.path.join(train_dir, seq_name)
        if not os.path.isdir(seq_dir):
            continue
        for drive in _list_dirs(seq_dir):
            thermal_dir = os.path.join(seq_dir, drive, "fl_ir_aligned")
            if not os.path.isdir(thermal_dir):
                continue
            thermal_files = sorted(glob.glob(os.path.join(thermal_dir, "*.png")))
            for i in range(len(thermal_files) - frame_skip):
                t1, t2 = thermal_files[i], thermal_files[i + frame_skip]
                r1 = t1.replace("fl_ir_aligned", "fl_rgb").replace("fl_ir_aligned_", "fl_rgb_")
                r2 = t2.replace("fl_ir_aligned", "fl_rgb").replace("fl_ir_aligned_", "fl_rgb_")
                if os.path.exists(r1) and os.path.exists(r2):
                    pairs.append({
                        "thermal1": t1, "thermal2": t2, "rgb1": r1, "rgb2": r2,
                        "sequence": seq_name, "drive": drive,
                    })
    return pairs


def build_rgb_thermal_index(root_dir: str, sequences: Optional[Sequence[str]] = None
                            ) -> List[Dict[str, str]]:
    """Per-frame RGB↔thermal matching (freiburg_dataset.py:37-96): match by
    index when counts agree, else by leading-token filename key."""
    train_dir = os.path.join(root_dir, "train")
    if sequences is None:
        sequences = _list_dirs(train_dir)
    pairs = []
    for seq_name in sequences:
        seq_dir = os.path.join(train_dir, seq_name)
        if not os.path.isdir(seq_dir):
            continue
        for drive in _list_dirs(seq_dir):
            drive_path = os.path.join(seq_dir, drive)
            rgb_files = sorted(glob.glob(os.path.join(drive_path, "fl_rgb", "*.png")))
            thermal_files = sorted(glob.glob(os.path.join(drive_path, "fl_ir_aligned", "*.png")))
            if not rgb_files or not thermal_files:
                for subdir in _list_dirs(drive_path):
                    sp = os.path.join(drive_path, subdir)
                    rgb_files.extend(sorted(glob.glob(os.path.join(sp, "*rgb*.png"))))
                    thermal_files.extend(sorted(glob.glob(os.path.join(sp, "*ir*.png"))))
            if len(rgb_files) == len(thermal_files):
                for r, t in zip(rgb_files, thermal_files):
                    pairs.append({"rgb": r, "thermal": t, "sequence": seq_name, "drive": drive})
            else:
                rb = {os.path.splitext(os.path.basename(f))[0].split("_")[0]: f for f in rgb_files}
                tb = {os.path.splitext(os.path.basename(f))[0].split("_")[0]: f
                      for f in thermal_files}
                for key in sorted(set(rb) & set(tb)):
                    pairs.append({"rgb": rb[key], "thermal": tb[key],
                                  "sequence": seq_name, "drive": drive})
    return pairs


def build_rgb_pair_index(root_dir: str, sequences: Optional[Sequence[str]] = None,
                         frame_skip: int = 5) -> List[Dict[str, str]]:
    """RGB temporal pairs for pseudo-GT generation (pseudo_gt.py:379-470),
    including the sequence auto-discovery heuristics and the requirement that
    corresponding thermal frames exist."""
    train_dir = os.path.join(root_dir, "train")
    if not os.path.isdir(train_dir):
        train_dir = root_dir
    if sequences is None:
        sequences = []
        for item in sorted(os.listdir(train_dir)):
            item_path = os.path.join(train_dir, item)
            if os.path.isdir(item_path) and (
                "seq" in item.lower()
                or os.path.exists(os.path.join(item_path, "fl_rgb"))
                or any("rgb" in f.lower() for f in os.listdir(item_path)
                       if os.path.isfile(os.path.join(item_path, f)))
            ):
                sequences.append(item)
    pairs = []
    for seq_name in sequences:
        seq_dir = os.path.join(train_dir, seq_name)
        if not os.path.isdir(seq_dir):
            continue
        for drive in _list_dirs(seq_dir):
            drive_path = os.path.join(seq_dir, drive)
            rgb_dir = os.path.join(drive_path, "fl_rgb")
            if os.path.isdir(rgb_dir):
                rgb_files = sorted(glob.glob(os.path.join(rgb_dir, "*.png")))
            else:
                rgb_files = []
                for subdir in _list_dirs(drive_path):
                    rgb_files.extend(
                        sorted(glob.glob(os.path.join(drive_path, subdir, "*rgb*.png"))))
            for i in range(len(rgb_files) - frame_skip):
                r1, r2 = rgb_files[i], rgb_files[i + frame_skip]
                t1 = r1.replace("fl_rgb", "fl_ir_aligned").replace("rgb", "ir")
                t2 = r2.replace("fl_rgb", "fl_ir_aligned").replace("rgb", "ir")
                if os.path.exists(t1) and os.path.exists(t2):
                    pairs.append({
                        "rgb_path1": r1, "rgb_path2": r2,
                        "thermal_path1": t1, "thermal_path2": t2,
                        "sequence": seq_name, "drive": drive,
                        "frame_idx1": i, "frame_idx2": i + frame_skip,
                    })
    return pairs


def match_pseudo_gt(pair: Dict[str, str], pseudo_gt_dir: str) -> Optional[Dict[str, str]]:
    """Flexible pseudo-GT file matching (dataset_loader.py:143-201):
    glob pointmap1/{rgb1_base}_*.npy, derive pair name and second base name,
    resolve pointmap2/confidence{1,2}/depth{1,2}/poses paths."""
    base1 = os.path.splitext(os.path.basename(pair["rgb1"]))[0]
    matches = glob.glob(os.path.join(pseudo_gt_dir, "pointmap1", f"{base1}_*.npy"))
    if not matches:
        return None
    pointmap1_path = sorted(matches)[0]
    pair_name = os.path.splitext(os.path.basename(pointmap1_path))[0]
    second_idx = pair_name.find("_", pair_name.find(base1) + len(base1))
    second_base = pair_name[second_idx + 1:]

    def p(sub, name):
        path = os.path.join(pseudo_gt_dir, sub, f"{name}.npy")
        return path if os.path.exists(path) else None

    return {
        "pointmap1": pointmap1_path,
        "pointmap2": p("pointmap2", pair_name),
        "confidence1": p("confidence1", pair_name),
        "confidence2": p("confidence2", pair_name),
        "depth1": p("depth1", base1),
        "depth2": p("depth2", second_base),
        "pose": p("poses", pair_name),
    }


def validate_pair_index(pairs: List[Dict[str, str]], pseudo_gt_dir: Optional[str] = None,
                        require_pointmaps: bool = True) -> List[Dict]:
    """Eagerly resolve pseudo-GT paths and drop incomplete pairs — the
    static-shape replacement for runtime None-skipping (SURVEY.md §5)."""
    valid = []
    for pair in pairs:
        entry = dict(pair)
        if pseudo_gt_dir:
            gt = match_pseudo_gt(pair, pseudo_gt_dir)
            if gt is None or (require_pointmaps and
                              (gt["pointmap1"] is None or gt["pointmap2"] is None)):
                continue
            entry["gt"] = gt
        valid.append(entry)
    return valid


def _resize(img: np.ndarray, size_wh: Tuple[int, int]) -> np.ndarray:
    if _HAS_CV2:
        return cv2.resize(img, size_wh)
    import jax.image
    import jax.numpy as jnp

    out_shape = (size_wh[1], size_wh[0]) + img.shape[2:]
    return np.asarray(jax.image.resize(jnp.asarray(img), out_shape, method="bilinear", antialias=False))


class FreiburgRGBThermalDataset:
    """Per-frame RGB+thermal dataset (SURVEY C7, data/freiburg_dataset.py:14-168):
    matches RGB↔thermal per frame and attaches the FLAT pseudo-GT layout
    (depth/, intrinsics/, poses/ keyed by the frame base name)."""

    def __init__(self, root_dir: str, sequences=None, img_size=(224, 224),
                 use_pseudo_gt: bool = False, pseudo_gt_dir: Optional[str] = None):
        self.img_size = tuple(img_size)
        self.pseudo_gt_dir = pseudo_gt_dir if use_pseudo_gt else None
        self.pairs = build_rgb_thermal_index(root_dir, sequences)

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, idx: int) -> Optional[Dict[str, np.ndarray]]:
        pair = self.pairs[idx]
        h, w = self.img_size
        rgb = load_rgb_image(pair["rgb"])
        thermal = load_thermal_image(pair["thermal"], normalize=False)
        if rgb is None or thermal is None:
            return None
        sample: Dict[str, np.ndarray] = {
            "rgb": _resize(rgb, (w, h)).astype(np.float32),
            "thermal": np.repeat(_resize(thermal, (w, h))[..., None], 3,
                                 axis=-1).astype(np.float32),
        }
        if self.pseudo_gt_dir:
            base = os.path.splitext(os.path.basename(pair["rgb"]))[0]
            for sub, key in [("depth", "depth"), ("intrinsics", "intrinsics"),
                             ("poses", "pose")]:
                p = os.path.join(self.pseudo_gt_dir, sub, f"{base}.npy")
                if os.path.exists(p):
                    sample[key] = np.load(p).astype(np.float32)
        return sample


def create_freiburg_dataloaders(root_dir: str, batch_size: int = 8,
                                img_size=(224, 224), split: float = 0.8,
                                pseudo_gt_dir: Optional[str] = None,
                                day_only: bool = False, night_only: bool = False,
                                seed: int = 0):
    """Loader factory (freiburg_dataset.py:170-206): day/night filter, random
    0.8 split, train(shuffled)/val loaders."""
    from thermal3d.data.pipeline import BatchLoader, split_index

    train_dir = os.path.join(root_dir, "train")
    sequences = day_night_filter(_list_dirs(train_dir), day_only, night_only)
    dataset = FreiburgRGBThermalDataset(
        root_dir, sequences=sequences, img_size=img_size,
        use_pseudo_gt=pseudo_gt_dir is not None, pseudo_gt_dir=pseudo_gt_dir)
    train_idx, val_idx = split_index(len(dataset), 1.0 - split, seed)
    train_loader = BatchLoader(dataset, train_idx, batch_size, shuffle=True, seed=seed)
    val_loader = BatchLoader(dataset, val_idx, batch_size, shuffle=False,
                             drop_last=False)
    return train_loader, val_loader


class FreiburgPairDataset:
    """Thermal pair dataset with pseudo-GT (SURVEY C6), numpy samples.

    Samples (all float32):
      thermal1/2   [H, W, 3]  raw-count frames resized (device enhances)
      pointmap1/2  [Hg, Wg, 3]
      confidence1/2 [Hg, Wg]  (ones when absent)
      pose         [4, 4]     (identity when absent)
    """

    def __init__(self, root_dir: str, sequences=None, img_size=(224, 224),
                 use_pseudo_gt: bool = True, pseudo_gt_dir: Optional[str] = None,
                 frame_skip: int = 1, gt_size: Optional[Tuple[int, int]] = None):
        self.img_size = tuple(img_size)
        self.gt_size = gt_size
        pairs = build_pair_index(root_dir, sequences, frame_skip)
        self.pairs = validate_pair_index(
            pairs, pseudo_gt_dir if use_pseudo_gt else None,
            require_pointmaps=use_pseudo_gt and pseudo_gt_dir is not None,
        )

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, idx: int) -> Optional[Dict[str, np.ndarray]]:
        pair = self.pairs[idx]
        h, w = self.img_size
        t1 = load_thermal_image(pair["thermal1"], normalize=False)
        t2 = load_thermal_image(pair["thermal2"], normalize=False)
        if t1 is None or t2 is None:
            return None
        t1 = _resize(t1, (w, h))
        t2 = _resize(t2, (w, h))
        sample: Dict[str, np.ndarray] = {
            "thermal1": np.repeat(t1[..., None], 3, axis=-1).astype(np.float32),
            "thermal2": np.repeat(t2[..., None], 3, axis=-1).astype(np.float32),
        }
        self._attach_gt(sample, pair)
        return sample

    def _attach_gt(self, sample: Dict[str, np.ndarray], pair: Dict) -> None:
        gt = pair.get("gt")
        if not gt:
            return
        pm1 = np.load(gt["pointmap1"]).astype(np.float32)
        pm2 = np.load(gt["pointmap2"]).astype(np.float32)
        sample["pointmap1"] = pm1
        sample["pointmap2"] = pm2
        ghw = pm1.shape[:2]
        for key in ("confidence1", "confidence2"):
            if gt.get(key):
                sample[key] = np.load(gt[key]).astype(np.float32)
            else:
                sample[key] = np.ones(ghw, dtype=np.float32)
        sample["pose"] = (np.load(gt["pose"]).astype(np.float32)
                          if gt.get("pose") else np.eye(4, dtype=np.float32))

    def debug_loading(self, idx: int = 0) -> Dict:
        """Index diagnostic (reference: FreiburgDataset.debug_loading,
        data/dataset_loader.py:219-235): print exactly which files sample
        `idx` resolves to, whether each exists, and the loaded shapes —
        the first tool to reach for when a training run sees 0 valid pairs.
        Returns the findings as a dict for programmatic use."""
        if not self.pairs:
            print("debug_loading: index is EMPTY (0 validated pairs) — check "
                  "root_dir layout (train/<seq>/<drive>/fl_ir_aligned/*.png) "
                  "and pseudo_gt_dir contents")
            return {"pairs": 0}
        idx = int(idx) % len(self.pairs)
        pair = self.pairs[idx]
        info: Dict = {"idx": idx}
        print(f"Loading sample {idx} of {len(self.pairs)}:")
        for key in ("thermal1", "thermal2", "rgb1", "rgb2"):
            path = pair.get(key)
            if path:
                exists = os.path.exists(path)
                info[key] = {"path": path, "exists": exists}
                print(f"  {key}: {path}  [exists: {exists}]")
        gt = pair.get("gt") or {}
        for key, path in gt.items():
            exists = bool(path) and os.path.exists(path)
            info[f"gt.{key}"] = {"path": path, "exists": exists}
            print(f"  gt.{key}: {path}  [exists: {exists}]")
        sample = self[idx]
        if sample is None:
            print("  -> sample FAILED to load (decode error)")
            info["loaded"] = None
        else:
            shapes = {k: tuple(v.shape) for k, v in sample.items()}
            info["loaded"] = shapes
            print(f"  -> loaded OK: " + ", ".join(
                f"{k}{s}" for k, s in shapes.items()))
        return info

    def get_batch(self, idxs) -> List[Dict[str, np.ndarray]]:
        """Batch-level loading: ONE native thread-pool decode+resize call for
        all 2B thermal frames of the batch (the training-pipeline host
        bottleneck, SURVEY §7 hard part 5), then per-sample pseudo-GT npy
        loads. Failed decodes drop the whole sample, matching __getitem__.
        BatchLoader prefers this over per-sample __getitem__ when present."""
        from thermal3d.preprocess.io import decode_thermal_batch

        pairs = [self.pairs[i] for i in idxs]
        h, w = self.img_size
        paths = [p["thermal1"] for p in pairs] + [p["thermal2"] for p in pairs]
        frames, ok = decode_thermal_batch(paths, (h, w), normalize=False)
        b = len(pairs)
        samples: List[Dict[str, np.ndarray]] = []
        kept: List[int] = []
        for i, pair in enumerate(pairs):
            if not (ok[i] and ok[b + i]):
                continue
            samples.append({
                "thermal1": np.repeat(frames[i][..., None], 3, axis=-1),
                "thermal2": np.repeat(frames[b + i][..., None], 3, axis=-1),
            })
            kept.append(i)
        # pseudo-GT npy loads (~2×3 MB pointmaps per sample at 512²) run in
        # parallel threads — serializing them here would bottleneck the host
        # path the batched decode just parallelized
        if kept:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(8, len(kept))) as ex:
                list(ex.map(lambda si: self._attach_gt(samples[si[0]],
                                                       pairs[si[1]]),
                            enumerate(kept)))
        return samples
