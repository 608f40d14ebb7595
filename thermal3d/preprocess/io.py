"""Host-side image IO and the decode→device preprocessing pipeline.

PNG decode is inherently host work (SURVEY.md §7 hard part 5); everything
after decode (normalize, resize, enhance) is device-side jnp. This module is
the seam where the native C++ batch decoder can be swapped in transparently
(thermal3d.native).

Reference behaviors reproduced:
  * load_and_preprocess_thermal_image (thermal_dustr_inference.py:25-60):
    IMREAD_ANYDEPTH, uint16 → /65535 else /255, gray → 3 channels, resize,
    percentile contrast enhancement.
  * training loader keeps RAW uint16 counts before percentile enhancement
    (data/dataset_loader.py:237-249) — equivalent under the scale-invariant
    percentile rescale, exposed via `normalize=False`.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False

from thermal3d.preprocess.enhance import enhance_thermal_contrast
from thermal3d.preprocess.resize import resize_bilinear_hw


def _imread_anydepth(path: str) -> Optional[np.ndarray]:
    if _HAS_CV2:
        img = cv2.imread(path, cv2.IMREAD_ANYDEPTH)
        if img is None:
            img = cv2.imread(path)
            if img is None:
                return None
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        return img
    from PIL import Image  # fallback decoder

    with Image.open(path) as im:
        arr = np.array(im)
    return arr


def load_thermal_image(path: str, normalize: bool = True) -> Optional[np.ndarray]:
    """Decode a thermal frame → float32 [H, W] (raw counts or normalized)."""
    if not os.path.exists(path):
        return None
    img = _imread_anydepth(path)
    if img is None:
        return None
    # Branch on the DECODED dtype (thermal_dustr_inference.py:36-40: `dtype ==
    # np.uint16`), not on pixel max: a dark uint16 frame with max ≤ 255 must
    # still scale by 65535, or enhance_thermal_fixed_range reconstructs wrong
    # raw counts downstream.
    is_uint16 = img.dtype == np.uint16
    is_float = np.issubdtype(img.dtype, np.floating)
    if img.ndim == 3:
        img = img.mean(axis=-1)
    img = img.astype(np.float32)
    if normalize:
        if is_uint16:
            img = img / 65535.0
        elif not is_float:  # uint8 and friends
            img = img / 255.0
    return img


def load_thermal_images_batch(paths, normalize: bool = True,
                              out_hw: Optional[Tuple[int, int]] = None):
    """Batch-decode thermal frames → (list of float32 [h, w], surviving paths).

    When `out_hw` is given and every path is a PNG, decode+resize runs through
    the native C++ thread-pool loader (thermal3d.native — the TPU-native
    answer to the reference's cv2-in-DataLoader-workers decode at
    data/dataset_loader.py:237-266); otherwise falls back to per-image
    cv2/PIL decode at original resolution. Failed decodes are dropped from
    both lists (matching the reference's None-skipping)."""
    paths = list(paths)
    if out_hw is not None and paths and all(p.lower().endswith(".png") for p in paths):
        from thermal3d import native

        if native.available():
            arr, ok = native.load_thermal_batch(paths, tuple(out_hw),
                                                normalize=normalize)
            grays = [arr[i] for i in range(len(paths)) if ok[i]]
            survivors = [p for p, o in zip(paths, ok) if o]
            return grays, survivors
    grays, survivors = [], []
    for p in paths:
        g = load_thermal_image(p, normalize=normalize)
        if g is not None:
            grays.append(g)
            survivors.append(p)
    return grays, survivors


def decode_thermal_batch(paths, out_hw: Tuple[int, int], normalize: bool = False):
    """Aligned batch decode+resize → (float32 [N, H, W], ok bool [N]).

    Rows stay aligned with `paths` (failed decodes are zero-filled with
    ok=False) — the building block for batch-level dataset loading where the
    caller handles dropping. Native C++ pool when available, else per-image
    cv2/PIL decode + resize."""
    paths = list(paths)
    h, w = out_hw
    if paths and all(p.lower().endswith(".png") for p in paths):
        from thermal3d import native

        if native.available():
            return native.load_thermal_batch(paths, (h, w), normalize=normalize)
    out = np.zeros((len(paths), h, w), dtype=np.float32)
    ok = np.zeros(len(paths), dtype=bool)
    for i, p in enumerate(paths):
        g = load_thermal_image(p, normalize=normalize)
        if g is None:
            continue
        if g.shape != (h, w):
            if _HAS_CV2:
                g = cv2.resize(g, (w, h))
            else:
                g = np.asarray(jax.image.resize(jnp.asarray(g), (h, w),
                                                "bilinear", antialias=False))
        out[i] = g
        ok[i] = True
    return out, ok


def load_rgb_image(path: str) -> Optional[np.ndarray]:
    """Decode an RGB frame → float32 [H, W, 3] in [0, 1]."""
    if not os.path.exists(path):
        return None
    if _HAS_CV2:
        img = cv2.imread(path)
        if img is None:
            return None
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    else:
        from PIL import Image

        with Image.open(path) as im:
            img = np.array(im.convert("RGB"))
    return img.astype(np.float32) / 255.0


@functools.partial(jax.jit, static_argnames=("out_hw",))
def _resize_enhance(gray: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Device-side: bilinear resize + percentile contrast → [H, W, 3]."""
    resized = resize_bilinear_hw(gray, out_hw)
    return enhance_thermal_contrast(resized)


def preprocess_thermal_for_model(
    path: str, img_size: Tuple[int, int] = (224, 224)
) -> Optional[np.ndarray]:
    """Full inference-time preprocessing of one thermal frame
    (thermal_dustr_inference.py:25-60): decode → normalize → resize →
    percentile enhance → [H, W, 3] float32 in [0, 1]."""
    gray = load_thermal_image(path, normalize=True)
    if gray is None:
        return None
    return np.asarray(_resize_enhance(jnp.asarray(gray), tuple(img_size)))


def preprocess_thermal_batch(paths, img_size: Tuple[int, int] = (224, 224)) -> np.ndarray:
    """Decode a list of frames on host, then one batched device kernel."""
    grays = [load_thermal_image(p, normalize=True) for p in paths]
    grays = [g for g in grays if g is not None]
    if not grays:
        return np.zeros((0, *img_size, 3), dtype=np.float32)
    hw = grays[0].shape
    stack = np.stack([g if g.shape == hw else np.asarray(
        jax.image.resize(jnp.asarray(g), hw, method="bilinear", antialias=False)) for g in grays])
    return np.asarray(_batched_resize_enhance(jnp.asarray(stack), tuple(img_size)))


@functools.partial(jax.jit, static_argnames=("out_hw",))
def _batched_resize_enhance(grays: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    resized = resize_bilinear_hw(grays, out_hw)
    return enhance_thermal_contrast(resized)
