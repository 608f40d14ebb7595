"""Camera intrinsics estimation from pointmaps (scripts/pseudo_gt.py:137-184).

fx = median over valid pixels of (u − W/2)/(X/Z), fy analogous; principal
point at the image center. Masked medians via nan-quantiles — jit-safe.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def estimate_camera_intrinsics_jit(pointmap: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    h, w = depth.shape
    v, u = jnp.mgrid[0:h, 0:w]
    z = depth
    mask = z > 0
    zs = jnp.where(mask, z, 1.0)
    x_norm = pointmap[..., 0] / zs
    y_norm = pointmap[..., 1] / zs
    fx = jnp.nanmedian(jnp.where(mask, (u - w / 2) / x_norm, jnp.nan))
    fy = jnp.nanmedian(jnp.where(mask, (v - h / 2) / y_norm, jnp.nan))
    return jnp.array([[fx, 0.0, w / 2], [0.0, fy, h / 2], [0.0, 0.0, 1.0]])


def estimate_camera_intrinsics(pointmap, depth, calib_path: Optional[str] = None) -> np.ndarray:
    """Estimate K, or load it from a calibration file when provided
    (pseudo_gt.py:141-148)."""
    if calib_path and os.path.exists(calib_path):
        try:
            from thermal3d.geometry.calibration import load_thermal_calibration

            k, _, _ = load_thermal_calibration(calib_path)
            return k
        except Exception:
            pass  # fall back to estimation, as the reference does
    return np.asarray(estimate_camera_intrinsics_jit(jnp.asarray(pointmap), jnp.asarray(depth)))
