"""Thermal camera calibration loaders (scripts/pseudo_gt.py:232-289).

Host-side config parsing: JSON ({intrinsic:[fx,fy,cx,cy], rotation,
translation} — calibrations/t_calib.json layout) and Kalibr-style YAML stereo
(left/right intrinsics + T_cn_cnm1).
"""

from __future__ import annotations

import json
from typing import Optional, Tuple

import numpy as np


def _k_from_fxfycxcy(fx, fy, cx, cy) -> np.ndarray:
    return np.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]])


def load_thermal_calibration(calib_path: str) -> Tuple[np.ndarray, Optional[np.ndarray], Optional[np.ndarray]]:
    if calib_path.endswith(".json"):
        with open(calib_path) as f:
            calib = json.load(f)
        fx, fy, cx, cy = calib["intrinsic"]
        k = _k_from_fxfycxcy(fx, fy, cx, cy)
        r = np.array(calib["rotation"])
        t = np.array(calib["translation"])
        return k, r, t
    if calib_path.endswith(".yaml"):
        import yaml

        with open(calib_path) as f:
            calib = yaml.safe_load(f)
        fx, fy, cx, cy = calib["left"]["intrinsics"]
        k_left = _k_from_fxfycxcy(fx, fy, cx, cy)
        if "right" in calib:
            fx_r, fy_r, cx_r, cy_r = calib["right"]["intrinsics"]
            k_right = _k_from_fxfycxcy(fx_r, fy_r, cx_r, cy_r)
            t_right_left = np.array(calib["right"]["T_cn_cnm1"])
            return k_left, k_right, t_right_left
        return k_left, None, None
    raise ValueError(f"Unsupported calibration file format: {calib_path}")
