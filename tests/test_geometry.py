"""Geometry: Umeyama alignment, relative pose, intrinsics estimation."""

import numpy as np
import pytest

from thermal3d.geometry.umeyama import (
    GeometryException,
    extract_relative_pose,
    umeyama_alignment,
)
from thermal3d.geometry.intrinsics import estimate_camera_intrinsics


def _random_rotation(rng):
    a = rng.standard_normal((3, 3))
    q, _ = np.linalg.qr(a)
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q


def test_umeyama_recovers_known_transform(rng):
    r_true = _random_rotation(rng)
    t_true = rng.standard_normal(3)
    x = rng.standard_normal((3, 200))
    y = r_true @ x + t_true[:, None]
    r, t, c = umeyama_alignment(x, y, with_scale=False)
    np.testing.assert_allclose(r, r_true, atol=1e-4)
    np.testing.assert_allclose(t, t_true, atol=1e-4)
    assert c == 1.0


def test_umeyama_with_scale(rng):
    r_true = _random_rotation(rng)
    s_true = 2.5
    x = rng.standard_normal((3, 300))
    y = s_true * (r_true @ x) + 1.0
    r, t, c = umeyama_alignment(x, y, with_scale=True)
    np.testing.assert_allclose(c, s_true, rtol=1e-3)
    np.testing.assert_allclose(r, r_true, atol=1e-4)


def test_umeyama_shape_mismatch_raises():
    with pytest.raises(GeometryException):
        umeyama_alignment(np.zeros((3, 5)), np.zeros((3, 6)))


def test_umeyama_degenerate_raises():
    x = np.zeros((3, 50))  # all identical points → rank 0
    y = np.zeros((3, 50))
    with pytest.raises(GeometryException):
        umeyama_alignment(x, y)


def test_extract_relative_pose_identity_when_same(rng):
    pm = rng.uniform(0.1, 5.0, (16, 16, 3)).astype(np.float32)
    t = extract_relative_pose(pm, pm)
    np.testing.assert_allclose(t, np.eye(4), atol=1e-4)


def test_extract_relative_pose_known_rigid(rng):
    r_true = _random_rotation(rng).astype(np.float32)
    t_true = np.array([0.5, -0.2, 0.3], dtype=np.float32)
    pm1 = rng.uniform(1.0, 5.0, (24, 24, 3)).astype(np.float32)
    pm2 = (pm1.reshape(-1, 3) @ r_true.T + t_true).reshape(24, 24, 3)
    if (pm2[..., 2] <= 0).any():
        pm2[..., 2] = np.abs(pm2[..., 2]) + 0.1
        pm1 = ((pm2.reshape(-1, 3) - t_true) @ r_true).reshape(24, 24, 3)
    t = extract_relative_pose(pm1, pm2)
    np.testing.assert_allclose(t[:3, :3], r_true, atol=1e-3)
    np.testing.assert_allclose(t[:3, 3], t_true, atol=1e-3)


def test_extract_relative_pose_nan_invalid_pixels(rng):
    """NaN at invalid (Z≤0) pixels must not poison the weighted solve
    (0·NaN = NaN — ADVICE r1): same rigid transform must be recovered."""
    r_true = _random_rotation(rng).astype(np.float32)
    t_true = np.array([0.1, 0.2, -0.1], dtype=np.float32)
    pm1 = rng.uniform(1.0, 5.0, (24, 24, 3)).astype(np.float32)
    pm2 = (pm1.reshape(-1, 3) @ r_true.T + t_true).reshape(24, 24, 3)
    if (pm2[..., 2] <= 0).any():
        pm2[..., 2] = np.abs(pm2[..., 2]) + 0.1
        pm1 = ((pm2.reshape(-1, 3) - t_true) @ r_true).reshape(24, 24, 3)
    pm1_nan, pm2_nan = pm1.copy(), pm2.copy()
    pm1_nan[:4, :4] = np.nan  # invalid pixels carry NaN, like real pointmaps
    pm2_nan[-3:, -3:] = np.inf
    t = extract_relative_pose(pm1_nan, pm2_nan)
    assert np.isfinite(t).all()
    np.testing.assert_allclose(t[:3, :3], r_true, atol=1e-3)
    np.testing.assert_allclose(t[:3, 3], t_true, atol=1e-3)


def test_extract_relative_pose_too_few_points():
    pm1 = np.zeros((8, 8, 3), dtype=np.float32)  # no valid Z
    pm2 = np.zeros((8, 8, 3), dtype=np.float32)
    np.testing.assert_allclose(extract_relative_pose(pm1, pm2), np.eye(4))


def test_intrinsics_estimation_roundtrip(rng):
    """Project synthetic points with known K; the median fit recovers fx/fy."""
    h, w = 64, 64
    fx, fy = 120.0, 110.0
    v, u = np.indices((h, w)).astype(np.float32)
    z = rng.uniform(2.0, 10.0, (h, w)).astype(np.float32)
    x = (u - w / 2) / fx * z
    y = (v - h / 2) / fy * z
    pointmap = np.stack([x, y, z], axis=-1)
    k = estimate_camera_intrinsics(pointmap, z)
    np.testing.assert_allclose(k[0, 0], fx, rtol=1e-3)
    np.testing.assert_allclose(k[1, 1], fy, rtol=1e-3)
    assert k[0, 2] == w / 2 and k[1, 2] == h / 2


def test_intrinsics_from_calibration_file(tmp_path):
    import json

    calib = dict(intrinsic=[100.0, 105.0, 32.0, 32.0],
                 rotation=np.eye(3).tolist(), translation=[0, 0, 0])
    p = tmp_path / "calib.json"
    p.write_text(json.dumps(calib))
    k = estimate_camera_intrinsics(np.zeros((4, 4, 3)), np.zeros((4, 4)), str(p))
    assert k[0, 0] == 100.0 and k[1, 1] == 105.0
