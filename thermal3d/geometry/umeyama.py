"""Umeyama/Kabsch rigid alignment and relative-pose extraction — jnp.

Re-implements scripts/pseudo_gt.py:186-343 TPU-style: the closed-form Umeyama
solve (means → covariance → 3×3 SVD → Kabsch sign fix) is a single jitted
function; validity masking is handled with WEIGHTED statistics over all valid
points instead of the reference's host-side boolean indexing + random
1000-point subsample (pseudo_gt.py:205-208) — deterministic and a superset of
the sampled estimator. The <10-valid-points identity fallback
(pseudo_gt.py:196-198) is an in-graph `where`.
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
import numpy as np


class GeometryException(Exception):
    """Geometry-related errors (degenerate covariance, shape mismatch)."""


def _umeyama_core(x: jnp.ndarray, y: jnp.ndarray, w: jnp.ndarray, with_scale: bool):
    """Weighted Umeyama. x, y: [3, N]; w: [N] nonneg weights.

    Returns (r [3,3], t [3], c scalar, rank_ok bool).
    """
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    wn = w / wsum
    mean_x = x @ wn
    mean_y = y @ wn
    xc = x - mean_x[:, None]
    yc = y - mean_y[:, None]
    sigma_x = jnp.sum((xc * xc) @ wn)
    cov = (yc * wn[None, :]) @ xc.T  # [3, 3]
    u, d, vt = jnp.linalg.svd(cov)
    eps = jnp.finfo(d.dtype).eps
    rank_ok = jnp.sum(d > eps) >= x.shape[0] - 1
    s = jnp.eye(x.shape[0], dtype=x.dtype)
    flip = jnp.linalg.det(u) * jnp.linalg.det(vt) < 0
    s = s.at[-1, -1].set(jnp.where(flip, -1.0, 1.0))
    r = u @ s @ vt
    c = jnp.where(
        with_scale, (1.0 / jnp.maximum(sigma_x, 1e-12)) * jnp.trace(jnp.diag(d) @ s), 1.0
    )
    t = mean_y - c * (r @ mean_x)
    return r, t, c, rank_ok


@functools.partial(jax.jit, static_argnames=("with_scale",))
def umeyama_alignment_jit(x: jnp.ndarray, y: jnp.ndarray, with_scale: bool = False):
    w = jnp.ones(x.shape[1], dtype=x.dtype)
    r, t, c, _ = _umeyama_core(x, y, w, with_scale)
    return r, t, c


def umeyama_alignment(x, y, with_scale: bool = False):
    """Host API mirroring pseudo_gt.py:295-343: raises GeometryException on
    shape mismatch or degenerate covariance rank."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if x.shape != y.shape:
        raise GeometryException("Data matrices must have the same shape")
    w = jnp.ones(x.shape[1])
    r, t, c, rank_ok = _umeyama_core(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
                                     w.astype(jnp.float32), with_scale)
    if not bool(rank_ok):
        raise GeometryException("Degenerate covariance rank, Umeyama alignment is not possible")
    return np.asarray(r), np.asarray(t), float(c)


@jax.jit
def extract_relative_pose_jit(pointmap1: jnp.ndarray, pointmap2: jnp.ndarray) -> jnp.ndarray:
    """Relative pose between two [H, W, 3] pointmaps → [4, 4] transform.

    Valid = both Z > 0 (pseudo_gt.py:191-193); all valid points enter the
    weighted solve; <10 valid or degenerate rank → identity.
    """
    mask = (pointmap1[..., 2] > 0) & (pointmap2[..., 2] > 0)
    mask &= jnp.all(jnp.isfinite(pointmap1), -1) & jnp.all(jnp.isfinite(pointmap2), -1)
    # Zero-weighting alone is not enough: 0 * NaN = NaN, so invalid points must
    # be zeroed BEFORE entering the weighted mean/covariance products (the
    # reference boolean-indexes them away host-side, pseudo_gt.py:191-204).
    p1 = jnp.where(mask[..., None], pointmap1, 0.0)
    p2 = jnp.where(mask[..., None], pointmap2, 0.0)
    w = mask.reshape(-1).astype(jnp.float32)
    x = p1.reshape(-1, 3).T  # source
    y = p2.reshape(-1, 3).T  # target
    r, t, _, rank_ok = _umeyama_core(x, y, w, with_scale=False)
    ok = rank_ok & (jnp.sum(w) >= 10)
    transform = jnp.eye(4).at[:3, :3].set(r).at[:3, 3].set(t)
    return jnp.where(ok, transform, jnp.eye(4))


def extract_relative_pose(pointmap1, pointmap2) -> np.ndarray:
    return np.asarray(extract_relative_pose_jit(jnp.asarray(pointmap1), jnp.asarray(pointmap2)))
