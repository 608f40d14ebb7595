"""Preprocessing kernels vs numpy oracles of the reference formulas."""

import jax.numpy as jnp
import numpy as np
import pytest

from thermal3d.preprocess.enhance import (
    enhance_thermal_contrast,
    enhance_thermal_fixed_range,
)


def oracle_enhance_contrast(thermal_np):
    """utils/preprocessing.py:6-30 as numpy."""
    if thermal_np.ndim == 3:  # HWC here
        t = thermal_np
        if np.allclose(t[..., 0], t[..., 1]) and np.allclose(t[..., 0], t[..., 2]):
            g = t[..., 0]
        else:
            g = 0.299 * t[..., 0] + 0.587 * t[..., 1] + 0.114 * t[..., 2]
    else:
        g = thermal_np
    p2, p98 = np.percentile(g, (2, 98))
    e = np.clip((g - p2) / (p98 - p2), 0, 1)
    return np.repeat(e[..., None], 3, axis=-1)


def test_enhance_contrast_gray(rng):
    img = rng.uniform(0.3, 0.4, (48, 64)).astype(np.float32)
    img[10:20, 10:20] = 0.9
    ours = np.asarray(enhance_thermal_contrast(img))
    oracle = oracle_enhance_contrast(img)
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_enhance_contrast_identical_channels(rng):
    g = rng.uniform(0, 1, (32, 32)).astype(np.float32)
    img = np.repeat(g[..., None], 3, axis=-1)
    ours = np.asarray(enhance_thermal_contrast(img))
    oracle = oracle_enhance_contrast(img)
    np.testing.assert_allclose(ours, oracle, atol=1e-4)


def test_enhance_contrast_rgb(rng):
    img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    ours = np.asarray(enhance_thermal_contrast(img))
    oracle = oracle_enhance_contrast(img)
    np.testing.assert_allclose(ours, oracle, atol=1e-4)


def test_enhance_contrast_batched(rng):
    imgs = rng.uniform(0, 1, (4, 16, 16, 3)).astype(np.float32)
    ours = np.asarray(enhance_thermal_contrast(imgs))
    assert ours.shape == (4, 16, 16, 3)
    for i in range(4):
        np.testing.assert_allclose(ours[i], oracle_enhance_contrast(imgs[i]), atol=1e-4)


def test_enhance_contrast_scale_invariance(rng):
    """Raw uint16 counts vs /65535-normalized give identical outputs
    (SURVEY C5: training keeps raw counts; percentile rescale is
    scale-invariant)."""
    raw = rng.uniform(21000, 26000, (32, 32)).astype(np.float32)
    a = np.asarray(enhance_thermal_contrast(raw))
    b = np.asarray(enhance_thermal_contrast(raw / 65535.0))
    np.testing.assert_allclose(a, b, atol=1e-4)


def oracle_fixed_range(g, normalized=True):
    """utils/preprocessing.py:32-73 as numpy (grayscale input)."""
    if normalized:
        raw = g * 65535.0
    else:
        raw = g
    raw = np.clip(raw, 21800, 25000)
    return (raw - 21800) / (25000 - 21800)


def test_fixed_range_normalized(rng):
    g = rng.uniform(0.3, 0.42, (24, 24)).astype(np.float32)  # ~raw counts /65535
    ours = np.asarray(enhance_thermal_fixed_range(g, normalized=True))
    np.testing.assert_allclose(ours, oracle_fixed_range(g, True), atol=1e-5)


def test_fixed_range_raw(rng):
    g = rng.uniform(20000, 26000, (24, 24)).astype(np.float32)
    ours = np.asarray(enhance_thermal_fixed_range(g, normalized=False))
    np.testing.assert_allclose(ours, oracle_fixed_range(g, False), atol=1e-5)


def test_fixed_range_preserves_channels(rng):
    g = rng.uniform(0.3, 0.42, (8, 8, 3)).astype(np.float32)
    g = np.repeat(g[..., :1], 3, axis=-1)
    out = np.asarray(enhance_thermal_fixed_range(g))
    assert out.shape == (8, 8, 3)


# ---- matmul resize (preprocess/resize.py) ----

def test_resize_matmul_matches_jax_image(rng):
    """The matmul formulation must match jax.image.resize to f32 rounding
    (its weight matrices are extracted from jax.image.resize itself; the
    GEMM accumulates taps in a different order, so allow ~1e-5),
    up/downsample, with and without antialias."""
    import jax

    from thermal3d.preprocess.resize import resize_bilinear_hw

    for (hi, wi), (ho, wo) in [((320, 416), (224, 224)),
                               ((224, 224), (512, 512)),
                               ((37, 53), (24, 60))]:
        x = rng.uniform(0, 1, (3, hi, wi)).astype(np.float32)
        for aa in (False, True):
            ref = np.asarray(jax.image.resize(
                jnp.asarray(x), (3, ho, wo), method="bilinear", antialias=aa))
            got = np.asarray(resize_bilinear_hw(jnp.asarray(x), (ho, wo),
                                                antialias=aa))
            np.testing.assert_allclose(got, ref, atol=5e-5)


def test_resize_matmul_hwc_and_identity(rng):
    import jax

    from thermal3d.preprocess.resize import (resize_bilinear_hw,
                                             resize_bilinear_hwc)

    x = rng.uniform(0, 1, (2, 64, 48, 3)).astype(np.float32)
    ref = np.asarray(jax.image.resize(jnp.asarray(x), (2, 24, 24, 3),
                                      method="bilinear", antialias=False))
    got = np.asarray(resize_bilinear_hwc(jnp.asarray(x), (24, 24)))
    np.testing.assert_allclose(got, ref, atol=2e-6)
    # no-op resize returns the input unchanged
    same = resize_bilinear_hw(jnp.asarray(x[..., 0]), (64, 48))
    np.testing.assert_array_equal(np.asarray(same), x[..., 0])


def test_resize_matmul_align_corners_matches_torch(rng):
    """align_corners=True (the DPT-head convention, models/heads.py) must
    match torch F.interpolate(mode='bilinear', align_corners=True) — the
    reference's DPT runs through torch Interpolate — at f32 rounding,
    including the exact-×2 pyramid shapes and a non-integer ratio."""
    import jax
    import torch
    import torch.nn.functional as F

    from thermal3d.preprocess.resize import resize_bilinear_hwc

    for (hi, wi), (ho, wo) in [((12, 16), (24, 32)),      # DPT ×2 fusion
                               ((96, 128), (192, 256)),   # DPT ×2 head
                               ((17, 23), (40, 31))]:     # general ratio
        x = rng.uniform(-2, 2, (2, hi, wi, 5)).astype(np.float32)
        ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                            size=(ho, wo), mode="bilinear",
                            align_corners=True).permute(0, 2, 3, 1).numpy()
        got = np.asarray(resize_bilinear_hwc(
            jnp.asarray(x), (ho, wo), align_corners=True,
            precision=jax.lax.Precision.HIGHEST))
        # torch computes the interpolation weights with its own f32
        # rounding; ~1e-5 relative weight deviation is the agreement floor
        np.testing.assert_allclose(got, ref, atol=3e-5)


def test_resize_align_corners_matches_gather_form(rng):
    """The matmul align-corners resize must agree with the direct
    gather/lerp formulation (the pre-round-4 models/heads.py
    implementation, reproduced here) to f32 rounding — both build their
    weights from the same linspace(0, n-1, out) positions."""
    import jax

    from thermal3d.preprocess.resize import resize_bilinear_hwc

    def gather_resize(x, out_hw):
        h, w = x.shape[1:3]
        oh, ow = out_hw
        ys = jnp.linspace(0.0, h - 1.0, oh)
        xs = jnp.linspace(0.0, w - 1.0, ow)
        y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
        y1 = jnp.clip(y0 + 1, 0, h - 1)
        x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
        x1 = jnp.clip(x0 + 1, 0, w - 1)
        wy = (ys - y0).astype(x.dtype)[None, :, None, None]
        wx = (xs - x0).astype(x.dtype)[None, None, :, None]
        top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
        bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
        return top * (1 - wy) + bot * wy

    for (hi, wi), (ho, wo) in [((12, 16), (24, 32)), ((17, 23), (40, 31))]:
        x = jnp.asarray(rng.uniform(-2, 2, (2, hi, wi, 5)).astype(np.float32))
        ref = np.asarray(gather_resize(x, (ho, wo)))
        got = np.asarray(resize_bilinear_hwc(
            x, (ho, wo), align_corners=True,
            precision=jax.lax.Precision.HIGHEST))
        np.testing.assert_allclose(got, ref, atol=5e-6)
