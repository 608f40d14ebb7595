"""Loss kernels vs a torch oracle transcribing the reference formulas."""

import numpy as np
import torch
import torch.nn.functional as F

from thermal3d.losses.losses import (
    batched_enhanced_loss,
    confidence_weighted_regression_loss,
    enhanced_thermal_aware_loss,
    thermal_aware_loss,
)


def oracle_basic(p1, p2, g1, g2, c1=None, c2=None, alpha=0.2):
    """utils/loss.py:75-98 in torch."""
    l1 = torch.abs(p1 - g1).mean(dim=-1)
    l2 = torch.abs(p2 - g2).mean(dim=-1)
    c1 = torch.ones_like(l1) if c1 is None else c1
    c2 = torch.ones_like(l2) if c2 is None else c2
    c1 = torch.clamp(c1, 1e-5, 10.0)
    c2 = torch.clamp(c2, 1e-5, 10.0)
    return (c1 * l1 - alpha * torch.log(c1)).mean() + (c2 * l2 - alpha * torch.log(c2)).mean()


def oracle_enhanced(p1, p2, g1, g2, c1, c2, t1, t2, alpha=0.2, ew=0.5, sw=0.3, dw=0.3,
                    multi_scale=True):
    """utils/loss.py:100-305 in torch (2-D grayscale thermal inputs)."""
    basic = oracle_basic(p1, p2, g1, g2, c1, c2, alpha)
    tg1, tg2 = t1, t2
    d1, d2 = p1[..., 2], p2[..., 2]
    gd1, gd2 = g1[..., 2], g2[..., 2]
    edge = smooth = detail = 0.0
    for scale in ([1, 2] if multi_scale else [1]):
        if scale > 1:
            pool = lambda x: F.avg_pool2d(x.unsqueeze(0).unsqueeze(0), scale, scale).squeeze()
            t1s, t2s, d1s, d2s, g1s, g2s = map(pool, (tg1, tg2, d1, d2, gd1, gd2))
        else:
            t1s, t2s, d1s, d2s, g1s, g2s = tg1, tg2, d1, d2, gd1, gd2

        def grads(t):
            gx = torch.zeros_like(t)
            gy = torch.zeros_like(t)
            gx[:, :-1] = torch.abs(t[:, 1:] - t[:, :-1])
            gy[:-1, :] = torch.abs(t[1:, :] - t[:-1, :])
            return gx, gy

        gtx1, gty1 = grads(t1s)
        gtx2, gty2 = grads(t2s)
        gdx1, gdy1 = grads(d1s)
        gdx2, gdy2 = grads(d2s)
        ggx1, ggy1 = grads(g1s)
        ggx2, ggy2 = grads(g2s)
        eps = 1e-5
        ntx1 = gtx1 / (gtx1.mean() + eps)
        nty1 = gty1 / (gty1.mean() + eps)
        ntx2 = gtx2 / (gtx2.mean() + eps)
        nty2 = gty2 / (gty2.mean() + eps)
        tf = 8.0
        w1 = torch.exp(-torch.clamp(ntx1, 0, 0.4) * tf) * torch.exp(-torch.clamp(nty1, 0, 0.4) * tf)
        w2 = torch.exp(-torch.clamp(ntx2, 0, 0.5) * tf) * torch.exp(-torch.clamp(nty2, 0, 0.5) * tf)
        se1 = (gdx1 * (1 - w1)).mean() + (gdy1 * (1 - w1)).mean()
        se2 = (gdx2 * (1 - w2)).mean() + (gdy2 * (1 - w2)).mean()
        ss1 = (gdx1.pow(2) * w1).mean() + (gdy1.pow(2) * w1).mean()
        ss2 = (gdx2.pow(2) * w2).mean() + (gdy2.pow(2) * w2).mean()
        hd = 0.1

        def hub(d):
            return torch.where(d < hd, 0.5 * d.pow(2), hd * (d - 0.5 * hd)).mean()

        sd1 = hub(torch.abs(gdx1 - ggx1)) + hub(torch.abs(gdy1 - ggy1))
        sd2 = hub(torch.abs(gdx2 - ggx2)) + hub(torch.abs(gdy2 - ggy2))
        w = 1.0 if scale == 1 else 0.7 / scale
        edge = edge + w * (se1 + se2)
        smooth = smooth + w * (ss1 + ss2)
        detail = detail + w * (sd1 + sd2)
    return basic + ew * edge + sw * smooth + dw * detail


def _sample(rng, h=24, w=32):
    p1 = rng.standard_normal((h, w, 3)).astype(np.float32)
    p2 = rng.standard_normal((h, w, 3)).astype(np.float32)
    g1 = p1 + 0.1 * rng.standard_normal((h, w, 3)).astype(np.float32)
    g2 = p2 + 0.1 * rng.standard_normal((h, w, 3)).astype(np.float32)
    c1 = rng.uniform(0.5, 5.0, (h, w)).astype(np.float32)
    c2 = rng.uniform(0.5, 5.0, (h, w)).astype(np.float32)
    t1 = rng.uniform(0, 1, (h, w)).astype(np.float32)
    t2 = rng.uniform(0, 1, (h, w)).astype(np.float32)
    return p1, p2, g1, g2, c1, c2, t1, t2


def test_basic_loss_matches_oracle(rng):
    p1, p2, g1, g2, c1, c2, _, _ = _sample(rng)
    ours = float(confidence_weighted_regression_loss(p1, p2, g1, g2, c1, c2))
    ref = float(oracle_basic(*map(torch.from_numpy, (p1, p2, g1, g2, c1, c2))))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_basic_loss_default_conf(rng):
    p1, p2, g1, g2, *_ = _sample(rng)
    ours = float(confidence_weighted_regression_loss(p1, p2, g1, g2))
    ref = float(oracle_basic(*map(torch.from_numpy, (p1, p2, g1, g2))))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_basic_loss_conf_clamping(rng):
    p1, p2, g1, g2, _, _, _, _ = _sample(rng)
    c1 = np.full(p1.shape[:2], 100.0, dtype=np.float32)  # clamped to 10
    c2 = np.full(p1.shape[:2], 1e-9, dtype=np.float32)  # clamped to 1e-5
    ours = float(confidence_weighted_regression_loss(p1, p2, g1, g2, c1, c2))
    ref = float(oracle_basic(*map(torch.from_numpy, (p1, p2, g1, g2, c1, c2))))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_enhanced_loss_matches_oracle(rng):
    vals = _sample(rng)
    ours, comps = enhanced_thermal_aware_loss(*vals)
    ref = float(oracle_enhanced(*map(torch.from_numpy, vals)))
    np.testing.assert_allclose(float(ours), ref, rtol=1e-4)
    assert set(comps) == {"basic_loss", "edge_loss", "smoothness_loss", "detail_loss"}


def test_enhanced_loss_single_scale(rng):
    vals = _sample(rng)
    ours, _ = enhanced_thermal_aware_loss(*vals, multi_scale=False)
    ref = float(oracle_enhanced(*map(torch.from_numpy, vals), multi_scale=False))
    np.testing.assert_allclose(float(ours), ref, rtol=1e-4)


def test_v1_duplicated_terms(rng):
    """v1's edge and smoothness components are the same value (loss.py:43-58)."""
    vals = _sample(rng)
    total, comps = thermal_aware_loss(*vals[:4], None, None, vals[6], vals[7])
    assert float(comps["edge_loss"]) == float(comps["smoothness_loss"])
    expect = float(comps["basic_loss"]) + 0.5 * float(comps["edge_loss"]) + 0.3 * float(
        comps["smoothness_loss"]
    )
    np.testing.assert_allclose(float(total), expect, rtol=1e-5)


def test_batched_loss_equals_mean_of_per_sample(rng):
    batch = [_sample(rng) for _ in range(3)]
    stacked = [np.stack(x) for x in zip(*batch)]
    total, comps = batched_enhanced_loss(*stacked)
    singles = [float(enhanced_thermal_aware_loss(*s)[0]) for s in batch]
    np.testing.assert_allclose(float(total), np.mean(singles), rtol=1e-5)


def test_loss_is_differentiable(rng):
    import jax

    vals = _sample(rng, h=16, w=16)

    def f(p1):
        return enhanced_thermal_aware_loss(p1, *vals[1:])[0]

    g = jax.grad(f)(vals[0])
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0
