"""Depth metrics vs numpy oracle of utils/metrics.py:4-69."""

import numpy as np

from thermal3d.evaluation.metrics import compute_depth_metrics


def oracle_metrics(pred, gt, mask=None, median_scaling=True):
    if mask is None:
        mask = (gt > 0) & np.isfinite(gt)
    pred = pred[mask].copy()
    gt = gt[mask]
    if pred.size == 0:
        return dict(abs_rel=np.nan, sq_rel=np.nan, rmse=np.nan, rmse_log=np.nan,
                    acc_1=0.0, acc_2=0.0, acc_3=0.0)
    if median_scaling:
        pred *= np.median(gt) / np.median(pred)
    thresh = np.maximum(gt / pred, pred / gt)
    return dict(
        abs_rel=np.mean(np.abs(gt - pred) / gt),
        sq_rel=np.mean((gt - pred) ** 2 / gt),
        rmse=np.sqrt(np.mean((gt - pred) ** 2)),
        rmse_log=np.sqrt(np.mean((np.log(gt) - np.log(pred)) ** 2)),
        acc_1=(thresh < 1.25).mean(),
        acc_2=(thresh < 1.25**2).mean(),
        acc_3=(thresh < 1.25**3).mean(),
    )


def test_metrics_match_oracle(rng):
    gt = rng.uniform(1, 50, (64, 64)).astype(np.float32)
    pred = gt * rng.uniform(0.7, 1.3, gt.shape).astype(np.float32)
    gt[5:10, 5:10] = 0.0  # invalid region
    ours = compute_depth_metrics(pred, gt)
    ref = oracle_metrics(pred, gt)
    for k in ref:
        np.testing.assert_allclose(ours[k], ref[k], rtol=2e-4, err_msg=k)


def test_metrics_no_median_scaling(rng):
    gt = rng.uniform(1, 10, (32, 32)).astype(np.float32)
    pred = gt + rng.normal(0, 0.5, gt.shape).astype(np.float32)
    pred = np.clip(pred, 0.1, None)
    ours = compute_depth_metrics(pred, gt, median_scaling=False)
    ref = oracle_metrics(pred, gt, median_scaling=False)
    for k in ref:
        np.testing.assert_allclose(ours[k], ref[k], rtol=2e-4, err_msg=k)


def test_metrics_explicit_mask(rng):
    gt = rng.uniform(1, 10, (16, 16)).astype(np.float32)
    pred = gt * rng.uniform(0.8, 1.2, gt.shape).astype(np.float32)
    mask = np.zeros_like(gt, dtype=bool)
    mask[:8] = True
    ours = compute_depth_metrics(pred, gt, mask=mask)
    ref = oracle_metrics(pred, gt, mask=mask)
    for k in ref:
        np.testing.assert_allclose(ours[k], ref[k], rtol=2e-4, err_msg=k)


def test_metrics_empty_mask():
    gt = np.zeros((8, 8), dtype=np.float32)  # nothing valid
    pred = np.ones_like(gt)
    ours = compute_depth_metrics(pred, gt)
    assert np.isnan(ours["abs_rel"]) and np.isnan(ours["rmse"])
    assert ours["acc_1"] == 0.0


def test_perfect_prediction(rng):
    gt = rng.uniform(1, 10, (16, 16)).astype(np.float32)
    ours = compute_depth_metrics(gt.copy(), gt)
    assert ours["abs_rel"] < 1e-6
    assert ours["acc_1"] == 1.0


def test_parity_harness(tmp_path, rng):
    from thermal3d.evaluation.parity import compare_depth_arrays, compare_depth_dirs

    theirs = tmp_path / "theirs"
    ours = tmp_path / "ours"
    theirs.mkdir()
    ours.mkdir()
    for i in range(3):
        d = rng.uniform(1, 20, (32, 32)).astype(np.float32)
        np.save(theirs / f"f{i}_depth.npy", d)
        # ours: tiny perturbation, well under 1% AbsRel
        np.save(ours / f"f{i}_depth.npy", d * (1 + 1e-4))
    np.save(theirs / "f3_depth.npy", rng.uniform(1, 20, (32, 32)).astype(np.float32))

    report = compare_depth_dirs(str(ours), str(theirs),
                                report_path=str(tmp_path / "parity.json"))
    s = report["summary"]
    assert s["n_frames"] == 4 and s["n_compared"] == 3 and s["n_missing"] == 1
    assert s["within_1pct_abs_rel"]
    assert (tmp_path / "parity.json").exists()

    exact = compare_depth_arrays(np.ones((4, 4)), np.ones((4, 4)))
    assert exact["bit_equal"] and exact["max_abs_diff"] == 0.0
