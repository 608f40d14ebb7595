"""Golden-file harness against the reference's checked-in MASt3R depths
(pseudo_gt_test_set/{day,night}/depth — SURVEY.md §4, BASELINE.md).

Without the released checkpoints in this environment we cannot regenerate the
predictions, but these tests pin the consumption side: the files decode to
the documented format, our eval pipeline's matching + metrics run on them,
and self-consistency invariants hold. When a checkpoint is available the same
harness feeds the parity comparison (AbsRel within 1% — BASELINE.json).
"""

import glob
import os

import numpy as np
import pytest

GOLDEN_ROOT = "/root/reference/pseudo_gt_test_set"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLDEN_ROOT), reason="golden fixtures not mounted")


def _depth_files(split):
    return sorted(glob.glob(os.path.join(GOLDEN_ROOT, split, "depth", "*_depth.npy")))


@pytest.mark.parametrize("split", ["day", "night"])
def test_golden_depth_format(split):
    files = _depth_files(split)
    assert len(files) == 32  # 96 files per split = 32 × (npy + vis + txt)
    d = np.load(files[0])
    assert d.shape == (512, 512) and d.dtype == np.float32
    assert np.isfinite(d).all()
    assert d.min() > 0  # metric MASt3R depths are positive


def test_metrics_on_golden_depths():
    """Self-metrics are perfect; cross-frame metrics are finite and worse."""
    from thermal3d.evaluation.metrics import compute_depth_metrics

    files = _depth_files("day")
    d0 = np.load(files[0])
    d1 = np.load(files[1])
    perfect = compute_depth_metrics(d0.copy(), d0)
    assert perfect["abs_rel"] < 1e-6 and perfect["acc_1"] == 1.0
    cross = compute_depth_metrics(d1, d0)
    assert np.isfinite(cross["rmse"]) and cross["abs_rel"] > perfect["abs_rel"]


def test_eval_matching_on_golden_names():
    """The filename heuristics resolve the golden files from their recorded
    thermal paths (each *_thermal_path.txt holds the original IR path)."""
    from thermal3d.evaluation.evaluator import find_matching_depth_file

    depth_dir = os.path.join(GOLDEN_ROOT, "night", "depth")
    txts = sorted(glob.glob(os.path.join(depth_dir, "*_thermal_path.txt")))
    assert txts
    n_matched = 0
    for txt in txts[:8]:
        thermal_path = open(txt).read().strip()
        if not thermal_path:
            continue
        match = find_matching_depth_file(thermal_path, depth_dir)
        if match is not None:
            n_matched += 1
    assert n_matched >= 6  # heuristics resolve the vast majority


def test_golden_depth_statistics():
    """Range documented in BASELINE.md (≈1.78–58.4 across the split)."""
    vals = [np.load(f) for f in _depth_files("day")[:8]]
    lo = min(v.min() for v in vals)
    hi = max(v.max() for v in vals)
    assert 0.5 < lo < 10.0
    assert 10.0 < hi < 200.0
