"""Data layer: index building, pseudo-GT matching, pipeline batching."""

import os

import numpy as np
import pytest

from thermal3d.data.freiburg import (
    FreiburgPairDataset,
    build_pair_index,
    build_rgb_pair_index,
    build_rgb_thermal_index,
    day_night_filter,
    match_pseudo_gt,
    validate_pair_index,
)
from thermal3d.data.pipeline import BatchLoader, split_index

cv2 = pytest.importorskip("cv2")


def _write_png16(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(str(path), arr.astype(np.uint16))


def _write_png8(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(str(path), arr.astype(np.uint8))


@pytest.fixture
def freiburg_tree(tmp_path, rng):
    """Synthetic Freiburg layout: train/<seq>/<drive>/{fl_ir_aligned,fl_rgb}."""
    root = tmp_path / "freiburg"
    names = []
    for seq in ["seq_00_day", "seq_01_night"]:
        for drive in ["00"]:
            for i in range(6):
                stamp = f"16000{i}_000{i}"
                tname = f"fl_ir_aligned_{stamp}.png"
                rname = f"fl_rgb_{stamp}.png"
                tdir = root / "train" / seq / drive / "fl_ir_aligned"
                rdir = root / "train" / seq / drive / "fl_rgb"
                _write_png16(tdir / tname, rng.integers(21000, 26000, (32, 40)))
                _write_png8(rdir / rname, rng.integers(0, 255, (32, 40, 3)))
                names.append((seq, drive, stamp))
    return root, names


@pytest.fixture
def pseudo_gt_tree(tmp_path, freiburg_tree, rng):
    """Pseudo-GT layout: pointmap1/2 + confidence1/2 by pair name,
    depth1/2 by single base name, poses by pair name (pseudo_gt.py:519-592)."""
    root, names = freiburg_tree
    gt = tmp_path / "pseudo_gt"
    frame_skip = 1
    by_seq = {}
    for seq, drive, stamp in names:
        by_seq.setdefault((seq, drive), []).append(stamp)
    for (seq, drive), stamps in by_seq.items():
        for i in range(len(stamps) - frame_skip):
            b1 = f"fl_rgb_{stamps[i]}"
            b2 = f"fl_rgb_{stamps[i + frame_skip]}"
            pair = f"{b1}_{b2}"
            for sub, name, shape in [
                ("pointmap1", pair, (16, 16, 3)),
                ("pointmap2", pair, (16, 16, 3)),
                ("confidence1", pair, (16, 16)),
                ("confidence2", pair, (16, 16)),
                ("depth1", b1, (16, 16)),
                ("depth2", b2, (16, 16)),
                ("poses", pair, (4, 4)),
            ]:
                d = gt / sub
                d.mkdir(parents=True, exist_ok=True)
                np.save(d / f"{name}.npy", rng.uniform(0.1, 5, shape).astype(np.float32))
    return gt


def test_pair_index(freiburg_tree):
    root, _ = freiburg_tree
    pairs = build_pair_index(str(root), frame_skip=1)
    assert len(pairs) == 2 * (6 - 1)
    assert all(os.path.exists(p["rgb1"]) for p in pairs)
    pairs3 = build_pair_index(str(root), frame_skip=3)
    assert len(pairs3) == 2 * (6 - 3)


def test_day_night_filter():
    seqs = ["seq_00_day", "seq_01_night", "seq_02_day"]
    assert day_night_filter(seqs, day_only=True) == ["seq_00_day", "seq_02_day"]
    assert day_night_filter(seqs, night_only=True) == ["seq_01_night"]


def test_rgb_thermal_index(freiburg_tree):
    root, _ = freiburg_tree
    pairs = build_rgb_thermal_index(str(root))
    assert len(pairs) == 12  # every frame matched 1:1


def test_pseudo_gt_source_pair_index(freiburg_tree):
    # note: the test name must not contain 'rgb' — the reference's path
    # derivation does a raw 'rgb'→'ir' substring replace over the WHOLE path
    # (pseudo_gt.py:446-449), which we reproduce faithfully.
    root, _ = freiburg_tree
    pairs = build_rgb_pair_index(str(root), frame_skip=2)
    assert len(pairs) == 2 * (6 - 2)
    assert all("fl_ir_aligned" in p["thermal_path1"] for p in pairs)


def test_pseudo_gt_matching(freiburg_tree, pseudo_gt_tree):
    root, _ = freiburg_tree
    pairs = build_pair_index(str(root), frame_skip=1)
    gt = match_pseudo_gt(pairs[0], str(pseudo_gt_tree))
    assert gt is not None
    assert all(gt[k] for k in ("pointmap1", "pointmap2", "confidence1",
                               "confidence2", "depth1", "depth2", "pose"))
    valid = validate_pair_index(pairs, str(pseudo_gt_tree))
    assert len(valid) == len(pairs)  # every pair has GT in the fixture


def test_validate_drops_missing_gt(freiburg_tree, tmp_path):
    root, _ = freiburg_tree
    empty_gt = tmp_path / "empty_gt"
    (empty_gt / "pointmap1").mkdir(parents=True)
    pairs = build_pair_index(str(root), frame_skip=1)
    assert validate_pair_index(pairs, str(empty_gt)) == []


def test_dataset_sample_shapes(freiburg_tree, pseudo_gt_tree):
    root, _ = freiburg_tree
    ds = FreiburgPairDataset(str(root), img_size=(24, 24),
                             pseudo_gt_dir=str(pseudo_gt_tree), frame_skip=1)
    s = ds[0]
    assert s["thermal1"].shape == (24, 24, 3)
    assert s["thermal1"].max() > 255  # raw counts preserved (dataset_loader:243)
    assert s["pointmap1"].shape == (16, 16, 3)
    assert s["confidence1"].shape == (16, 16)
    assert s["pose"].shape == (4, 4)


def test_batch_loader(freiburg_tree, pseudo_gt_tree):
    root, _ = freiburg_tree
    ds = FreiburgPairDataset(str(root), img_size=(24, 24),
                             pseudo_gt_dir=str(pseudo_gt_tree), frame_skip=1)
    loader = BatchLoader(ds, batch_size=4, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == len(ds) // 4
    for b in batches:
        assert b["thermal1"].shape == (4, 24, 24, 3)
        assert b["pointmap1"].shape == (4, 16, 16, 3)
    # shuffling differs between epochs
    b2 = list(loader)
    assert len(b2) == len(batches)


def test_get_batch_matches_per_sample(freiburg_tree, pseudo_gt_tree):
    """Batch-level loading (native decode path) ≡ per-sample __getitem__."""
    root, _ = freiburg_tree
    ds = FreiburgPairDataset(str(root), img_size=(24, 24),
                             pseudo_gt_dir=str(pseudo_gt_tree), frame_skip=1)
    idxs = [0, 3, 5]
    batch_samples = ds.get_batch(idxs)
    assert len(batch_samples) == len(idxs)
    for i, s in zip(idxs, batch_samples):
        ref = ds[i]
        assert set(s) == set(ref)
        for k in s:
            np.testing.assert_allclose(s[k], ref[k], atol=1e-2, err_msg=k)


def test_batch_loader_uses_get_batch(freiburg_tree, pseudo_gt_tree, monkeypatch):
    root, _ = freiburg_tree
    ds = FreiburgPairDataset(str(root), img_size=(24, 24),
                             pseudo_gt_dir=str(pseudo_gt_tree), frame_skip=1)
    calls = []
    orig = ds.get_batch
    monkeypatch.setattr(ds, "get_batch",
                        lambda idxs: calls.append(list(idxs)) or orig(idxs))
    batches = list(BatchLoader(ds, batch_size=4, shuffle=False, seed=0))
    assert calls, "BatchLoader did not route through get_batch"
    assert len(batches) == len(ds) // 4


def test_split_index_disjoint():
    tr, va = split_index(100, val_fraction=0.2, seed=0)
    assert len(tr) == 80 and len(va) == 20
    assert not set(tr) & set(va)
    tr2, _ = split_index(100, val_fraction=0.2, seed=0)
    np.testing.assert_array_equal(tr, tr2)  # deterministic


def test_rgb_thermal_dataset_and_factory(freiburg_tree, tmp_path, rng):
    from thermal3d.data.freiburg import (
        FreiburgRGBThermalDataset, create_freiburg_dataloaders)

    root, _ = freiburg_tree
    # flat pseudo-GT layout: depth/intrinsics/poses by frame base name
    gt = tmp_path / "flat_gt"
    for sub in ("depth", "intrinsics", "poses"):
        (gt / sub).mkdir(parents=True)
    ds0 = FreiburgRGBThermalDataset(str(root), img_size=(16, 16))
    base = None
    import os as _os
    base = _os.path.splitext(_os.path.basename(ds0.pairs[0]["rgb"]))[0]
    np.save(gt / "depth" / f"{base}.npy", rng.uniform(1, 5, (16, 16)).astype(np.float32))
    np.save(gt / "intrinsics" / f"{base}.npy", np.eye(3, dtype=np.float32))
    np.save(gt / "poses" / f"{base}.npy", np.eye(4, dtype=np.float32))

    ds = FreiburgRGBThermalDataset(str(root), img_size=(16, 16),
                                   use_pseudo_gt=True, pseudo_gt_dir=str(gt))
    s = ds[0]
    assert s["rgb"].shape == (16, 16, 3)
    assert s["thermal"].shape == (16, 16, 3)
    assert s["depth"].shape == (16, 16)
    assert s["intrinsics"].shape == (3, 3)

    tr, va = create_freiburg_dataloaders(str(root), batch_size=4, img_size=(16, 16),
                                         day_only=True)
    batches = list(tr)
    assert batches and batches[0]["rgb"].shape == (4, 16, 16, 3)


def test_pipelined_batches_ordering_and_skip():
    """pipelined_batches preserves submission order, consumes token i only
    after dispatching token i+1, skips None dispatches, and decodes every
    chunk exactly once."""
    import threading

    from thermal3d.data.pipeline import pipelined_batches

    chunks = list(range(7))
    decoded, consumed, events = [], [], []
    lock = threading.Lock()

    def decode(c):
        with lock:
            decoded.append(c)
        return c

    def dispatch(d):
        events.append(("dispatch", d))
        return None if d == 3 else d  # chunk 3: every frame failed

    def consume(t):
        events.append(("consume", t))
        consumed.append(t)

    pipelined_batches(chunks, decode, dispatch, consume, prefetch=2)
    assert sorted(decoded) == chunks  # each decoded exactly once
    assert consumed == [0, 1, 2, 4, 5, 6]  # in order, 3 skipped
    # token i is consumed only AFTER some later dispatch (overlap contract)
    for tok in consumed[:-1]:
        i_c = events.index(("consume", tok))
        later_dispatches = [e for e in events[:i_c] if e[0] == "dispatch"
                            and e[1] > tok]
        assert later_dispatches, f"token {tok} consumed before dispatching a later chunk"
