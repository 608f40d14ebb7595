"""cli.parity — the one-command reference-parity gate (BASELINE.md 1% AbsRel,
reference eval protocol utils/evaluate_depth_metrics.py:247-401), kept ready
for the moment real reference weights/outputs are available."""

import json
import os

import numpy as np
import pytest

from thermal3d.cli.parity import main


@pytest.fixture
def depth_pair(tmp_path, rng):
    ours = tmp_path / "ours"
    theirs = tmp_path / "theirs"
    ours.mkdir(), theirs.mkdir()
    for i in range(3):
        d = rng.uniform(1.0, 10.0, (16, 16)).astype(np.float32)
        np.save(theirs / f"f_{i}_depth.npy", d)
        np.save(ours / f"f_{i}_depth.npy", d)
    return ours, theirs


def test_dir_mode_pass_and_report(depth_pair, tmp_path):
    ours, theirs = depth_pair
    rpt = tmp_path / "r.json"
    report = main(["--ours_dir", str(ours), "--theirs_dir", str(theirs),
                   "--report", str(rpt)])
    assert report["dirs"]["summary"]["all_bit_equal"]
    assert json.load(open(rpt))["dirs"]["summary"]["within_1pct_abs_rel"]


def test_dir_mode_gate_fails_on_drift(depth_pair, rng):
    ours, theirs = depth_pair
    # non-uniform perturbation: median scaling cannot absorb it
    for f in os.listdir(ours):
        d = np.load(ours / f)
        d[::2] *= 1.5
        np.save(ours / f, d)
    with pytest.raises(SystemExit):
        main(["--ours_dir", str(ours), "--theirs_dir", str(theirs)])


def test_half_specified_modes_fail_loudly(depth_pair):
    """A CI gate must not print PASS when the intended comparison never ran:
    half-specified modes are argparse errors, not silent skips."""
    ours, _ = depth_pair
    with pytest.raises(SystemExit):  # --ours_dir without --theirs_dir
        main(["--ours_dir", str(ours)])
    with pytest.raises(SystemExit):  # --int8 without --golden_dir
        main(["--ours_dir", str(ours), "--theirs_dir", str(ours), "--int8"])


def test_golden_mode_no_depth_match_is_gate_failure(tmp_path, rng):
    """Thermal frames resolve but no *_depth.npy matches → FAIL, not
    KeyError."""
    import cv2

    gdir = tmp_path / "golden"
    gdir.mkdir()
    png = tmp_path / "fl_ir_aligned_1570000000_12340_ir.png"
    cv2.imwrite(str(png), rng.uniform(21000, 26000, (64, 80)).astype(np.uint16))
    (gdir / "unrelated_name_rgb_thermal_path.txt").write_text(str(png))
    np.save(gdir / "zzz_mismatched_depth.npy",
            rng.uniform(1, 10, (8, 8)).astype(np.float32))
    os.remove(gdir / "zzz_mismatched_depth.npy")  # no depth files at all
    with pytest.raises(SystemExit):
        main(["--golden_dir", str(gdir), "--model_preset", "tiny",
              "--img_size", "64", "64", "--compute_dtype", "float32",
              "--batch_size", "2"])


def test_dir_mode_gate_fails_on_missing_frame(depth_pair):
    ours, theirs = depth_pair
    os.remove(ours / "f_1_depth.npy")  # reference frame we never produced
    with pytest.raises(SystemExit):
        main(["--ours_dir", str(ours), "--theirs_dir", str(theirs)])


@pytest.fixture
def golden_set(tmp_path, rng):
    import cv2

    gdir = tmp_path / "golden"
    gdir.mkdir()
    for i in range(2):
        ts = f"157000000{i}_1234{i}"
        png = tmp_path / f"fl_ir_aligned_{ts}_ir.png"
        cv2.imwrite(str(png),
                    rng.uniform(21000, 26000, (64, 80)).astype(np.uint16))
        base = f"fl_ir_aligned_{ts}0_rgb"
        np.save(gdir / f"{base}_depth.npy",
                rng.uniform(1.0, 10.0, (32, 32)).astype(np.float32))
        (gdir / f"{base}_thermal_path.txt").write_text(str(png))
    return gdir


def test_golden_mode_int8_gate(golden_set, tmp_path):
    rpt = tmp_path / "g.json"
    # random-init tiny engines; the wide gate tests the HARNESS (both engines
    # run, drift computed, report written), not model accuracy
    report = main(["--golden_dir", str(golden_set), "--model_preset", "tiny",
                   "--img_size", "64", "64", "--compute_dtype", "float32",
                   "--batch_size", "2", "--int8", "--gate", "10.0",
                   "--report", str(rpt)])
    assert np.isfinite(report["golden_bf16"]["abs_rel"])
    assert np.isfinite(report["golden_int8"]["abs_rel"])
    assert "int8_abs_rel_drift" in json.load(open(rpt))


def test_golden_mode_model_variant(golden_set, tmp_path):
    """--model_variant selects the 512 DPT/catmlpdpt architectures (mirrors
    cli.infer) so the gate can load those reference checkpoints too."""
    rpt = tmp_path / "v.json"
    report = main(["--golden_dir", str(golden_set),
                   "--model_variant", "mastr512_catmlpdpt",
                   "--model_preset", "tiny", "--img_size", "64", "64",
                   "--compute_dtype", "float32", "--batch_size", "2",
                   "--gate", "10.0", "--report", str(rpt)])
    assert np.isfinite(report["golden_bf16"]["abs_rel"])


def test_golden_mode_reference_metrics_gate_fails(golden_set, tmp_path):
    ref = tmp_path / "ref.json"
    ref.write_text(json.dumps({"abs_rel": 1e-6}))  # unreachable target
    with pytest.raises(SystemExit):
        main(["--golden_dir", str(golden_set), "--model_preset", "tiny",
              "--img_size", "64", "64", "--compute_dtype", "float32",
              "--batch_size", "2", "--reference_metrics", str(ref)])


def test_full_gate_end_to_end(golden_set, tmp_path):
    """--full-gate (VERDICT r4 #8): strict convert → oracle activation diff →
    golden metrics → int8 drift, one command, one PASS/FAIL JSON. Exercised
    with a tiny oracle-layout checkpoint standing in for the released .pth."""
    import importlib.util

    import torch

    from thermal3d.cli.common import apply_preset
    from thermal3d.core.config import DUSTR_224_LINEAR

    cfg = apply_preset(DUSTR_224_LINEAR, "tiny", (64, 64), "float32")
    spec = importlib.util.spec_from_file_location(
        "_oracle", os.path.join(os.path.dirname(__file__), "torch_oracle.py"))
    oracle_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(oracle_mod)
    torch.manual_seed(0)
    oracle = oracle_mod.TorchDustr(cfg).eval()
    ckpt = tmp_path / "tiny_real.pth"
    torch.save({"model": dict(oracle.state_dict())}, str(ckpt))

    rpt = tmp_path / "fg.json"
    report = main(["--full-gate", "--model", str(ckpt),
                   "--golden_dir", str(golden_set), "--model_preset", "tiny",
                   "--img_size", "64", "64", "--compute_dtype", "float32",
                   "--batch_size", "2", "--gate", "10.0",
                   "--report", str(rpt)])
    assert report["full_gate_convert"]["ok"]
    assert report["full_gate_oracle"]["ok"]
    assert report["full_gate_oracle"]["worst_rel"] <= 2e-4
    assert np.isfinite(report["golden_bf16"]["abs_rel"])
    assert "int8_abs_rel_drift" in report  # --full-gate implies --int8

    # gate wiring: an impossible tolerance must FAIL the whole command
    with pytest.raises(SystemExit):
        main(["--full-gate", "--model", str(ckpt),
              "--golden_dir", str(golden_set), "--model_preset", "tiny",
              "--img_size", "64", "64", "--compute_dtype", "float32",
              "--batch_size", "2", "--gate", "10.0", "--oracle_tol", "0.0"])

    # half-specified full gate is an argparse error, not a silent skip
    with pytest.raises(SystemExit):
        main(["--full-gate", "--model", str(ckpt)])


def test_full_gate_catmlpdpt_variant(golden_set, tmp_path):
    """--full-gate with --model_variant mastr512_catmlpdpt: the oracle stage
    covers the MASt3R head family numerically (round 5 — the torch oracle
    grew DPT/catmlpdpt heads), incl. desc/desc_conf in the output diff."""
    import dataclasses
    import importlib.util

    import torch

    from thermal3d.cli.common import apply_preset
    from thermal3d.core.config import MASTR_512_CATMLPDPT

    cfg = apply_preset(MASTR_512_CATMLPDPT, "tiny", (64, 64), "float32")
    cfg = dataclasses.replace(cfg, compute_dtype="float32")
    spec = importlib.util.spec_from_file_location(
        "_oracle2", os.path.join(os.path.dirname(__file__), "torch_oracle.py"))
    oracle_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(oracle_mod)
    torch.manual_seed(1)
    oracle = oracle_mod.TorchDustr(cfg).eval()
    ckpt = tmp_path / "tiny_mastr.pth"
    torch.save({"model": dict(oracle.state_dict())}, str(ckpt))

    report = main(["--full-gate", "--model", str(ckpt),
                   "--model_variant", "mastr512_catmlpdpt",
                   "--golden_dir", str(golden_set), "--model_preset", "tiny",
                   "--img_size", "64", "64", "--compute_dtype", "float32",
                   "--batch_size", "2", "--gate", "10.0"])
    assert report["full_gate_convert"]["ok"]
    assert report["full_gate_oracle"]["ok"]
    # desc branch included in the final-output diff
    assert report["full_gate_oracle"]["layers"] >= 10


def test_full_gate_broken_checkpoint_skips_cleanly(golden_set, tmp_path, capsys):
    """A checkpoint the strict converter rejects must FAIL the gate with the
    machine-readable JSON line (later stages 'skipped'), never a traceback."""
    import json as _json

    import torch

    ckpt = tmp_path / "broken.pth"
    torch.save({"model": {"totally_unknown.weight": torch.zeros(3)}}, str(ckpt))
    with pytest.raises(SystemExit) as exc:
        main(["--full-gate", "--model", str(ckpt),
              "--golden_dir", str(golden_set), "--model_preset", "tiny",
              "--img_size", "64", "64", "--compute_dtype", "float32",
              "--batch_size", "2"])
    assert exc.value.code == 1
    out = capsys.readouterr().out
    line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    parsed = _json.loads(line)
    assert parsed["full_gate"] == "FAIL"
    assert parsed["stages"]["convert"] == "fail"
    assert parsed["stages"]["oracle"] == "skipped"
    assert parsed["stages"]["golden_metrics"] == "skipped"
    assert parsed["stages"]["int8_drift"] == "skipped"
