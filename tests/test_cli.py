"""CLI surface: flags exist with the reference's defaults."""

import pytest


def test_train_parser_defaults():
    from thermal3d.cli.train import build_parser

    args = build_parser().parse_args([
        "--dataset_dir", "d", "--pseudo_gt_dir", "g", "--weights", "w",
        "--output_model", "o"])
    # reference defaults (train_thermal_dustr.py:25-58)
    assert args.epochs == 10 and args.batch_size == 4 and args.lr == 5e-4
    assert args.img_size == [224, 224] and args.frame_skip == 3
    assert args.log_interval == 100
    assert args.edge_weight == 0.5 and args.smoothness_weight == 0.3
    assert args.detail_weight == 0.4 and args.accumulation_steps == 1
    assert args.max_batches is None
    assert not args.use_thermal_aware_loss and not args.multi_scale


def test_infer_parser():
    from thermal3d.cli.infer import build_parser

    args = build_parser().parse_args(["--img_path", "x.png"])
    assert args.img_size is None  # resolved to the variant's native resolution
    assert args.output_dir == "inference_results"
    args2 = build_parser().parse_args(
        ["--img_path", "a.png", "--img_path2", "b.png", "--fire_scene",
         "--refine_depth"])
    assert args2.img_path2 == "b.png" and args2.fire_scene and args2.refine_depth


def test_int8_equalize_without_int8_is_an_error():
    """--int8_equalize only acts inside the int8 branch; alone it would be a
    silent no-op, so both CLIs reject it loudly (fail-loud convention)."""
    import pytest

    from thermal3d.cli import infer, pseudo_gt

    with pytest.raises(SystemExit):
        infer.main(["--img_path", "x.png", "--int8_equalize"])
    with pytest.raises(SystemExit):
        pseudo_gt.main(["--dataset_dir", "d", "--output_dir", "o",
                        "--int8_equalize"])


def test_infer_incompatible_flag_pairs_fail_at_parser():
    """Known-incompatible combinations must die at the parser, not as deep
    tracebacks after model load/compile."""
    from thermal3d.cli import infer

    # static act scales are per-tensor; grouped weight scales would need
    # per-group act ranges (quantize_params_int8 rejects it much later)
    with pytest.raises(SystemExit):
        infer.main(["--img_path", "x.png", "--int8", "--int8_static_acts",
                    "--int8_group_size", "128"])
    # stereo / fire-scene modes run batch-1 programs that cannot shard
    with pytest.raises(SystemExit):
        infer.main(["--img_path", "a.png", "--img_path2", "b.png",
                    "--ndev", "2", "--batch_size", "2"])
    with pytest.raises(SystemExit):
        infer.main(["--img_path", "a.png", "--fire_scene", "--ndev", "2",
                    "--batch_size", "2"])


def test_evaluate_parser():
    from thermal3d.cli.evaluate import build_parser

    args = build_parser().parse_args(
        ["--thermal_dir", "t", "--pseudo_gt_dir", "g", "--output_dir", "o"])
    assert args.num_samples == 0  # 0 = all (evaluate_depth_metrics.py:259-261)


def test_pseudo_gt_parser():
    from thermal3d.cli.pseudo_gt import build_parser

    args = build_parser().parse_args(["--dataset_dir", "d", "--output_dir", "o"])
    assert args.img_size == [512, 512] and args.frame_skip == 5  # pseudo_gt.py defaults


def test_grid_search_parser():
    from thermal3d.cli.grid_search import build_parser

    args = build_parser().parse_args(
        ["--dataset_dir", "d", "--pseudo_gt_dir", "g", "--weights", "w"])
    # grid defaults (run_grid_search_thermal_parameters.sh:13-15)
    assert args.edge_weights == [0.3, 0.5, 0.7]
    assert args.smoothness_weights == [0.1, 0.3, 0.5]
    assert args.epochs == 2


def test_cli_infer_end_to_end_tiny(tmp_path, rng):
    """Full infer CLI on synthetic frames with the tiny preset."""
    import cv2
    import numpy as np

    frames = tmp_path / "frames"
    frames.mkdir()
    for i in range(2):
        cv2.imwrite(str(frames / f"fl_ir_aligned_100{i}_{i}.png"),
                    rng.integers(21000, 26000, (40, 48)).astype(np.uint16))
    out = tmp_path / "out"
    from thermal3d.cli.infer import main

    main(["--img_path", str(frames), "--output_dir", str(out),
          "--img_size", "32", "32", "--model_preset", "tiny",
          "--batch_size", "2", "--no_vis"])
    import glob

    depths = glob.glob(str(out / "*_depth.npy"))
    assert len(depths) == 2
    d = np.load(depths[0])
    assert d.shape == (32, 32) and np.isfinite(d).all()


@pytest.mark.heavy
def test_cli_ais_investigate_end_to_end_tiny(tmp_path, rng):
    """Staged OOD investigation driver: all three notebook stages over the
    same frames, AIS_DATA-layout stage dirs + quantitative report."""
    import cv2
    import numpy as np

    frames = tmp_path / "frames"
    frames.mkdir()
    for i in range(2):
        cv2.imwrite(str(frames / f"s0_t_{i}.png"),
                    rng.integers(21000, 26000, (40, 48)).astype(np.uint16))
    out = tmp_path / "ais"
    from thermal3d.cli.ais_investigate import main

    n_rows = main(["--img_path", str(frames), "--output_dir", str(out),
                   "--img_size", "32", "32", "--model_preset", "tiny",
                   "--compute_dtype", "float32", "--no_vis"])
    assert n_rows == 2 * 3  # 2 frames x 3 stages
    for stage in ("original", "preprocessed", "final"):
        d = np.load(out / stage / "s0_t_0_depth.npy")
        assert d.shape == (32, 32) and np.isfinite(d).all()
    report = (out / "investigation.md").read_text()
    assert "| s0_t_0 | final |" in report and "blockiness" in report
    # refinement changes the depth map; enhancement changes the model input
    d_orig = np.load(out / "original" / "s0_t_0_depth.npy")
    d_pre = np.load(out / "preprocessed" / "s0_t_0_depth.npy")
    d_fin = np.load(out / "final" / "s0_t_0_depth.npy")
    assert not np.allclose(d_orig, d_pre) and not np.allclose(d_pre, d_fin)


def test_ais_investigate_parser():
    from thermal3d.cli.ais_investigate import STAGES, build_parser

    args = build_parser().parse_args(["--img_path", "x"])
    assert args.stages == ["original", "preprocessed", "final"]
    assert set(args.stages) <= set(STAGES)
    args2 = build_parser().parse_args(
        ["--img_path", "x", "--stages", "original", "advanced"])
    assert args2.stages == ["original", "advanced"]


def test_cli_pseudo_gt_end_to_end_tiny(tmp_path, rng):
    import cv2
    import numpy as np

    root = tmp_path / "ds"
    for i in range(3):
        stamp = f"100{i}_00{i}"
        tdir = root / "train" / "seq_00_day" / "00" / "fl_ir_aligned"
        rdir = root / "train" / "seq_00_day" / "00" / "fl_rgb"
        tdir.mkdir(parents=True, exist_ok=True)
        rdir.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(tdir / f"fl_ir_aligned_{stamp}.png"),
                    rng.integers(21000, 26000, (32, 32)).astype(np.uint16))
        cv2.imwrite(str(rdir / f"fl_rgb_{stamp}.png"),
                    rng.integers(0, 255, (32, 32, 3)).astype(np.uint8))
    out = tmp_path / "gt"
    from thermal3d.cli.pseudo_gt import main

    n = main(["--dataset_dir", str(root), "--output_dir", str(out),
              "--img_size", "32", "32", "--model_preset", "tiny",
              "--frame_skip", "1", "--batch_size", "2"])
    assert n == 2
    import glob

    assert len(glob.glob(str(out / "pointmap1" / "*.npy"))) == 2

    # int8 + static activation calibration through the same CLI path
    # (calibrates on the first pair batch before compiling the int8 program)
    out2 = tmp_path / "gt_int8"
    n2 = main(["--dataset_dir", str(root), "--output_dir", str(out2),
               "--img_size", "32", "32", "--model_preset", "tiny",
               "--frame_skip", "1", "--batch_size", "2",
               "--int8", "--int8_static_acts"])
    assert n2 == 2
    d = np.load(glob.glob(str(out2 / "depth1" / "*.npy"))[0])
    assert np.isfinite(d).all()


def test_int8_static_acts_without_int8_is_an_error():
    """--int8_static_acts only acts inside the int8 branch (same fail-loud
    convention as --int8_equalize)."""
    import pytest

    from thermal3d.cli import infer, pseudo_gt

    with pytest.raises(SystemExit):
        infer.main(["--img_path", "x.png", "--int8_static_acts"])
    with pytest.raises(SystemExit):
        pseudo_gt.main(["--dataset_dir", "d", "--output_dir", "o",
                        "--int8_static_acts"])


def test_cli_train_end_to_end_tiny(tmp_path, rng):
    """Torch .pth → converter → pseudo-GT data → sharded training → orbax:
    the complete fine-tuning pipeline through the CLI (tiny preset)."""
    import cv2
    import numpy as np
    import torch

    from thermal3d.cli.common import apply_preset
    from thermal3d.convert.torch_to_flax import expected_torch_keys
    from thermal3d.core.config import DUSTR_224_LINEAR

    # synthetic dataset with pseudo-GT
    root = tmp_path / "ds"
    gt = tmp_path / "gt"
    stamps = []
    for i in range(10):
        stamp = f"100{i}_00{i}"
        stamps.append(stamp)
        tdir = root / "train" / "seq_00_day" / "00" / "fl_ir_aligned"
        rdir = root / "train" / "seq_00_day" / "00" / "fl_rgb"
        tdir.mkdir(parents=True, exist_ok=True)
        rdir.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(tdir / f"fl_ir_aligned_{stamp}.png"),
                    rng.integers(21000, 26000, (32, 32)).astype(np.uint16))
        cv2.imwrite(str(rdir / f"fl_rgb_{stamp}.png"),
                    rng.integers(0, 255, (32, 32, 3)).astype(np.uint8))
    for i in range(len(stamps) - 1):
        b1, b2 = f"fl_rgb_{stamps[i]}", f"fl_rgb_{stamps[i + 1]}"
        pair = f"{b1}_{b2}"
        for sub, name, shape in [("pointmap1", pair, (16, 16, 3)),
                                 ("pointmap2", pair, (16, 16, 3)),
                                 ("confidence1", pair, (16, 16)),
                                 ("confidence2", pair, (16, 16))]:
            (gt / sub).mkdir(parents=True, exist_ok=True)
            np.save(gt / sub / f"{name}.npy",
                    rng.uniform(0.5, 5, shape).astype(np.float32))

    # synthetic torch checkpoint with the tiny architecture's key layout
    tiny_cfg = apply_preset(DUSTR_224_LINEAR, "tiny", (32, 32), "float32")
    state = {k: torch.from_numpy(rng.standard_normal(s).astype(np.float32) * 0.05)
             for k, s in expected_torch_keys(tiny_cfg).items()}
    ckpt_path = tmp_path / "tiny_dustr.pth"
    torch.save({"model": state}, str(ckpt_path))

    from thermal3d.cli.train import main

    summary = main([
        "--dataset_dir", str(root), "--pseudo_gt_dir", str(gt),
        "--weights", str(ckpt_path), "--output_model", str(tmp_path / "ckpt"),
        "--epochs", "1", "--batch_size", "4", "--frame_skip", "1",
        "--img_size", "32", "32", "--model_preset", "tiny",
        "--compute_dtype", "float32", "--use_thermal_aware_loss", "--multi_scale",
        "--no_wandb", "--max_batches", "1",
    ])
    assert summary["epochs_run"] == 1
    assert np.isfinite(summary["best_val_loss"])
    import os

    assert os.path.isdir(tmp_path / "ckpt")


def test_infer_from_orbax_checkpoint(tmp_path, rng, tiny_config):
    """cli.train's orbax output loads back into the inference engine."""
    import jax
    import numpy as np

    from thermal3d.cli.infer import _load_params
    from thermal3d.core.config import TrainConfig
    from thermal3d.models.dustr import AsymmetricCroCo3DStereo
    from thermal3d.train.checkpoint import CheckpointManager
    from thermal3d.train.state import create_train_state

    model = AsymmetricCroCo3DStereo(tiny_config)
    img = np.zeros((1, 32, 32, 3), np.float32)
    params = model.init(jax.random.key(0), img, img)["params"]
    state = create_train_state(model, params, TrainConfig(), 10)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, state, val_loss=0.5, extra={"epoch": 1})
    mgr.close()

    loaded, head = _load_params(str(tmp_path / "ckpt"), tiny_config)
    assert head is None
    ref = jax.tree_util.tree_leaves(params)
    got = jax.tree_util.tree_leaves(loaded)
    assert len(ref) == len(got)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]))


@pytest.mark.heavy
def test_cli_infer_rectangular_img_size(tmp_path, rng):
    """--img_size H W with H != W (landscape_only=False semantics,
    thermal_dustr_model.py:44) runs the full CLI path and saves H×W depth."""
    import cv2
    import numpy as np

    frames = tmp_path / "frames"
    frames.mkdir()
    cv2.imwrite(str(frames / "fl_ir_aligned_2000_0.png"),
                rng.integers(21000, 26000, (40, 64)).astype(np.uint16))
    out = tmp_path / "out"
    from thermal3d.cli.infer import main

    main(["--img_path", str(frames), "--output_dir", str(out),
          "--img_size", "32", "48", "--model_preset", "tiny",
          "--batch_size", "1", "--no_vis"])
    import glob

    depths = glob.glob(str(out / "*_depth.npy"))
    assert len(depths) == 1
    d = np.load(depths[0])
    assert d.shape == (32, 48) and np.isfinite(d).all()


@pytest.mark.heavy
def test_infer_model_variant_dpt(tmp_path, rng):
    """--model_variant dustr512_dpt serves the DPT family member end-to-end."""
    import cv2
    import numpy as np

    png = tmp_path / "fl_ir_aligned_0000.png"
    cv2.imwrite(str(png), rng.integers(21000, 26000, (40, 48)).astype(np.uint16))
    out = tmp_path / "out"
    from thermal3d.cli.infer import main

    main(["--img_path", str(png), "--output_dir", str(out),
          "--model_preset", "tiny", "--img_size", "64", "64",
          "--compute_dtype", "float32", "--no_vis",
          "--model_variant", "dustr512_dpt"])
    files = list(out.glob("*_depth.npy"))
    assert len(files) == 1
    assert np.load(files[0]).shape == (64, 64)


def test_cli_explore_end_to_end(tmp_path, rng):
    """Census + sample-panel browser through one CLI (C26 + the
    visualize_dataset drive browser)."""
    import cv2
    import numpy as np

    d = tmp_path / "train" / "seq_00_day" / "00"
    (d / "fl_rgb").mkdir(parents=True)
    (d / "fl_ir_aligned").mkdir(parents=True)
    cv2.imwrite(str(d / "fl_rgb" / "fl_rgb_0.png"),
                rng.integers(0, 255, (16, 16, 3)).astype(np.uint8))
    cv2.imwrite(str(d / "fl_ir_aligned" / "fl_ir_aligned_0.png"),
                rng.integers(21000, 26000, (16, 16)).astype(np.uint16))
    from thermal3d.cli.explore import main

    out = tmp_path / "samples"
    report = main(["--dataset_dir", str(tmp_path), "--samples", "1",
                   "--output_dir", str(out)])
    assert report["extension_counts"][".png"] == 2
    assert len(report["thermal_dirs"]) == 1
    assert len(list(out.glob("*.png"))) == 1


@pytest.mark.heavy
def test_cli_pseudo_gt_sharded(tmp_path, rng):
    """--num_shards/--shard_id: two shard runs into ONE output dir produce
    exactly the unsharded result (disjoint pair filenames, no collisions)."""
    import glob

    import cv2
    import numpy as np

    root = tmp_path / "ds"
    for i in range(5):
        stamp = f"100{i}_00{i}"
        tdir = root / "train" / "seq_00_day" / "00" / "fl_ir_aligned"
        rdir = root / "train" / "seq_00_day" / "00" / "fl_rgb"
        tdir.mkdir(parents=True, exist_ok=True)
        rdir.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(tdir / f"fl_ir_aligned_{stamp}.png"),
                    rng.integers(21000, 26000, (32, 32)).astype(np.uint16))
        cv2.imwrite(str(rdir / f"fl_rgb_{stamp}.png"),
                    rng.integers(0, 255, (32, 32, 3)).astype(np.uint8))
    from thermal3d.cli.pseudo_gt import main

    base = ["--dataset_dir", str(root), "--img_size", "32", "32",
            "--model_preset", "tiny", "--frame_skip", "1",
            "--batch_size", "2", "--compute_dtype", "float32"]
    out_full = tmp_path / "full"
    n_full = main(base + ["--output_dir", str(out_full)])

    out_sh = tmp_path / "sharded"
    n0 = main(base + ["--output_dir", str(out_sh),
                      "--num_shards", "2", "--shard_id", "0"])
    n1 = main(base + ["--output_dir", str(out_sh),
                      "--num_shards", "2", "--shard_id", "1"])
    assert n0 + n1 == n_full
    names = lambda d: sorted(  # noqa: E731
        p.split("/")[-1] for p in glob.glob(str(d / "pointmap1" / "*.npy")))
    assert names(out_sh) == names(out_full)
    # out-of-range shard id dies at the parser
    with pytest.raises(SystemExit):
        main(base + ["--output_dir", "x", "--num_shards", "2",
                     "--shard_id", "2"])


@pytest.mark.heavy
def test_bench_tiny_secondary_metrics(capsys):
    """bench.py --tiny (CPU): the headline JSON line carries secondary_metrics
    with the bf16 reference and both int8 configs, each with machine-checked
    drift numbers and a 1%-AbsRel gate verdict (VERDICT r4 #2 plumbing)."""
    import json as _json
    import sys as _sys

    import bench as bench_mod

    argv = _sys.argv
    _sys.argv = ["bench.py", "4", "2", "--tiny"]
    try:
        bench_mod.main()
    finally:
        _sys.argv = argv
    line = [ln for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("{")][-1]
    out = _json.loads(line)
    assert out["metric"] == "thermal_frames_per_sec_per_chip_dustr224"
    secs = {s["config"]: s for s in out["secondary_metrics"]}
    assert set(secs) == {"bf16", "int8_fc1_static_acts",
                         "int8_all_static_acts"}
    for s in secs.values():
        assert "abs_rel_drift" in s and "drift_ok" in s
    assert secs["bf16"]["drift_ok"] is True
