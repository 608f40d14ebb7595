"""Pseudo-GT generation → training-data roundtrip, evaluator, introspection."""

import dataclasses
import glob
import os

import numpy as np
import pytest

from thermal3d.core.config import DustrModelConfig, HeadConfig

cv2 = pytest.importorskip("cv2")

TINY_MASTR_KW = dict(
    img_size=(32, 32),
    enc_embed_dim=64,
    enc_depth=2,
    enc_num_heads=2,
    dec_embed_dim=48,
    dec_depth=2,
    dec_num_heads=2,
    head=HeadConfig(head_type="catmlpdpt", feature_dim=32, last_dim=16,
                    dpt_layer_dims=(8, 16, 24, 32), local_feat_dim=6),
)


@pytest.fixture
def mini_freiburg(tmp_path, rng):
    root = tmp_path / "ds"
    for seq in ["seq_00_day"]:
        for i in range(4):
            stamp = f"157000{i}_00{i}"
            tdir = root / "train" / seq / "00" / "fl_ir_aligned"
            rdir = root / "train" / seq / "00" / "fl_rgb"
            tdir.mkdir(parents=True, exist_ok=True)
            rdir.mkdir(parents=True, exist_ok=True)
            cv2.imwrite(str(tdir / f"fl_ir_aligned_{stamp}.png"),
                        rng.integers(21000, 26000, (32, 32)).astype(np.uint16))
            cv2.imwrite(str(rdir / f"fl_rgb_{stamp}.png"),
                        rng.integers(0, 255, (32, 32, 3)).astype(np.uint8))
    return root


def test_generator_int8_mode(rng):
    """quantize_int8 on the generator (same opt-in as the engine): fc1-scope
    int8 runs through both program modes, outputs finite and close to the
    float path on a tiny net."""
    from thermal3d.kernels.quant import SCOPE_TO_ONLY
    from thermal3d.pseudo_gt.generator import PseudoGTGenerator

    cfg = DustrModelConfig(**TINY_MASTR_KW)
    gen = PseudoGTGenerator(cfg, batch_size=2)
    gen8 = PseudoGTGenerator(cfg, params=gen.params, batch_size=2,
                             quantize_int8=True,
                             int8_only=SCOPE_TO_ONLY["fc1"])
    gen8s = PseudoGTGenerator(cfg, params=gen.params, batch_size=2,
                              split_programs=True, quantize_int8=True,
                              int8_only=SCOPE_TO_ONLY["fc1"])
    rgb1 = rng.uniform(0, 1, (2, *cfg.img_size, 3)).astype(np.float32)
    rgb2 = rng.uniform(0, 1, (2, *cfg.img_size, 3)).astype(np.float32)
    out = gen.run_pairs(rgb1, rgb2)
    out8 = gen8.run_pairs(rgb1, rgb2)
    out8s = gen8s.run_pairs(rgb1, rgb2)
    for k in out:
        assert np.isfinite(out8[k]).all(), k
        # int8 and float paths agree to quantization noise on a tiny net
        scale = np.abs(out[k]).mean() + 1e-6
        assert np.abs(out8[k] - out[k]).mean() / scale < 0.05, k
        # both program modes quantize identically
        np.testing.assert_allclose(out8s[k], out8[k], rtol=2e-4, atol=2e-4,
                                   err_msg=k)


@pytest.mark.heavy
def test_generator_split_programs_matches_single(rng):
    """split_programs (two compiled programs: encoder / rest) is numerically
    the single-program step."""
    from thermal3d.pseudo_gt.generator import PseudoGTGenerator

    cfg = DustrModelConfig(**TINY_MASTR_KW)
    gen1 = PseudoGTGenerator(cfg, batch_size=2)
    gen2 = PseudoGTGenerator(cfg, params=gen1.params, batch_size=2,
                             split_programs=True)
    rgb1 = rng.uniform(0, 1, (2, *cfg.img_size, 3)).astype(np.float32)
    rgb2 = rng.uniform(0, 1, (2, *cfg.img_size, 3)).astype(np.float32)
    out1 = gen1.run_pairs(rgb1, rgb2)
    out2 = gen2.run_pairs(rgb1, rgb2)
    assert set(out1) == set(out2)
    for k in out1:
        np.testing.assert_allclose(out1[k], out2[k], rtol=2e-4, atol=2e-4,
                                   err_msg=k)


def test_pseudo_gt_roundtrip(mini_freiburg, tmp_path):
    """Generator output layout must be loadable by the training dataset —
    the C16 → C6 contract."""
    from thermal3d.data.freiburg import FreiburgPairDataset, build_rgb_pair_index
    from thermal3d.pseudo_gt.generator import PseudoGTGenerator, generate_pseudo_gt

    cfg = DustrModelConfig(**TINY_MASTR_KW)
    gen = PseudoGTGenerator(cfg, batch_size=2)
    pairs = build_rgb_pair_index(str(mini_freiburg), frame_skip=1)
    assert len(pairs) == 3
    out_dir = tmp_path / "gt"
    n = generate_pseudo_gt(pairs, str(out_dir), gen)
    assert n == 3
    for sub in ("pointmap1", "pointmap2", "confidence1", "confidence2",
                "depth1", "depth2", "intrinsics", "poses"):
        assert len(glob.glob(str(out_dir / sub / "*.npy"))) == 3, sub
    pm = np.load(glob.glob(str(out_dir / "pointmap1" / "*.npy"))[0])
    assert pm.shape == (32, 32, 3) and pm.dtype == np.float32
    k = np.load(glob.glob(str(out_dir / "intrinsics" / "*.npy"))[0])
    assert k.shape == (3, 3)
    pose = np.load(glob.glob(str(out_dir / "poses" / "*.npy"))[0])
    assert pose.shape == (4, 4)

    # the training dataset must find and attach this GT
    ds = FreiburgPairDataset(str(mini_freiburg), img_size=(32, 32),
                             pseudo_gt_dir=str(out_dir), frame_skip=1)
    assert len(ds) == 3
    s = ds[0]
    assert s["pointmap1"].shape == (32, 32, 3)
    assert s["confidence1"].min() >= 1.0  # conf = 1 + exp(x)


def test_test_set_pseudo_gt_layout(mini_freiburg, tmp_path):
    """C23: {name}_depth.npy + _thermal_path.txt + _depth_vis.png under depth/."""
    from thermal3d.data.freiburg import build_rgb_thermal_index
    from thermal3d.pseudo_gt.generator import PseudoGTGenerator
    from thermal3d.pseudo_gt.test_set import generate_test_set_pseudo_gt

    cfg = DustrModelConfig(**TINY_MASTR_KW)
    gen = PseudoGTGenerator(cfg, batch_size=2)
    frames = build_rgb_thermal_index(str(mini_freiburg))
    out = tmp_path / "ts"
    n = generate_test_set_pseudo_gt(frames[:2], str(out), gen)
    assert n == 2
    files = sorted(os.listdir(out / "depth"))
    assert any(f.endswith("_depth.npy") for f in files)
    assert any(f.endswith("_thermal_path.txt") for f in files)
    assert any(f.endswith("_depth_vis.png") for f in files)
    d = np.load(str(out / "depth" / [f for f in files if f.endswith("_depth.npy")][0]))
    assert d.shape == (32, 32)


def test_find_matching_depth_file(tmp_path):
    from thermal3d.evaluation.evaluator import find_matching_depth_file

    depth_dir = tmp_path / "depth"
    depth_dir.mkdir()
    # RGB-suffix convention: ir stamp 191987444 → rgb stamp +'0'
    np.save(depth_dir / "fl_ir_aligned_1570730891_1919874440_rgb_depth.npy",
            np.ones((8, 8), np.float32))
    thermal = "/x/fl_ir_aligned_1570730891_191987444_ir.png"
    match = find_matching_depth_file(thermal, str(depth_dir))
    assert match is not None and match.endswith("_rgb_depth.npy")
    # glob fallback on partial timestamp
    np.save(depth_dir / "fl_ir_aligned_9999_1_rgb_depth.npy", np.ones((8, 8), np.float32))
    assert find_matching_depth_file("/x/fl_ir_aligned_9999_1_ir.png", str(depth_dir))
    assert find_matching_depth_file("/x/bad.png", str(depth_dir)) is None


def test_evaluate_test_set(mini_freiburg, tmp_path, tiny_config, rng):
    from thermal3d.evaluation.evaluator import evaluate_test_set
    from thermal3d.infer.engine import InferenceEngine

    engine = InferenceEngine(tiny_config, use_thermal_head=True)
    thermal_paths = sorted(glob.glob(
        str(mini_freiburg / "train" / "seq_00_day" / "00" / "fl_ir_aligned" / "*.png")))
    depth_dir = tmp_path / "gtd"
    depth_dir.mkdir()
    for t in thermal_paths:
        name = os.path.splitext(os.path.basename(t))[0]
        parts = name.split("_")
        ts = "_".join(parts[2:-1]) if len(parts) >= 3 else name
        np.save(depth_dir / f"fl_ir_aligned_{ts}_x_rgb_depth.npy",
                rng.uniform(1, 10, (32, 32)).astype(np.float32))
    out_dir = tmp_path / "eval_out"
    summary = evaluate_test_set(engine, thermal_paths, str(depth_dir),
                                output_dir=str(out_dir), batch_size=2)
    assert summary["n_images"] == len(thermal_paths)
    assert np.isfinite(summary["rmse"])
    assert os.path.exists(out_dir / "metrics_summary.txt")
    assert glob.glob(str(out_dir / "*_comparison.png"))


def test_evaluate_test_set_sharded_matches_single_device(
        mini_freiburg, tmp_path, tiny_config, rng):
    """Mesh-DP evaluation (cli.evaluate --ndev, VERDICT r4 #5): the sharded
    engine produces the same metrics_summary.txt as the single-device run —
    same structure/images, numerics equal up to float reduction order (the
    8-way program compiles different fusions; observed delta ~6e-6 rel).
    The eval loop was the last single-chip workload (reference:
    utils/evaluate_depth_metrics.py:247-401)."""
    import jax

    from thermal3d.core.mesh import make_mesh
    from thermal3d.evaluation.evaluator import evaluate_test_set
    from thermal3d.infer.engine import InferenceEngine

    thermal_paths = sorted(glob.glob(
        str(mini_freiburg / "train" / "seq_00_day" / "00" / "fl_ir_aligned" / "*.png")))
    depth_dir = tmp_path / "gtd"
    depth_dir.mkdir()
    for t in thermal_paths:
        name = os.path.splitext(os.path.basename(t))[0]
        parts = name.split("_")
        ts = "_".join(parts[2:-1]) if len(parts) >= 3 else name
        np.save(depth_dir / f"fl_ir_aligned_{ts}_x_rgb_depth.npy",
                rng.uniform(1, 10, (32, 32)).astype(np.float32))

    # identical params in both engines (fixed init seed)
    eng1 = InferenceEngine(tiny_config, use_thermal_head=True)
    mesh = make_mesh((8,), ("data",), devices=jax.devices("cpu")[:8])
    eng8 = InferenceEngine(tiny_config, params=eng1.params,
                           use_thermal_head=True,
                           thermal_head_params=eng1.thermal_head_params, mesh=mesh)

    out1, out8 = tmp_path / "ev1", tmp_path / "ev8"
    s1 = evaluate_test_set(eng1, thermal_paths, str(depth_dir),
                           output_dir=str(out1), save_visualizations=False,
                           batch_size=8)
    s8 = evaluate_test_set(eng8, thermal_paths, str(depth_dir),
                           output_dir=str(out8), save_visualizations=False,
                           batch_size=8)
    assert s8["n_images"] == s1["n_images"] == len(thermal_paths)
    t1 = (out1 / "metrics_summary.txt").read_text()
    t8 = (out8 / "metrics_summary.txt").read_text()

    # identical layout; every number equal to 1e-4 rel (float reduction order)
    import re

    num = re.compile(r"-?\d+\.?\d*")
    assert num.sub("#", t8) == num.sub("#", t1)
    v1 = [float(x) for x in num.findall(t1)]
    v8 = [float(x) for x in num.findall(t8)]
    np.testing.assert_allclose(v8, v1, rtol=1e-4, atol=1e-4)


def test_model_info_stats_and_validation(tiny_config, rng):
    from thermal3d.cli.model_info import (
        param_stats, reconstruct_architecture, validate_against_config)
    from thermal3d.convert.torch_to_flax import expected_torch_keys

    state = {k: rng.standard_normal(s).astype(np.float32)
             for k, s in expected_torch_keys(tiny_config).items()}
    stats = param_stats(state)
    assert stats["total"] > 0
    assert stats["groups"]["encoder"] > stats["groups"]["head"]
    arch = reconstruct_architecture(state)
    assert arch["enc_blocks"]["n_blocks"] == 2
    assert arch["dec_blocks"]["attention"] == "Self + Cross Attention"
    assert arch["patch_embed"]["embed_dim"] == 64

    # scan-layout introspection: stacked enc_scan/dec_scan keys reconstruct
    # to the same architecture
    scan_state = {"patch_embed.proj.weight": state["patch_embed.proj.weight"]}
    for k, v in state.items():
        for src, dst in (("enc_blocks.", "enc_scan.blk."),
                         ("dec_blocks.", "dec_scan.blk1."),
                         ("dec_blocks2.", "dec_scan.blk2.")):
            if k.startswith(src) and k[len(src)].isdigit():
                rest = k[len(src):].split(".", 1)[1]
                key = dst + rest
                scan_state.setdefault(key, []).append(v)
    scan_state = {k: (np.stack(v) if isinstance(v, list) else v)
                  for k, v in scan_state.items()}
    arch2 = reconstruct_architecture(scan_state)
    assert arch2["enc_blocks"]["n_blocks"] == 2
    assert arch2["dec_blocks2"]["n_blocks"] == 2

    report = validate_against_config(state, tiny_config)
    assert not report["missing"] and not report["unexpected"]
    del state["enc_norm.weight"]
    state["bogus.weight"] = np.zeros(3, np.float32)
    report = validate_against_config(state, tiny_config)
    assert report["missing"] == ["enc_norm.weight"]
    assert report["unexpected"] == ["bogus.weight"]


def test_dataset_exploration(mini_freiburg):
    from thermal3d.data.exploration import explore_dataset

    info = explore_dataset(str(mini_freiburg))
    assert info["extension_counts"][".png"] == 8
    assert len(info["rgb_dirs"]) == 1
    assert len(info["thermal_dirs"]) == 1


def test_viz_panels_smoke(tmp_path, rng):
    from thermal3d.viz.panels import (
        overlay_rgb_thermal, plot_point_cloud, sample_figure, visualize_data,
        visualize_depth_result, visualize_ir)

    t = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    d = rng.uniform(1, 5, (16, 16)).astype(np.float32)
    import matplotlib.pyplot as plt

    for fig in [sample_figure(t, t, d, d), sample_figure(t, t, d, d, with_edges=True)]:
        plt.close(fig)
    visualize_data(t, t, d, d, save_path=str(tmp_path / "vd.png"))
    visualize_depth_result(t, d, d, save_path=str(tmp_path / "vr.png"))
    visualize_ir(rng.uniform(21800, 23700, (16, 16)), save_path=str(tmp_path / "ir.png"))
    ov = overlay_rgb_thermal(t, d)
    assert ov.shape == (16, 16, 3)
    pm = np.concatenate([rng.standard_normal((16, 16, 2)), d[..., None]], axis=-1)
    plot_point_cloud(pm, color_img=t, pose=np.eye(4), save_path=str(tmp_path / "pc.png"))
    assert all((tmp_path / f).exists() for f in ["vd.png", "vr.png", "ir.png", "pc.png"])


def test_viz_full_pair_panels(tmp_path, rng):
    """Reference-faithful pair panels (visualize.py:463-541, 725-818):
    combined 3-D cloud + camera frames, per-view clouds, and the
    8-directory-layout driver."""
    from thermal3d.viz.panels import (visualize_pair_from_dir,
                                      visualize_pair_full,
                                      visualize_pair_merged_full)

    rgb = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    pm = rng.uniform(0.5, 5, (16, 16, 3)).astype(np.float32)
    d = pm[..., 2]
    pose = np.eye(4)
    pose[:3, 3] = [0.1, 0.0, 0.05]
    visualize_pair_full(rgb, d, pm, rgb, d, pm, pose=pose,
                        intrinsics=np.eye(3), camera_size=0.5,
                        save_path=str(tmp_path / "pf.png"))
    visualize_pair_merged_full(rgb, d, pm, rgb, d, pm,
                               save_path=str(tmp_path / "pmf.png"))

    pair = "a_b"
    for sub in ("pointmap1", "pointmap2", "intrinsics", "poses"):
        (tmp_path / "gt" / sub).mkdir(parents=True)
    np.save(tmp_path / "gt" / "pointmap1" / f"base_{pair}.npy", pm)
    np.save(tmp_path / "gt" / "pointmap2" / f"{pair}.npy", pm)
    np.save(tmp_path / "gt" / "intrinsics" / f"{pair}.npy", np.eye(3))
    np.save(tmp_path / "gt" / "poses" / f"{pair}.npy", pose)
    visualize_pair_from_dir(str(tmp_path / "gt"), pair,
                            save_path=str(tmp_path / "pd.png"))
    visualize_pair_from_dir(str(tmp_path / "gt"), pair, merged=True,
                            save_path=str(tmp_path / "pdm.png"))
    assert all((tmp_path / f).exists()
               for f in ["pf.png", "pmf.png", "pd.png", "pdm.png"])


def test_viz_sampler_and_pairs(tmp_path, rng):
    from thermal3d.viz.sampler import sample_dataset, visualize_pair, visualize_pair_merged

    class DS:
        def __len__(self):
            return 5

        def __getitem__(self, i):
            return {
                "thermal1": rng.uniform(21000, 26000, (16, 16, 3)).astype(np.float32),
                "thermal2": rng.uniform(21000, 26000, (16, 16, 3)).astype(np.float32),
                "pointmap1": rng.uniform(0.1, 5, (16, 16, 3)).astype(np.float32),
            }

    t = rng.uniform(0, 1, (16, 16)).astype(np.float32)
    visualize_pair(t, t, t, t, save_path=str(tmp_path / "pair.png"))
    visualize_pair_merged(t, t, t * 5, t * 4, pose=np.eye(4),
                          save_path=str(tmp_path / "merged.png"))
    sample_dataset(DS(), n=3, save_path=str(tmp_path / "samples.png"))
    assert all((tmp_path / f).exists() for f in ["pair.png", "merged.png", "samples.png"])


def test_shard_batch_multihost_single_host(rng):
    import jax

    from thermal3d.core.mesh import make_mesh, shard_batch_multihost

    mesh = make_mesh((-1,), ("data",), devices=jax.devices("cpu"))
    batch = {"x": rng.standard_normal((8, 4)).astype(np.float32)}
    out = shard_batch_multihost(mesh, batch)
    assert out["x"].shape == (8, 4)
    np.testing.assert_allclose(np.asarray(out["x"]), batch["x"])


def test_evaluate_thermal_depth_model_level(tiny_config, rng):
    """C21: monocular eval over a dataset with GT depth (metrics.py:72-137)."""
    from thermal3d.evaluation.evaluator import evaluate_thermal_depth
    from thermal3d.infer.engine import InferenceEngine

    engine = InferenceEngine(tiny_config, use_thermal_head=False)

    class DS:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            return {
                "thermal1": rng.uniform(21000, 26000, (32, 32, 3)).astype(np.float32),
                "depth1": rng.uniform(1, 10, (32, 32)).astype(np.float32),
            }

    m = evaluate_thermal_depth(engine, DS())
    assert set(m) == {"abs_rel", "sq_rel", "rmse", "rmse_log", "acc_1", "acc_2", "acc_3"}
    assert np.isfinite(m["rmse"])


def test_engine_params_dtype(tiny_config):
    import jax

    from thermal3d.infer.engine import InferenceEngine

    engine = InferenceEngine(tiny_config, use_thermal_head=False,
                             params_dtype="bfloat16")
    leaf = jax.tree_util.tree_leaves(engine.params)[0]
    assert str(leaf.dtype) == "bfloat16"
    out = engine.infer(np.full((1, 40, 48), 0.35, np.float32))
    assert np.isfinite(out["depth"]).all()


def test_generator_mesh_dp_matches_single(rng):
    """Data-parallel pseudo-GT generation over the virtual 8-device mesh is
    numerically identical to single-device (VERDICT r3 #1: the 20.6k-frame
    offline workload scales over a slice)."""
    import jax

    from thermal3d.core.mesh import make_mesh
    from thermal3d.pseudo_gt.generator import PseudoGTGenerator

    cfg = DustrModelConfig(**TINY_MASTR_KW)
    mesh = make_mesh((8,), ("data",), devices=jax.devices("cpu")[:8])
    rgb1 = rng.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32)
    rgb2 = rng.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32)
    single = PseudoGTGenerator(cfg, batch_size=8, rng_seed=2)
    sharded = PseudoGTGenerator(cfg, batch_size=8, rng_seed=2, mesh=mesh)
    o_s = single.run_pairs(rgb1, rgb2)
    o_m = sharded.run_pairs(rgb1, rgb2)
    # float tolerance: the per-shard SPMD program's reduction order differs
    for k in ("depth1", "intrinsics", "poses", "confidence2"):
        np.testing.assert_allclose(o_m[k], o_s[k], rtol=1e-4, atol=1e-4)


def test_generator_mesh_rejects_indivisible_batch():
    import jax

    from thermal3d.core.mesh import make_mesh
    from thermal3d.pseudo_gt.generator import PseudoGTGenerator

    cfg = DustrModelConfig(**TINY_MASTR_KW)
    mesh = make_mesh((8,), ("data",), devices=jax.devices("cpu")[:8])
    with pytest.raises(ValueError, match="not divisible"):
        PseudoGTGenerator(cfg, batch_size=6, mesh=mesh)


def test_model_info_text_and_diagram(tiny_config, rng, tmp_path):
    """Reference-style architecture rendering + the mpl box diagram
    (scripts/model_info.py:158-334 counterpart, VERDICT r3 #8)."""
    from thermal3d.cli.model_info import (draw_architecture_diagram,
                                          reconstruct_architecture,
                                          render_architecture_text)
    from thermal3d.convert.torch_to_flax import expected_torch_keys

    state = {k: rng.standard_normal(s).astype(np.float32)
             for k, s in expected_torch_keys(tiny_config).items()}
    arch = reconstruct_architecture(state)
    text = render_architecture_text(arch)
    assert "DUSt3R Model Architecture" in text
    assert "Dual-branch decoder structure" in text
    assert "Self + Cross Attention" in text
    png = tmp_path / "arch.png"
    draw_architecture_diagram(arch, str(png))
    assert png.exists() and png.stat().st_size > 1000


def test_debug_loading_diagnostic(mini_freiburg, capsys):
    """FreiburgPairDataset.debug_loading prints the per-sample file
    resolution (reference data/dataset_loader.py:219-235) and returns it."""
    from thermal3d.data.freiburg import FreiburgPairDataset

    ds = FreiburgPairDataset(str(mini_freiburg), img_size=(32, 32),
                             use_pseudo_gt=False)
    assert len(ds) > 0
    info = ds.debug_loading(0)
    out = capsys.readouterr().out
    assert "thermal1" in out and "exists: True" in out
    assert info["thermal1"]["exists"]
    assert info["loaded"]["thermal1"] == (32, 32, 3)

    # train CLI exposes it as --debug_loading IDX
    from thermal3d.cli.train import build_parser

    args = build_parser().parse_args(
        ["--dataset_dir", "d", "--pseudo_gt_dir", "g", "--weights", "w",
         "--output_model", "o", "--debug_loading", "0"])
    assert args.debug_loading == 0


def test_viz_enhanced_thermal_and_borders(tmp_path, rng):
    """Border removal crops exactly to the >threshold bounding box;
    visualize_enhanced_thermal returns the model-input enhancement
    (visualize.py:236-345) and writes the two-panel figure."""
    import cv2

    from thermal3d.viz.panels import (colorize_ir, remove_black_borders,
                                      visualize_enhanced_thermal,
                                      visualize_ir_standalone)

    img = np.zeros((20, 24), np.uint16)
    img[3:17, 5:21] = rng.integers(21000, 26000, (14, 16)).astype(np.uint16)
    assert remove_black_borders(img).shape == (14, 16)
    assert remove_black_borders(np.zeros((4, 4), np.uint16)).shape == (4, 4)

    p = tmp_path / "ir.png"
    cv2.imwrite(str(p), img)
    colored = colorize_ir(str(p))
    assert colored.shape == (20, 24, 3) and colored.dtype == np.uint8
    out = visualize_ir_standalone(str(p), save_path=str(tmp_path / "s.png"))
    assert out.shape == (20, 24, 3) and (tmp_path / "s.png").exists()

    enh = visualize_enhanced_thermal(str(p), img_size=(16, 16),
                                     save_path=str(tmp_path / "e.png"))
    assert enh.shape == (16, 16, 3) and np.isfinite(enh).all()
    assert float(enh.min()) >= 0.0 and float(enh.max()) <= 1.0
    assert (tmp_path / "e.png").exists()


def test_viz_dataset_drive_browser(tmp_path, rng):
    """find_drive_folders / load_images_from_drive / visualize_dataset over a
    synthetic Freiburg tree (visualize.py:543-694)."""
    import cv2

    from thermal3d.viz.sampler import (find_drive_folders,
                                       load_images_from_drive,
                                       visualize_dataset)

    for seq, sub in [("seq_00_day", "00"), ("seq_01_night", "00")]:
        d = tmp_path / "train" / seq / sub
        (d / "fl_rgb").mkdir(parents=True)
        (d / "fl_ir_aligned").mkdir(parents=True)
        for i in range(2):
            cv2.imwrite(str(d / "fl_rgb" / f"fl_rgb_{i}.png"),
                        rng.integers(0, 255, (16, 16, 3)).astype(np.uint8))
            cv2.imwrite(str(d / "fl_ir_aligned" / f"fl_ir_aligned_{i}.png"),
                        rng.integers(21000, 26000, (16, 16)).astype(np.uint16))

    drives = find_drive_folders(str(tmp_path))
    assert len(drives) == 2 and drives[0][0] == "seq_00_day"
    rgb, ir = load_images_from_drive(drives[0][2])  # recursive fallback
    assert len(rgb) == 2 and len(ir) == 2
    out = tmp_path / "samples"
    n = visualize_dataset(str(tmp_path), num_samples=3, output_dir=str(out))
    assert n == 3 and len(list(out.glob("*.png"))) == 3
