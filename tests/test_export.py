"""Serving-artifact export/load (infer/export.py): the exported StableHLO +
weights npz must reproduce InferenceEngine.infer without any model code at
load time, across monocular/stereo/int8/padding, with cpu+tpu lowering."""

import numpy as np
import pytest

from thermal3d.infer.engine import InferenceEngine
from thermal3d.infer.export import ServingArtifact, save_serving_artifact


@pytest.fixture
def raw_frames(rng):
    # raw grayscale at a non-model resolution so the in-program resize runs
    return rng.uniform(21000.0, 26000.0, (4, 24, 28)).astype(np.float32)


def _export(tmp_path, engine, **kw):
    path = str(tmp_path / "serving.npz")
    meta = save_serving_artifact(path, engine, batch_sizes=(4,),
                                 input_hw=(24, 28), **kw)
    return path, meta


def test_artifact_matches_engine(tmp_path, tiny_config, raw_frames):
    engine = InferenceEngine(tiny_config)
    path, meta = _export(tmp_path, engine)
    art = ServingArtifact.load(path)
    got = art.infer(raw_frames)
    want = engine.infer(raw_frames)
    assert set(got) == set(meta["outputs"]) == set(want)
    for k in got:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)
    assert "cpu" in art.meta["platforms"] and "tpu" in art.meta["platforms"]


def test_artifact_pads_short_batches(tmp_path, tiny_config, raw_frames):
    engine = InferenceEngine(tiny_config)
    path, _ = _export(tmp_path, engine)
    art = ServingArtifact.load(path)
    full = art.infer(raw_frames)
    short = art.infer(raw_frames[:3])
    assert short["depth"].shape[0] == 3
    np.testing.assert_array_equal(short["depth"], full["depth"][:3])
    with pytest.raises(ValueError, match="largest exported"):
        art.infer(np.concatenate([raw_frames, raw_frames]))


def test_artifact_stereo(tmp_path, tiny_config, raw_frames, rng):
    engine = InferenceEngine(tiny_config)
    path, _ = _export(tmp_path, engine, stereo=True)
    art = ServingArtifact.load(path)
    raw2 = rng.uniform(21000.0, 26000.0, (4, 24, 28)).astype(np.float32)
    got = art.infer(raw_frames, raw2)
    want = engine.infer(raw_frames, raw2)
    np.testing.assert_allclose(got["pointmap2"], want["pointmap2"],
                               rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError, match="second view"):
        art.infer(raw_frames)  # monocular call on a stereo artifact


def test_artifact_int8(tmp_path, tiny_config, raw_frames):
    """The quant collection (int8 kernels + scales) must ride the artifact:
    the loaded program matches the int8 engine, not the float one."""
    engine = InferenceEngine(tiny_config, quantize_int8=True)
    path, meta = _export(tmp_path, engine)
    assert meta["int8"]
    art = ServingArtifact.load(path)
    got = art.infer(raw_frames)
    want = engine.infer(raw_frames)
    np.testing.assert_allclose(got["depth"], want["depth"],
                               rtol=1e-5, atol=1e-6)
    flo = InferenceEngine(tiny_config).infer(raw_frames)
    assert not np.allclose(got["depth"], flo["depth"], rtol=1e-5, atol=1e-6)


def test_artifact_rejects_wrong_shape_and_format(tmp_path, tiny_config,
                                                 raw_frames):
    engine = InferenceEngine(tiny_config)
    path, _ = _export(tmp_path, engine)
    art = ServingArtifact.load(path)
    with pytest.raises(ValueError, match="raw frames"):
        art.infer(raw_frames[:, :12, :])
    bogus = tmp_path / "bogus.npz"
    np.savez(bogus, meta=np.frombuffer(b'{"format": "nope"}', dtype=np.uint8))
    with pytest.raises(ValueError, match="not a thermal3d-serving"):
        ServingArtifact.load(str(bogus))
    with pytest.raises(ValueError, match="empty batch"):
        art.infer(raw_frames[:0])


def test_loader_imports_without_flax(tmp_path, tiny_config, raw_frames):
    """The deployment contract: `from thermal3d.infer.export import
    ServingArtifact` + load + infer on a host with jax+numpy but NO
    flax/optax/orbax. Run in a fresh subprocess with those imports blocked
    (this process already has them cached in sys.modules)."""
    import subprocess
    import sys

    engine = InferenceEngine(tiny_config)
    path, _ = _export(tmp_path, engine)
    np.save(tmp_path / "frames.npy", raw_frames)
    code = f"""
import sys

class Block:
    BLOCKED = ("flax", "optax", "orbax")
    def find_spec(self, name, path=None, target=None):
        if name.split(".")[0] in self.BLOCKED:
            raise ImportError("blocked: " + name)
        return None

sys.meta_path.insert(0, Block())
import numpy as np
from thermal3d.infer.export import ServingArtifact
art = ServingArtifact.load({str(path)!r})
out = art.infer(np.load({str(tmp_path / "frames.npy")!r}))
assert out["depth"].shape[0] == 4 and np.isfinite(out["depth"]).all()
assert not [m for m in sys.modules if m.split(".")[0] in Block.BLOCKED]
print("FLAX_FREE_OK")
"""
    import os

    env = dict(os.environ, THERMAL3D_PLATFORM="cpu")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run([sys.executable, "-c", code], cwd=repo_root,
                          capture_output=True, text=True, env=env,
                          timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "FLAX_FREE_OK" in proc.stdout


def test_native_platform_export(tmp_path, tiny_config, raw_frames):
    """platforms=None exports the engine's exact native program for the
    current backend only; multi-platform exports flag the portable variant.
    On the CPU test backend both programs are the same ops, so outputs
    match the engine either way."""
    engine = InferenceEngine(tiny_config)
    path = str(tmp_path / "native.npz")
    meta = save_serving_artifact(path, engine, batch_sizes=(4,),
                                 input_hw=(24, 28), platforms=None)
    import jax

    assert meta["platforms"] == [jax.default_backend()]
    assert not meta["portable_program"]
    got = ServingArtifact.load(path).infer(raw_frames)
    want = engine.infer(raw_frames)
    np.testing.assert_allclose(got["depth"], want["depth"],
                               rtol=1e-5, atol=1e-6)
    _, multi = _export(tmp_path, engine)
    assert multi["portable_program"]


def test_export_cli(tmp_path, raw_frames):
    from thermal3d.cli.export import main

    out = str(tmp_path / "cli.npz")
    main(["--out", out, "--batch_sizes", "4", "--input_hw", "24", "28",
          "--model_preset", "tiny", "--img_size", "32", "32",
          "--compute_dtype", "float32"])
    art = ServingArtifact.load(out)
    depth = art.infer(raw_frames)["depth"]
    assert depth.shape == (4, 32, 32) and np.isfinite(depth).all()
