"""Pseudo-GT generation: frozen MASt3R-512 over RGB temporal pairs.

TPU re-design of scripts/pseudo_gt.py:507-611. The reference runs one pair at
a time under no_grad and does intrinsics/pose estimation on the host in numpy;
here forward + intrinsics (median focal fit, pseudo_gt.py:137-184) + Umeyama
relative pose (pseudo_gt.py:186-229) are ONE jitted batched program (the
geometry is vmapped on device), and only the .npy writes stay on host.

Output layout is byte-compatible with the reference's 8 directories
(pseudo_gt.py:519-592): pointmap1/2, confidence1/2 by pair name;
depth1/2 by single-image base name; intrinsics, poses by pair name.
"""

from __future__ import annotations


import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from thermal3d.core.config import MASTR_512_CATMLPDPT, DustrModelConfig
from thermal3d.geometry.calibration import load_thermal_calibration
from thermal3d.geometry.intrinsics import estimate_camera_intrinsics_jit
from thermal3d.geometry.umeyama import extract_relative_pose_jit
from thermal3d.models.dustr import AsymmetricCroCo3DStereo
from thermal3d.preprocess.io import load_rgb_image

OUTPUT_DIRS = ("pointmap1", "pointmap2", "confidence1", "confidence2",
               "depth1", "depth2", "intrinsics", "poses")


def _vars(params, quant):
    """Flax variable dict; the 'quant' collection only when int8 scales exist
    (QuantDense dispatches on its presence — models/layers.py)."""
    v = {"params": params}
    if quant is not None:
        v["quant"] = quant
    return v


class PseudoGTGenerator:
    def __init__(self, config: DustrModelConfig = MASTR_512_CATMLPDPT,
                 params: Optional[Dict] = None, batch_size: int = 4,
                 calib_file: Optional[str] = None, rng_seed: int = 0,
                 split_programs: bool = False, params_dtype: Optional[str] = None,
                 quantize_int8: bool = False,
                 int8_group_size: Optional[int] = None,
                 int8_skip: tuple = (), int8_only: tuple = (),
                 int8_equalize: bool = False, int8_calibration=None,
                 mesh=None):
        """split_programs: compile encoder and decoder+heads+geometry as TWO
        programs instead of one — same numerics, one extra HBM round-trip of
        the encoder features, but each XLA compile is roughly half the size
        (for environments where the single 512 program compiles too slowly;
        docs/PERF.md).

        quantize_int8: int8-MXU the trunk GEMMs (kernels/quant.py), same
        opt-in + scoping as the serving engine. Measured at 512 production
        dims (docs/INT8_SWEEP.md): full-trunk +9.9% pairs/s but 8.1% depth
        RMS drift (fc1-scope is speed-NEUTRAL at S=1024) — pseudo-GT is
        GT-GENERATING, so this is for heavily-filtered candidate generation
        only; gate outputs via cli.parity before training on them. At
        S=1024 'auto' attention resolves to the fused Pallas kernels, so
        the engine's postscale-vs-int8 pin does not apply here.

        mesh: optional jax.sharding.Mesh for data-parallel generation —
        params replicated, pair batches sharded on 'data', one SPMD program.
        The heaviest offline workload (20.6k Freiburg frames) then scales
        linearly over a slice instead of one chip (the reference is
        single-GPU, scripts/pseudo_gt.py:507-611). batch_size must be a
        multiple of the mesh's data size."""
        self.config = config
        self.batch_size = batch_size
        self.mesh = mesh
        self._n_data = int(mesh.shape.get("data", 1)) if mesh is not None else 1
        if batch_size % self._n_data:
            raise ValueError(
                f"batch_size {batch_size} not divisible by the mesh's "
                f"data-parallel size {self._n_data}")
        self.split_programs = split_programs
        self.model = AsymmetricCroCo3DStereo(config)
        h, w = config.img_size
        if params is None:
            dummy = jnp.zeros((1, h, w, 3), jnp.float32)
            params = jax.jit(lambda k: self.model.init(k, dummy, dummy))(
                jax.random.key(rng_seed))["params"]
        if params_dtype is not None:
            dt = jnp.bfloat16 if params_dtype == "bfloat16" else jnp.dtype(params_dtype)
            params = jax.tree_util.tree_map(lambda x: x.astype(dt), params)
        self.quant = None
        if quantize_int8:
            from thermal3d.kernels.quant import (equalize_ln_gemm,
                                                 quantize_params_int8)

            if int8_equalize:  # exact LN→GEMM fold (see engine / quant.py)
                params = equalize_ln_gemm(params, only=int8_only,
                                          skip=int8_skip)
            act_scales = None
            if int8_calibration is not None:
                # (rgb1, rgb2) sample pair batch → ONE float forward with
                # 'calib' mutable: static per-GEMM activation scales
                # (engine docstring / kernels/quant.py act_scales)
                r1, r2 = int8_calibration
                _, mut = self.model.apply(
                    {"params": params}, jnp.asarray(r1), jnp.asarray(r2),
                    mutable=["calib"])
                act_scales = mut["calib"]
            params, self.quant = quantize_params_int8(
                params, group_size=int8_group_size, skip=int8_skip,
                only=int8_only, act_scales=act_scales)
        self.params = params
        if mesh is not None:
            from thermal3d.core.mesh import replicated_sharding

            repl = replicated_sharding(mesh)
            put = lambda x: jax.device_put(x, repl)  # noqa: E731
            self.params = jax.tree_util.tree_map(put, self.params)
            if self.quant is not None:
                self.quant = jax.tree_util.tree_map(put, self.quant)
        self.calib_k = None
        if calib_file and os.path.exists(calib_file):
            try:
                self.calib_k, _, _ = load_thermal_calibration(calib_file)
            except Exception:
                self.calib_k = None  # fall back to estimation (pseudo_gt.py:148)
        if split_programs:
            # the two-view concat and the feats split both live INSIDE the
            # jitted programs: an eager op between them would dispatch
            # through the (slow) host↔device path per call
            self._enc = jax.jit(lambda p, q, rgb1, rgb2: self.model.apply(
                _vars(p, q), jnp.concatenate([rgb1, rgb2], axis=0),
                method="encode"))
            self._tail = jax.jit(
                lambda p, q, feats, pos: self._tail_impl(p, q, feats, pos))
            self._step = self._step_split
        else:
            self._step = jax.jit(self._step_impl)

    def _step_split(self, params, quant, rgb1, rgb2):
        feats, pos, grid = self._enc(params, quant, rgb1, rgb2)
        return self._tail(params, quant, feats, pos)

    def _tail_impl(self, params, quant, feats, pos):
        grid = self.config.patch_grid
        b = feats.shape[0] // 2
        pred1, pred2 = self.model.apply(_vars(params, quant), feats[:b],
                                        feats[b:], pos, grid,
                                        method="decode_with_heads")
        return self._geometry(pred1, pred2)

    def _step_impl(self, params, quant, rgb1, rgb2):
        """rgb*: [B, H, W, 3] in [0,1] → all pseudo-GT tensors, on device."""
        pred1, pred2 = self.model.apply(_vars(params, quant), rgb1, rgb2)
        return self._geometry(pred1, pred2)

    def _geometry(self, pred1, pred2):
        pm1 = pred1["pts3d"].astype(jnp.float32)
        pm2 = pred2["pts3d_in_other_view"].astype(jnp.float32)
        c1 = pred1["conf"].astype(jnp.float32)
        c2 = pred2["conf"].astype(jnp.float32)
        d1 = pm1[..., 2]
        d2 = pm2[..., 2]
        k = jax.vmap(estimate_camera_intrinsics_jit)(pm1, d1)
        pose = jax.vmap(extract_relative_pose_jit)(pm1, pm2)
        return {"pointmap1": pm1, "pointmap2": pm2, "confidence1": c1,
                "confidence2": c2, "depth1": d1, "depth2": d2,
                "intrinsics": k, "poses": pose}

    def _shard(self, rgb):
        """Place one pair batch onto the mesh, sharded on 'data' (no-op
        without a mesh)."""
        if self.mesh is None:
            return jnp.asarray(rgb)
        from thermal3d.core.mesh import data_sharding

        rgb = np.asarray(rgb)
        if rgb.shape[0] % self._n_data:
            raise ValueError(
                f"batch size {rgb.shape[0]} not divisible by the mesh's "
                f"data-parallel size {self._n_data}")
        return jax.device_put(rgb, data_sharding(self.mesh, rgb.ndim))

    def run_pairs_async(self, rgb1: np.ndarray, rgb2: np.ndarray
                        ) -> Dict[str, jnp.ndarray]:
        """Dispatch one pair batch; returns DEVICE arrays without blocking
        (generate_pseudo_gt overlaps the next batch's decode with this one's
        compute)."""
        return self._step(self.params, self.quant,
                          self._shard(rgb1), self._shard(rgb2))

    def run_pairs(self, rgb1: np.ndarray, rgb2: np.ndarray) -> Dict[str, np.ndarray]:
        out = self.run_pairs_async(rgb1, rgb2)
        return {k: np.asarray(v) for k, v in out.items()}


def _resize_rgb(img: np.ndarray, hw) -> np.ndarray:
    try:
        import cv2

        return cv2.resize(img, (hw[1], hw[0]))
    except Exception:
        return np.asarray(jax.image.resize(jnp.asarray(img), (*hw, 3), method="bilinear", antialias=False))


def generate_pseudo_gt(pairs: List[Dict[str, str]], output_dir: str,
                       generator: Optional[PseudoGTGenerator] = None,
                       batch_size: int = 4, visualize: bool = False,
                       calib_file: Optional[str] = None,
                       max_pairs: Optional[int] = None) -> int:
    """pairs: entries from data.freiburg.build_rgb_pair_index. Returns the
    number of pairs written."""
    if generator is None:
        generator = PseudoGTGenerator(batch_size=batch_size, calib_file=calib_file)
    for d in OUTPUT_DIRS:
        os.makedirs(os.path.join(output_dir, d), exist_ok=True)
    vis_dir = os.path.join(output_dir, "visualizations")
    if visualize:
        os.makedirs(vis_dir, exist_ok=True)

    hw = generator.config.img_size
    n_written = 0
    if max_pairs is not None:
        pairs = pairs[:max_pairs]
    bs = generator.batch_size

    def decode_chunk(chunk):
        imgs1, imgs2, names = [], [], []
        for pr in chunk:
            a = load_rgb_image(pr["rgb_path1"])
            b = load_rgb_image(pr["rgb_path2"])
            if a is None or b is None:
                continue
            imgs1.append(_resize_rgb(a, hw))
            imgs2.append(_resize_rgb(b, hw))
            b1 = os.path.splitext(os.path.basename(pr["rgb_path1"]))[0]
            b2 = os.path.splitext(os.path.basename(pr["rgb_path2"]))[0]
            names.append((b1, b2))
        return imgs1, imgs2, names

    def write_batch(dev_out, names, imgs1, imgs2, real):
        nonlocal n_written
        out = {k: np.asarray(v) for k, v in dev_out.items()}
        if generator.calib_k is not None:
            out["intrinsics"] = np.tile(generator.calib_k[None], (bs, 1, 1)).astype(np.float32)
        for j, (b1, b2) in enumerate(names[:real]):
            pair_name = f"{b1}_{b2}"
            np.save(os.path.join(output_dir, "pointmap1", f"{pair_name}.npy"), out["pointmap1"][j])
            np.save(os.path.join(output_dir, "pointmap2", f"{pair_name}.npy"), out["pointmap2"][j])
            np.save(os.path.join(output_dir, "confidence1", f"{pair_name}.npy"), out["confidence1"][j])
            np.save(os.path.join(output_dir, "confidence2", f"{pair_name}.npy"), out["confidence2"][j])
            np.save(os.path.join(output_dir, "depth1", f"{b1}.npy"), out["depth1"][j])
            np.save(os.path.join(output_dir, "depth2", f"{b2}.npy"), out["depth2"][j])
            np.save(os.path.join(output_dir, "intrinsics", f"{pair_name}.npy"), out["intrinsics"][j])
            np.save(os.path.join(output_dir, "poses", f"{pair_name}.npy"), out["poses"][j])
            if visualize and n_written < 10:
                from thermal3d.viz.panels import visualize_data

                visualize_data(imgs1[j], imgs2[j], out["depth1"][j], out["depth2"][j],
                               save_path=os.path.join(vis_dir, f"{pair_name}.png"))
            n_written += 1

    # pipelined: a background thread decodes chunk i+1/i+2 while the device
    # computes chunk i; chunk i's fetch + npy writes happen only after chunk
    # i+1 is dispatched (pipelined_batches — shared with infer_paths)
    from thermal3d.data.pipeline import pipelined_batches

    chunks = [pairs[i : i + bs] for i in range(0, len(pairs), bs)]

    def dispatch(decoded):
        imgs1, imgs2, names = decoded
        if not imgs1:
            return None
        real = len(imgs1)
        while len(imgs1) < bs:  # pad to static batch
            imgs1.append(imgs1[-1])
            imgs2.append(imgs2[-1])
        dev_out = generator.run_pairs_async(np.stack(imgs1), np.stack(imgs2))
        return (dev_out, names, imgs1, imgs2, real)

    pipelined_batches(chunks, decode_chunk, dispatch,
                      lambda token: write_batch(*token))
    return n_written
