"""Batched jit inference engine — the north-star benchmark path
(SURVEY.md §3.2: preprocess → forward → depth extraction at 224²).

Re-designs thermal_dustr_inference.py:63-159 TPU-first: the reference runs one
frame at a time through host-side numpy preprocessing and an unfused torch
forward; here decode stays on host while normalize→resize→percentile-enhance→
(optional learnable thermal head)→model→depth-extract is ONE jitted program
over a batch, bf16 on the MXU (the linear 224 head and all regression
activations stay f32; DPT/catmlpdpt conv heads follow the compute dtype —
HeadConfig.dpt_dtype), Pallas fused attention.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from thermal3d.core.config import DUSTR_224_LINEAR, DustrModelConfig
from thermal3d.models.dustr import AsymmetricCroCo3DStereo
from thermal3d.models.thermal_wrap import ThermalPreprocessHead
from thermal3d.preprocess.enhance import enhance_thermal_contrast, rgb_to_gray
from thermal3d.preprocess.resize import resize_bilinear_hw


class InferenceEngine:
    """Holds a jitted forward for fixed (batch, H, W) shapes.

    use_thermal_head replicates wrapping with ThermalDUSt3R at inference
    (thermal_dustr_inference.py:95-96). Monocular mode feeds view1 as view2
    (:87-92).

    mesh: optional jax.sharding.Mesh for data-parallel serving — params are
    replicated, batches are sharded on the 'data' axis, and XLA compiles one
    SPMD program whose per-chip work is batch/n_data (the reference's
    inference driver is single-GPU, thermal_dustr_inference.py:323-350; here
    a slice serves N× the throughput). Numerics match single-device to float
    tolerance (tests/test_engine.py — the per-shard program's fusion order
    differs, so not bit-equal).
    """

    def __init__(
        self,
        config: DustrModelConfig = DUSTR_224_LINEAR,
        params: Optional[Dict] = None,
        use_thermal_head: bool = True,
        thermal_head_params: Optional[Dict] = None,
        rng_seed: int = 0,
        params_dtype: Optional[str] = None,
        quantize_int8: bool = False,
        int8_group_size: Optional[int] = None,
        int8_skip: tuple = (),
        int8_only: tuple = (),
        int8_equalize: bool = False,
        int8_calibration=None,
        mesh=None,
    ):
        """int8_calibration: optional raw grayscale frame sample [B, h, w]
        (any scale) — runs ONE float forward over it to calibrate static
        per-GEMM activation scales, so int8 serving skips the per-token
        dynamic absmax pass (kernels/quant.py act_scales). Requires
        quantize_int8 and int8_group_size=None."""
        if quantize_int8:
            # shared int8 attention policy (rationale in kernels/quant.py)
            from thermal3d.kernels.quant import pin_attention_for_int8

            config = dataclasses.replace(
                config,
                attention_impl=pin_attention_for_int8(config.attention_impl))
        self.config = config
        self.model = AsymmetricCroCo3DStereo(config)
        h, w = config.img_size
        if params is None:  # random init (tests / benchmarks without ckpt)
            dummy = jnp.zeros((1, h, w, 3), jnp.float32)
            params = self.model.init(jax.random.key(rng_seed), dummy, dummy)["params"]
        if params_dtype is not None:
            # store weights in the compute dtype once (e.g. 'bfloat16') so the
            # forward skips the per-step f32→bf16 weight cast (~1 GB HBM/step
            # at ViT-L scale)
            dt = jnp.bfloat16 if params_dtype == "bfloat16" else jnp.dtype(params_dtype)
            params = jax.tree_util.tree_map(lambda x: x.astype(dt), params)
        self.use_thermal_head = use_thermal_head
        self._thermal_head = ThermalPreprocessHead()
        if use_thermal_head and thermal_head_params is None:
            dummy = jnp.zeros((1, h, w, 3), jnp.float32)
            thermal_head_params = self._thermal_head.init(jax.random.key(0), dummy)["params"]
        self.thermal_head_params = thermal_head_params

        self.quant = None
        if quantize_int8:
            # int8 MXU serving mode (2x bf16 peak; measured 1.3-1.5x on the
            # trunk GEMMs — docs/PERF.md). Accuracy-gated: tests bound the
            # tiny-model depth drift and the parity harness enforces the
            # BASELINE 1%-AbsRel criterion before this may serve.
            from thermal3d.kernels.quant import (equalize_ln_gemm,
                                                 quantize_params_int8)

            # int8_group_size: finer weight scales, measured NOT to reduce
            # drift on this model (docs/INT8_SWEEP.md — the drift lever is
            # int8_only/scope); int8_skip holds named layers in float
            # (scripts/int8_sensitivity.py ranks them) — PARITY.md frontier.
            if int8_equalize:
                # SmoothQuant-style LN→GEMM fold: exact reparameterization,
                # damps activation outlier channels before dynamic quant
                params = equalize_ln_gemm(params, only=int8_only,
                                          skip=int8_skip)
            act_scales = None
            if int8_calibration is not None:
                # ONE float forward over the sample, serving-shaped
                # (preprocess → thermal head → monocular model), with the
                # 'calib' collection mutable: QuantDense sows per-GEMM input
                # absmax (max-reduced over the sample)
                x = self._preprocess(jnp.asarray(int8_calibration))
                if use_thermal_head:
                    x = self._thermal_head.apply(
                        {"params": thermal_head_params}, x)
                _, mut = self.model.apply({"params": params}, x, None,
                                          mutable=["calib"])
                act_scales = mut["calib"]
            params, self.quant = quantize_params_int8(
                params, group_size=int8_group_size, skip=int8_skip,
                only=int8_only, act_scales=act_scales)
        self.params = params

        self.mesh = mesh
        self._n_data = 1
        if mesh is not None:
            from thermal3d.core.mesh import replicated_sharding

            self._n_data = int(mesh.shape.get("data", 1))
            repl = replicated_sharding(mesh)
            put = functools.partial(jax.device_put, device=repl)
            self.params = jax.tree_util.tree_map(put, self.params)
            if self.quant is not None:
                self.quant = jax.tree_util.tree_map(put, self.quant)
            if self.thermal_head_params is not None:
                self.thermal_head_params = jax.tree_util.tree_map(
                    put, self.thermal_head_params)

        self._forward = jax.jit(self._forward_impl, static_argnames=("monocular",))

    def _forward_impl(self, params, quant, head_params, img1, img2,
                      monocular: bool):
        """img*: [B, H, W, 3] enhanced [0,1]. Returns device dict."""
        if self.use_thermal_head:
            img1 = self._thermal_head.apply({"params": head_params}, img1)
            img2 = None if monocular else self._thermal_head.apply(
                {"params": head_params}, img2)
        elif monocular:
            img2 = None
        variables = {"params": params}
        if quant is not None:
            variables["quant"] = quant
        pred1, pred2 = self.model.apply(variables, img1, img2)
        return {
            "pointmap1": pred1["pts3d"],
            "pointmap2": pred2["pts3d_in_other_view"],
            "confidence1": pred1["conf"],
            "confidence2": pred2["conf"],
            "depth": pred1["pts3d"][..., 2],  # Z channel (inference.py:133-134)
        }

    @functools.partial(jax.jit, static_argnums=(0,))
    def _preprocess(self, grays: jnp.ndarray) -> jnp.ndarray:
        """[B, h, w] decoded grayscale (any scale) → enhanced [B, H, W, 3]."""
        resized = resize_bilinear_hw(grays, self.config.img_size)
        return enhance_thermal_contrast(resized)

    def _shard(self, img):
        """Place one image batch onto the mesh, sharded on 'data' (no-op
        without a mesh): everything downstream of a sharded input — the
        jitted preprocess and forward — then compiles SPMD."""
        if self.mesh is None or img is None:
            return jnp.asarray(img) if img is not None else None
        from thermal3d.core.mesh import data_sharding

        img = np.asarray(img)
        if img.shape[0] % self._n_data:
            raise ValueError(
                f"batch size {img.shape[0]} not divisible by the mesh's "
                f"data-parallel size {self._n_data}")
        return jax.device_put(img, data_sharding(self.mesh, img.ndim))

    def infer(self, img1: np.ndarray, img2: Optional[np.ndarray] = None,
              preprocessed: bool = False) -> Dict[str, np.ndarray]:
        """img*: [B, h, w] raw grayscale or [B, H, W, 3] preprocessed."""
        out = self.infer_async(img1, img2, preprocessed)
        return {k: np.asarray(v) for k, v in out.items()}

    def infer_async(self, img1: np.ndarray, img2: Optional[np.ndarray] = None,
                    preprocessed: bool = False) -> Dict[str, jnp.ndarray]:
        """Like infer() but returns DEVICE arrays without blocking on the
        result — jax's async dispatch lets the caller queue the next batch's
        host work (decode) while this one computes (infer_paths pipelining)."""
        img1, img2 = self._shard(img1), self._shard(img2)
        if not preprocessed:
            img1 = self._preprocess(img1)
            img2 = self._preprocess(img2) if img2 is not None else None
        monocular = img2 is None
        return self._forward(self.params, self.quant, self.thermal_head_params,
                             img1, img1 if monocular else img2, monocular)

    def infer_paths(self, paths: List[str], batch_size: int = 36,
                    pad_final: bool = True, outputs: Optional[tuple] = None,
                    prefetch: int = 2) -> Dict[str, np.ndarray]:
        """Directory-batch monocular depth over a list of thermal frames
        (thermal_dustr_inference.py:323-350), fully pipelined: a background
        thread decodes batches i+1..i+prefetch (native C++ loader) while the
        device computes batch i, and batch i's results are fetched only AFTER
        batch i+1 has been dispatched — host decode, device compute, and
        device→host fetch all overlap. Results are bit-identical to the
        serial decode→infer→fetch loop (tests/test_engine.py).

        outputs: optional key subset to fetch, e.g. ("depth",) — the full
        pointmaps+confidences are ~29 MB per 36-frame batch over the host
        link; depth-only cuts the fetch ~7×.

        The returned dict carries a "paths" list of the frames that actually
        decoded, row-aligned with every array — callers must zip against it,
        not the input list, since failed decodes are dropped."""
        from thermal3d.data.pipeline import pipelined_batches
        from thermal3d.preprocess.io import load_thermal_images_batch

        chunks = [paths[i : i + batch_size]
                  for i in range(0, len(paths), batch_size)]

        def decode(chunk):
            return load_thermal_images_batch(
                chunk, normalize=True, out_hw=self.config.img_size)

        outs: List[Dict[str, np.ndarray]] = []
        ok_paths: List[str] = []

        def dispatch(decoded):
            grays, survivors = decoded
            if not grays:
                return None
            real = len(grays)
            ok_paths.extend(survivors)
            if pad_final and real < batch_size:
                grays = list(grays) + [grays[-1]] * (batch_size - real)
            return (self.infer_async(np.stack(grays)), real)

        def fetch(token):
            dev_out, real = token
            sel = dev_out if outputs is None else {
                k: dev_out[k] for k in outputs}
            outs.append({k: np.asarray(v)[:real] for k, v in sel.items()})

        pipelined_batches(chunks, decode, dispatch, fetch, prefetch=prefetch)
        if not outs:
            return {}
        result = {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}
        result["paths"] = ok_paths
        return result
