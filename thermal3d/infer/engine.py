"""Batched jit inference engine — the north-star benchmark path
(SURVEY.md §3.2: preprocess → forward → depth extraction at 224²).

Re-designs thermal_dustr_inference.py:63-159 TPU-first: the reference runs one
frame at a time through host-side numpy preprocessing and an unfused torch
forward; here decode stays on host while normalize→resize→percentile-enhance→
(optional learnable thermal head)→model→depth-extract is ONE jitted program
over a batch, bf16 on the MXU with f32 heads, Pallas fused attention.
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
    ):
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
            params, self.quant = quantize_params_int8(
                params, group_size=int8_group_size, skip=int8_skip,
                only=int8_only)
        self.params = params
        self.use_thermal_head = use_thermal_head
        self._thermal_head = ThermalPreprocessHead()
        if use_thermal_head and thermal_head_params is None:
            dummy = jnp.zeros((1, h, w, 3), jnp.float32)
            thermal_head_params = self._thermal_head.init(jax.random.key(0), dummy)["params"]
        self.thermal_head_params = thermal_head_params

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

    def infer(self, img1: np.ndarray, img2: Optional[np.ndarray] = None,
              preprocessed: bool = False) -> Dict[str, np.ndarray]:
        """img*: [B, h, w] raw grayscale or [B, H, W, 3] preprocessed."""
        if not preprocessed:
            img1 = self._preprocess(jnp.asarray(img1))
            img2 = self._preprocess(jnp.asarray(img2)) if img2 is not None else None
        monocular = img2 is None
        out = self._forward(self.params, self.quant, self.thermal_head_params,
                            img1, img1 if monocular else img2, monocular)
        return {k: np.asarray(v) for k, v in out.items()}

    def infer_paths(self, paths: List[str], batch_size: int = 36,
                    pad_final: bool = True) -> Dict[str, np.ndarray]:
        """Directory-batch monocular depth over a list of thermal frames
        (thermal_dustr_inference.py:323-350), batched + device-pipelined.

        The returned dict carries a "paths" list of the frames that actually
        decoded, row-aligned with every array — callers must zip against it,
        not the input list, since failed decodes are dropped."""
        from thermal3d.preprocess.io import load_thermal_images_batch

        outs: List[Dict[str, np.ndarray]] = []
        ok_paths: List[str] = []
        n = len(paths)
        for i in range(0, n, batch_size):
            chunk = paths[i : i + batch_size]
            grays, survivors = load_thermal_images_batch(
                chunk, normalize=True, out_hw=self.config.img_size)
            if not grays:
                continue
            real = len(grays)
            ok_paths.extend(survivors)
            if pad_final and real < batch_size:
                grays = list(grays) + [grays[-1]] * (batch_size - real)
            stack = np.stack(grays)
            out = self.infer(stack)
            outs.append({k: v[:real] for k, v in out.items()})
        if not outs:
            return {}
        result = {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}
        result["paths"] = ok_paths
        return result
