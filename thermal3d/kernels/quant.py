"""Int8 serving quantization for the transformer-trunk GEMMs.

v5e's MXU runs int8×int8→int32 at 2× the bf16 rate; measured end-to-end on
the production GEMM shapes this is 1.3-1.5× faster than plain bf16 even
including dynamic per-token activation quantization (scripts/gemm_shootout.py,
docs/PERF.md). This module provides:

  * `int8_dense` — the quantized matmul: dynamic per-token (row) activation
    scales, static per-output-channel (column) weight scales, int32
    accumulation, f32 dequant;
  * `quantize_params_int8` — a one-shot serving-time transform of a model
    param tree: 2-D Dense kernels inside the transformer trunk
    (enc_blocks*/dec_blocks*/decoder_embed) become int8 plus a parallel
    'quant' variable collection holding the column scales. Heads, patch
    embed, norms, and biases stay in float (they carry the f32-parity
    surface; the reference computes heads outside autocast too).

The transform is OPT-IN (InferenceEngine(quantize_int8=True) / bench --int8)
and accuracy-gated by tests (tiny-model depth drift bound) plus the parity
harness (BASELINE 1% AbsRel) before it may serve.

No counterpart in the reference (fp32 CUDA throughout); this is TPU-native
serving optimization for its inference path (thermal_dustr_inference.py:63).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from flax import traverse_util


def int8_dense(x: jnp.ndarray, wq: jnp.ndarray, ws: jnp.ndarray,
               out_dtype) -> jnp.ndarray:
    """x: [..., K] float; wq: [K, N] int8; ws: [N] f32 per-column scales.

    Dynamic symmetric per-token activation quantization (absmax/127), int8
    MXU matmul with int32 accumulation, dequant by (token_scale ⊗ ws).
    """
    xf = x.astype(jnp.float32)
    ax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(ax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * (xs * ws)).astype(out_dtype)


def quantize_kernel(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[K, N] float kernel → (int8 kernel, [N] f32 per-column scales)."""
    wf = jnp.asarray(w, jnp.float32)
    ws = jnp.maximum(jnp.max(jnp.abs(wf), axis=0), 1e-8) / 127.0
    wq = jnp.clip(jnp.round(wf / ws), -127, 127).astype(jnp.int8)
    return wq, ws


def _targeted(path: Tuple[str, ...]) -> bool:
    top = path[0]
    return top.startswith(("enc_blocks", "dec_blocks")) or top == "decoder_embed"


def quantize_params_int8(params: Dict) -> Tuple[Dict, Dict]:
    """Returns (params_q, quant_collection).

    params_q mirrors `params` with targeted 2-D 'kernel' leaves replaced by
    int8; quant_collection mirrors the module scopes with 'kernel_scale'
    leaves, to be passed as apply({'params': params_q, 'quant': quant}).
    """
    flat = traverse_util.flatten_dict(params)
    qflat, quant = {}, {}
    for path, leaf in flat.items():
        if (path[-1] == "kernel" and getattr(leaf, "ndim", 0) == 2
                and _targeted(path)):
            wq, ws = quantize_kernel(leaf)
            qflat[path] = wq
            quant[path[:-1] + ("kernel_scale",)] = ws
        else:
            qflat[path] = leaf
    if not quant:
        raise ValueError("no quantizable Dense kernels found in param tree")
    return (traverse_util.unflatten_dict(qflat),
            traverse_util.unflatten_dict(quant))
