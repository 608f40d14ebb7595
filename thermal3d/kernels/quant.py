"""Int8 serving quantization for the transformer-trunk GEMMs.

v5e's MXU runs int8×int8→int32 at 2× the bf16 rate; measured end-to-end on
the production GEMM shapes this is 1.3-1.5× faster than plain bf16 even
including dynamic per-token activation quantization (scripts/gemm_shootout.py,
docs/PERF.md). This module provides:

  * `int8_dense` — the quantized matmul: dynamic per-token (row) activation
    scales, static per-output-channel (column) weight scales, int32
    accumulation, f32 dequant. With GROUPED scales (quantize_kernel
    group_size=G) the contraction axis is split into K/G segments, each with
    its own weight-column and activation-token scales: the matmul becomes a
    batched [.., G, K/G] × [G, K/G, N] int8 contraction (K/G=128 matches the
    MXU tile) dequantized and summed per segment, at the cost of G f32
    partial-sum combines. NOTE the round-3 sweep measured that finer scales
    do NOT reduce end-to-end drift on this model (group128 2.79% vs flat
    2.67% — the drift is accumulated ACTIVATION-quant noise, not weight-
    scale resolution; docs/INT8_SWEEP.md), so grouping stays available for
    weight distributions that need it but is not the drift lever here;
  * `quantize_params_int8` — a one-shot serving-time transform of a model
    param tree: 2-D Dense kernels inside the transformer trunk
    (enc_blocks*/dec_blocks*/decoder_embed) become int8 plus a parallel
    'quant' variable collection holding the scales. Heads, patch
    embed, norms, and biases stay in float (they carry the f32-parity
    surface; the reference computes heads outside autocast too). `skip`
    holds float any extra top-level modules (sensitivity-driven —
    scripts/int8_sensitivity.py finds the layers whose quantization hurts
    most so they can be excluded from serving configs).

The transform is OPT-IN (InferenceEngine(quantize_int8=True) / bench --int8)
and accuracy-gated by tests (tiny-model depth drift bound) plus the parity
harness (BASELINE 1% AbsRel) before it may serve.

No counterpart in the reference (fp32 CUDA throughout); this is TPU-native
serving optimization for its inference path (thermal_dustr_inference.py:63).
"""

from __future__ import annotations

from typing import Collection, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from flax import traverse_util

# named --int8_scope presets → quantize_params_int8(only=...) module-name
# filters, shared by the inference CLI and bench.py (docs/INT8_SWEEP.md
# frontier: all=780 fps/2.67% drift, fc1=666 fps/1.00%)
SCOPE_TO_ONLY = {"all": (), "mlp": ("fc1", "fc2"), "fc1": ("fc1",)}


def pin_attention_for_int8(attention_impl: str) -> str:
    """The ONE place the int8 attention policy lives (engine + bench share
    it): deferred softmax normalization — the bf16 'auto' default — breaks
    the fusion of the post-PV division into the NEXT projection's dynamic
    int8 quantization pass (measured 633 vs 750 fps at batch 32, and
    re-confirmed 745 vs 868 at batch 36 — docs/PERF.md), so int8 serving
    pins the legacy pre-divided form. Explicit impls are respected."""
    return "xla_bf16_scores" if attention_impl == "auto" else attention_impl


def int8_dense(x: jnp.ndarray, wq: jnp.ndarray, ws: jnp.ndarray,
               out_dtype, act_scale: Optional[jnp.ndarray] = None
               ) -> jnp.ndarray:
    """x: [..., K] float; wq: [K, N] int8; ws: per-column scales — [N] f32
    (whole-column) or [G, N] f32 (grouped: column scales per K/G-row segment).

    Dynamic symmetric activation quantization (absmax/127; per token, or per
    token-and-segment when grouped), int8 MXU matmul with int32 accumulation,
    f32 dequant.

    act_scale: optional STATIC per-tensor activation scale (scalar f32,
    calibrated offline from a frame sample — quantize_params_int8
    act_scales): skips the per-token absmax reduction pass entirely; values
    beyond the calibrated range saturate at ±127 (standard static-quant
    behavior). Mutually exclusive with grouped weight scales.
    """
    if ws.ndim == 2:
        if act_scale is not None:
            raise ValueError("static act_scale is not supported with grouped "
                             "weight scales (pick one)")
        return _int8_dense_grouped(x, wq, ws, out_dtype)
    xf = x.astype(jnp.float32)
    if act_scale is not None:
        xs = act_scale.astype(jnp.float32)
    else:
        ax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        xs = jnp.maximum(ax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * (xs * ws)).astype(out_dtype)


def _int8_dense_grouped(x: jnp.ndarray, wq: jnp.ndarray, ws: jnp.ndarray,
                        out_dtype) -> jnp.ndarray:
    """Grouped variant: ws [G, N]; both weights and activations get per-
    segment scales along the contraction axis."""
    g, n = ws.shape
    k = x.shape[-1]
    gk = k // g
    lead = x.shape[:-1]
    xf = x.astype(jnp.float32).reshape(*lead, g, gk)
    ax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)  # [..., G, 1]
    xs = jnp.maximum(ax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    wg = wq.reshape(g, gk, n)
    # [..., G, gk] × [G, gk, N] → [G, ..., N], contraction over gk with G as
    # a batch dim; int32 accumulation on the MXU (gk=128 matches its tile)
    acc = jax.lax.dot_general(
        xq, wg,
        (((xq.ndim - 1,), (1,)), ((xq.ndim - 2,), (0,))),
        preferred_element_type=jnp.int32)  # [G, ..., N]
    scale = jnp.moveaxis(xs, -2, 0) * ws.reshape(g, *([1] * len(lead)), n)
    return jnp.sum(acc.astype(jnp.float32) * scale, axis=0).astype(out_dtype)


def quantize_kernel(w: jnp.ndarray, group_size: Optional[int] = None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[K, N] float kernel → (int8 kernel, f32 scales).

    group_size=None: scales [N] (absmax per column).
    group_size=G rows: scales [K/G, N] (absmax per column per K-segment)."""
    wf = jnp.asarray(w, jnp.float32)
    if group_size is None:
        ws = jnp.maximum(jnp.max(jnp.abs(wf), axis=0), 1e-8) / 127.0
        wq = jnp.clip(jnp.round(wf / ws), -127, 127).astype(jnp.int8)
        return wq, ws
    k, n = wf.shape
    if k % group_size:
        raise ValueError(f"K={k} not divisible by group_size={group_size}")
    g = k // group_size
    wg = wf.reshape(g, group_size, n)
    ws = jnp.maximum(jnp.max(jnp.abs(wg), axis=1), 1e-8) / 127.0  # [G, N]
    wq = jnp.clip(jnp.round(wg / ws[:, None, :]), -127, 127)
    return wq.reshape(k, n).astype(jnp.int8), ws


def _equalize_block(b: Dict, only: Collection[str], alpha: float
                    ) -> Tuple[Dict, int]:
    """Equalize one block subtree (returns a modified copy + pair count).

    Works identically on unrolled ([C]/[C,N]) and scan-stacked ([L,C]/[L,C,N])
    leaves — every op broadcasts over the leading depth axis."""

    def want(name):
        return not only or name in only

    pairs = []
    if "attn" in b and "norm1" in b and want("qkv"):
        pairs.append(("norm1", [("attn", "qkv")]))
    if "cross_attn" in b:
        if "norm2" in b and want("projq"):
            pairs.append(("norm2", [("cross_attn", "projq")]))
        kv = [("cross_attn", n) for n in ("projk", "projv") if want(n)]
        if "norm_y" in b and kv:
            # norm_y feeds BOTH k and v projections: one shared s serves both
            pairs.append(("norm_y", kv))
        if "norm3" in b and "mlp" in b and want("fc1"):
            pairs.append(("norm3", [("mlp", "fc1")]))
    elif "mlp" in b and "norm2" in b and want("fc1"):
        pairs.append(("norm2", [("mlp", "fc1")]))

    b = dict(b)
    n = 0
    for ln_name, targets in pairs:
        ln = b[ln_name]
        g = jnp.asarray(ln["scale"], jnp.float32)
        be = jnp.asarray(ln["bias"], jnp.float32)
        # LN output channel-j magnitude proxy: tokens are ~N(0,1) per channel
        # before the affine, so absmax_j ≈ c·|γ_j| + |β_j| with c uniform in j
        a = jnp.abs(g) + jnp.abs(be) + 1e-6
        w = None
        for mod, ker_name in targets:
            kmax = jnp.max(jnp.abs(jnp.asarray(b[mod][ker_name]["kernel"],
                                               jnp.float32)), axis=-1)
            w = kmax if w is None else jnp.maximum(w, kmax)
        s = (a ** alpha) / (w + 1e-6) ** (1.0 - alpha)
        s = jnp.clip(s, 1e-2, 1e2)  # keep the reparameterization well-scaled
        b[ln_name] = {**ln, "scale": (g / s).astype(ln["scale"].dtype),
                      "bias": (be / s).astype(ln["bias"].dtype)}
        for mod, ker_name in targets:
            ker = b[mod][ker_name]["kernel"]
            # folded kernels stay f32: quantize_params_int8 consumes them
            # from float, and casting back to a bf16 storage dtype would add
            # ~2^-8 relative rounding on every folded leaf before int8
            # quantization — partially eating the fold's benefit
            newk = jnp.asarray(ker, jnp.float32) * s[..., :, None]
            b[mod] = {**b[mod],
                      ker_name: {**b[mod][ker_name], "kernel": newk}}
            n += 1
    return b, n


def equalize_ln_gemm(params: Dict, only: Collection[str] = (),
                     skip: Collection[str] = (), alpha: float = 0.5) -> Dict:
    """SmoothQuant-style LN→GEMM equalization (exact reparameterization,
    zero runtime cost) for the int8 activation-quant noise.

    For every LN→GEMM pair in the trunk (enc: norm1→qkv, norm2→fc1; dec:
    norm1→qkv, norm2→projq, norm_y→projk+projv, norm3→fc1) fold a
    per-input-channel scale s into the LayerNorm affine (γ/s, β/s) and the
    GEMM kernel rows (s·W): LN'(x) @ W' == LN(x) @ W exactly, while the
    per-token activation absmax — the int8 dynamic-quant scale — shrinks by
    however much the outlier channels are damped. s_j = a_j^α / w_j^(1-α)
    (SmoothQuant, α=0.5), with a_j = |γ_j|+|β_j| as the LN output magnitude
    proxy and w_j the kernel row absmax. fc2/proj have no preceding affine
    and cannot be equalized. `only`/`skip` use quantize_params_int8
    semantics so exactly the quantized GEMMs get folded."""
    out = dict(params)
    total = 0
    for top, sub in params.items():
        if top in skip:
            continue
        if top.startswith(("enc_blocks", "dec_blocks", "dec_dual")):
            # dec_dual_* leaves are branch-stacked [2,...]; _equalize_block
            # broadcasts over any leading axis (same as the scan layout)
            out[top], n = _equalize_block(sub, only, alpha)
            total += n
        elif top == "enc_scan":
            blk, n = _equalize_block(sub["blk"], only, alpha)
            out[top] = {**sub, "blk": blk}
            total += n
        elif top == "dec_scan":
            new = dict(sub)
            for k in ("blk1", "blk2"):
                new[k], n = _equalize_block(sub[k], only, alpha)
                total += n
            out[top] = new
    if not total:
        raise ValueError("no equalizable LN→GEMM pairs found "
                         "(only fc1/qkv/projq/projk/projv have a preceding "
                         "LayerNorm affine)")
    return out


def _targeted(path: Tuple[str, ...], skip: Collection[str],
              only: Collection[str]) -> bool:
    top = path[0]
    if top in skip:
        return False
    if only and path[-2] not in only:
        return False
    return (top.startswith(("enc_blocks", "dec_blocks", "dec_dual"))
            or top in ("decoder_embed", "enc_scan", "dec_scan"))


def quantize_params_int8(params: Dict, group_size: Optional[int] = None,
                         skip: Collection[str] = (),
                         only: Collection[str] = (),
                         act_scales: Optional[Dict] = None
                         ) -> Tuple[Dict, Dict]:
    """Returns (params_q, quant_collection).

    act_scales: optional calibration tree (the 'calib' collection returned
    by a float forward with mutable=['calib'] — QuantDense sows its input
    absmax there): for every quantized kernel whose module has a calibrated
    `act_absmax`, a static `act_scale = absmax/127` is added to the quant
    collection and int8_dense skips the per-token dynamic absmax pass.
    Requires group_size=None.

    params_q mirrors `params` with targeted 2-D 'kernel' leaves replaced by
    int8; quant_collection mirrors the module scopes with 'kernel_scale'
    leaves, to be passed as apply({'params': params_q, 'quant': quant}).

    group_size: rows per weight-scale segment (None = whole-column scales;
    128 matches the MXU tile and cuts drift — PARITY.md).
    skip: top-level module names (e.g. 'enc_blocks_0', 'decoder_embed') to
    leave in float.
    only: restrict quantization to Dense modules with these names (e.g.
    ('fc1','fc2') = MLP GEMMs only — 2/3 of each block's FLOPs). Empty =
    all trunk GEMMs. int8 drift is accumulated activation-quant noise spread
    evenly over the ~100 trunk GEMMs (docs/INT8_SWEEP.md: grouping scales
    and skipping single layers barely move it), so the accuracy/speed
    frontier is the FRACTION of GEMMs quantized, which `only` controls.
    """
    flat = traverse_util.flatten_dict(params)
    calib_flat = {}
    if act_scales is not None:
        if group_size is not None:
            raise ValueError("act_scales (static activation quantization) "
                             "requires group_size=None")
        calib_flat = traverse_util.flatten_dict(act_scales)
    qflat, quant = {}, {}
    for path, leaf in flat.items():
        ndim = getattr(leaf, "ndim", 0)
        # scan-layout trunks (enc_scan/dec_scan, models/scan_params.py) stack
        # each block's [K,N] kernel on a leading depth axis → [L,K,N]; the
        # scales quantize per layer and stay stacked so nn.scan's
        # variable_axes={"quant": 0} slices them alongside the params
        # dec_dual_* (branch-batched decoder, models/scan_params.py::
        # to_branch_params) stacks the two branches' kernels the same way —
        # [2,K,N] with nn.vmap's variable_axes={"quant": 0} slicing scales
        stacked = ndim == 3 and (path[0] in ("enc_scan", "dec_scan")
                                 or path[0].startswith("dec_dual"))
        if (path[-1] == "kernel" and (ndim == 2 or stacked)
                and _targeted(path, skip, only)):
            # whole-column fallback for kernels whose K the group doesn't
            # divide (production Ks 768/1024/3072/4096 all divide 128)
            k_dim = leaf.shape[1] if stacked else leaf.shape[0]
            gs = group_size if group_size and k_dim % group_size == 0 \
                else None
            if stacked:
                wq, ws = jax.vmap(lambda w: quantize_kernel(w, gs))(leaf)
            else:
                wq, ws = quantize_kernel(leaf, gs)
            qflat[path] = wq
            quant[path[:-1] + ("kernel_scale",)] = ws
            # calib tree path: module scope + 'act_absmax' (QuantDense.sow);
            # stacked layouts carry per-layer absmax → per-layer act_scale
            cpath = path[:-1] + ("act_absmax",)
            if cpath in calib_flat:
                absmax = jnp.asarray(calib_flat[cpath], jnp.float32)
                quant[path[:-1] + ("act_scale",)] = (
                    jnp.maximum(absmax, 1e-8) / 127.0)
        else:
            qflat[path] = leaf
    if not quant:
        raise ValueError("no quantizable Dense kernels found in param tree")
    return (traverse_util.unflatten_dict(qflat),
            traverse_util.unflatten_dict(quant))
