"""Fused attention Pallas kernels for TPU.

DUSt3R attention runs at short sequence lengths (196 tokens @224², 1024
@512²). The kernels here keep the full K/V for a (batch, head-group) in
VMEM so scores never round-trip to HBM, compute the softmax in one shot (no
online rescaling needed at S ≤ ~2k), and run both matmuls on the MXU with
f32 accumulation. The flagship variants are `fused_rope_attention` /
`fused_rope_cross_attention`: they consume the RAW qkv / projq/k/v
projection outputs ([B,S,3C] / [B,S,C]) and apply croco 2-D RoPE in VMEM
from precomputed tables — no head-split reshape, no RoPE HBM pass, no score
traffic. Head-group (`group`) and batch-block (`batch_block`) tiling
amortize per-program launch overhead.

Dispatch policy (measured on v5e, scripts/fused_attn_shootout.py +
docs/PERF.md): 'auto' routes through the fused kernels on TPU at
S ≥ FUSED_MIN_SEQ=512, where they win 1.2-2.7× over XLA+rope (MASt3R-512
paths); below that XLA's one-big-einsum attention with bf16 score
materialization wins and 'auto' keeps it (DUSt3R-224 paths). All ops are
differentiable via custom VJPs that recompute attention with standard jnp
formulas (cheap at these sizes, saves HBM for residuals).

Replaces the torch SDPA the reference inherits from the external dust3r repo
(SURVEY.md §2.2, §5 "long-context": flash attention is the per-chip
throughput lever here, not a cross-chip one).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from thermal3d.core.platform import default_compute_platform as _auto_platform

try:  # pltpu is importable on CPU too; kernels only compile on TPU
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _seq_pad(s: int) -> int:
    """Sequence padding for the fused kernels' SUBLANE dimension: align to
    the bf16 sublane tile (16) instead of a full lane tile (128). At S=196
    this is 208 rows instead of 256 — ~19% less M-dim matmul work and ~19%
    fewer score-exp register tiles, at identical numerics (the lane dim of
    the in-VMEM score matrix rounds to 128-multiples either way, and Pallas
    masks the block-edge overrun). S=1024 is unchanged (already aligned)."""
    return _round_up(s, 16)


# Below this sequence length XLA's one-big-einsum attention wins (S=196:
# fused kernel 1.3-2.4x slower — grid overhead + 196→256 pad waste dominate);
# at and above it the fused RoPE+attention kernel wins 1.2-2.7x (S=1024
# measured on v5e, scripts/fused_attn_shootout.py / docs/PERF.md).
FUSED_MIN_SEQ = 512


def fused_auto_group(num_heads: int, head_dim: int, cross: bool) -> int:
    """Head-group size for the fused kernel's 'auto' dispatch, from the v5e
    shootout at production shapes (docs/PERF.md): encoder (16 heads) self g4
    / cross g8; decoder (12 heads) self g2 / cross g2. Returns 0 when no
    group yields a lane-aligned (group*head_dim % 128) block."""
    if cross:
        prefs = (8, 4, 2) if num_heads % 8 == 0 else (2, 4)
    else:
        prefs = (2, 4) if num_heads == 12 else (4, 2, 8)
    for g in prefs:
        if num_heads % g == 0 and (g * head_dim) % 128 == 0:
            return g
    return 0


def use_fused_attention(seq_len: int, num_heads: int, head_dim: int,
                        cross: bool = False) -> bool:
    """True when 'auto' should route RoPE+attention through the fused Pallas
    kernel: TPU, long-enough sequence, and a lane-aligned head group."""
    return (_auto_platform() == "tpu" and seq_len >= FUSED_MIN_SEQ
            and fused_auto_group(num_heads, head_dim, cross) > 0)


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, valid_len: int, scale: float):
    # Keep matmul INPUTS in the stored dtype (bf16 in production) with f32
    # accumulation — f32-input MXU matmuls run at a fraction of the bf16 rate
    # and dominated the kernel before (docs/PERF.md). Softmax stays f32.
    q = q_ref[0]  # [BLK_Q, D]
    k = k_ref[0]  # [S_pad, D]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BLK_Q, S_pad] f32
    s_pad = scores.shape[-1]
    if valid_len < s_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=1)
        scores = jnp.where(col < valid_len, scores, -1e30)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / denom
    o_ref[0] = o.astype(o_ref.dtype)


def _flash_attention_fwd_pallas(q, k, v, *, scale: float, interpret: bool = False):
    """q: [BH, Sq, D], k/v: [BH, Sk, D] -> [BH, Sq, D]."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    sq_pad = _round_up(sq, 128)
    sk_pad = _round_up(sk, 128)
    d_pad = _round_up(d, 128)
    qp = jnp.pad(q, ((0, 0), (0, sq_pad - sq), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, sk_pad - sk), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, sk_pad - sk), (0, d_pad - d)))

    blk_q = min(sq_pad, 256)
    grid = (bh, sq_pad // blk_q)
    kernel = functools.partial(_attention_kernel, valid_len=sk, scale=scale)

    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel"),
        )
    mem_space = pltpu.VMEM if _HAS_PLTPU else None

    def bspec(shape, index_map):
        if mem_space is not None:
            return pl.BlockSpec(shape, index_map, memory_space=mem_space)
        return pl.BlockSpec(shape, index_map)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, sq_pad, d_pad), q.dtype),
        grid=grid,
        in_specs=[
            bspec((1, blk_q, d_pad), lambda b, i: (b, i, 0)),
            bspec((1, sk_pad, d_pad), lambda b, i: (b, 0, 0)),
            bspec((1, sk_pad, d_pad), lambda b, i: (b, 0, 0)),
        ],
        out_specs=bspec((1, blk_q, d_pad), lambda b, i: (b, i, 0)),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq_pad * sk_pad * d_pad,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=bh * sq_pad * sk_pad,
        ),
        interpret=interpret,
        **kwargs,
    )(qp, kp, vp)
    return out[:, :sq, :d]


def _multihead_kernel(q_ref, k_ref, v_ref, o_ref, *, valid_len: int, scale: float,
                      num_heads: int):
    """One grid program per batch element; all heads computed in-program
    (unrolled) so the scores never leave VMEM and launches are amortized —
    built for DUSt3R's short sequences (196/1024 tokens)."""
    for h in range(num_heads):
        q = q_ref[0, h]  # [S_pad, D_pad], stored dtype (bf16 in prod)
        k = k_ref[0, h]
        v = v_ref[0, h]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s_pad = scores.shape[-1]
        if valid_len < s_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=1)
            scores = jnp.where(col < valid_len, scores, -1e30)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / denom
        o_ref[0, h] = o.astype(o_ref.dtype)


def _flash_attention_fwd_multihead(q, k, v, *, scale: float, interpret: bool = False):
    """q/k/v: [B, H, S, D] → [B, H, S, D]; whole-sequence, per-batch grid."""
    b, nh, sq, d = q.shape
    sk = k.shape[2]
    sq_pad = _round_up(sq, 128)
    sk_pad = _round_up(sk, 128)
    d_pad = _round_up(d, 128)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, sk_pad - sk), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, sk_pad - sk), (0, d_pad - d)))
    kernel = functools.partial(_multihead_kernel, valid_len=sk, scale=scale,
                               num_heads=nh)
    mem_space = pltpu.VMEM if _HAS_PLTPU else None

    def bspec(shape):
        if mem_space is not None:
            return pl.BlockSpec(shape, lambda i: (i, 0, 0, 0), memory_space=mem_space)
        return pl.BlockSpec(shape, lambda i: (i, 0, 0, 0))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, nh, sq_pad, d_pad), q.dtype),
        grid=(b,),
        in_specs=[bspec((1, nh, sq_pad, d_pad)),
                  bspec((1, nh, sk_pad, d_pad)),
                  bspec((1, nh, sk_pad, d_pad))],
        out_specs=bspec((1, nh, sq_pad, d_pad)),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nh * sq_pad * sk_pad * d_pad,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * nh * sq_pad * sk_pad,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :, :sq, :d]


def _grouped_kernel(q_ref, k_ref, v_ref, o_ref, *, valid_len: int, scale: float,
                    group: int):
    """One grid program per (batch, head-group): `group` heads computed
    sequentially with scores resident in VMEM. Unlike the q-blocked kernel,
    inputs are NOT pre-padded in HBM (the round-1 kernel's jnp.pad of D
    64→128 and S→256 cost three full HBM copies + 2× reads — docs/PERF.md);
    the block shape simply overruns the array and Pallas masks the edges."""
    for i in range(group):
        q = q_ref[0, i]  # [S_pad, D] stored dtype (bf16 in prod)
        k = k_ref[0, i]
        v = v_ref[0, i]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [S_pad, S_pad] f32
        s_pad = scores.shape[-1]
        if valid_len < s_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=1)
            scores = jnp.where(col < valid_len, scores, -1e30)
            # the block overruns the array: OOB v rows hold garbage (NaN in
            # interpret mode) and 0·NaN = NaN in the PV matmul — zero them
            row = jax.lax.broadcasted_iota(jnp.int32, v.shape, dimension=0)
            v = jnp.where(row < valid_len, v, jnp.zeros_like(v))
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / denom
        o_ref[0, i] = o.astype(o_ref.dtype)


def _flash_attention_fwd_grouped(q, k, v, *, scale: float, group: int = 4,
                                 interpret: bool = False):
    """q/k/v: [B, H, S, D] → [B, H, S, D]; grid (B, H/group), no HBM padding."""
    b, nh, sq, d = q.shape
    sk = k.shape[2]
    g = min(group, nh)
    while nh % g:
        g -= 1
    sq_pad = _round_up(sq, 128)
    sk_pad = _round_up(sk, 128)
    kernel = functools.partial(_grouped_kernel, valid_len=sk, scale=scale, group=g)
    mem_space = pltpu.VMEM if _HAS_PLTPU else None

    def bspec(s_pad):
        shape = (1, g, s_pad, d)
        index = lambda i, j: (i, j, 0, 0)  # noqa: E731
        if mem_space is not None:
            return pl.BlockSpec(shape, index, memory_space=mem_space)
        return pl.BlockSpec(shape, index)

    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel"))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, nh, sq, d), q.dtype),
        grid=(b, nh // g),
        in_specs=[bspec(sq_pad), bspec(sk_pad), bspec(sk_pad)],
        out_specs=bspec(sq_pad),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nh * sq_pad * sk_pad * d,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=b * nh * sq_pad * sk_pad,
        ),
        interpret=interpret,
        **kwargs,
    )(q, k, v)


def _rot_lanes(t, d: int):
    """RoPE rotation companion: [-t[d4:2d4], t[:d4], -t[3d4:], t[2d4:3d4]]
    over the last (lane) axis; matches rope.rope_tables' layout."""
    d4 = d // 4
    return jnp.concatenate(
        [-t[:, d4:2 * d4], t[:, :d4], -t[:, 3 * d4:d], t[:, 2 * d4:3 * d4]],
        axis=1)


def _fused_rope_kernel(q_ref, k_ref, v_ref, cos_ref, sin_ref, o_ref, *,
                       valid_len: int, scale: float, group: int, head_dim: int,
                       batch_block: int = 1, rope_f32: bool = True):
    """Self-attention over `group` heads × `batch_block` batch items with
    RoPE applied in VMEM.

    q/k/v refs are lane-blocks of the SAME [B, S, 3C] qkv projection output
    (three views with region-offset index maps — no reshape/transpose/copy of
    the projection output ever materializes in HBM). batch_block > 1 gives
    each grid program more sequential work, amortizing per-program launch
    overhead — the dominant cost at S=196 where the matmuls are tiny."""
    cos = cos_ref[...]  # [S_pad, D] f32
    sin = sin_ref[...]
    if not rope_f32:
        # apply RoPE in the stored dtype (bf16 in production): the extra
        # rounding lands on values that feed a bf16 MXU matmul anyway —
        # opt-in, shootout-measured (scripts/fused_attn_shootout.py)
        cos = cos.astype(q_ref.dtype)
        sin = sin.astype(q_ref.dtype)
    for b in range(batch_block):
        for i in range(group):
            sl = slice(i * head_dim, (i + 1) * head_dim)
            q = q_ref[b][:, sl]
            k = k_ref[b][:, sl]
            v = v_ref[b][:, sl]
            if rope_f32:
                q = q.astype(jnp.float32)
                k = k.astype(jnp.float32)
            q = q * cos + _rot_lanes(q, head_dim) * sin
            k = k * cos + _rot_lanes(k, head_dim) * sin
            scores = jax.lax.dot_general(
                q.astype(v.dtype), k.astype(v.dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s_pad = scores.shape[-1]
            if valid_len < s_pad:
                col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
                scores = jnp.where(col < valid_len, scores, -1e30)
                row = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
                v = jnp.where(row < valid_len, v, jnp.zeros_like(v))
            m = jnp.max(scores, axis=-1, keepdims=True)
            p = jnp.exp(scores - m)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) / denom
            o_ref[b, :, sl] = o.astype(o_ref.dtype)


def _fused_rope_attention_fwd(qkv, cos, sin, *, num_heads: int, scale: float,
                              group: int, interpret: bool,
                              batch_block: int = 1, rope_f32: bool = True):
    """qkv: [B, S, 3C] (packed projection output) → [B, S, C] attention out."""
    b, s, three_c = qkv.shape
    c = three_c // 3
    d = c // num_heads
    g = min(group, num_heads)
    while num_heads % g:
        g -= 1
    bb = min(batch_block, b)
    while b % bb:
        bb -= 1
    s_pad = _seq_pad(s)
    hb = num_heads // g  # lane-blocks per q/k/v region
    kernel = functools.partial(_fused_rope_kernel, valid_len=s, scale=scale,
                               group=g, head_dim=d, batch_block=bb,
                               rope_f32=rope_f32)
    mem_space = pltpu.VMEM if _HAS_PLTPU else None

    def bspec(shape, index):
        if mem_space is not None:
            return pl.BlockSpec(shape, index, memory_space=mem_space)
        return pl.BlockSpec(shape, index)

    blk = (bb, s_pad, g * d)
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        # both grid dims are independent programs — declaring them parallel
        # lets Mosaic schedule/pipeline block prefetch across them freely
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel"))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, s, c), qkv.dtype),
        grid=(b // bb, hb),
        in_specs=[
            bspec(blk, lambda i, j: (i, 0, j)),            # q region
            bspec(blk, lambda i, j: (i, 0, hb + j)),       # k region
            bspec(blk, lambda i, j: (i, 0, 2 * hb + j)),   # v region
            bspec((s_pad, d), lambda i, j: (0, 0)),        # cos
            bspec((s_pad, d), lambda i, j: (0, 0)),        # sin
        ],
        out_specs=bspec(blk, lambda i, j: (i, 0, j)),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * s_pad * s_pad * d,
            bytes_accessed=qkv.size * qkv.dtype.itemsize
            + b * s * c * qkv.dtype.itemsize,
            transcendentals=b * num_heads * s_pad * s_pad,
        ),
        interpret=interpret,
        **kwargs,
    )(qkv, qkv, qkv, cos, sin)


def _fused_rope_xattn_fwd(q, k, v, cos, sin, *, num_heads: int, scale: float,
                          group: int, interpret: bool, batch_block: int = 1,
                          rope_f32: bool = True):
    """Cross-attention variant: q/k/v are SEPARATE [B, S, C] projection
    outputs (croco projq/projk/projv); same in-VMEM RoPE + attention kernel,
    region offsets all zero. Requires Sq == Sk (true for DUSt3R's dual
    decoder: both views share the patch grid)."""
    b, s, c = q.shape
    assert k.shape == v.shape == q.shape, "cross-attn kernel needs Sq == Sk"
    d = c // num_heads
    g = min(group, num_heads)
    while num_heads % g:
        g -= 1
    bb = min(batch_block, b)
    while b % bb:
        bb -= 1
    s_pad = _seq_pad(s)
    hb = num_heads // g
    kernel = functools.partial(_fused_rope_kernel, valid_len=s, scale=scale,
                               group=g, head_dim=d, batch_block=bb,
                               rope_f32=rope_f32)
    mem_space = pltpu.VMEM if _HAS_PLTPU else None

    def bspec(shape, index):
        if mem_space is not None:
            return pl.BlockSpec(shape, index, memory_space=mem_space)
        return pl.BlockSpec(shape, index)

    blk = (bb, s_pad, g * d)
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel"))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, s, c), q.dtype),
        grid=(b // bb, hb),
        in_specs=[
            bspec(blk, lambda i, j: (i, 0, j)),
            bspec(blk, lambda i, j: (i, 0, j)),
            bspec(blk, lambda i, j: (i, 0, j)),
            bspec((s_pad, d), lambda i, j: (0, 0)),
            bspec((s_pad, d), lambda i, j: (0, 0)),
        ],
        out_specs=bspec(blk, lambda i, j: (i, 0, j)),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * s_pad * s_pad * d,
            bytes_accessed=4 * q.size * q.dtype.itemsize,
            transcendentals=b * num_heads * s_pad * s_pad,
        ),
        interpret=interpret,
        **kwargs,
    )(q, k, v, cos, sin)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def fused_rope_cross_attention(q, k, v, cos, sin, num_heads, scale, group=4,
                               interpret=False, batch_block=1):
    """Fused RoPE + cross-attention on separate [B, S, C] q/k/v projection
    outputs; returns [B, S, C]."""
    return _fused_rope_xattn_fwd(q, k, v, cos, sin, num_heads=num_heads,
                                 scale=scale, group=group, interpret=interpret,
                                 batch_block=batch_block)


def _xattn_fwd(q, k, v, cos, sin, num_heads, scale, group, interpret,
               batch_block):
    return (fused_rope_cross_attention(q, k, v, cos, sin, num_heads, scale,
                                       group, interpret, batch_block),
            (q, k, v, cos, sin))


def _xattn_bwd(num_heads, scale, group, interpret, batch_block, res, g_out):
    q, k, v, cos, sin = res
    b, s, c = q.shape
    d = c // num_heads
    dq, dk, dv = _rope_attn_bwd_core(
        q.reshape(b, s, num_heads, d), k.reshape(b, s, num_heads, d),
        v.reshape(b, s, num_heads, d), g_out.reshape(b, s, num_heads, d),
        cos, sin, scale)
    return (dq.reshape(b, s, c).astype(q.dtype),
            dk.reshape(b, s, c).astype(k.dtype),
            dv.reshape(b, s, c).astype(v.dtype),
            jnp.zeros_like(cos), jnp.zeros_like(sin))


fused_rope_cross_attention.defvjp(_xattn_fwd, _xattn_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_rope_attention(qkv, cos, sin, num_heads, scale, group=4,
                         interpret=False, batch_block=1):
    """Fused RoPE + self-attention on the packed [B, S, 3C] qkv projection
    output; returns [B, S, C]. RoPE tables from rope.rope_tables."""
    return _fused_rope_attention_fwd(qkv, cos, sin, num_heads=num_heads,
                                     scale=scale, group=group,
                                     interpret=interpret,
                                     batch_block=batch_block)


def _fused_fwd(qkv, cos, sin, num_heads, scale, group, interpret, batch_block):
    return (fused_rope_attention(qkv, cos, sin, num_heads, scale, group,
                                 interpret, batch_block), (qkv, cos, sin))


def _rope_attn_bwd_core(q, k, v, g_out, cos, sin, scale):
    """Closed-form RoPE+attention VJP shared by the packed and cross-attn
    fused kernels: recompute roped q/k, standard attention VJP, then the
    rope transpose (R^T = -R). Inputs/grad are [B, S, H, D]; returns
    (dq, dk, dv) in [B, S, H, D] f32.

    Memory: the [B,H,S,S] score/probability intermediates are STORED in the
    input dtype (bf16 in bf16 networks — halves backward HBM at the
    MASt3R-512 training shapes, where each f32 S² tensor is 100s of MB per
    block) while every einsum accumulates in f32 and the softmax statistics
    stay f32. f32 inputs keep full-f32 intermediates, so the autodiff-parity
    tests see the exact closed form.
    """
    b, s, num_heads, d = q.shape
    sdtype = q.dtype if q.dtype == jnp.bfloat16 else jnp.float32
    qf, kf, vf, gf = (t.astype(jnp.float32) for t in (q, k, v, g_out))
    cb = cos[None, :, None, :]
    sb = sin[None, :, None, :]

    def rot(t):
        d4 = d // 4
        return jnp.concatenate(
            [-t[..., d4:2 * d4], t[..., :d4],
             -t[..., 3 * d4:], t[..., 2 * d4:3 * d4]], axis=-1)

    qr = qf * cb + rot(qf) * sb
    kr = kf * cb + rot(kf) * sb
    scores = jnp.einsum("bqhd,bkhd->bhqk", qr.astype(sdtype), kr.astype(sdtype),
                        preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(scores, axis=-1).astype(sdtype)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, gf.astype(sdtype),
                    preferred_element_type=jnp.float32)
    dp = jnp.einsum("bqhd,bkhd->bhqk", gf.astype(sdtype), vf.astype(sdtype),
                    preferred_element_type=jnp.float32).astype(sdtype)
    # rowsum(dp ∘ p) in f32 without materializing the f32 product
    rowcorr = jnp.einsum("bhqk,bhqk->bhq", dp, p,
                         preferred_element_type=jnp.float32)
    ds = (p.astype(jnp.float32)
          * (dp.astype(jnp.float32) - rowcorr[..., None])).astype(sdtype)
    dqr = jnp.einsum("bhqk,bkhd->bqhd", ds, kr.astype(sdtype),
                     preferred_element_type=jnp.float32) * scale
    dkr = jnp.einsum("bhqk,bqhd->bkhd", ds, qr.astype(sdtype),
                     preferred_element_type=jnp.float32) * scale
    # qr = q*cos + R(q)*sin  ⇒  dq = dqr*cos + Rᵀ(dqr*sin),  Rᵀ = -R
    dq = dqr * cb - rot(dqr * sb)
    dk = dkr * cb - rot(dkr * sb)
    return dq, dk, dv


def _fused_bwd(num_heads, scale, group, interpret, batch_block, res, g_out):
    qkv, cos, sin = res
    b, s, three_c = qkv.shape
    c = three_c // 3
    d = c // num_heads
    dq, dk, dv = _rope_attn_bwd_core(
        qkv[:, :, :c].reshape(b, s, num_heads, d),
        qkv[:, :, c:2 * c].reshape(b, s, num_heads, d),
        qkv[:, :, 2 * c:].reshape(b, s, num_heads, d),
        g_out.reshape(b, s, num_heads, d), cos, sin, scale)
    dqkv = jnp.concatenate(
        [dq.reshape(b, s, c), dk.reshape(b, s, c), dv.reshape(b, s, c)],
        axis=-1).astype(qkv.dtype)
    return dqkv, jnp.zeros_like(cos), jnp.zeros_like(sin)


fused_rope_attention.defvjp(_fused_fwd, _fused_bwd)


def _attention_reference(q, k, v, scale):
    scores = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v.astype(jnp.float32)).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_attention_core(q, k, v, scale, interpret):
    return _flash_attention_fwd_pallas(q, k, v, scale=scale, interpret=interpret)


def _core_fwd(q, k, v, scale, interpret):
    return _flash_attention_core(q, k, v, scale, interpret), (q, k, v)


def _core_bwd(scale, interpret, res, g):
    q, k, v = res
    # Recompute attention in f32 and differentiate the closed form.
    qf, kf, vf, gf = (t.astype(jnp.float32) for t in (q, k, v, g))
    scores = jnp.einsum("bqd,bkd->bqk", qf, kf) * scale
    p = jax.nn.softmax(scores, axis=-1)
    dv = jnp.einsum("bqk,bqd->bkd", p, gf)
    dp = jnp.einsum("bqd,bkd->bqk", gf, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bqk,bkd->bqd", ds, kf) * scale
    dk = jnp.einsum("bqk,bqd->bkd", ds, qf) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_flash_attention_core.defvjp(_core_fwd, _core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _grouped_core(q, k, v, scale, group, interpret):
    return _flash_attention_fwd_grouped(q, k, v, scale=scale, group=group,
                                        interpret=interpret)


def _grouped_fwd(q, k, v, scale, group, interpret):
    return _grouped_core(q, k, v, scale, group, interpret), (q, k, v)


def _grouped_bwd(scale, group, interpret, res, g):
    q, k, v = res  # [B, H, S, D]
    b, h = q.shape[:2]

    def flat(t):
        return t.reshape(b * h, *t.shape[2:])

    dq, dk, dv = _core_bwd(scale, interpret, (flat(q), flat(k), flat(v)), flat(g))
    return (dq.reshape(q.shape), dk.reshape(k.shape), dv.reshape(v.shape))


_grouped_core.defvjp(_grouped_fwd, _grouped_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _multihead_core(q, k, v, scale, interpret):
    return _flash_attention_fwd_multihead(q, k, v, scale=scale, interpret=interpret)


def _mh_fwd(q, k, v, scale, interpret):
    return _multihead_core(q, k, v, scale, interpret), (q, k, v)


def _mh_bwd(scale, interpret, res, g):
    q, k, v = res  # [B, H, S, D]
    b, h = q.shape[:2]

    def flat(t):
        return t.reshape(b * h, *t.shape[2:])

    dq, dk, dv = _core_bwd(scale, interpret, (flat(q), flat(k), flat(v)), flat(g))
    return (dq.reshape(q.shape), dk.reshape(k.shape), dv.reshape(v.shape))


_multihead_core.defvjp(_mh_fwd, _mh_bwd)


def attention_bshd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float | None = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Attention in the transpose-free [B, S, H, D] layout (the natural
    layout coming out of the qkv projection — avoids the head-split
    transposes that showed up as pure layout-copy time in profiles).

    XLA path: einsum bqhd,bkhd->bhqk with f32 accumulation, f32 softmax,
    probabilities cast back to the value dtype for the PV matmul (bf16 MXU).
    Pallas path (long sequences): transposes to [B,H,S,D] around the kernel.
    """
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if impl.startswith("pallas_fused"):
        # the fused RoPE+attention kernel only exists for packed self-attn
        # qkv; cross-attention (separate q/k/v projections) falls back to
        # the standard dispatch
        impl = "auto"
    if impl == "auto":
        long_seq = sk >= 2048
        impl = "pallas" if (_auto_platform() == "tpu" and long_seq) else "xla"
    if impl.startswith("pallas"):
        out = flash_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
            scale=scale, impl=impl,
        )
        return out.transpose(0, 2, 1, 3)
    if impl == "xla_bqhk":
        # layout experiment: keep the head axis inboard of the sequence axes
        # end-to-end (scores [B,Q,H,K]) so operands stay in the projection's
        # natural [B,S,H,D] layout
        scores = jnp.einsum("bqhd,bkhd->bqhk", q, k,
                            preferred_element_type=jnp.float32) * scale
        scores = scores.astype(jnp.bfloat16) if q.dtype == jnp.bfloat16 else scores
        m = jnp.max(scores.astype(jnp.float32), axis=-1, keepdims=True)
        p = jnp.exp(scores.astype(jnp.float32) - m)
        s = jnp.sum(p, axis=-1, keepdims=True)
        out = jnp.einsum("bqhk,bkhd->bqhd", p.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        return (out / s).astype(q.dtype)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    # Materialize the (B,H,S,S) score tensor in bf16 when the network already
    # computes in bf16 — one extra rounding on logits that are themselves sums
    # of bf16 products, and it halves the dominant softmax HBM traffic
    # (531 → 598 fps end-to-end, docs/PERF.md). Softmax statistics stay f32.
    # f32 inputs (parity/tests) keep f32 scores; impl flags force either way.
    bf16_scores = impl in ("xla_bf16_scores", "xla_postscale", "xla_nomax",
                           "xla_fusedmax", "xla_bf16softmax") or (
        impl != "xla_f32_scores" and q.dtype == jnp.bfloat16)
    # Deferred normalization is the DEFAULT on the bf16 path (646.9 → 656.0
    # fps end-to-end, docs/PERF.md); 'xla_bf16_scores' forces the legacy
    # pre-divided formulation for comparison.
    postscale = bf16_scores and impl != "xla_bf16_scores"
    if bf16_scores:
        if impl == "xla_fusedmax":
            # Take the row max of the PRE-cast f32 scores: the reduce then
            # joins the multi-output fusion that writes the bf16 score
            # tensor, instead of being a standalone full re-read pass over
            # [B,H,S,S] (the `convert_reduce_fusion`s in the profile).
            # Numerically still a valid stabilizer: exp(x_bf16 − m_f32) ≤
            # exp(half a bf16 ulp) ≈ 1.004.
            m = jnp.max(scores, axis=-1, keepdims=True)
            scores = scores.astype(jnp.bfloat16)
            p = jnp.exp(scores.astype(jnp.float32) - m)
        elif impl == "xla_nomax":
            # measurement-only variant: skip the max pass (unsafe if logits
            # can exceed ~88; LN'd q/k keep them far below in practice)
            scores = scores.astype(jnp.bfloat16)
            p = jnp.exp(scores.astype(jnp.float32))
        elif impl == "xla_bf16softmax":
            # measurement variant: max and exp stay ENTIRELY in bf16 (no f32
            # upcast of the [B,H,S,S] tensor inside the softmax fusions; the
            # normalizer still accumulates f32). exp(x−m) ≤ 1 so bf16 only
            # costs ~2^-9 relative on the probabilities.
            scores = scores.astype(jnp.bfloat16)
            m = jnp.max(scores, axis=-1, keepdims=True)
            p = jnp.exp(scores - m)  # bf16 end-to-end; PV reads it directly
        else:
            scores = scores.astype(jnp.bfloat16)
            m = jnp.max(scores.astype(jnp.float32), axis=-1, keepdims=True)
            p = jnp.exp(scores.astype(jnp.float32) - m)
        if postscale:
            # Defer the softmax normalization past the PV matmul: dividing p
            # is a full [B,H,S,S] read+write pass, while scaling the output
            # rows touches only [B,S,H,D] (S/D ≈ 3× less HBM at S=196).
            # exp(x−m) ≤ 1 so unnormalized p is representable in bf16; the
            # PV matmul accumulates f32 and the row scale happens there —
            # numerics differ from pre-division only by final rounding.
            # [B, H, Sq]; f32 accumulation (no-op upcast when p is f32)
            s = jnp.sum(p.astype(jnp.float32), axis=-1)
            out = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
            return (out / s.transpose(0, 2, 1)[..., None]).astype(q.dtype)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
    else:
        p = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float | None = None,
    impl: str = "auto",
    interpret: bool = False,
) -> jnp.ndarray:
    """Multi-head attention. q: [B, H, Sq, D]; k/v: [B, H, Sk, D].

    impl: 'auto' (pallas on TPU, XLA elsewhere), 'pallas', or 'xla'.
    """
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    if impl == "auto":
        # At DUSt3R's sequence lengths (196/1024 tokens) the scores matrix
        # fits VMEM and XLA's fused attention wins — measured 433 vs 374
        # fps/chip end-to-end at S=196 (docs/PERF.md). The Pallas kernel pays
        # off once scores would spill (long sequences), so 'auto' selects it
        # only there.
        long_seq = sk >= 2048
        impl = "pallas" if (_auto_platform() == "tpu" and long_seq) else "xla"

    if impl.startswith("pallas_grouped"):
        # grid (B, H/G): G heads per program, VMEM-resident scores, no HBM
        # padding. 'pallas_grouped' → G=4; 'pallas_grouped8' etc. override.
        g = int(impl[len("pallas_grouped"):] or 4)
        return _grouped_core(q, k, v, scale, g, interpret)

    if impl == "pallas_multihead":
        # experimental variant: one program per batch element, all heads
        # in-program. Measured SLOWER than both the q-blocked kernel and XLA
        # at S=196 (288 vs 378 vs 433 fps end-to-end — docs/PERF.md): few big
        # sequential programs pipeline worse than many small ones.
        return _multihead_core(q, k, v, scale, interpret)

    qf = q.reshape(b * h, sq, d)
    kf = k.reshape(b * h, sk, d)
    vf = v.reshape(b * h, sk, d)
    if impl == "pallas":
        out = _flash_attention_core(qf, kf, vf, scale, interpret)
    else:
        out = _attention_reference(qf, kf, vf, scale)
    return out.reshape(b, h, sq, d)
