#!/usr/bin/env python3
"""Fused RoPE+attention shootout at DUSt3R production shapes (on-chip).

Measures the FULL sub-pipeline the model runs between the qkv projection and
the output projection — head-split + RoPE + attention + merge — so the fused
Pallas kernel's savings (no head reshape, RoPE in VMEM, no score HBM traffic)
are compared against exactly what they replace in the XLA path.

Run: python scripts/fused_attn_shootout.py [iters]
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from thermal3d.core.cache import enable_compilation_cache
from thermal3d.kernels.flash_attention import (attention_bshd,
                                               fused_rope_attention,
                                               fused_rope_cross_attention)
from thermal3d.models.rope import (apply_rope_2d_bshd, make_grid_positions,
                                   rope_tables)

SHAPES = [  # (label, B, grid_h, grid_w, H, D)
    ("enc224 (2 views)", 64, 14, 14, 16, 64),
    ("dec224", 32, 14, 14, 12, 64),
    ("enc512 (2 views)", 16, 32, 32, 16, 64),
    ("dec512", 8, 32, 32, 12, 64),
]
GROUPS = [1, 2, 4, 8]
# enc224-mono is the serving encoder shape (monocular single-encode, B=32);
# pass --s196 to sweep only the 224 shapes (the round-3 optimization target)
S196_SHAPES = [
    ("enc224-mono", 32, 14, 14, 16, 64),
    ("enc224 (2 views)", 64, 14, 14, 16, 64),
    ("dec224", 32, 14, 14, 12, 64),
]


def bench(f, args, iters):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, np.asarray(out, np.float32)


def main():
    enable_compilation_cache()
    s196 = "--s196" in sys.argv
    rope16 = "--rope16" in sys.argv  # add bf16-in-kernel-RoPE variants
    pos_args = [a for a in sys.argv[1:] if not a.startswith("-")]
    iters = int(pos_args[0]) if pos_args else 100
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    for label, b, gh, gw, h, d in (S196_SHAPES if s196 else SHAPES):
        s, c = gh * gw, h * d
        pos = make_grid_positions(gh, gw)
        scale = 1.0 / math.sqrt(d)
        qkv = jnp.asarray(rng.standard_normal((b, s, 3 * c)), jnp.bfloat16)

        def xla_path(qkv):
            q, k, v = (t.reshape(b, s, h, d)
                       for t in jnp.split(qkv, 3, axis=-1))
            q = apply_rope_2d_bshd(q, pos)
            k = apply_rope_2d_bshd(k, pos)
            return attention_bshd(q, k, v, impl="xla").reshape(b, s, c)

        dt, ref = bench(jax.jit(xla_path), (qkv,), iters)
        print(f"{label:18s} self  {'xla+rope':14s} {dt*1e6:9.1f} us")

        for g in GROUPS:
            if h % g:
                continue
            for bb in (1, 2, 4, 8, 16):
                if b % bb:
                    continue
                variants = [(f"fused_g{g}b{bb}", True)]
                if rope16:
                    variants.append((f"fused_g{g}b{bb}r16", False))
                for tag, rf32 in variants:
                    from thermal3d.kernels.flash_attention import \
                        _fused_rope_attention_fwd

                    f = jax.jit(lambda qkv, g=g, bb=bb, rf32=rf32:
                                _fused_rope_attention_fwd(
                                    qkv, *rope_tables(pos, d), num_heads=h,
                                    scale=scale, group=g, interpret=False,
                                    batch_block=bb, rope_f32=rf32))
                    try:
                        dt, out = bench(f, (qkv,), iters)
                        err = float(np.abs(out - ref).max())
                        print(f"{label:18s} self  {tag:14s} "
                              f"{dt*1e6:9.1f} us  maxerr={err:.3e}")
                    except Exception as e:
                        print(f"{label:18s} self  {tag} FAILED: "
                              f"{type(e).__name__}: {str(e)[:100]}")

        # cross-attention: separate q/k/v projections, shared grid
        qp, kp, vp = (jnp.asarray(rng.standard_normal((b, s, c)), jnp.bfloat16)
                      for _ in range(3))

        def xla_cross(qp, kp, vp):
            q = apply_rope_2d_bshd(qp.reshape(b, s, h, d), pos)
            k = apply_rope_2d_bshd(kp.reshape(b, s, h, d), pos)
            return attention_bshd(q, k, vp.reshape(b, s, h, d),
                                  impl="xla").reshape(b, s, c)

        dt, ref = bench(jax.jit(xla_cross), (qp, kp, vp), iters)
        print(f"{label:18s} cross {'xla+rope':14s} {dt*1e6:9.1f} us")
        for g in GROUPS:
            if h % g:
                continue
            for bb in (1, 2, 4):
                if b % bb:
                    continue
                variants = [(f"fused_g{g}b{bb}", True)]
                if rope16:
                    variants.append((f"fused_g{g}b{bb}r16", False))
                for tag, rf32 in variants:
                    from thermal3d.kernels.flash_attention import \
                        _fused_rope_xattn_fwd

                    f = jax.jit(lambda qp, kp, vp, g=g, bb=bb, rf32=rf32:
                                _fused_rope_xattn_fwd(
                                    qp, kp, vp, *rope_tables(pos, d),
                                    num_heads=h, scale=scale, group=g,
                                    interpret=False, batch_block=bb,
                                    rope_f32=rf32))
                    try:
                        dt, out = bench(f, (qp, kp, vp), iters)
                        err = float(np.abs(out - ref).max())
                        print(f"{label:18s} cross {tag:14s} "
                              f"{dt*1e6:9.1f} us  maxerr={err:.3e}")
                    except Exception as e:
                        print(f"{label:18s} cross {tag} FAILED: "
                              f"{type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__":
    main()
