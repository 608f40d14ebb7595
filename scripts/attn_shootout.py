#!/usr/bin/env python3
"""Attention implementation shootout at DUSt3R production shapes (on-chip).

Times attention_bshd (the layout the model actually uses, including any
transposes a path needs) across impls at the three shapes the model family
runs: encoder self-attn (both views batched), decoder self/cross-attn, and
MASt3R-512 (S=1024). Run: python scripts/attn_shootout.py [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from thermal3d.core.cache import enable_compilation_cache
from thermal3d.kernels.flash_attention import attention_bshd

SHAPES = [  # (label, B, S, H, D)
    ("enc224 (2 views)", 64, 196, 16, 64),
    ("dec224", 32, 196, 12, 64),
    ("enc512 (2 views)", 16, 1024, 16, 64),
]
IMPLS = ["xla", "pallas", "pallas_grouped1", "pallas_grouped2",
         "pallas_grouped4", "pallas_grouped8", "pallas_multihead"]


def main():
    enable_compilation_cache()
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    for label, b, s, h, d in SHAPES:
        q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
        ref = None
        for impl in IMPLS:
            try:
                f = jax.jit(lambda q, k, v, impl=impl: attention_bshd(
                    q, k, v, impl=impl))
                out = f(q, k, v)
                out.block_until_ready()
                if ref is None:
                    ref = np.asarray(out, np.float32)
                    err = 0.0
                else:
                    err = float(np.abs(np.asarray(out, np.float32) - ref).max())
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = f(q, k, v)
                out.block_until_ready()
                dt = (time.perf_counter() - t0) / iters
                print(f"{label:18s} {impl:18s} {dt*1e6:9.1f} us  maxerr={err:.3e}")
            except Exception as e:
                print(f"{label:18s} {impl:18s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
