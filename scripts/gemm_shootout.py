#!/usr/bin/env python3
"""Microbench the GEMM constructs of the DUSt3R step to locate fusion
inefficiency (docs/PERF.md: big-GEMM+LN fusions measured ~110 TFLOP/s vs
~197 bf16 peak on v5e).

Each case runs `iters` iterations INSIDE one jitted lax.scan with a real
data dependency between iterations (feeding a slice of the output back into
the carry) — unchained dispatch loops measure the dispatch path on this
harness, not the chip. Prints achieved TFLOP/s per construct.

Usage: python scripts/gemm_shootout.py [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from thermal3d.core.cache import enable_compilation_cache

B, S = 32, 196
M = B * S  # 6272 tokens


def chained(fn, x0, extra, iters):
    """Run y = fn(x, *extra) `iters` times with x perturbed by y each step."""

    def body(c, _):
        y = fn(c, *extra)
        # the dependency must consume EVERY output element, or XLA dead-code
        # -eliminates GEMM columns across scan iterations (measured >peak
        # "TFLOP/s" with a first-column-only carry); a mean fuses into the
        # GEMM epilogue so its own cost is negligible
        c2 = c + jnp.mean(y.astype(jnp.float32), axis=-1, keepdims=True
                          ).astype(c.dtype) * 1e-12
        return c2, ()

    def run(x):
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c

    f = jax.jit(run)
    out = f(x0)
    float(out[0, 0].astype(jnp.float32))  # block_until_ready lies on the relay
    t0 = time.perf_counter()
    out = f(x0)
    float(out[0, 0].astype(jnp.float32))
    return (time.perf_counter() - t0) / iters


def main():
    enable_compilation_cache()
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)

    def mk(shape, dtype=jnp.bfloat16):
        return jnp.asarray(rng.standard_normal(shape), dtype)

    results = []
    # measurement floor: carry-update-only chain (no GEMM) — dispatch + scan
    # + scalar-fetch overhead shows up here
    x0 = mk((M, 1024))
    dt = chained(lambda c: c[:, :1], x0, (), iters)
    results.append(("null (no GEMM) floor", dt, 0.0))

    for k, n, tag in [(1024, 4096, "fc1"), (4096, 1024, "fc2"),
                      (1024, 3072, "qkv"), (768, 3072, "dec_fc1"),
                      (768, 1024, "head_proj")]:
        x = mk((M, k))
        w = mk((k, n))
        bias = mk((n,), jnp.float32)
        g = mk((k,), jnp.float32)
        be = mk((k,), jnp.float32)
        flops = 2 * M * k * n

        def plain(x, w):
            return x @ w

        def bias_gelu(x, w, bias):
            return jax.nn.gelu(x @ w + bias.astype(jnp.bfloat16),
                               approximate=True)

        def ln_mm(x, w, g, be):
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, -1, keepdims=True)
            var = jnp.var(xf, -1, keepdims=True)
            xn = ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * g + be
                  ).astype(jnp.bfloat16)
            return xn @ w

        for name, fn, extra in [("plain bf16", plain, (w,)),
                                ("+bias+gelu", bias_gelu, (w, bias)),
                                ("LN+matmul", ln_mm, (w, g, be))]:
            dt = chained(fn, x, extra, iters)
            results.append((f"{tag:9s} {name:12s} [{M}x{k}x{n}]", dt,
                            flops / dt / 1e12))

        # int8
        wq = jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8)
        ws = jnp.float32(0.01)

        def int8_mm(x, wq, ws):
            xf = x.astype(jnp.float32)
            ax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
            xs = ax / 127.0
            xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * (xs * ws)).astype(jnp.bfloat16)

        def int8w_mm(x, wq, ws):
            return x @ (wq.astype(jnp.bfloat16) * ws.astype(jnp.bfloat16))

        for name, fn, extra in [("int8xint8", int8_mm, (wq, ws)),
                                ("int8w->bf16", int8w_mm, (wq, ws))]:
            dt = chained(fn, x, extra, iters)
            results.append((f"{tag:9s} {name:12s} [{M}x{k}x{n}]", dt,
                            flops / dt / 1e12))

    for name, dt, tf in results:
        print(f"{name:46s} {dt*1e6:9.1f} us  {tf:7.1f} TFLOP/s")


if __name__ == "__main__":
    main()
