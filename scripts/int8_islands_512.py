"""Per-block f32 islands vs int8 drift at MASt3R-512 production dims.

VERDICT r3 #5: does keeping the first/last k trunk blocks in float (where
quant noise is injected into / read out of the residual stream) cut the
8.1% full-trunk depth drift at 512 dims enough to matter, while keeping
most of the +9.9% pairs/s win?

Per-block islands need the UNROLLED param layout (`int8_skip` names
top-level modules; the scan layout stacks each trunk into one leaf), and
the unrolled 512 program cannot compile through the dev harness's TPU
relay (HTTP 413) — so this runs on CPU in f32. Drift is a pure-numerics
question: the int8 path and its float reference run on the same platform,
so the platform cancels; the 224 sweep measured bf16-vs-f32 adds ~0.7%
on top (docs/INT8_SWEEP.md).

Usage: THERMAL3D_PLATFORM=cpu python scripts/int8_islands_512.py [batch]
"""

import dataclasses
import json
import sys

sys.path.insert(0, ".")

import jax
import numpy as np

from thermal3d.core.cache import enable_compilation_cache
from thermal3d.core.config import MASTR_512_CATMLPDPT
from thermal3d.pseudo_gt.generator import PseudoGTGenerator

enable_compilation_cache()

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
config = dataclasses.replace(MASTR_512_CATMLPDPT, compute_dtype="float32",
                             scan_layers=False)
gen = PseudoGTGenerator(config, batch_size=batch)

h, w = config.img_size
ks = jax.random.split(jax.random.key(7), 2)
rgb1 = np.asarray(jax.random.uniform(ks[0], (batch, h, w, 3)))
rgb2 = np.asarray(jax.random.uniform(ks[1], (batch, h, w, 3)))

ref = gen.run_pairs(rgb1, rgb2)


def island(k):
    """First/last k blocks of encoder and BOTH decoder branches in float,
    plus decoder_embed (the residual-stream entry point)."""
    names = ["decoder_embed"]
    for i in list(range(k)) + list(range(24 - k, 24)):
        names.append(f"enc_blocks_{i}")
    for i in list(range(k)) + list(range(12 - k, 12)):
        names.append(f"dec_blocks_{i}")
        names.append(f"dec_blocks2_{i}")
    return tuple(names)


CONFIGS = [
    ("all", {}),
    ("island1", {"int8_skip": island(1)}),
    ("island2", {"int8_skip": island(2)}),
    ("island4", {"int8_skip": island(4)}),
]

for scope, kw in CONFIGS:
    g8 = PseudoGTGenerator(config, params=gen.params, batch_size=batch,
                           quantize_int8=True, **kw)
    out = g8.run_pairs(rgb1, rgb2)
    row = {"scope": scope,
           "n_float_blocks": len(kw.get("int8_skip", ()))}
    for k in ("depth1", "depth2", "confidence1"):
        d = out[k].astype(np.float64)
        r = ref[k].astype(np.float64)
        row[f"rel_rms_{k}"] = round(
            float(np.linalg.norm(d - r) / np.linalg.norm(r)), 5)
    print(json.dumps(row), flush=True)
