"""Accuracy cost of the bf16 DPT/catmlpdpt head at MASt3R-512 production dims.

Round 4 moved the DPT conv pyramid + desc MLP from pinned f32 to the model
compute dtype (HeadConfig.dpt_dtype='compute'): the head stage was 48% of
the 512 pseudo-GT step at 17% MFU (docs/PERF.md). This measures what that
costs in output drift: bf16 trunk + bf16 head vs bf16 trunk + f32 head
(the pre-round-4 production path), random init, same protocol as
scripts/int8_drift_512.py.

Usage: python scripts/head_dtype_drift_512.py [batch]
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

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2
base = dataclasses.replace(MASTR_512_CATMLPDPT, compute_dtype="bfloat16",
                           scan_layers=True)
cfg_f32 = dataclasses.replace(
    base, head=dataclasses.replace(base.head, dpt_dtype="float32"))

gen_ref = PseudoGTGenerator(cfg_f32, batch_size=batch, params_dtype="bfloat16")
gen_bf16 = PseudoGTGenerator(base, params=gen_ref.params, batch_size=batch)

h, w = base.img_size
ks = jax.random.split(jax.random.key(7), 2)
rgb1 = np.asarray(jax.random.uniform(ks[0], (batch, h, w, 3)))
rgb2 = np.asarray(jax.random.uniform(ks[1], (batch, h, w, 3)))

ref = gen_ref.run_pairs(rgb1, rgb2)
out = gen_bf16.run_pairs(rgb1, rgb2)

row = {"compare": "bf16_head_vs_f32_head, bf16 trunk both"}
for k in ("depth1", "depth2", "confidence1", "confidence2"):
    d = out[k].astype(np.float64)
    r = ref[k].astype(np.float64)
    row[f"rel_rms_{k}"] = round(
        float(np.linalg.norm(d - r) / np.linalg.norm(r)), 5)
print(json.dumps(row))
