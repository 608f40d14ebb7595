"""Int8 depth drift at MASt3R-512 production dims (pseudo-GT path).

Complements the 224-dims serving sweep (scripts/int8_sensitivity.py,
docs/INT8_SWEEP.md): same protocol — random-init params, relative depth RMS
of the int8 path vs the unquantized reference — but on the catmlpdpt 512
generator the pseudo-GT int8 option actually serves. Reference here is the
bf16 production path (the 224 sweep measured bf16-vs-f32 adds ~0.7% on top).

Usage: python scripts/int8_drift_512.py [batch]
"""

import dataclasses
import json
import sys

sys.path.insert(0, ".")

import jax
import numpy as np

from thermal3d.core.cache import enable_compilation_cache
from thermal3d.core.config import MASTR_512_CATMLPDPT
from thermal3d.kernels.quant import SCOPE_TO_ONLY
from thermal3d.pseudo_gt.generator import PseudoGTGenerator

enable_compilation_cache()

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2
config = dataclasses.replace(MASTR_512_CATMLPDPT, compute_dtype="bfloat16",
                             scan_layers=True)
gen = PseudoGTGenerator(config, batch_size=batch, params_dtype="bfloat16")

h, w = config.img_size
ks = jax.random.split(jax.random.key(7), 2)
rgb1 = np.asarray(jax.random.uniform(ks[0], (batch, h, w, 3)))
rgb2 = np.asarray(jax.random.uniform(ks[1], (batch, h, w, 3)))

ref = gen.run_pairs(rgb1, rgb2)

# scan-layout skip names whole stacked trunks: enc_only/dec_only locate
# WHERE the 512 drift accumulates (encoder stack vs decoder+embed)
# *_static: STATIC activation scales calibrated on the same input the drift
# is measured on (best case for static quant — zero calibration mismatch),
# isolating the per-token→per-tensor activation-scale coarsening cost
CONFIGS = [
    ("fc1", {"int8_only": SCOPE_TO_ONLY["fc1"]}),
    ("all", {}),
    ("enc_only", {"int8_skip": ("dec_scan", "decoder_embed")}),
    ("dec_only", {"int8_skip": ("enc_scan",)}),
    ("fc1_static", {"int8_only": SCOPE_TO_ONLY["fc1"],
                    "int8_calibration": "SAMPLE"}),
    ("all_static", {"int8_calibration": "SAMPLE"}),
]

for scope, kw in CONFIGS:
    if kw.get("int8_calibration") == "SAMPLE":
        kw = dict(kw, int8_calibration=(rgb1, rgb2))
    g8 = PseudoGTGenerator(config, params=gen.params, batch_size=batch,
                           quantize_int8=True, **kw)
    out = g8.run_pairs(rgb1, rgb2)
    row = {"scope": scope}
    for k in ("depth1", "depth2", "confidence1"):
        d = out[k].astype(np.float64)
        r = ref[k].astype(np.float64)
        row[f"rel_rms_{k}"] = round(
            float(np.linalg.norm(d - r) / np.linalg.norm(r)), 5)
    print(json.dumps(row))
