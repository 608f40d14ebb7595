#!/usr/bin/env python3
"""Dump the optimized HLO of the serving step and print the bodies of the
fusions matching a name pattern (default: convert_reduce).

Usage: python scripts/dump_hlo.py [batch] [pattern] [attn]
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from thermal3d.core.cache import enable_compilation_cache

enable_compilation_cache()

from scripts.profile_step import build_step  # noqa: E402

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
pattern = sys.argv[2] if len(sys.argv) > 2 else "convert_reduce"
attn = sys.argv[3] if len(sys.argv) > 3 else "auto"

step, params, head_params, raw = build_step(batch, attn)
txt = step.lower(params, head_params, raw).compile().as_text()
path = "/tmp/step_hlo.txt"
with open(path, "w") as f:
    f.write(txt)
print(f"wrote {path} ({len(txt)} bytes)")

# find fusion instructions whose NAME matches, print their called computation
called = set()
for m in re.finditer(rf"%?({pattern}[\w.]*) = [^\n]*calls=%?([\w.\-]+)", txt):
    called.add(m.group(2))
print("matching fusions call:", sorted(called)[:8], f"({len(called)} total)")

for comp in sorted(called)[:2]:
    m = re.search(rf"%?{re.escape(comp)} \([^\n]*\n(.*?)\n\}}", txt, re.S)
    if m:
        body = m.group(0)
        print(f"\n===== {comp} ({len(body)} chars) =====")
        print(body[:4000])
