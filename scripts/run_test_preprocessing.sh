#!/bin/bash
# Preprocessing smoke test: single-image inference on a sample frame
# (counterpart of run_test_preprocessing.sh).
set -euo pipefail

IMG="${1:?usage: run_test_preprocessing.sh <thermal.png> [output_dir]}"
OUT="${2:-preprocess_smoke}"

python -m thermal3d.cli.infer --img_path "$IMG" --output_dir "$OUT" --no_vis
python - "$IMG" <<'EOF'
import sys
import numpy as np
import jax.numpy as jnp
from thermal3d.preprocess.io import load_thermal_image
from thermal3d.preprocess.enhance import enhance_thermal_contrast, enhance_thermal_fixed_range

gray = load_thermal_image(sys.argv[1], normalize=True)
assert gray is not None, "decode failed"
enh = np.asarray(enhance_thermal_contrast(jnp.asarray(gray)))
fixed = np.asarray(enhance_thermal_fixed_range(jnp.asarray(gray)))
print(f"decoded {gray.shape}; contrast-enhanced range [{enh.min():.3f},{enh.max():.3f}]; "
      f"fixed-range mean {fixed.mean():.3f}")
EOF
