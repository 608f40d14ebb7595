"""ThermalDUSt3R — learnable thermal preprocessing wrapped around the model.

Re-implements the reference wrapper (thermal_dustr_model.py:86-161): per-image
min/max normalization over (H, W), depthwise Sobel edge magnitude, and
`clamp((x + edge_weight·edges) · temp_scale, 0, 1)` with LEARNABLE edge_weight
(init 0.5) and temp_scale (init 1.0). The Sobel op is computed in separable
stencil form (padded slices, fully fusable VPU arithmetic) rather than the
reference's grouped conv, which XLA maps poorly at C=3 on TPU.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from thermal3d.core.config import DustrModelConfig
from thermal3d.models.dustr import AsymmetricCroCo3DStereo

SOBEL_X = jnp.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]])
SOBEL_Y = jnp.array([[-1.0, -2.0, -1.0], [0.0, 0.0, 0.0], [1.0, 2.0, 1.0]])


def sobel_edge_magnitude(x: jnp.ndarray) -> jnp.ndarray:
    """Depthwise |Sobel| magnitude. x: [B, H, W, C] → same shape.

    Matches torch conv2d(groups=C, padding=1) with the fixed kernels at
    thermal_dustr_model.py:96-101 (zero padding, cross-correlation), computed
    as the separable 3-tap stencils (Gx = smooth[1,2,1]ᵀ ⊗ diff[-1,0,1],
    Gy transposed) over padded slices — pure fusable VPU arithmetic. XLA maps
    a feature_group_count=3 conv poorly on TPU; the stencil form measured ~3×
    faster in the serving preprocess (scripts/preproc_breakdown.py), with
    equality to the conv form unit-tested (tests/test_models.py).
    """
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    vs = xp[:, :-2] + 2.0 * xp[:, 1:-1] + xp[:, 2:]  # rows smoothed  [B,H,W+2,C]
    vd = xp[:, 2:] - xp[:, :-2]                      # rows differenced
    ex = vs[:, :, 2:] - vs[:, :, :-2]                # → Gx  [B,H,W,C]
    ey = vd[:, :, :-2] + 2.0 * vd[:, :, 1:-1] + vd[:, :, 2:]  # → Gy
    return jnp.sqrt(ex * ex + ey * ey)


class ThermalPreprocessHead(nn.Module):
    """Learnable thermal enhancement (thermal_dustr_model.py:110-142)."""

    edge_weight_init: float = 0.5
    temp_scale_init: float = 1.0
    use_local_normalization: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        edge_weight = self.param("edge_weight", lambda k: jnp.asarray(self.edge_weight_init))
        temp_scale = self.param("temp_scale", lambda k: jnp.asarray(self.temp_scale_init))
        if x.shape[-1] == 1:
            x = jnp.tile(x, (1, 1, 1, 3))
        if self.use_local_normalization:
            mn = jnp.min(x, axis=(1, 2), keepdims=True)
            mx = jnp.max(x, axis=(1, 2), keepdims=True)
            x = (x - mn) / (mx - mn + 1e-6)
        mag = sobel_edge_magnitude(x)
        enhanced = (x + edge_weight * mag) * temp_scale
        return jnp.clip(enhanced, 0.0, 1.0)


class ThermalDUSt3R(nn.Module):
    """Wrapper: thermal preprocessing head + base AsymmetricCroCo3DStereo."""

    config: DustrModelConfig
    edge_weight_init: float = 0.5
    temp_scale_init: float = 1.0

    def setup(self):
        self.preprocess = ThermalPreprocessHead(
            self.edge_weight_init, self.temp_scale_init, name="thermal_preprocess"
        )
        self.model = AsymmetricCroCo3DStereo(self.config, name="model")

    def __call__(self, img1: jnp.ndarray, img2: jnp.ndarray) -> Tuple[Dict, Dict]:
        return self.model(self.preprocess(img1), self.preprocess(img2))
