"""Depth-map refinement: outlier removal + guided + bilateral filtering.

Fused jit replacement for depth_refinement_with_outlier_removal
(thermal_dustr_inference_for_experiment.py:284-377) whose outlier stage is an
O(H·W) Python loop in the reference — here it's one vectorized stencil kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from thermal3d.kernels.filters import bilateral_filter, guided_filter, remove_depth_outliers
from thermal3d.preprocess.enhance import rgb_to_gray


@functools.partial(jax.jit, static_argnames=("use_guided_filter",))
def refine_depth(depth: jnp.ndarray, thermal: jnp.ndarray,
                 use_guided_filter: bool = True) -> jnp.ndarray:
    """depth: [H, W]; thermal: [H, W] or [H, W, C] in [0,1].

    Pipeline (reference :330-377): 3σ outlier → masked 5×5 local median;
    guidedFilter(radius=8, eps=1e-4) guided by the thermal gray; final
    bilateralFilter(d=5, σc=50, σs=50) on the depth values.
    """
    gray = rgb_to_gray(thermal) if thermal.ndim == 3 else thermal
    cleaned = remove_depth_outliers(depth, kernel_size=5, n_sigma=3.0)
    if use_guided_filter:
        refined = guided_filter(gray.astype(jnp.float32), cleaned.astype(jnp.float32),
                                radius=8, eps=1e-4)
    else:
        refined = cleaned
    return bilateral_filter(refined, d=5, sigma_color=50.0, sigma_space=50.0)
