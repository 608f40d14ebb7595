"""thermal3d — TPU-native 3D vision in thermal images.

A JAX/XLA/Pallas re-design of the capabilities of salvingeorge/Thermal3D-Vision:
DUSt3R/MASt3R pointmap regression models, thermal preprocessing, pseudo-GT
generation, thermal-aware fine-tuning, and depth evaluation — built TPU-first
(static shapes, jitted end-to-end, SPMD over a `jax.sharding.Mesh`).
"""

__version__ = "0.1.0"

import os as _os

# Platform pin: THERMAL3D_PLATFORM=cpu forces JAX onto a platform before any
# backend initializes. Needed because some hosts force-register a TPU plugin
# whose registration overrides the standard JAX_PLATFORMS env var (the same
# problem tests/conftest.py solves for pytest); CLIs and scripts get the fix
# by importing thermal3d first.
if _os.environ.get("THERMAL3D_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["THERMAL3D_PLATFORM"])
