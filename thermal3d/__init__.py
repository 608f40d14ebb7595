"""thermal3d — TPU-native 3D vision in thermal images.

A JAX/XLA/Pallas re-design of the capabilities of salvingeorge/Thermal3D-Vision:
DUSt3R/MASt3R pointmap regression models, thermal preprocessing, pseudo-GT
generation, thermal-aware fine-tuning, and depth evaluation — built TPU-first
(static shapes, jitted end-to-end, SPMD over a `jax.sharding.Mesh`).
"""

__version__ = "0.1.0"
