"""2D rotary position embedding (croco 'RoPE100').

DUSt3R/CroCo apply RoPE inside every attention (self and cross): the per-head
feature dim is split in two halves; the first half is rotated by the token's
y (row) position, the second by x (column), each with a 1-D GPT-NeoX-style
rotation at base frequency 100 (reference model is built with
pos_embed='RoPE100'; the patched encoder loop at thermal_dustr_model.py:67-74
passes `pos` through every block).

All functions are pure jnp, shape-static, and fuse into the surrounding
attention under jit.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_grid_positions(h: int, w: int) -> jnp.ndarray:
    """Token positions for an h×w patch grid, row-major: [(0,0),(0,1),...].

    Returns int32 [h*w, 2] with columns (y, x) — the croco PositionGetter
    cartesian-product ordering.
    """
    ys = jnp.arange(h, dtype=jnp.int32)
    xs = jnp.arange(w, dtype=jnp.int32)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)


def _rotate_half(t: jnp.ndarray) -> jnp.ndarray:
    d = t.shape[-1] // 2
    t1, t2 = t[..., :d], t[..., d:]
    return jnp.concatenate([-t2, t1], axis=-1)


def _rope_1d(t: jnp.ndarray, pos: jnp.ndarray, base: float) -> jnp.ndarray:
    """1-D RoPE on the last dim. t: [..., S, d] (d even); pos: broadcastable [S]."""
    d = t.shape[-1]
    inv_freq = 1.0 / (base ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))  # [d/2]
    freqs = pos.astype(jnp.float32)[..., None] * inv_freq  # [..., S, d/2]
    freqs = jnp.concatenate([freqs, freqs], axis=-1)  # [..., S, d]
    cos = jnp.cos(freqs).astype(t.dtype)
    sin = jnp.sin(freqs).astype(t.dtype)
    return t * cos + _rotate_half(t) * sin


def rope_tables(positions: jnp.ndarray, head_dim: int, base: float = 100.0):
    """Precomputed (cos, sin) tables [S, head_dim] f32 for the 2-D RoPE, laid
    out so that `t*cos + rot(t)*sin` equals apply_rope_2d_bshd, where
    rot(t) = [-t[d4:2d4], t[:d4], -t[3d4:], t[2d4:3d4]] (d4 = head_dim//4).

    Used by the fused Pallas attention kernel, which applies RoPE in VMEM
    instead of a separate HBM pass.
    """
    d = head_dim // 2  # per-axis rotary dim (y first half, x second half)
    inv_freq = 1.0 / (base ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))  # [d/2]
    pos_y = positions[:, 0].astype(jnp.float32)[:, None]  # [S,1]
    pos_x = positions[:, 1].astype(jnp.float32)[:, None]
    fy = pos_y * inv_freq  # [S, d/2]
    fx = pos_x * inv_freq
    freqs = jnp.concatenate([fy, fy, fx, fx], axis=-1)  # [S, head_dim]
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope_2d(tokens: jnp.ndarray, positions: jnp.ndarray, base: float = 100.0) -> jnp.ndarray:
    """Apply 2-D RoPE.

    tokens:    [B, num_heads, S, head_dim] (head_dim divisible by 4)
    positions: [S, 2] or [B, S, 2] int (y, x)
    """
    if positions.ndim == 2:
        pos_y, pos_x = positions[:, 0], positions[:, 1]  # [S]
    else:
        pos_y, pos_x = positions[:, None, :, 0], positions[:, None, :, 1]  # [B,1,S]
    d = tokens.shape[-1] // 2
    t_y, t_x = tokens[..., :d], tokens[..., d:]
    t_y = _rope_1d(t_y, pos_y, base)
    t_x = _rope_1d(t_x, pos_x, base)
    return jnp.concatenate([t_y, t_x], axis=-1)


def apply_rope_2d_bshd(tokens: jnp.ndarray, positions: jnp.ndarray,
                       base: float = 100.0) -> jnp.ndarray:
    """Same rotation for the transpose-free [B, S, num_heads, head_dim]
    layout (the sequence axis is second; cos/sin broadcast over heads)."""
    pos_y = positions[:, 0][:, None]  # [S, 1] → broadcasts over H
    pos_x = positions[:, 1][:, None]
    d = tokens.shape[-1] // 2
    t_y, t_x = tokens[..., :d], tokens[..., d:]
    t_y = _rope_1d(t_y, pos_y, base)
    t_x = _rope_1d(t_x, pos_x, base)
    return jnp.concatenate([t_y, t_x], axis=-1)
