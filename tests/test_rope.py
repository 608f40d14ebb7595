"""RoPE parity against an independently-written torch oracle of the croco
RoPE2D formula (base=100, y/x half-split, GPT-NeoX rotate-half layout)."""

import numpy as np
import torch

from thermal3d.models.rope import apply_rope_2d, make_grid_positions


def torch_rope2d_oracle(tokens: torch.Tensor, positions: torch.Tensor, base: float = 100.0):
    """tokens: [B, H, S, D]; positions: [S, 2] (y, x)."""

    def rope1d(t, pos1d):
        d = t.size(-1)
        inv_freq = 1.0 / (base ** (torch.arange(0, d, 2).float() / d))
        freqs = torch.einsum("i,j->ij", pos1d.float(), inv_freq)
        freqs = torch.cat((freqs, freqs), dim=-1)  # [S, d]
        cos, sin = freqs.cos(), freqs.sin()
        t1, t2 = t[..., : d // 2], t[..., d // 2 :]
        rotated = torch.cat((-t2, t1), dim=-1)
        return t * cos + rotated * sin

    d = tokens.size(-1) // 2
    y, x = tokens[..., :d], tokens[..., d:]
    y = rope1d(y, positions[:, 0])
    x = rope1d(x, positions[:, 1])
    return torch.cat((y, x), dim=-1)


def test_grid_positions_row_major():
    pos = np.asarray(make_grid_positions(2, 3))
    expected = [[0, 0], [0, 1], [0, 2], [1, 0], [1, 1], [1, 2]]
    assert pos.tolist() == expected


def test_rope2d_matches_torch_oracle(rng):
    b, h, s, d = 2, 3, 12, 16
    tokens = rng.standard_normal((b, h, s, d)).astype(np.float32)
    pos = np.asarray(make_grid_positions(3, 4))

    ours = np.asarray(apply_rope_2d(tokens, pos, base=100.0))
    theirs = torch_rope2d_oracle(torch.from_numpy(tokens), torch.from_numpy(pos)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_rope_preserves_norm(rng):
    tokens = rng.standard_normal((1, 2, 6, 8)).astype(np.float32)
    pos = np.asarray(make_grid_positions(2, 3))
    out = np.asarray(apply_rope_2d(tokens, pos))
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=-1), np.linalg.norm(tokens, axis=-1), rtol=1e-5
    )


def test_rope_tables_match_apply_rope():
    """t*cos + rot(t)*sin with the precomputed tables equals the reference
    rope application (the contract the fused attention kernel relies on)."""
    import jax.numpy as jnp

    from thermal3d.models.rope import (apply_rope_2d_bshd, make_grid_positions,
                                       rope_tables)

    rng = np.random.default_rng(3)
    h, w, heads, d = 3, 5, 2, 16
    pos = make_grid_positions(h, w)
    t = jnp.asarray(rng.standard_normal((2, h * w, heads, d)), jnp.float32)
    want = np.asarray(apply_rope_2d_bshd(t, pos, base=100.0))

    cos, sin = rope_tables(pos, d, base=100.0)
    d4 = d // 4
    tt = np.asarray(t)

    def rot(x):
        return np.concatenate([-x[..., d4:2*d4], x[..., :d4],
                               -x[..., 3*d4:], x[..., 2*d4:3*d4]], axis=-1)

    got = tt * np.asarray(cos)[None, :, None, :] + rot(tt) * np.asarray(sin)[None, :, None, :]
    np.testing.assert_allclose(got, want, atol=1e-5)
