"""Pallas fused attention vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thermal3d.kernels.flash_attention import (
    _attention_reference,
    _flash_attention_fwd_pallas,
    flash_attention,
)


@pytest.mark.parametrize("sq,sk", [(196, 196), (196, 64), (256, 256), (100, 300)])
def test_pallas_matches_reference(rng, sq, sk):
    d = 32
    q = rng.standard_normal((4, sq, d)).astype(np.float32)
    k = rng.standard_normal((4, sk, d)).astype(np.float32)
    v = rng.standard_normal((4, sk, d)).astype(np.float32)
    scale = 1.0 / np.sqrt(d)
    out_pallas = np.asarray(
        _flash_attention_fwd_pallas(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                    scale=scale, interpret=True)
    )
    out_ref = np.asarray(_attention_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale))
    # interpret mode models MXU input precision (bf16 mantissa on operands,
    # f32 accumulate) — tolerance is bf16-level, same as on hardware.
    np.testing.assert_allclose(out_pallas, out_ref, atol=5e-3)


def test_xla_path_grad(rng):
    """The dispatch op is differentiable; grads match autodiff-through-reference."""
    b, h, s, d = 1, 2, 24, 16
    q = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))

    def loss_xla(q, k, v):
        return jnp.sum(flash_attention(q, k, v, impl="xla") ** 2)

    g = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    assert all(np.all(np.isfinite(np.asarray(t))) for t in g)


def test_custom_vjp_matches_autodiff(rng):
    """Our hand-written backward equals autodiff through the reference math."""
    from thermal3d.kernels.flash_attention import _core_bwd

    b, s, d = 3, 20, 8
    q = jnp.asarray(rng.standard_normal((b, s, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, d)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((b, s, d)).astype(np.float32))
    scale = 0.3

    dq, dk, dv = _core_bwd(scale, False, (q, k, v), g)

    def f(q, k, v):
        return jnp.sum(_attention_reference(q, k, v, scale) * g)

    adq, adk, adv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(adq), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(adk), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(adv), atol=1e-4)


def test_multihead_kernel_matches_reference(rng):
    from thermal3d.kernels.flash_attention import (
        _attention_reference, _flash_attention_fwd_multihead)

    b, h, s, d = 2, 3, 196, 32
    q = rng.standard_normal((b, h, s, d)).astype(np.float32)
    k = rng.standard_normal((b, h, s, d)).astype(np.float32)
    v = rng.standard_normal((b, h, s, d)).astype(np.float32)
    scale = 1.0 / np.sqrt(d)
    ours = np.asarray(_flash_attention_fwd_multihead(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=scale, interpret=True))
    ref = np.asarray(_attention_reference(
        jnp.asarray(q.reshape(b * h, s, d)), jnp.asarray(k.reshape(b * h, s, d)),
        jnp.asarray(v.reshape(b * h, s, d)), scale)).reshape(b, h, s, d)
    np.testing.assert_allclose(ours, ref, atol=5e-3)


def test_multihead_grad(rng):
    from thermal3d.kernels.flash_attention import _mh_bwd, _attention_reference

    b, h, s, d = 1, 2, 20, 8
    q = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    dq, dk, dv = _mh_bwd(0.3, False, (q, k, v), g)

    def f(q, k, v):
        out = _attention_reference(q.reshape(b * h, s, d), k.reshape(b * h, s, d),
                                   v.reshape(b * h, s, d), 0.3)
        return jnp.sum(out.reshape(b, h, s, d) * g)

    adq, adk, adv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(adq), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(adk), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(adv), atol=1e-4)


def test_bf16_scores_path_close_to_f32(rng):
    from thermal3d.kernels.flash_attention import attention_bshd

    b, s, h, d = 2, 48, 4, 16
    q = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    exact = np.asarray(attention_bshd(q, k, v, impl="xla"))
    fast = np.asarray(attention_bshd(q, k, v, impl="xla_bf16_scores"))
    # bf16 score quantization: small relative error on O(1) outputs
    assert np.abs(fast - exact).max() < 2e-2
    assert np.abs(fast - exact).mean() < 3e-3
    # deferred-normalization variants (divide after PV instead of over the
    # S² probability tensor) must agree with the pre-divided bf16 path
    for impl in ("xla_postscale", "xla_nomax", "xla_fusedmax", "xla_bqhk",
                 "xla_bf16softmax"):
        post = np.asarray(attention_bshd(q, k, v, impl=impl))
        assert np.abs(post - exact).max() < 2e-2
        assert np.abs(post - fast).max() < 1e-2


@pytest.mark.parametrize("group,nh", [(1, 4), (2, 4), (4, 4), (4, 6)])
def test_grouped_kernel_matches_reference(rng, group, nh):
    """The head-grouped kernel (grid (B, H/G), no HBM padding, block overruns
    masked by Pallas) matches reference attention, including when G doesn't
    divide H (it shrinks to the largest divisor)."""
    from thermal3d.kernels.flash_attention import _flash_attention_fwd_grouped

    b, s, d = 2, 100, 16
    q = rng.standard_normal((b, nh, s, d)).astype(np.float32)
    k = rng.standard_normal((b, nh, s, d)).astype(np.float32)
    v = rng.standard_normal((b, nh, s, d)).astype(np.float32)
    scale = 1.0 / np.sqrt(d)
    out = np.asarray(_flash_attention_fwd_grouped(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=scale,
        group=group, interpret=True))
    ref = np.asarray(_attention_reference(
        jnp.asarray(q.reshape(b * nh, s, d)), jnp.asarray(k.reshape(b * nh, s, d)),
        jnp.asarray(v.reshape(b * nh, s, d)), scale)).reshape(b, nh, s, d)
    np.testing.assert_allclose(out, ref, atol=5e-3)


def test_grouped_impl_dispatch_and_grad(rng):
    """impl='pallas_grouped' routes through the grouped kernel and is
    differentiable via the shared closed-form backward."""
    b, h, s, d = 1, 4, 32, 8
    q = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, impl="pallas_grouped2",
                                       interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(flash_attention(q, k, v, impl="xla") ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-3)


def test_fused_rope_attention_matches_module(rng):
    """fused_rope_attention (RoPE in VMEM from tables + attention on the
    packed [B,S,3C] projection) equals the module's XLA path."""
    import math

    from thermal3d.kernels.flash_attention import fused_rope_attention
    from thermal3d.models.rope import apply_rope_2d_bshd, make_grid_positions, rope_tables

    b, h_g, w_g, nh, d = 2, 7, 10, 4, 16
    s, c = h_g * w_g, nh * d
    pos = make_grid_positions(h_g, w_g)
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * c)), jnp.float32)

    # reference: split → rope → attention
    qkv_r = qkv.reshape(b, s, 3, nh, d)
    q = apply_rope_2d_bshd(qkv_r[:, :, 0], pos, 100.0)
    k = apply_rope_2d_bshd(qkv_r[:, :, 1], pos, 100.0)
    ref = flash_attention(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                          qkv_r[:, :, 2].transpose(0, 2, 1, 3), impl="xla")
    ref = np.asarray(ref.transpose(0, 2, 1, 3)).reshape(b, s, c)

    cos, sin = rope_tables(pos, d, 100.0)
    out = np.asarray(fused_rope_attention(qkv, cos, sin, nh,
                                          1.0 / math.sqrt(d), 2, True))
    np.testing.assert_allclose(out, ref, atol=5e-3)


def test_fused_rope_attention_grad(rng):
    """Custom backward (attention VJP + rope transpose) matches autodiff
    through the reference formulation."""
    import math

    from thermal3d.kernels.flash_attention import fused_rope_attention
    from thermal3d.models.rope import apply_rope_2d_bshd, make_grid_positions, rope_tables

    b, h_g, w_g, nh, d = 1, 4, 6, 2, 8
    s, c = h_g * w_g, nh * d
    pos = make_grid_positions(h_g, w_g)
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * c)), jnp.float32)
    cos, sin = rope_tables(pos, d, 100.0)
    scale = 1.0 / math.sqrt(d)

    def loss_fused(qkv):
        return jnp.sum(fused_rope_attention(qkv, cos, sin, nh, scale, 2, True) ** 2)

    def loss_ref(qkv):
        qkv_r = qkv.reshape(b, s, 3, nh, d)
        q = apply_rope_2d_bshd(qkv_r[:, :, 0], pos, 100.0)
        k = apply_rope_2d_bshd(qkv_r[:, :, 1], pos, 100.0)
        out = flash_attention(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                              qkv_r[:, :, 2].transpose(0, 2, 1, 3), impl="xla")
        return jnp.sum(out ** 2)

    g = np.asarray(jax.grad(loss_fused)(qkv))
    gr = np.asarray(jax.grad(loss_ref)(qkv))
    np.testing.assert_allclose(g, gr, atol=1e-3, rtol=1e-3)


def test_attention_module_fused_impl(rng):
    """Attention module with attention_impl='pallas_fused' gives the same
    output as impl='xla' for identical weights (interpret mode on CPU)."""
    import flax.linen as nn  # noqa: F401

    from thermal3d.models.layers import Attention
    from thermal3d.models.rope import make_grid_positions
    import sys
    from unittest import mock

    import thermal3d.kernels.flash_attention  # noqa: F401

    fa = sys.modules["thermal3d.kernels.flash_attention"]

    b, h_g, w_g, nh = 1, 4, 4, 2
    s, c = h_g * w_g, nh * 16
    pos = make_grid_positions(h_g, w_g)
    x = jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)

    mod_x = Attention(nh, attention_impl="xla")
    params = mod_x.init(jax.random.key(0), x, pos)
    want = np.asarray(mod_x.apply(params, x, pos))

    real = fa.fused_rope_attention
    with mock.patch.object(
            fa, "fused_rope_attention",
            lambda qkv, cos, sin, nh_, sc, g: real(qkv, cos, sin, nh_, sc, g,
                                                   True)):
        mod_f = Attention(nh, attention_impl="pallas_fused2")
        got = np.asarray(mod_f.apply(params, x, pos))
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_cross_attention_module_fused_impl(rng):
    """CrossAttention with attention_impl='pallas_fused' equals the XLA path
    (same weights; shared grid positions as in the dual decoder)."""
    import sys
    from unittest import mock

    import thermal3d.kernels.flash_attention  # noqa: F401
    from thermal3d.models.layers import CrossAttention
    from thermal3d.models.rope import make_grid_positions

    fa = sys.modules["thermal3d.kernels.flash_attention"]
    b, h_g, w_g, nh = 1, 4, 4, 2
    s, c = h_g * w_g, nh * 16
    pos = make_grid_positions(h_g, w_g)
    x = jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)

    mod_x = CrossAttention(nh, attention_impl="xla")
    params = mod_x.init(jax.random.key(0), x, y, y, pos, pos)
    want = np.asarray(mod_x.apply(params, x, y, y, pos, pos))

    real = fa.fused_rope_cross_attention
    with mock.patch.object(
            fa, "fused_rope_cross_attention",
            lambda q, k, v, cos, sin, nh_, sc, g: real(
                q, k, v, cos, sin, nh_, sc, g, True)):
        mod_f = CrossAttention(nh, attention_impl="pallas_fused2")
        got = np.asarray(mod_f.apply(params, x, y, y, pos, pos))
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_cross_attention_fused_grad(rng):
    """fused_rope_cross_attention backward matches autodiff through the
    reference path."""
    import math

    from thermal3d.kernels.flash_attention import fused_rope_cross_attention
    from thermal3d.models.rope import apply_rope_2d_bshd, make_grid_positions, rope_tables

    b, h_g, w_g, nh, d = 1, 3, 4, 2, 8
    s, c = h_g * w_g, nh * d
    pos = make_grid_positions(h_g, w_g)
    q = jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)
    cos, sin = rope_tables(pos, d, 100.0)
    scale = 1.0 / math.sqrt(d)

    def loss_fused(q, k, v):
        return jnp.sum(fused_rope_cross_attention(q, k, v, cos, sin, nh,
                                                  scale, 2, True) ** 2)

    def loss_ref(q, k, v):
        qh = apply_rope_2d_bshd(q.reshape(b, s, nh, d), pos, 100.0)
        kh = apply_rope_2d_bshd(k.reshape(b, s, nh, d), pos, 100.0)
        out = flash_attention(qh.transpose(0, 2, 1, 3), kh.transpose(0, 2, 1, 3),
                              v.reshape(b, s, nh, d).transpose(0, 2, 1, 3),
                              impl="xla")
        return jnp.sum(out ** 2)

    g = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-3,
                                   rtol=1e-3)


def test_fused_bwd_bf16_storage_close_to_f32(rng):
    """In bf16 networks the shared backward core stores the S² intermediates
    in bf16 (halving backward HBM at S=1024); grads must stay within bf16
    rounding of the full-f32 closed form, for both the packed self-attn and
    the separate-q/k/v cross-attn VJPs (the latter no longer concatenates
    its residuals — ADVICE round-2 item)."""
    import math

    from thermal3d.kernels.flash_attention import (
        fused_rope_attention,
        fused_rope_cross_attention,
    )
    from thermal3d.models.rope import make_grid_positions, rope_tables

    b, h_g, w_g, nh, d = 1, 4, 4, 2, 8
    s, c = h_g * w_g, nh * d
    pos = make_grid_positions(h_g, w_g)
    cos, sin = rope_tables(pos, d, 100.0)
    scale = 1.0 / math.sqrt(d)

    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * c)), jnp.float32)

    def loss_self(x):
        return jnp.sum(fused_rope_attention(x, cos, sin, nh, scale, 2, True) ** 2)

    g32 = np.asarray(jax.grad(loss_self)(qkv), np.float32)
    g16 = np.asarray(jax.grad(loss_self)(qkv.astype(jnp.bfloat16)), np.float32)
    np.testing.assert_allclose(g16, g32, atol=0.15, rtol=0.1)

    q, k, v = (jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)
               for _ in range(3))

    def loss_x(q, k, v):
        return jnp.sum(fused_rope_cross_attention(q, k, v, cos, sin, nh,
                                                  scale, 2, True) ** 2)

    gx32 = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    gx16 = jax.grad(loss_x, argnums=(0, 1, 2))(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16))
    for a, b_ in zip(gx16, gx32):
        assert a.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   atol=0.15, rtol=0.1)


def test_fused_auto_dispatch_policy():
    """'auto' routes to the fused kernel exactly where it measured faster
    (TPU, S >= 512, lane-aligned head group — docs/PERF.md shootout)."""
    import sys
    from unittest import mock

    import thermal3d.kernels.flash_attention  # noqa: F401

    fa = sys.modules["thermal3d.kernels.flash_attention"]
    # measured-best head groups at production shapes (v5e)
    assert fa.fused_auto_group(16, 64, cross=False) == 4
    assert fa.fused_auto_group(16, 64, cross=True) == 8
    assert fa.fused_auto_group(12, 64, cross=False) == 2
    assert fa.fused_auto_group(12, 64, cross=True) == 2
    assert fa.fused_auto_group(2, 16, cross=False) == 0  # 2*16 < 128 lanes

    with mock.patch.object(fa, "_auto_platform", lambda: "tpu"):
        assert fa.use_fused_attention(1024, 16, 64)
        assert fa.use_fused_attention(1024, 12, 64, cross=True)
        assert not fa.use_fused_attention(196, 16, 64)  # XLA wins at S=196
        assert not fa.use_fused_attention(1024, 2, 16)  # unalignable heads
    with mock.patch.object(fa, "_auto_platform", lambda: "cpu"):
        assert not fa.use_fused_attention(1024, 16, 64)


def test_attention_module_auto_fused_equivalence(rng):
    """On a (mocked) TPU at S=1024 the 'auto' Attention module takes the
    fused kernel and matches the XLA path numerically."""
    import sys
    from unittest import mock

    import thermal3d.kernels.flash_attention  # noqa: F401
    import thermal3d.models.layers as layers_mod
    from thermal3d.models.layers import Attention
    from thermal3d.models.rope import make_grid_positions

    fa = sys.modules["thermal3d.kernels.flash_attention"]
    b, h_g, w_g, nh, d = 1, 32, 32, 2, 64
    s, c = h_g * w_g, nh * d
    pos = make_grid_positions(h_g, w_g)
    x = jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)

    mod = Attention(nh, attention_impl="xla")
    params = mod.init(jax.random.key(0), x, pos)
    want = np.asarray(mod.apply(params, x, pos))

    real = fa.fused_rope_attention
    with mock.patch.object(layers_mod, "use_fused_attention",
                           lambda *a, **k: True), \
         mock.patch.object(fa, "fused_rope_attention",
                           lambda qkv, cos, sin, nh_, sc, g: real(
                               qkv, cos, sin, nh_, sc, g, True)):
        mod_auto = Attention(nh, attention_impl="auto")
        got = np.asarray(mod_auto.apply(params, x, pos))
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_cross_attention_fused_batch_block(rng):
    """Batch-blocked cross-attention kernel matches the XLA path."""
    import math

    from thermal3d.kernels.flash_attention import (attention_bshd,
                                                   fused_rope_cross_attention)
    from thermal3d.models.rope import (apply_rope_2d_bshd,
                                       make_grid_positions, rope_tables)

    b, h_g, w_g, nh, d = 4, 3, 4, 2, 8
    s, c = h_g * w_g, nh * d
    pos = make_grid_positions(h_g, w_g)
    qp = jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)
    kp = jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)
    cos, sin = rope_tables(pos, d, 100.0)

    q = apply_rope_2d_bshd(qp.reshape(b, s, nh, d), pos)
    k = apply_rope_2d_bshd(kp.reshape(b, s, nh, d), pos)
    want = np.asarray(attention_bshd(q, k, vp.reshape(b, s, nh, d),
                                     impl="xla").reshape(b, s, c))
    for bb in (1, 2, 4):
        got = np.asarray(fused_rope_cross_attention(
            qp, kp, vp, cos, sin, nh, 1.0 / math.sqrt(d), 2, True, bb))
        np.testing.assert_allclose(got, want, atol=5e-3)
