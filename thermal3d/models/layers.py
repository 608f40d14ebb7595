"""Transformer layers for the DUSt3R/MASt3R family (Flax).

Re-implements the croco/dust3r block zoo TPU-first: pre-norm ViT blocks with
RoPE'd self-attention for the encoder, and decoder blocks adding RoPE'd
cross-attention to the other view's tokens. Attention dispatch ('auto', all
measured on v5e — docs/PERF.md): at DUSt3R-224's S=196, XLA fused attention
with bf16 score materialization (beats every Pallas variant there); at
MASt3R-512's S=1024 (and any S ≥ 512 on TPU), the fused RoPE+attention
Pallas kernel, which applies RoPE in VMEM over the packed qkv projection
output and never round-trips scores to HBM (1.2-2.7× over XLA+rope).

Parameter names deliberately mirror the PyTorch checkpoint key layout
(`attn.qkv`, `attn.proj`, `cross_attn.projq/projk/projv/proj`, `norm1..3`,
`norm_y`, `mlp.fc1/fc2` — evidenced by /root/reference/scripts/model_info.py:
209,228-261) so the converter is a mechanical transpose.
"""

from __future__ import annotations



import flax.linen as nn
import jax.numpy as jnp

from thermal3d.kernels.flash_attention import (attention_bshd,
                                               fused_auto_group,
                                               use_fused_attention)
from thermal3d.models.rope import apply_rope_2d_bshd


class QuantDense(nn.Module):
    """Drop-in nn.Dense for the transformer trunk that runs the int8 MXU
    path when the serving-time transform (kernels/quant.py) installed int8
    kernels plus a 'quant' variable collection; otherwise numerically
    identical to nn.Dense (same param names/init, so checkpoints, the
    converter, and training are untouched)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.is_mutable_collection("calib"):
            # calibration pass (float forward with mutable=['calib']):
            # record this GEMM's input absmax over the sample batch — the
            # static activation scale for int8 serving (kernels/quant.py
            # act_scales; max-reduced across calls)
            self.sow("calib", "act_absmax",
                     jnp.max(jnp.abs(x)).astype(jnp.float32),
                     init_fn=lambda: jnp.zeros((), jnp.float32),
                     reduce_fn=jnp.maximum)
        if self.has_variable("quant", "kernel_scale"):
            from thermal3d.kernels.quant import int8_dense

            ws = self.get_variable("quant", "kernel_scale")
            act = (self.get_variable("quant", "act_scale")
                   if self.has_variable("quant", "act_scale") else None)
            y = int8_dense(x, kernel, ws, self.dtype, act_scale=act)
        else:
            if kernel.dtype == jnp.int8:
                raise ValueError(
                    "int8-quantized kernel applied without its 'quant' scale "
                    "collection — pass the quantize_params_int8 output as "
                    "apply({'params': pq, 'quant': scales}, ...); quantized "
                    "params are serving-only and cannot be trained")
            y = x.astype(self.dtype) @ kernel.astype(self.dtype)
        return y + bias.astype(self.dtype)


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = QuantDense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        # torch nn.GELU (the reference model's activation) is the exact erf
        # form, which XLA lowers to an expensive erfc + sign-branch bitmask
        # inside every MLP fusion. The tanh approximation's error (~3e-4) is
        # below bf16 quantization (~8e-3 at |x|≈1), so use it whenever the
        # compute dtype is bf16; keep exact erf in f32 for checkpoint parity.
        x = nn.gelu(x, approximate=self.dtype == jnp.bfloat16)
        x = QuantDense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        return x


class Attention(nn.Module):
    """Self-attention with packed qkv projection and 2-D RoPE on q/k."""

    num_heads: int
    rope_base: float = 100.0
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, x, pos):
        b, s, c = x.shape
        hd = c // self.num_heads
        qkv = QuantDense(3 * c, dtype=self.dtype, name="qkv")(x)
        impl = self.attention_impl
        if impl == "auto" and use_fused_attention(s, self.num_heads, hd):
            # measured: fused kernel wins at S≥512 on TPU (docs/PERF.md)
            impl = f"pallas_fused{fused_auto_group(self.num_heads, hd, False)}"
        if impl.startswith("pallas_fused"):
            # RoPE + attention fused in one Pallas kernel over the packed
            # [B,S,3C] projection output — no head-split reshape, no HBM
            # score round-trips, RoPE applied in VMEM from tables.
            import math

            from thermal3d.kernels.flash_attention import fused_rope_attention
            from thermal3d.models.rope import rope_tables

            g = int(impl[len("pallas_fused"):] or 4)
            cos, sin = rope_tables(pos, hd, self.rope_base)
            out = fused_rope_attention(qkv, cos, sin, self.num_heads,
                                       1.0 / math.sqrt(hd), g)
            return QuantDense(c, dtype=self.dtype, name="proj")(out)
        # Split the packed projection along the LAST axis (contiguous slices
        # XLA fuses into the RoPE/attention consumers) instead of a
        # reshape(b,s,3,h,hd)+index, whose intermediate layout materialized
        # as pure copy time in profiles (docs/PERF.md round 3).
        # transpose-free [B, S, H, hd] layout end-to-end
        q = qkv[..., :c].reshape(b, s, self.num_heads, hd)
        k = qkv[..., c:2 * c].reshape(b, s, self.num_heads, hd)
        v = qkv[..., 2 * c:].reshape(b, s, self.num_heads, hd)
        q = apply_rope_2d_bshd(q, pos, self.rope_base)
        k = apply_rope_2d_bshd(k, pos, self.rope_base)
        out = attention_bshd(q, k, v, impl=impl)
        return QuantDense(c, dtype=self.dtype, name="proj")(out.reshape(b, s, c))


class CrossAttention(nn.Module):
    """Cross-attention: queries from x, keys/values from y, RoPE'd per view."""

    num_heads: int
    rope_base: float = 100.0
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, x, key, value, xpos, ypos=None):
        """ypos=None declares the views SHARE xpos's grid (DUSt3R's dual
        decoder) — a static signal that survives nn.remat re-tracing, where
        an `xpos is ypos` identity check on tracers would not."""
        b, sq, c = x.shape
        sk = key.shape[1]
        hd = c // self.num_heads

        qp = QuantDense(c, dtype=self.dtype, name="projq")(x)
        kp = QuantDense(c, dtype=self.dtype, name="projk")(key)
        vp = QuantDense(c, dtype=self.dtype, name="projv")(value)

        impl = self.attention_impl
        fusable = sq == sk and (ypos is None or xpos is ypos)
        if ypos is None:
            ypos = xpos
        if (impl == "auto" and fusable
                and use_fused_attention(sk, self.num_heads, hd, cross=True)):
            impl = f"pallas_fused{fused_auto_group(self.num_heads, hd, True)}"
        if impl.startswith("pallas_fused") and fusable:
            import math

            from thermal3d.kernels.flash_attention import fused_rope_cross_attention
            from thermal3d.models.rope import rope_tables

            g = int(impl[len("pallas_fused"):] or 4)
            # DUSt3R's dual decoder shares one patch grid: xpos == ypos, so
            # one table pair serves both sides (asserted structurally by the
            # kernel's single cos/sin input)
            cos, sin = rope_tables(xpos, hd, self.rope_base)
            out = fused_rope_cross_attention(qp, kp, vp, cos, sin,
                                             self.num_heads,
                                             1.0 / math.sqrt(hd), g)
            return QuantDense(c, dtype=self.dtype, name="proj")(out)

        def heads(t, s):
            return t.reshape(b, s, self.num_heads, hd)  # [B, S, H, hd]

        q = apply_rope_2d_bshd(heads(qp, sq), xpos, self.rope_base)
        k = apply_rope_2d_bshd(heads(kp, sk), ypos, self.rope_base)
        out = attention_bshd(q, k, heads(vp, sk), impl=impl)
        return QuantDense(c, dtype=self.dtype, name="proj")(out.reshape(b, sq, c))


class EncoderBlock(nn.Module):
    """Pre-norm ViT block: x += attn(norm1(x)); x += mlp(norm2(x))."""

    num_heads: int
    mlp_ratio: float = 4.0
    rope_base: float = 100.0
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, x, pos):
        c = x.shape[-1]
        x = x + Attention(
            self.num_heads, self.rope_base, self.dtype, self.attention_impl, name="attn"
        )(nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x), pos)
        x = x + Mlp(int(c * self.mlp_ratio), c, self.dtype, name="mlp")(
            nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        )
        return x


class DecoderBlock(nn.Module):
    """Croco decoder block: self-attn, cross-attn to the other view, MLP.

    Forward contract (croco blocks.DecoderBlock):
        x = x + attn(norm1(x), xpos)
        y_ = norm_y(y)
        x = x + cross_attn(norm2(x), y_, y_, xpos, ypos)
        x = x + mlp(norm3(x))
    """

    num_heads: int
    mlp_ratio: float = 4.0
    rope_base: float = 100.0
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, x, y, xpos, ypos=None):
        """ypos=None means both views share xpos's patch grid (see
        CrossAttention — keeps the fused-kernel dispatch remat-safe)."""
        c = x.shape[-1]
        x = x + Attention(
            self.num_heads, self.rope_base, self.dtype, self.attention_impl, name="attn"
        )(nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x), xpos)
        y_ = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm_y")(y)
        x = x + CrossAttention(
            self.num_heads, self.rope_base, self.dtype, self.attention_impl, name="cross_attn"
        )(nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x), y_, y_, xpos, ypos)
        x = x + Mlp(int(c * self.mlp_ratio), c, self.dtype, name="mlp")(
            nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm3")(x)
        )
        return x


class PatchEmbed(nn.Module):
    """16×16 conv patchifier → [B, S, C] tokens (croco PatchEmbedDust3R)."""

    patch_size: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img):
        # img: [B, H, W, 3] (NHWC — TPU-native layout)
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="proj",
        )(img)
        b, h, w, c = x.shape
        return x.reshape(b, h * w, c), (h, w)
