"""Shared neural-net building blocks (Flax linen, channels-last / NHWC).

Functionally equivalent to the reference blocks in
/root/reference/model/burgers_1d/unet.py:23-264, re-expressed for TPU:
channels-last layouts (XLA-native conv layout), einsum attention that maps
onto the MXU, and optional bfloat16 compute with float32 parameters.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def sinusoidal_pos_emb(t: jax.Array, dim: int, theta: float = 10000.0) -> jax.Array:
    """Sinusoidal diffusion-time embedding (reference unet.py:87-113, even dim).

    t: (B,) float or int times -> (B, dim).
    """
    half = dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-math.log(theta) / (half - 1))
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class TimeMLP(nn.Module):
    """sinusoidal -> Dense -> GELU -> Dense (reference unet.py:315-320)."""

    dim: int
    time_dim: int
    theta: float = 10000.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        emb = sinusoidal_pos_emb(t, self.dim, self.theta)
        emb = nn.Dense(self.time_dim, dtype=self.dtype, name="fc1")(emb)
        emb = nn.gelu(emb, approximate=False)
        emb = nn.Dense(self.time_dim, dtype=self.dtype, name="fc2")(emb)
        return emb


class ChanLayerNorm(nn.Module):
    """Channel LayerNorm with learned gain, no bias, biased variance
    (reference unet.py:60-70). Operates on the last (channel) axis."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        eps = 1e-5 if x.dtype == jnp.float32 else 1e-3
        g = self.param("g", nn.initializers.ones, (self.dim,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + eps) * g


class Block(nn.Module):
    """Conv3x3 -> GroupNorm -> (scale, shift) -> SiLU (reference unet.py:134-153)."""

    dim_out: int
    groups: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, scale_shift=None) -> jax.Array:
        x = nn.Conv(self.dim_out, (3, 3), padding=1, dtype=self.dtype, name="proj")(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, dtype=self.dtype,
                         name="norm")(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        return nn.silu(x)


class ResnetBlock(nn.Module):
    """Two Blocks with FiLM time conditioning + residual 1x1 conv
    (reference unet.py:155-186)."""

    dim_out: int
    groups: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, time_emb: Optional[jax.Array] = None):
        scale_shift = None
        if time_emb is not None:
            h_t = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="mlp")(
                nn.silu(time_emb)
            )
            h_t = h_t[:, None, None, :]  # broadcast over H, W
            scale_shift = jnp.split(h_t, 2, axis=-1)

        h = Block(self.dim_out, self.groups, self.dtype, name="block1")(x, scale_shift)
        h = Block(self.dim_out, self.groups, self.dtype, name="block2")(h)
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype, name="res_conv")(x)
        return h + x


class LinearAttention(nn.Module):
    """Linear attention with channel-softmax q / token-softmax k
    (reference unet.py:188-228), fused as two MXU einsums over tokens."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h_sp, w_sp, _ = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False, dtype=self.dtype,
                      name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        # keep the token-major (b, n, h, d) layout end to end: explicit
        # transposes materialize as layout copies (~19 us each) in the scanned
        # sampler on this runtime; dot_general handles the contraction order
        def to_heads(t):
            return t.reshape(b, h_sp * w_sp, self.heads, self.dim_head)

        q, k, v = map(to_heads, (q, k, v))
        q = jax.nn.softmax(q, axis=-1)  # over channel dim d
        k = jax.nn.softmax(k, axis=1)   # over tokens n
        q = q * self.dim_head**-0.5
        context = jnp.einsum("bnhd,bnhe->bhde", k, v)
        out = jnp.einsum("bhde,bnhd->bnhe", context, q)
        out = out.reshape(b, h_sp, w_sp, hidden)
        out = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="to_out")(out)
        return ChanLayerNorm(self.dim, dtype=self.dtype, name="out_norm")(out)


class Attention(nn.Module):
    """Full softmax attention over all spatial tokens (reference unet.py:230-264)."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h_sp, w_sp, _ = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False, dtype=self.dtype,
                      name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def to_heads(t):  # (b, n, heads, c)
            return t.reshape(b, h_sp * w_sp, self.heads, self.dim_head)

        q, k, v = map(to_heads, (q, k, v))
        q = q * self.dim_head**-0.5
        sim = jnp.einsum("bihd,bjhd->bhij", q, k)
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(sim.dtype)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v)
        out = out.reshape(b, h_sp, w_sp, hidden)
        return nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="to_out")(out)


class LinearAttentionBlock(nn.Module):
    """x + LinearAttention(LayerNorm(x))
    (reference Residual(PreNorm(LinearAttention)), unet.py:345-349)."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = ChanLayerNorm(self.dim, dtype=self.dtype, name="norm")(x)
        h = LinearAttention(self.dim, self.heads, self.dim_head,
                            dtype=self.dtype, name="attn")(h)
        return x + h


class AttentionBlock(nn.Module):
    """x + Attention(LayerNorm(x))
    (reference Residual(PreNorm(Attention)), unet.py:356-360)."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = ChanLayerNorm(self.dim, dtype=self.dtype, name="norm")(x)
        h = Attention(self.dim, self.heads, self.dim_head,
                      dtype=self.dtype, name="attn")(h)
        return x + h


def space_to_depth(x: jax.Array) -> jax.Array:
    """(b, 2h, 2w, c) -> (b, h, w, 4c) with torch (c p1 p2) channel order
    (reference Downsample2d rearrange, unet.py:46-50)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))  # b h w c p1 p2
    return x.reshape(b, h // 2, w // 2, c * 4)


class Downsample(nn.Module):
    """Space-to-depth + 1x1 conv: lossless strided downsample that keeps the
    MXU busy instead of a strided conv (reference unet.py:46-50)."""

    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(self.dim_out, (1, 1), dtype=self.dtype, name="conv")(
            space_to_depth(x)
        )


class Upsample(nn.Module):
    """Nearest 2x upsample + conv3x3 (reference unet.py:40-44)."""

    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
        return nn.Conv(self.dim_out, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")(x)
