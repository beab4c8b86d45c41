"""UNet3D video denoiser for the smoke and jellyfish benchmarks,
channels-last (B, F, H, W, C).

Architecture parity with the reference ``Unet3D_with_Conv3D``
(/root/reference/model/video_diffusion_pytorch/video_diffusion_pytorch_conv3d.py:356-552):
init 7^3 conv + temporal attention; per level two FiLM ResnetBlock3Ds
(first maps dim_in->dim_out), per-frame spatial linear attention, temporal
attention over frames (rotary embeddings + T5 relative position bias),
spatial-only (1,4,4)/(1,2,2) down/upsampling; bottleneck with per-frame full
spatial attention + temporal attention; one skip per level; final ResnetBlock
over concatenated init features.

The temporal attention operates on (B*H*W, F, C) token blocks and the spatial
attentions on (B*F, H*W, C) — both become MXU einsums; the 4096-token spatial
attention is the candidate for a Pallas flash-attention kernel.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from diffphycon_tpu.nets.blocks import TimeMLP

Dtype = Any


# ---------------------------------------------------------------------------
# positional machinery
# ---------------------------------------------------------------------------


def t5_relative_position_buckets(n: int, num_buckets: int = 32,
                                 max_distance: int = 32) -> np.ndarray:
    """T5-style relative position buckets (reference RelativePositionBias,
    video_diffusion_pytorch_conv3d.py:74-112). Returns (n, n) int array."""
    q = np.arange(n)[:, None]
    k = np.arange(n)[None, :]
    rel = k - q
    n_neg = -rel
    nb = num_buckets // 2
    ret = (n_neg < 0).astype(np.int64) * nb
    n_abs = np.abs(n_neg)
    max_exact = nb // 2
    is_small = n_abs < max_exact
    with np.errstate(divide="ignore"):
        val_large = max_exact + (
            np.log(np.maximum(n_abs, 1) / max_exact)
            / math.log(max_distance / max_exact) * (nb - max_exact)
        ).astype(np.int64)
    val_large = np.minimum(val_large, nb - 1)
    ret = ret + np.where(is_small, n_abs, val_large)
    return ret


def rotary_angles(n: int, dim: int) -> np.ndarray:
    """Rotary frequencies x positions, duplicated-interleaved to ``dim``
    (lucidrains rotary_embedding_torch defaults used by the reference :380)."""
    freqs = 1.0 / (10000 ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    ang = np.arange(n)[:, None] * freqs[None, :]  # (n, dim/2)
    return np.repeat(ang, 2, axis=-1)  # (n, dim) interleaved pairs


def _rotate_half(x: jax.Array) -> jax.Array:
    """(x0, x1, x2, x3, ...) -> (-x1, x0, -x3, x2, ...) (interleaved pairs)."""
    x2 = x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    x2 = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1)
    return x2.reshape(x.shape)


def apply_rotary(x: jax.Array, angles: jax.Array) -> jax.Array:
    """x: (..., n, d); angles: (n, d)."""
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    return x * cos + _rotate_half(x) * sin


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------


class ChanLayerNorm3D(nn.Module):
    """LayerNorm over the channel axis with learned gain, eps 1e-5
    (reference LayerNorm, :165-174). Channels-last."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = self.param("gamma", nn.initializers.ones, (self.dim,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * g


class Block3D(nn.Module):
    """Conv3x3x3 -> GroupNorm -> FiLM -> SiLU (reference Block, :189-204)."""

    dim_out: int
    groups: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale_shift=None):
        x = nn.Conv(self.dim_out, (3, 3, 3), padding=1, dtype=self.dtype,
                    name="proj")(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         dtype=self.dtype, name="norm")(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        return nn.silu(x)


class ResnetBlock3D(nn.Module):
    """(reference ResnetBlock, :206-230)."""

    dim_out: int
    groups: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_emb=None):
        scale_shift = None
        if time_emb is not None:
            h_t = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="mlp")(
                nn.silu(time_emb)
            )
            h_t = h_t[:, None, None, None, :]
            scale_shift = jnp.split(h_t, 2, axis=-1)
        h = Block3D(self.dim_out, self.groups, self.dtype, name="block1")(
            x, scale_shift)
        h = Block3D(self.dim_out, self.groups, self.dtype, name="block2")(h)
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1, 1), dtype=self.dtype,
                        name="res_conv")(x)
        return h + x


class SpatialLinearAttention3D(nn.Module):
    """Per-frame linear attention (reference SpatialLinearAttention,
    :232-257): frames fold into the batch."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, f, h_sp, w_sp, _ = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1, 1, 1), use_bias=False, dtype=self.dtype,
                      name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_first(t):  # (b*f, heads, c, n)
            t = t.reshape(b * f, h_sp * w_sp, self.heads, self.dim_head)
            return jnp.transpose(t, (0, 2, 3, 1))

        q, k, v = map(heads_first, (q, k, v))
        q = jax.nn.softmax(q, axis=-2)
        k = jax.nn.softmax(k, axis=-1)
        q = q * self.dim_head**-0.5
        context = jnp.einsum("bhdn,bhen->bhde", k, v)
        out = jnp.einsum("bhde,bhdn->bhen", context, q)
        out = jnp.transpose(out, (0, 3, 1, 2)).reshape(b, f, h_sp, w_sp, hidden)
        return nn.Conv(self.dim, (1, 1, 1), dtype=self.dtype, name="to_out")(out)


class TemporalAttention(nn.Module):
    """Full attention over frames with rotary embedding + relative position
    bias; tokens (B, H*W) x F x C (reference temporal_attn / Attention,
    :276-352,382)."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_bias=None):
        b, f, h_sp, w_sp, c = x.shape
        hidden = self.heads * self.dim_head
        # 'b c f h w -> b (h w) f c'
        tok = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b, h_sp * w_sp, f, c)
        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype,
                       name="to_qkv")(tok)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def to_heads(t):  # (b, hw, heads, f, d)
            t = t.reshape(b, h_sp * w_sp, f, self.heads, self.dim_head)
            return jnp.transpose(t, (0, 1, 3, 2, 4))

        q, k, v = map(to_heads, (q, k, v))
        q = q * self.dim_head**-0.5
        rot_dim = min(32, self.dim_head)
        ang = jnp.asarray(rotary_angles(f, rot_dim), jnp.float32)
        q = apply_rotary(q, ang)
        k = apply_rotary(k, ang)
        sim = jnp.einsum("bshid,bshjd->bshij", q, k)
        if pos_bias is not None:
            sim = sim + pos_bias  # (heads, f, f)
        sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bshij,bshjd->bshid", attn, v)
        out = jnp.transpose(out, (0, 1, 3, 2, 4)).reshape(
            b, h_sp * w_sp, f, hidden)
        out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                       name="to_out")(out)
        return jnp.transpose(
            out.reshape(b, h_sp, w_sp, f, self.dim), (0, 3, 1, 2, 4))


class SpatialFullAttention(nn.Module):
    """Per-frame full attention over H*W tokens (reference mid spatial_attn,
    :449). No rotary, no bias."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, f, h_sp, w_sp, c = x.shape
        hidden = self.heads * self.dim_head
        tok = x.reshape(b, f, h_sp * w_sp, c)
        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype,
                       name="to_qkv")(tok)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def to_heads(t):
            t = t.reshape(b, f, h_sp * w_sp, self.heads, self.dim_head)
            return jnp.transpose(t, (0, 1, 3, 2, 4))

        q, k, v = map(to_heads, (q, k, v))
        q = q * self.dim_head**-0.5
        sim = jnp.einsum("bfhid,bfhjd->bfhij", q, k)
        sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bfhij,bfhjd->bfhid", attn, v)
        out = jnp.transpose(out, (0, 1, 3, 2, 4)).reshape(
            b, f, h_sp * w_sp, hidden)
        out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                       name="to_out")(out)
        return out.reshape(b, f, h_sp, w_sp, self.dim)


class SpatialDownsample(nn.Module):
    """Conv3d (1,4,4) stride (1,2,2) pad (0,1,1) (reference Downsample :162)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.dim, (1, 4, 4), strides=(1, 2, 2),
                       padding=((0, 0), (1, 1), (1, 1)), dtype=self.dtype,
                       name="conv")(x)


class SpatialUpsample(nn.Module):
    """ConvTranspose3d (1,4,4) stride (1,2,2) pad (0,1,1) with torch
    gradient-of-conv semantics (reference Upsample :159-160)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(), in_axis=(4,),
                                         out_axis=(3,)),
            (1, 4, 4, self.dim, in_dim),  # (kd,kh,kw, OUT, IN) torch layout
        )
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        # ConvTranspose(stride s, pad p) == conv of the s-dilated input with
        # the spatially flipped io-swapped kernel, padding k-1-p per dim
        k = jnp.flip(kernel, axis=(0, 1, 2))
        k = jnp.swapaxes(k, -1, -2)  # (kd,kh,kw, IN, OUT)
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            k.astype(self.dtype),
            window_strides=(1, 1, 1),
            padding=((0, 0), (2, 2), (2, 2)),  # (1-1-0, 4-1-1, 4-1-1)
            lhs_dilation=(1, 2, 2),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return out + bias


class UNet3D(nn.Module):
    """Video U-Net (see module docstring). Input (B, F, H, W, C)."""

    dim: int = 64
    out_dim: Optional[int] = None
    dim_mults: Sequence[int] = (1, 2, 4)
    channels: int = 6
    attn_heads: int = 4
    attn_dim_head: int = 32
    init_kernel_size: int = 7
    use_sparse_linear_attn: bool = True
    resnet_groups: int = 8
    remat: bool = True  # rematerialize blocks: the (B, H*W, h, F, F)
    # temporal-attention intermediates otherwise blow past HBM in training
    remat_all: bool = False  # also remat the conv/resnet blocks: needed for
    # full-resolution training batches on small-HBM chips (trades FLOPs for
    # the (B, F, 64, 64, C) activation stash; slower compile)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, time: jax.Array) -> jax.Array:
        assert x.ndim == 5, "expected (B, F, H, W, C)"
        b, f, h_sp, w_sp, _ = x.shape
        dt = self.dtype
        groups = self.resnet_groups
        if self.remat:
            # remat the attentions only: their (B, H*W, h, F, F) / token
            # intermediates dominate HBM; remat-ing the conv blocks too makes
            # XLA compile time explode
            TemporalAttention_ = nn.remat(TemporalAttention)
            SpatialLinearAttention3D_ = nn.remat(SpatialLinearAttention3D)
            SpatialFullAttention_ = nn.remat(SpatialFullAttention)
        else:
            TemporalAttention_ = TemporalAttention
            SpatialLinearAttention3D_ = SpatialLinearAttention3D
            SpatialFullAttention_ = SpatialFullAttention
        if self.remat_all:
            TemporalAttention_ = nn.remat(TemporalAttention)
            SpatialLinearAttention3D_ = nn.remat(SpatialLinearAttention3D)
            SpatialFullAttention_ = nn.remat(SpatialFullAttention)
            ResnetBlock3D_ = nn.remat(ResnetBlock3D)
        else:
            ResnetBlock3D_ = ResnetBlock3D

        buckets = t5_relative_position_buckets(f, 32, 32)
        bias_table = self.param(
            "time_rel_pos_bias", nn.initializers.normal(1.0),
            (32, self.attn_heads),
        )
        pos_bias = jnp.transpose(bias_table[jnp.asarray(buckets)], (2, 0, 1))

        pad = self.init_kernel_size // 2
        x = nn.Conv(self.dim, (self.init_kernel_size,) * 3, padding=pad,
                    dtype=dt, name="init_conv")(x)
        h_norm = ChanLayerNorm3D(self.dim, dt, name="init_attn_norm")(x)
        x = x + TemporalAttention_(self.dim, self.attn_heads,
                                  self.attn_dim_head, dt,
                                  name="init_temporal_attn")(h_norm, pos_bias)
        r = x

        t = TimeMLP(self.dim, self.dim * 4, dtype=dt, name="time_mlp")(time)

        dims = [self.dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_res = len(in_out)

        skips = []
        for i, (dim_in, dim_out) in enumerate(in_out):
            is_last = i >= num_res - 1
            x = ResnetBlock3D_(dim_out, groups, dt, name=f"down_{i}_block1")(x, t)
            x = ResnetBlock3D_(dim_out, groups, dt, name=f"down_{i}_block2")(x, t)
            if self.use_sparse_linear_attn:
                hn = ChanLayerNorm3D(dim_out, dt, name=f"down_{i}_sattn_norm")(x)
                x = x + SpatialLinearAttention3D_(
                    dim_out, self.attn_heads, self.attn_dim_head, dt,
                    name=f"down_{i}_sattn")(hn)
            hn = ChanLayerNorm3D(dim_out, dt, name=f"down_{i}_tattn_norm")(x)
            x = x + TemporalAttention_(dim_out, self.attn_heads,
                                      self.attn_dim_head, dt,
                                      name=f"down_{i}_tattn")(hn, pos_bias)
            skips.append(x)
            if not is_last:
                x = SpatialDownsample(dim_out, dt,
                                      name=f"down_{i}_downsample")(x)

        mid_dim = dims[-1]
        x = ResnetBlock3D_(mid_dim, groups, dt, name="mid_block1")(x, t)
        hn = ChanLayerNorm3D(mid_dim, dt, name="mid_sattn_norm")(x)
        x = x + SpatialFullAttention_(mid_dim, self.attn_heads,
                                     self.attn_dim_head, dt,
                                     name="mid_sattn")(hn)
        hn = ChanLayerNorm3D(mid_dim, dt, name="mid_tattn_norm")(x)
        x = x + TemporalAttention_(mid_dim, self.attn_heads, self.attn_dim_head,
                                  dt, name="mid_tattn")(hn, pos_bias)
        x = ResnetBlock3D_(mid_dim, groups, dt, name="mid_block2")(x, t)

        for i, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = i >= num_res - 1
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock3D_(dim_in, groups, dt, name=f"up_{i}_block1")(x, t)
            x = ResnetBlock3D_(dim_in, groups, dt, name=f"up_{i}_block2")(x, t)
            if self.use_sparse_linear_attn:
                hn = ChanLayerNorm3D(dim_in, dt, name=f"up_{i}_sattn_norm")(x)
                x = x + SpatialLinearAttention3D_(
                    dim_in, self.attn_heads, self.attn_dim_head, dt,
                    name=f"up_{i}_sattn")(hn)
            hn = ChanLayerNorm3D(dim_in, dt, name=f"up_{i}_tattn_norm")(x)
            x = x + TemporalAttention_(dim_in, self.attn_heads,
                                      self.attn_dim_head, dt,
                                      name=f"up_{i}_tattn")(hn, pos_bias)
            if not is_last:
                x = SpatialUpsample(dim_in, dt, name=f"up_{i}_upsample")(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = ResnetBlock3D_(self.dim, groups, dt, name="final_block")(x)
        out_dim = self.out_dim if self.out_dim is not None else self.channels
        return nn.Conv(out_dim, (1, 1, 1), dtype=dt, name="final_conv")(x)
