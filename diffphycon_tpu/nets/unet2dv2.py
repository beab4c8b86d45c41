"""Image U-Net variant used by the smoke/jellyfish auxiliary models,
channels-last.

Parity with the reference 2D ``Unet`` embedded in
/root/reference/diffusion/diffusion_2d_jellyfish.py:276-403 (same class in
diffusion_2d_smoke.py:277-404); differs from the Burgers UNet2D in:
weight-standardized convs in the resnet blocks (:107-120), linear attention
dividing v by the token count (:244), resnet_block_groups default 8.

Also provides ``ForceUNet`` — the encoder-only thrust-force surrogate
(diffusion_2d_jellyfish.py:406-481) used for jellyfish guidance: U-Net down
path + mid blocks + spatial mean-pool + linear head.

The "time" input doubles as the theta-delta conditioning when the net is used
as the jellyfish boundary updater / neural simulator
(inference/sim_ppl_2d.py:20-107).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffphycon_tpu.nets.blocks import (
    Attention,
    ChanLayerNorm,
    Downsample,
    TimeMLP,
    Upsample,
)

Dtype = Any


class WSConv(nn.Module):
    """Weight-standardized 3x3 conv (reference WeightStandardizedConv2d,
    diffusion_2d_jellyfish.py:107-120)."""

    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, in_dim, self.dim_out))
        bias = self.param("bias", nn.initializers.zeros, (self.dim_out,))
        eps = 1e-5 if x.dtype == jnp.float32 else 1e-3
        # standardize per output channel over (kh, kw, in)
        mean = kernel.mean(axis=(0, 1, 2), keepdims=True)
        var = kernel.var(axis=(0, 1, 2), keepdims=True)
        w = (kernel - mean) * jax.lax.rsqrt(var + eps)
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype), (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias


class WSBlock(nn.Module):
    """WSConv -> GroupNorm -> FiLM -> SiLU (reference Block, :178-194)."""

    dim_out: int
    groups: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale_shift=None):
        x = WSConv(self.dim_out, self.dtype, name="proj")(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         dtype=self.dtype, name="norm")(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        return nn.silu(x)


class WSResnetBlock(nn.Module):
    """(reference ResnetBlock, :196-220)."""

    dim_out: int
    groups: int = 8
    use_time: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_emb=None):
        scale_shift = None
        if self.use_time and time_emb is not None:
            h_t = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="mlp")(
                nn.silu(time_emb))
            scale_shift = jnp.split(h_t[:, None, None, :], 2, axis=-1)
        h = WSBlock(self.dim_out, self.groups, self.dtype, name="block1")(
            x, scale_shift)
        h = WSBlock(self.dim_out, self.groups, self.dtype, name="block2")(h)
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype,
                        name="res_conv")(x)
        return h + x


class LinearAttentionV2(nn.Module):
    """Linear attention with v scaled by 1/(h*w) (reference :222-250)."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h_sp, w_sp, _ = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False, dtype=self.dtype,
                      name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_first(t):
            t = t.reshape(b, h_sp * w_sp, self.heads, self.dim_head)
            return jnp.transpose(t, (0, 2, 3, 1))

        q, k, v = map(heads_first, (q, k, v))
        q = jax.nn.softmax(q, axis=-2)
        k = jax.nn.softmax(k, axis=-1)
        q = q * self.dim_head**-0.5
        v = v / (h_sp * w_sp)
        context = jnp.einsum("bhdn,bhen->bhde", k, v)
        out = jnp.einsum("bhde,bhdn->bhen", context, q)
        out = jnp.transpose(out, (0, 3, 1, 2)).reshape(b, h_sp, w_sp, hidden)
        out = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="to_out")(out)
        return ChanLayerNorm(self.dim, dtype=self.dtype, name="out_norm")(out)


class UNet2Dv2(nn.Module):
    """(reference Unet, diffusion_2d_jellyfish.py:276-403). Input (B,H,W,C);
    ``time`` may be a diffusion time or a theta-delta (B,)."""

    dim: int = 64
    out_dim: Optional[int] = None
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 3
    resnet_block_groups: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, time):
        dt = self.dtype
        groups = self.resnet_block_groups
        t = TimeMLP(self.dim, self.dim * 4, dtype=dt, name="time_mlp")(time)
        x = nn.Conv(self.dim, (7, 7), padding=3, dtype=dt, name="init_conv")(x)
        r = x

        dims = [self.dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_res = len(in_out)
        h = []
        for i, (dim_in, dim_out) in enumerate(in_out):
            is_last = i >= num_res - 1
            x = WSResnetBlock(dim_in, groups, True, dt,
                              name=f"down_{i}_block1")(x, t)
            h.append(x)
            x = WSResnetBlock(dim_in, groups, True, dt,
                              name=f"down_{i}_block2")(x, t)
            hn = ChanLayerNorm(dim_in, dtype=dt, name=f"down_{i}_attn_norm")(x)
            x = x + LinearAttentionV2(dim_in, dtype=dt,
                                      name=f"down_{i}_attn")(hn)
            h.append(x)
            if not is_last:
                x = Downsample(dim_out, dtype=dt, name=f"down_{i}_downsample")(x)
            else:
                x = nn.Conv(dim_out, (3, 3), padding=1, dtype=dt,
                            name=f"down_{i}_downsample")(x)

        mid = dims[-1]
        x = WSResnetBlock(mid, groups, True, dt, name="mid_block1")(x, t)
        hn = ChanLayerNorm(mid, dtype=dt, name="mid_attn_norm")(x)
        x = x + Attention(mid, dtype=dt, name="mid_attn")(hn)
        x = WSResnetBlock(mid, groups, True, dt, name="mid_block2")(x, t)

        for i, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = i == num_res - 1
            x = jnp.concatenate([x, h.pop()], axis=-1)
            x = WSResnetBlock(dim_out, groups, True, dt,
                              name=f"up_{i}_block1")(x, t)
            x = jnp.concatenate([x, h.pop()], axis=-1)
            x = WSResnetBlock(dim_out, groups, True, dt,
                              name=f"up_{i}_block2")(x, t)
            hn = ChanLayerNorm(dim_out, dtype=dt, name=f"up_{i}_attn_norm")(x)
            x = x + LinearAttentionV2(dim_out, dtype=dt,
                                      name=f"up_{i}_attn")(hn)
            if not is_last:
                x = Upsample(dim_in, dtype=dt, name=f"up_{i}_upsample")(x)
            else:
                x = nn.Conv(dim_in, (3, 3), padding=1, dtype=dt,
                            name=f"up_{i}_upsample")(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = WSResnetBlock(self.dim, groups, True, dt,
                          name="final_res_block")(x, t)
        out_dim = self.out_dim if self.out_dim is not None else self.channels
        return nn.Conv(out_dim, (1, 1), dtype=dt, name="final_conv")(x)


class ForceUNet(nn.Module):
    """Encoder-only force readout (reference ForceUnet,
    diffusion_2d_jellyfish.py:406-481): downs + mid attention + mean pool +
    Dense head. Input (B, H, W, C) -> (B, out_dim)."""

    dim: int = 64
    out_dim: int = 1
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 4
    resnet_block_groups: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        groups = self.resnet_block_groups
        x = nn.Conv(self.dim, (7, 7), padding=3, dtype=dt, name="init_conv")(x)
        dims = [self.dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_res = len(in_out)
        for i, (dim_in, dim_out) in enumerate(in_out):
            is_last = i >= num_res - 1
            x = WSResnetBlock(dim_in, groups, False, dt,
                              name=f"down_{i}_block1")(x)
            x = WSResnetBlock(dim_in, groups, False, dt,
                              name=f"down_{i}_block2")(x)
            hn = ChanLayerNorm(dim_in, dtype=dt, name=f"down_{i}_attn_norm")(x)
            x = x + LinearAttentionV2(dim_in, dtype=dt,
                                      name=f"down_{i}_attn")(hn)
            if not is_last:
                x = Downsample(dim_out, dtype=dt, name=f"down_{i}_downsample")(x)
            else:
                x = nn.Conv(dim_out, (3, 3), padding=1, dtype=dt,
                            name=f"down_{i}_downsample")(x)
        mid = dims[-1]
        x = WSResnetBlock(mid, groups, False, dt, name="mid_block1")(x)
        hn = ChanLayerNorm(mid, dtype=dt, name="mid_attn_norm")(x)
        x = x + Attention(mid, dtype=dt, name="mid_attn")(hn)
        x = WSResnetBlock(mid, groups, False, dt, name="mid_block2")(x)
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.out_dim, dtype=dt, name="final")(x)
