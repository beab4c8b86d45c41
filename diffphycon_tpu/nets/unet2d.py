"""UNet2D denoiser for the Burgers benchmark (time x space treated as an
image), channels-last.

Architecture parity with the reference ``Unet2D``
(/root/reference/model/burgers_1d/unet.py:268-431): init 7x7 conv; per
resolution two FiLM ResnetBlocks + residual pre-norm linear attention +
downsample (space-to-depth, last level a 3x3 conv); full attention at the
bottleneck; symmetric up path with skip concatenation; final ResnetBlock over
the concatenated init features; 1x1 output conv.

Input is (B, T, X, C) — e.g. (B, 16, 128, 2) for stacked (u, f) Burgers
trajectories — rather than the reference's (B, C, T, X).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffphycon_tpu.nets.blocks import (
    AttentionBlock,
    Downsample,
    LinearAttentionBlock,
    ResnetBlock,
    TimeMLP,
    Upsample,
)


class UNet2D(nn.Module):
    dim: int = 64
    out_dim: Optional[int] = None
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 2
    resnet_block_groups: int = 1
    attn_dim_head: int = 32
    attn_heads: int = 4
    sinusoidal_pos_emb_theta: float = 10000.0
    self_condition: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        time: jax.Array,
        x_self_cond: Optional[jax.Array] = None,
    ) -> jax.Array:
        assert x.ndim == 4, "expected (B, T, X, C)"
        if self.self_condition:
            if x_self_cond is None:
                x_self_cond = jnp.zeros_like(x)
            x = jnp.concatenate([x_self_cond, x], axis=-1)

        dims = [self.dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        groups = self.resnet_block_groups
        dt = self.dtype

        t = TimeMLP(self.dim, self.dim * 4, self.sinusoidal_pos_emb_theta,
                    dtype=dt, name="time_mlp")(time)

        x = nn.Conv(self.dim, (7, 7), padding=3, dtype=dt, name="init_conv")(x)
        r = x

        h = []
        num_res = len(in_out)
        for i, (dim_in, dim_out) in enumerate(in_out):
            is_last = i >= num_res - 1
            x = ResnetBlock(dim_in, groups, dt, name=f"down_{i}_block1")(x, t)
            h.append(x)
            x = ResnetBlock(dim_in, groups, dt, name=f"down_{i}_block2")(x, t)
            x = LinearAttentionBlock(dim_in, self.attn_heads,
                                     self.attn_dim_head, dtype=dt,
                                     name=f"down_{i}_attn")(x)
            h.append(x)
            if not is_last:
                x = Downsample(dim_out, dtype=dt, name=f"down_{i}_downsample")(x)
            else:
                x = nn.Conv(dim_out, (3, 3), padding=1, dtype=dt,
                            name=f"down_{i}_downsample")(x)

        mid_dim = dims[-1]
        x = ResnetBlock(mid_dim, groups, dt, name="mid_block1")(x, t)
        x = AttentionBlock(mid_dim, self.attn_heads, self.attn_dim_head,
                           dtype=dt, name="mid_attn")(x)
        x = ResnetBlock(mid_dim, groups, dt, name="mid_block2")(x, t)

        for i, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = i == num_res - 1
            x = jnp.concatenate([x, h.pop()], axis=-1)
            x = ResnetBlock(dim_out, groups, dt, name=f"up_{i}_block1")(x, t)
            x = jnp.concatenate([x, h.pop()], axis=-1)
            x = ResnetBlock(dim_out, groups, dt, name=f"up_{i}_block2")(x, t)
            x = LinearAttentionBlock(dim_out, self.attn_heads,
                                     self.attn_dim_head, dtype=dt,
                                     name=f"up_{i}_attn")(x)
            if not is_last:
                x = Upsample(dim_in, dtype=dt, name=f"up_{i}_upsample")(x)
            else:
                x = nn.Conv(dim_in, (3, 3), padding=1, dtype=dt,
                            name=f"up_{i}_upsample")(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = ResnetBlock(self.dim, groups, dt, name="final_res_block")(x, t)
        out_dim = self.out_dim if self.out_dim is not None else self.channels
        return nn.Conv(out_dim, (1, 1), dtype=dt, name="final_conv")(x)
