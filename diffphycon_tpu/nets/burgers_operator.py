"""1D Burgers latent surrogate operator.

Equivalent of /root/reference/model/pde_1d_surrogate_model: encoder/decoder
pairs for the force (``NetF``) and state (``NetU``) plus a latent transition
(``NetTrans``); ``SurrogateOperator.simulate`` steps u forward one control
frame (burgers_operator.py:120-158, scripts/models.py:5-160). Used by the
PID/SL/SAC baselines and by partial-observation guidance.

Channels-last: fields are (B, Nx, 1). RESCALER = 6.4519
(burgers_operator.py:27).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

RESCALER = 6.4519


def _upsample_linear_1d(x: jax.Array) -> jax.Array:
    """torch nn.Upsample(scale=2, mode='linear', align_corners=True) on
    (B, N, C)."""
    b, n, c = x.shape
    # align_corners: output positions map to input positions i*(n-1)/(2n-1)
    pos = jnp.arange(2 * n) * (n - 1) / (2 * n - 1)
    i0 = jnp.floor(pos).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, n - 1)
    w = (pos - i0)[None, :, None]
    return x[:, i0, :] * (1 - w) + x[:, i1, :] * w


class _Coder(nn.Module):
    """Shared encoder/decoder stack (reference Net_f_ELU / Net_u_ELU,
    models.py:42-77,116-151)."""

    h: int  # full resolution
    act: str = "elu"
    dtype: Any = jnp.float32

    def _a(self, x):
        return nn.elu(x) if self.act == "elu" else jnp.tanh(x)

    @nn.compact
    def encode(self, f):
        # f: (B, Nx, 1)
        h4 = self.h // 4
        x = self._a(nn.Conv(8, (5,), padding=2, name="down0")(f))
        x = self._a(nn.Conv(16, (5,), strides=2, padding=2, name="down1")(x))
        x = self._a(nn.Conv(32, (5,), strides=2, padding=2, name="down2")(x))
        x = self._a(nn.Conv(8, (5,), padding=2, name="down3")(x))
        # torch flattens (B, 8, h4) channel-major; our layout is (B, h4, 8)
        x = jnp.transpose(x, (0, 2, 1)).reshape(x.shape[0], 8 * h4)
        return nn.Dense(8 * h4, name="down_fc")(x)

    @nn.compact
    def decode(self, latent):
        # latent: (B, 8*h4) in torch channel-major order
        h4 = self.h // 4
        x = latent.reshape(-1, 8, h4)
        x = jnp.transpose(x, (0, 2, 1))  # (B, h4, 8)
        x = self._a(nn.Conv(64, (5,), padding=2, name="up0")(x))
        x = self._a(nn.Conv(32, (5,), padding=2, name="up1")(x))
        x = _upsample_linear_1d(x)
        x = self._a(nn.Conv(16, (5,), padding=2, name="up2")(x))
        x = _upsample_linear_1d(x)
        return nn.Conv(1, (5,), padding=2, name="up3")(x)

    def __call__(self, f):
        latent = self.encode(f)
        rec = self.decode(latent)
        return rec, latent


class NetF(_Coder):
    pass


class NetU(_Coder):
    pass


class NetTrans(nn.Module):
    """Latent transition: Conv1d(16 -> 8, k3) over the latent viewed as
    (B, 16, h/4) channel-major (reference Net_trans, models.py:153-160)."""

    h: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, latent_cat):
        # latent_cat: (B, 16, h4) channel-major (u latent stacked on f latent)
        x = jnp.transpose(latent_cat, (0, 2, 1))  # (B, h4, 16)
        x = nn.Conv(8, (3,), padding=1, name="transition1")(x)
        return jnp.transpose(x, (0, 2, 1))  # (B, 8, h4)


class SurrogateOperator:
    """u_{t+1} = decode_u(trans(cat(enc_u(u_t), enc_f(f_t))))
    (reference Simu_surrogate_model.simulation, burgers_operator.py:139-158).
    """

    def __init__(self, s: int = 128, s_ob: int = 128):
        self.s, self.s_ob = s, s_ob
        self.net_f = NetF(h=s)
        self.net_u = NetU(h=s_ob)
        self.net_trans = NetTrans(h=s_ob)

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        pf = self.net_f.init(k1, jnp.zeros((1, self.s, 1)))
        pu = self.net_u.init(k2, jnp.zeros((1, self.s_ob, 1)))
        pt = self.net_trans.init(k3, jnp.zeros((1, 16, self.s_ob // 4)))
        return {"f": pf, "u": pu, "trans": pt}

    def simulate(self, params, ut, ft):
        """ut: (B, Nx); ft: (B, Nx) unscaled -> u_{t+1} (B, Nx)."""
        h4 = self.s_ob // 4
        u = (ut / RESCALER)[..., None]
        f = (ft / RESCALER)[..., None]
        _, f_lat = self.net_f.apply(params["f"], f)
        _, u_lat = self.net_u.apply(params["u"], u)
        if u_lat.shape[-1] < f_lat.shape[-1]:
            f_lat = f_lat[:, : u_lat.shape[-1]] + f_lat[:, u_lat.shape[-1] :]
        cat = jnp.concatenate(
            [u_lat.reshape(-1, 8, h4), f_lat.reshape(-1, 8, h4)], axis=1)
        next_lat = self.net_trans.apply(params["trans"], cat)
        u_next = self.net_u.apply(
            params["u"], next_lat.reshape(-1, 8 * h4),
            method=NetU.decode)
        return u_next[..., 0] * RESCALER

    def rollout(self, params, u0, f_seq):
        """u0: (B, Nx); f_seq: (B, Nt, Nx) -> (B, Nt+1, Nx)."""

        def body(u, f_t):
            u_next = self.simulate(params, u, f_t)
            return u_next, u_next

        _, us = jax.lax.scan(body, u0, jnp.swapaxes(f_seq, 0, 1))
        return jnp.concatenate([u0[:, None], jnp.swapaxes(us, 0, 1)], axis=1)
