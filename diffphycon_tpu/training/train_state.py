"""Train state: optimizer, LR schedules, EMA.

Matches the reference training recipe
(/root/reference/diffusion/diffusion_1d_burgers.py:844-1034): Adam(0.9, 0.99)
with torch-style CosineAnnealingLR, global grad-norm clip 1.0, and an EMA of
the model weights with ema_pytorch's warmup schedule (decay .995, update every
10 steps). Smoke/jellyfish use MultiStepLR instead
(diffusion_2d_smoke.py:925-927).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


def torch_cosine_annealing(
    base_lr: float, t_max: int = 10000, eta_min: float = 0.0
) -> optax.Schedule:
    """torch.optim.lr_scheduler.CosineAnnealingLR closed form:
    lr(t) = eta_min + (lr0 - eta_min) * (1 + cos(pi t / T_max)) / 2.
    Like torch, it keeps following the cosine past T_max (oscillates), which
    is what the reference's 100k-step run with T_max=10k actually does
    (diffusion_1d_burgers.py:905)."""

    def schedule(count):
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(math.pi * count / t_max)
        )

    return schedule


def multistep_lr(base_lr: float, milestones, gamma: float = 0.1) -> optax.Schedule:
    """torch MultiStepLR (reference diffusion_2d_smoke.py:925-927)."""
    bounds = {int(m): gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, bounds)


def make_optimizer(
    lr_schedule: optax.Schedule,
    b1: float = 0.9,
    b2: float = 0.99,
    max_grad_norm: float = 1.0,
) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adam(lr_schedule, b1=b1, b2=b2),
    )


@dataclasses.dataclass(frozen=True)
class EMAConfig:
    """ema_pytorch-compatible EMA (reference EMA(beta=.995, update_every=10),
    diffusion_1d_burgers.py:911): before ``update_after_step`` updates the EMA
    simply copies the online weights; afterwards the decay warms up as
    min(beta, 1 - (1 + k)^(-power))."""

    beta: float = 0.995
    update_every: int = 10
    update_after_step: int = 100
    inv_gamma: float = 1.0
    power: float = 0.75


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    ema_cfg: EMAConfig = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx, ema_cfg: EMAConfig = EMAConfig()):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=jax.tree.map(jnp.copy, params),
            tx=tx,
            ema_cfg=ema_cfg,
        )

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self._ema_update(new_params)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )

    def _ema_update(self, new_params):
        cfg = self.ema_cfg
        # number of completed optimizer steps after this update
        step = self.step + 1
        is_update_step = (step % cfg.update_every) == 0
        # ema_pytorch counts the warmup epoch in RAW optimizer steps
        # (ema_pytorch.EMA.get_current_decay: epoch = step - update_after_step - 1),
        # with update_every gating only whether an update happens.
        k = jnp.maximum(step - cfg.update_after_step - 1, 0).astype(jnp.float32)
        warm = 1.0 - (1.0 + k / cfg.inv_gamma) ** (-cfg.power)
        decay = jnp.clip(warm, 0.0, cfg.beta)
        # copy phase (decay==0 when k==0), then lerp
        def upd(e, p):
            d = jnp.where(is_update_step, decay, 1.0)
            return d * e + (1.0 - d) * p

        # when not an update step, keep ema (d=1 keeps e)
        return jax.tree.map(upd, self.ema_params, new_params)
