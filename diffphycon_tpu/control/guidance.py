"""Guidance objectives for controlled sampling.

The guidance gradient is ``jax.grad`` of a scalarized control objective,
evaluated inside the scanned sampler body — the JAX-native equivalent of the
reference's per-step ``torch.autograd.grad`` closure
(/root/reference/diffusion/diffusion_1d_burgers.py:34-49,
 /root/reference/utils.py:1289-1328).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def make_nabla_j(loss_fn: Callable) -> Callable:
    """nabla_J(x) = d loss_fn(x).sum() / dx (reference get_nablaJ,
    diffusion_1d_burgers.py:34-49; grad_outputs=ones == grad of the sum)."""

    def nabla_j(x):
        return jax.grad(lambda xx: jnp.sum(loss_fn(xx)))(x)

    return nabla_j


def mse_dist_reg(u):
    """Temporal smoothness regularizer sum_t ||u_{t+1}-u_t||^2
    (reference utils.py:1286-1287). u: (B, Nt, Nx)."""
    return jnp.sum((u[:, 1:, :] - u[:, :-1, :]) ** 2)


def ddpm_guidance_loss(
    u_target: jax.Array,
    u: jax.Array,
    f: jax.Array,
    wu: float = 0.0,
    wf: float = 0.0,
    wreg: float = 0.0,
    dist_reg: Callable = lambda u: 0.0,
    partially_observed: Optional[str] = None,
) -> jax.Array:
    """Burgers guidance loss (reference utils.py:1289-1328):

      wu * mean[(u0 - u0*)^2 + (uT - uT*)^2]  (endpoint deviation)
      + wf * mean_batch[sum f^2]              (control energy)
      + wreg * dist_reg(u)

    u_target: (B, Nt, Nx) ground-truth trajectory (rescaled like u).
    u: (B, Nt, Nx) diffused states; f: (B, Nt-1, Nx) diffused control.
    """
    # endpoint deviations via a time mask instead of slicing: the backward of
    # u[:, 0] / u[:, -1] is a dynamic-update-slice scatter, which costs
    # ~50 us/op inside the scanned sampler on this runtime (PERF.md r2); the
    # masked form differentiates to pure elementwise ops.
    nt, nx = u.shape[1], u.shape[2]
    tmask = jnp.zeros((nt,), u.dtype).at[0].set(1.0).at[nt - 1].set(1.0)
    diff2 = (u - u_target) ** 2 * tmask[None, :, None]
    if partially_observed == "front_rear_quarter":
        mask = jnp.ones((nx,), u.dtype).at[nx // 4 : (3 * nx) // 4].set(0.0)
        diff2 = diff2 * mask
    elif partially_observed is not None:
        raise ValueError(f"unknown partially observed mode {partially_observed!r}")
    # mean over the same (B, Nx)-sized endpoint set as the reference
    loss_u = diff2.sum() / (u.shape[0] * nx)

    loss_f = (f**2).sum(axis=(-1, -2)).mean()
    return loss_u * wu + loss_f * wf + dist_reg(u) * wreg


def burgers_guidance_from_x(
    u_target: jax.Array,
    wu: float = 0.0,
    wf: float = 0.0,
    wreg: float = 0.0,
    use_dist_reg: bool = False,
    partially_observed: Optional[str] = None,
    nt_u: int = 11,
    nt_f: int = 10,
) -> Callable:
    """Build loss_fn(x) over the stacked channels-last sample x (B,16,128,2)
    (reference get_loss_fn_2dconv, inference_1d_burgers.py:129-165)."""

    reg = mse_dist_reg if use_dist_reg else (lambda u: 0.0)

    def loss_fn(x):
        u = x[:, :nt_u, :, 0]
        f = x[:, :nt_f, :, 1]
        return ddpm_guidance_loss(
            u_target, u, f, wu=wu, wf=wf, wreg=wreg, dist_reg=reg,
            partially_observed=partially_observed,
        )

    return loss_fn
