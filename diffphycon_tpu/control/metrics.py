"""Control evaluation metrics (solver-as-oracle).

Equivalents of the reference metrics (/root/reference/utils.py:1189-1284):
the sampled control is re-simulated with the ground-truth solver and scored
against the target final state. All metrics are batched, jittable jnp.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from diffphycon_tpu.physics.burgers import burgers_solve


def _observed_slice(a, partially_observed: Optional[str]):
    if partially_observed is None:
        return a
    if partially_observed == "front_rear_quarter":
        nx = a.shape[-1]
        return jnp.concatenate(
            [a[..., : nx // 4], a[..., (3 * nx) // 4 :]], axis=-1
        )
    raise NotImplementedError(partially_observed)


def mse_deviation(u1, u2, partially_observed=None, report_all=False):
    """(reference utils.py:1189-1201). u1, u2: (B, Nt, Nx)."""
    u1 = _observed_slice(u1, partially_observed)
    u2 = _observed_slice(u2, partially_observed)
    mse = ((u1 - u2) ** 2).mean(axis=(-1, -2))
    if not report_all:
        return mse
    mae = jnp.abs(u1 - u2).mean(axis=(-1, -2))
    ep = 1e-5
    return (
        mse,
        mae,
        mse / ((u2 + ep) ** 2).mean(),
        mae / jnp.abs(u2 + ep).mean(),
    )


def burgers_metric(
    u_target,
    f,
    partial_control: Optional[str] = "full",
    report_all: bool = False,
    diffused_u=None,
    evaluate_u: bool = False,
    partially_observed: Optional[str] = None,
    solver=None,
):
    """J_actual (final-state deviation of the re-simulated trajectory) and
    control energy (reference burgers_metric, utils.py:1203-1284).

    u_target: (B, Nt, Nx) unscaled ground truth; f: (B, Nt-1, Nx) unscaled
    control. Returns (J_actual, control_energy); J_actual is
    (mse, mse_median, mae, mae_median, nmse, nmae) when report_all.
    """
    if partial_control == "front_rear_quarter":
        nx = f.shape[-1]
        f = f.at[:, :, nx // 4 : (3 * nx) // 4].set(0.0)

    if evaluate_u:
        u_controlled = diffused_u
    else:
        if solver is None:
            solver = lambda u0, ff: burgers_solve(
                u0, ff, visc=0.01, T=1.0, dt=1e-4, num_t=ff.shape[1]
            )
        u_controlled = solver(u_target[:, 0, :], f)

    u_controlled = _observed_slice(u_controlled, partially_observed)
    u_tgt = _observed_slice(u_target, partially_observed)

    d = u_controlled[:, -1, :] - u_tgt[:, -1, :]
    mse = (d**2).mean(-1)
    control_energy = (f**2).sum(axis=(-1, -2))
    if not report_all:
        return mse, control_energy

    ep = 1e-5

    def torch_median(a):
        # torch.median picks the lower of the two middle elements for even n
        n = a.shape[-1]
        return jnp.sort(a, axis=-1)[..., (n - 1) // 2]

    mse_median = torch_median(d**2)
    mae = jnp.abs(d).mean(-1)
    mae_median = torch_median(jnp.abs(d))
    nmse = mse / ((u_tgt[:, -1, :] ** 2).mean() + ep)
    nmae = mae / (jnp.abs(u_tgt[:, -1, :]).mean() + ep)
    return (mse, mse_median, mae, mae_median, nmse, nmae), control_energy


def jellyfish_objective(forces, dthetas, reg_ratio=0.0):
    """Shared jellyfish control objective — the ONE convention used by the
    RL envs, MPC scoring and the DDPM eval alike (reference
    inference/inference_2d_jellyfish.py:105-110):

        J = mean_t(force_t * weight_t) - reg_ratio * sum_t dtheta_t^2,
        weight = arange(T, 0, -1)  (descending time weight).

    forces: (B, T) per-frame thrust; dthetas: (B, T') per-step theta deltas.
    """
    forces = jnp.asarray(forces)
    dthetas = jnp.asarray(dthetas)
    t = forces.shape[1]
    weight = jnp.arange(t, 0, -1, dtype=forces.dtype)[None]
    return (forces * weight).mean(axis=1) - reg_ratio * (dthetas**2).sum(axis=1)
