"""SL (supervised / adjoint) baseline for Burgers control.

The reference (/root/reference/baselines/sl_burgers/sl_burgers_control.py)
optimizes the control through a learned latent surrogate operator because
differentiating its numerical solver 10^4 steps is impractical in torch. Here
the JAX FD solver is differentiable by construction (checkpointed scan), so
the baseline optimizes the control *directly through the true solver* — the
strongest form of this baseline. Objective (reference :26-27, lamb-weighted):

  J(f) = ||u(T; u0, f) - u_target(T)||^2 + lamb * sum f^2
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import optax

from diffphycon_tpu.physics.burgers import burgers_solve


def sl_optimize_control(
    u0: jax.Array,
    u_target_T: jax.Array,
    f_init: jax.Array = None,
    lamb: float = 0.0,
    lr: float = 1e-2,
    steps: int = 100,
    solver_dt: float = 1e-4,
    partial_control: str | None = None,
    surrogate=None,
):
    """Optimize f (B, Nt-1, Nx) by Adam on the solver-adjoint gradient.

    surrogate: optional (SurrogateOperator, params) — optimize through the
    learned latent operator instead of the true solver, the reference's
    actual SL formulation (baselines/sl_burgers/sl_burgers_control.py uses
    Simu_surrogate_model; useful in partial-observation settings where the
    true state is not available to the optimizer).

    Returns (f_opt, J_history)."""
    b, nx = u0.shape
    nt = 10
    if f_init is None:
        f = jnp.zeros((b, nt, nx))
    else:
        f = jnp.asarray(f_init)

    if partial_control == "front_rear_quarter":
        mask = jnp.zeros((nx,)).at[: nx // 4].set(1.0).at[3 * nx // 4 :].set(1.0)
    else:
        mask = jnp.ones((nx,))

    def objective(f):
        fm = f * mask
        if surrogate is not None:
            op, op_params = surrogate
            traj = op.rollout(op_params, u0, fm)
        else:
            traj = burgers_solve(u0, fm, visc=0.01, T=1.0, dt=solver_dt,
                                 num_t=nt)
        dev = ((traj[:, -1] - u_target_T) ** 2).mean()
        return dev + lamb * (fm**2).sum(axis=(-1, -2)).mean()

    tx = optax.adam(lr)
    opt_state = tx.init(f)

    @jax.jit
    def step(f, opt_state):
        val, g = jax.value_and_grad(objective)(f)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(f, updates), opt_state, val

    history = []
    for _ in range(steps):
        f, opt_state, val = step(f, opt_state)
        history.append(float(val))
    return f * mask, history
