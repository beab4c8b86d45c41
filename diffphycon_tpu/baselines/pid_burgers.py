"""PID baseline for Burgers control.

Equivalent of /root/reference/baselines/PID_burgers/pde_1d_control_PID.py
(PID_Controller_MIMO, :91-130): per-grid-point PID gains produce the forcing
from the tracking error  f_t = Kp*e_t + Ki*sum e + Kd*(e_t - e_{t-1}), rolled
out through the solver; gains are optimized by gradient descent through the
differentiable rollout (the reference tunes through its surrogate instead).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from diffphycon_tpu.physics.burgers import _stencil_step


@dataclasses.dataclass
class PIDController:
    kp: jax.Array  # (Nx,)
    ki: jax.Array
    kd: jax.Array


def pid_rollout(ctrl: PIDController, u0, u_target_traj, dt=1e-3, num_t=10,
                visc=0.01, control_mask=None):
    """Roll the PID loop through the FD solver: at each of the num_t control
    frames, f = PID(error against the target at that frame), held constant
    over the frame's substeps. control_mask (Nx,) restricts actuation to the
    controllable sites *inside* the loop (partial-control setting) so tuning
    sees the same plant as evaluation.
    Returns (traj (B, num_t+1, Nx), f (B,num_t,Nx))."""
    b, nx = u0.shape
    steps = int(round(1.0 / dt))
    record = steps // num_t
    dx = 1.0 / (nx + 1)

    def frame(carry, tgt_t):
        u, err_sum, err_prev = carry
        err = tgt_t - u
        err_sum = err_sum + err
        f = ctrl.kp * err + ctrl.ki * err_sum + ctrl.kd * (err - err_prev)
        if control_mask is not None:
            f = f * control_mask

        def sub(u, _):
            return _stencil_step(u, f, dt, dx, visc), None

        u, _ = jax.lax.scan(sub, u, None, length=record)
        return (u, err_sum, err), (u, f)

    tgt = jnp.swapaxes(u_target_traj[:, 1:, :], 0, 1)  # frames 1..num_t
    carry, (us, fs) = jax.lax.scan(
        frame, (u0, jnp.zeros_like(u0), jnp.zeros_like(u0)), tgt)
    traj = jnp.concatenate([u0[None], us], 0).swapaxes(0, 1)
    return traj, jnp.swapaxes(fs, 0, 1)


def pid_control(u0, u_target_traj, lr=1e-2, steps=100, dt=1e-3, seed=0,
                lamb=0.0, control_mask=None):
    """Tune the PID gains by Adam through the rollout; returns
    (controller, f, traj, J_history)."""
    nx = u0.shape[-1]
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    gains = {
        "kp": 0.1 * jax.random.normal(k1, (nx,)),
        "ki": 0.1 * jax.random.normal(k2, (nx,)),
        "kd": 0.1 * jax.random.normal(k3, (nx,)),
    }

    def objective(g):
        ctrl = PIDController(g["kp"], g["ki"], g["kd"])
        traj, f = pid_rollout(ctrl, u0, u_target_traj, dt=dt,
                              control_mask=control_mask)
        dev = ((traj[:, -1] - u_target_traj[:, -1]) ** 2).mean()
        return dev + lamb * (f**2).sum(axis=(-1, -2)).mean()

    tx = optax.adam(lr)
    opt_state = tx.init(gains)

    @jax.jit
    def step(g, opt_state):
        val, grads = jax.value_and_grad(objective)(g)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(g, updates), opt_state, val

    history = []
    for _ in range(steps):
        gains, opt_state, val = step(gains, opt_state)
        history.append(float(val))
    ctrl = PIDController(gains["kp"], gains["ki"], gains["kd"])
    traj, f = pid_rollout(ctrl, u0, u_target_traj, dt=dt,
                          control_mask=control_mask)
    return ctrl, f, traj, history
