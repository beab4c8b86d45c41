"""Gradient MPC baseline for jellyfish control.

Equivalent of the reference MPC controller embedded in
/root/reference/inference/inference_2d_jellyfish.py:488-806: optimize the
theta schedule by gradient descent through the neural SurrogatePipeline
(simulator + force readout + boundary updater), maximizing time-weighted
thrust minus the theta-smoothness regularizer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def mpc_plan(ppl, state_0, bd_0, theta_0, horizon=20, lr=1e-2, iters=50,
             reg_ratio=0.0, seed=0):
    """Plan a theta schedule of length ``horizon`` by Adam through the
    surrogate rollout.

    ppl: diffphycon_tpu.benchmarks.jellyfish.SurrogatePipeline.
    Returns (thetas (B, horizon), forces (B, horizon), J_history).
    """
    b = state_0.shape[0]
    key = jax.random.PRNGKey(seed)
    thetas = theta_0[:, None] + 0.01 * jax.random.normal(key, (b, horizon))
    thetas = thetas.at[:, 0].set(theta_0)

    weight = jnp.arange(horizon, 0, -1, dtype=jnp.float32)[None]

    def objective(th):
        th = th.at[:, 0].set(theta_0)  # first step fixed
        _, forces = ppl.rollout(state_0, bd_0, th)
        avg_v = (forces * weight).mean(axis=1)
        reg = ((th[:, 1:] - th[:, :-1]) ** 2).sum(axis=1)
        return (-avg_v + reg_ratio * reg).sum()

    tx = optax.adam(lr)
    opt_state = tx.init(thetas)

    @jax.jit
    def step(th, opt_state):
        val, g = jax.value_and_grad(objective)(th)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(th, updates), opt_state, val

    history = []
    for _ in range(iters):
        thetas, opt_state, val = step(thetas, opt_state)
        history.append(float(val))
    thetas = thetas.at[:, 0].set(theta_0)
    _, forces = ppl.rollout(state_0, bd_0, thetas)
    return thetas, forces, history
