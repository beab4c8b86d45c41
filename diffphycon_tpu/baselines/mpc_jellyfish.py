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


def mpc_receding_horizon(ppl, state_0, bd_0, theta_0, frames=20,
                         num_iters=30, lr=0.05, lamda=1000.0,
                         coef_endcondition=0.0, coef_clip=0.0,
                         theta_clip=(0.2, 1.1), dtheta_clip=0.15,
                         optimizer="adam", seed=0):
    """Receding-horizon MPC through the surrogate pipeline: replan the
    remaining theta schedule at EVERY step, execute its first action, repeat
    (reference run_model_MPC + MPC_controller,
    /root/reference/inference/inference_2d_jellyfish.py:488-806).

    Faithful pieces: per-step replanning over the shrinking horizon, the
    cumulative-thrust objective J = mean_t cumsum(force)_t (realized prefix +
    planned suffix, :571-580), theta clamp to [0.2, 1.1] (:592), the
    smoothness regularizer lamda * sum dtheta^2, the end-condition penalty
    |theta_T - theta_0| and the +-0.15 dtheta clip loss (:580). TPU-native
    redesign: batched over samples and expressed as ONE jitted program —
    outer lax.scan over real steps, inner scan over optimizer iterations,
    fixed-length rollout scans with positional masking instead of shrinking
    arrays. optimizer: 'adam' (cosine-annealed lr, mirroring the reference's
    get_CosineAnnealingLR step sizes) or 'lbfgs' (MPC_controller_LBFGS :342).

    Returns (thetas (B, frames), states (B, frames, H, W, ns),
    forces (B, frames)).
    """
    b = state_0.shape[0]
    num_t = frames - 1
    key = jax.random.PRNGKey(seed)
    # reference init: theta_set ~ U[0.2, 0.9] (:760)
    theta_plan0 = 0.7 * jax.random.uniform(key, (b, num_t)) + 0.2

    def plan_rollout(state, bd, theta_prev, plan, t):
        """Roll the pipeline over plan positions t..num_t-1 (fixed length,
        masked); returns planned forces (B, num_t) aligned to absolute
        position (zeros before t)."""

        def body(carry, k):
            st, bdv, th_prev = carry
            idx = jnp.clip(t + k, 0, num_t - 1)
            th_k = jnp.take_along_axis(plan, jnp.full((b, 1), idx), 1)[:, 0]
            delta = th_k - th_prev
            st2, force = ppl.step(st, bdv, delta)
            bd2 = ppl.bd_updater_apply(ppl.params_bd, bdv, delta)
            live = (t + k < num_t).astype(force.dtype)
            return (st2, bd2, th_k), force * live

        _, forces = jax.lax.scan(body, (state, bd, theta_prev),
                                 jnp.arange(num_t))
        forces = jnp.swapaxes(forces, 0, 1)  # (B, num_t) in k-order
        # shift into absolute positions: planned force for step t+k
        roll = jax.vmap(lambda f: jnp.roll(f, t))(forces)
        pos = jnp.arange(num_t)[None]
        return jnp.where((pos >= t) & (pos < num_t), roll, 0.0)

    def objective(plan, state, bd, theta_prev, realized, t, theta0):
        planned = plan_rollout(state, bd, theta_prev, plan, t)
        all_forces = realized + planned                     # (B, num_t)
        vt = jnp.cumsum(all_forces, axis=1)                 # cumulative
        J = vt.mean(axis=1)
        reg = ((plan[:, 1:] - plan[:, :-1]) ** 2).sum(1)
        end = jnp.abs(plan[:, -1] - theta0)
        d0 = plan[:, 0] - theta_prev
        dd = plan[:, 1:] - plan[:, :-1]
        clipv = (jnp.maximum(jnp.abs(d0) - dtheta_clip, 0.0) ** 2
                 + (jnp.maximum(jnp.abs(dd) - dtheta_clip, 0.0) ** 2).sum(1))
        return (-(J - lamda * reg - coef_endcondition * end
                  - coef_clip * clipv)).sum()

    if optimizer == "lbfgs":
        tx = optax.lbfgs(lr)
    else:
        tx = optax.adam(lr)

    def replan(plan, state, bd, theta_prev, realized, t, theta0):
        opt_state = tx.init(plan)
        lrs = 0.5 * (1 + jnp.cos(jnp.pi * jnp.arange(num_iters) / num_iters))

        def it(carry, lr_scale):
            pl, os_ = carry
            val, g = jax.value_and_grad(objective)(pl, state, bd, theta_prev,
                                                   realized, t, theta0)
            if optimizer == "lbfgs":
                updates, os_ = tx.update(
                    g, os_, pl, value=val, grad=g,
                    value_fn=lambda p: objective(p, state, bd, theta_prev,
                                                 realized, t, theta0))
            else:
                updates, os_ = tx.update(g, os_)
                updates = jax.tree.map(lambda u: u * lr_scale, updates)
            pl = optax.apply_updates(pl, updates)
            pl = jnp.clip(pl, theta_clip[0], theta_clip[1])
            return (pl, os_), val

        (plan, _), hist = jax.lax.scan(it, (plan, opt_state), lrs)
        return plan, hist

    def real_step(carry, t):
        state, bd, theta, plan, realized = carry
        plan, _ = replan(plan, state, bd, theta, realized, t, theta_0)
        th_next = jnp.take_along_axis(plan, jnp.full((b, 1), t), 1)[:, 0]
        delta = th_next - theta
        state2, force = ppl.step(state, bd, delta)
        bd2 = ppl.bd_updater_apply(ppl.params_bd, bd, delta)
        realized = realized.at[:, t].set(force)
        return (state2, bd2, th_next, plan, realized), (th_next, state2,
                                                        force)

    realized0 = jnp.zeros((b, num_t))
    init = (jnp.asarray(state_0), jnp.asarray(bd_0), jnp.asarray(theta_0),
            theta_plan0, realized0)
    carry, (thetas, states, forces) = jax.lax.scan(real_step, init,
                                                   jnp.arange(num_t))
    thetas = jnp.concatenate([jnp.asarray(theta_0)[:, None],
                              jnp.swapaxes(thetas, 0, 1)], axis=1)
    states = jnp.concatenate([jnp.asarray(state_0)[:, None],
                              jnp.swapaxes(states, 0, 1)], axis=1)
    last_force = ppl.step(carry[0], carry[1])
    forces = jnp.concatenate([jnp.swapaxes(forces, 0, 1),
                              last_force[:, None]], axis=1)
    return thetas, states, forces
