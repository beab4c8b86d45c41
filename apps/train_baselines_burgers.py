#!/usr/bin/env python
"""Train and evaluate the RL baselines (BC / BPPO / SAC) on Burgers control.

Equivalent of /root/reference/baselines/{BC,BPPO}_burgers/train_infer_*.py and
baselines/sac_burgers: build an offline buffer from solver trajectories
(state u_t -> action f_t, reward = progress toward the target final state),
train the policy, then evaluate closed-loop through the real FD solver with
the same J_actual metric as the diffusion pipeline.

Example:
  python apps/train_baselines_burgers.py --method bc --n_data 512
  python apps/train_baselines_burgers.py --method bppo
  python apps/train_baselines_burgers.py --method sac
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--method", default="bc", choices=["bc", "bppo", "sac"])
    p.add_argument("--n_data", default=512, type=int)
    p.add_argument("--n_test", default=32, type=int)
    p.add_argument("--bc_steps", default=2000, type=int)
    p.add_argument("--critic_steps", default=2000, type=int)
    p.add_argument("--bppo_steps", default=200, type=int)
    p.add_argument("--sac_steps", default=2000, type=int)
    p.add_argument("--hidden_dim", default=512, type=int)
    p.add_argument("--depth", default=2, type=int)
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--partial_control", default=None, type=str)
    p.add_argument("--partially_observed", default=None, type=str,
                   help="'front_rear_quarter' zeroes the unobserved middle "
                        "half of u in policy states (reference "
                        "BC_burgers/train_infer_POPC.py:131)")
    p.add_argument("--solver_dt", default=1e-3, type=float)
    p.add_argument("--save_file", default="burgers_results/baselines.json")
    p.add_argument("--seed", default=0, type=int)
    return p


def obs_mask(nx, partially_observed):
    import numpy as np

    m = np.ones((nx,), np.float32)
    if partially_observed == "front_rear_quarter":
        m[nx // 4 : 3 * nx // 4] = 0.0
    return m


def closed_loop_eval(select_action, u_target, dt, partial_control=None,
                     partially_observed=None):
    """Roll the policy through the real solver frame by frame; report
    J_actual (final-state MSE) and control energy. Under partial
    observation the policy sees the masked state; J stays full-state."""
    import jax.numpy as jnp
    import numpy as np

    from diffphycon_tpu.physics.burgers import burgers_solve

    nx = u_target.shape[-1]
    omask = jnp.asarray(obs_mask(nx, partially_observed))
    u = jnp.asarray(u_target[:, 0, :])
    fs = []
    for t in range(10):
        a = select_action(u * omask / 10.0) * 10.0  # rescaled, observed part
        a = jnp.asarray(a)
        if partial_control == "front_rear_quarter":
            mask = jnp.zeros((nx,)).at[: nx // 4].set(1.0)
            mask = mask.at[3 * nx // 4 :].set(1.0)
            a = a * mask
        fs.append(a)
        traj = burgers_solve(u, a[:, None, :], visc=0.01, T=0.1, dt=dt,
                             num_t=1)
        u = traj[:, -1]
    f = jnp.stack(fs, axis=1)
    j_actual = np.asarray(((u - jnp.asarray(u_target[:, -1])) ** 2).mean(-1))
    energy = np.asarray((f**2).sum(axis=(-1, -2)))
    return float(j_actual.mean()), float(energy.mean())


def main(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffphycon_tpu.baselines.rl import (
        BPPO,
        SAC,
        BehaviorCloning,
        QSarsaLearner,
        ReplayBuffer,
        ValueLearner,
    )
    from diffphycon_tpu.physics.burgers import burgers_solve, make_burgers_data

    rng = np.random.default_rng(args.seed)
    u0, f = make_burgers_data(args.n_data + args.n_test, seed=args.seed,
                              partial_control=args.partial_control)
    traj = np.asarray(burgers_solve(jnp.asarray(u0), jnp.asarray(f),
                                    dt=args.solver_dt))
    # offline dataset: expert actions are the generating forcings; reward is
    # negative deviation from the trajectory's own final state
    omask = obs_mask(u0.shape[-1], args.partially_observed)
    states = traj[: args.n_data] * omask / 10.0
    actions = (f[: args.n_data] / 10.0).clip(-1, 1)
    rewards = -((traj[: args.n_data, 1:] - traj[: args.n_data, -1:]) ** 2
                ).mean(-1).astype(np.float32)
    buf = ReplayBuffer.from_trajectories(states, actions, rewards)
    u_target = traj[args.n_data :]

    nx = u0.shape[-1]
    results = {"method": args.method,
               "partially_observed": args.partially_observed,
               "partial_control": args.partial_control,
               "n_test": args.n_test}

    if args.method in ("bc", "bppo"):
        bc = BehaviorCloning(nx, nx, args.hidden_dim, args.depth, args.lr,
                             seed=args.seed)
        loss = float("nan")  # stays NaN when --bc_steps 0
        for i in range(args.bc_steps):
            loss = bc.update(buf)
        results["bc_loss"] = loss
        policy_params = bc.params
        select = lambda s: bc.select_action(policy_params, s)

        if args.method == "bppo":
            v = ValueLearner(nx, args.hidden_dim, args.depth, args.lr,
                             seed=args.seed)
            q = QSarsaLearner(nx, nx, args.hidden_dim, args.depth, args.lr,
                              seed=args.seed)
            for _ in range(args.critic_steps):
                v.update(buf)
                q.update(buf)
            bppo = BPPO(bc, q, v, lr=args.lr, seed=args.seed)
            for _ in range(args.bppo_steps):
                loss = bppo.update(buf)
            results["bppo_loss"] = loss
            policy_params = bppo.params
            select = lambda s: bc.select_action(policy_params, s)
    else:
        sac = SAC(nx, nx, args.hidden_dim, args.depth, seed=args.seed)
        for _ in range(args.sac_steps):
            ql, pl = sac.update(buf)
        results["sac_q_loss"], results["sac_pi_loss"] = ql, pl
        select = lambda s: sac.select_action(s)

    j, e = closed_loop_eval(select, u_target, args.solver_dt,
                            args.partial_control, args.partially_observed)
    results["J_actual_mse"] = j
    results["control_energy"] = e
    print(f"{args.method}: J_actual={j:.6f} energy={e:.2f}")
    os.makedirs(os.path.dirname(args.save_file) or ".", exist_ok=True)
    with open(args.save_file, "a") as fh:
        fh.write(json.dumps(results) + "\n")
    return results


if __name__ == "__main__":
    main(build_parser().parse_args())
