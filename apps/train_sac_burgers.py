#!/usr/bin/env python
"""Online SAC for Burgers control through the real solver.

Equivalent of /root/reference/baselines/sac_burgers/burgers_sac_train_quarter.py:
the MDP state is [t, u_t, u_target] (dim 2*Nx+1), the action is the control at
the controllable locations only (front/rear quarter => Nx/2 dims, or full Nx),
the per-step reward is -||u_{t+1} - u_target||^2 / Nx - reward_f * ||f_t||^2.
The replay is seeded with offline dataset transitions (reference :103-120),
then each episode rolls the current policy through the solver for 10 frames
(reference :158-188, --online path) and performs ``updates_per_step`` SAC
updates. Where the reference steps its torch solver one CPU batch at a time,
here each frame is one batched jitted `burgers_solve` call.

Example:
  python apps/train_sac_burgers.py --num_episode 100 --partial_control \
      front_rear_quarter
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--n_data", default=512, type=int)
    p.add_argument("--n_test", default=50, type=int)
    p.add_argument("--num_episode", default=300, type=int,
                   help="online episodes (reference default 1500)")
    p.add_argument("--train_batch_size", default=32, type=int,
                   help="trajectories rolled per episode")
    p.add_argument("--updates_per_step", default=50, type=int)
    p.add_argument("--batch_size", default=1024, type=int,
                   help="SAC update minibatch (reference 8192)")
    p.add_argument("--hidden_dim", default=512, type=int)
    p.add_argument("--depth", default=2, type=int)
    p.add_argument("--lr", default=3e-4, type=float)
    p.add_argument("--gamma", default=0.5, type=float,
                   help="discount (reference default 0.5)")
    p.add_argument("--tau", default=0.05, type=float)
    p.add_argument("--reward_f", default=0.0, type=float,
                   help="control-energy penalty weight")
    p.add_argument("--action_scale", default=10.0, type=float,
                   help="tanh action -> physical forcing amplitude")
    p.add_argument("--replay_size", default=1_000_000, type=int)
    p.add_argument("--partial_control", default=None, type=str)
    p.add_argument("--partially_observed", default=None, type=str,
                   help="'front_rear_quarter' zeroes the unobserved middle "
                        "half of u in MDP states (reference "
                        "sac_burgers/burgers_sac_pob_*.py)")
    p.add_argument("--solver_dt", default=1e-3, type=float)
    p.add_argument("--eval_every", default=25, type=int)
    p.add_argument("--save_file", default="burgers_results/sac.json")
    p.add_argument("--seed", default=0, type=int)
    return p


def main(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffphycon_tpu.baselines.rl import SAC, RingReplay
    from diffphycon_tpu.physics.burgers import burgers_solve, make_burgers_data

    nx = 128
    partial = args.partial_control == "front_rear_quarter"
    act_dim = nx // 2 if partial else nx
    state_dim = 2 * nx + 1

    def expand_action(a):
        """Controllable slots -> full grid (reference :165-167)."""
        if not partial:
            return a
        full = jnp.zeros((a.shape[0], nx))
        full = full.at[:, : nx // 4].set(a[:, : nx // 4])
        full = full.at[:, 3 * nx // 4 :].set(a[:, nx // 4 :])
        return full

    def contract_action(f):
        if not partial:
            return f
        return np.concatenate([f[:, : nx // 4], f[:, 3 * nx // 4 :]], -1)

    omask = np.ones((nx,), np.float32)
    if args.partially_observed == "front_rear_quarter":
        omask[nx // 4 : 3 * nx // 4] = 0.0

    def mdp_state(t, u, u_tgt):
        return np.concatenate(
            [np.full((u.shape[0], 1), float(t), np.float32), u * omask,
             u_tgt * omask], -1)

    # data: trajectories from the generating distribution; the final state of
    # each is its own control target (reference :104-109)
    u0, f = make_burgers_data(args.n_data + args.n_test, seed=args.seed,
                              partial_control=args.partial_control)
    traj = np.asarray(burgers_solve(jnp.asarray(u0), jnp.asarray(f),
                                    dt=args.solver_dt))
    train_traj, train_f = traj[: args.n_data], np.asarray(f[: args.n_data])
    test_traj = traj[args.n_data :]

    replay = RingReplay(args.replay_size, state_dim, act_dim)
    tgt = train_traj[:, -1]
    for t in range(10):
        r = -((tgt - train_traj[:, t + 1]) ** 2).sum(-1) / nx
        r = r - args.reward_f * (train_f[:, t] ** 2).sum(-1)
        replay.push_batch(
            mdp_state(t, train_traj[:, t], tgt),
            np.clip(contract_action(train_f[:, t]) / args.action_scale, -1, 1),
            r, mdp_state(t + 1, train_traj[:, t + 1], tgt),
            0.0 if t == 9 else 1.0)

    agent = SAC(state_dim, act_dim, args.hidden_dim, args.depth, lr=args.lr,
                gamma=args.gamma, tau=args.tau, batch_size=args.batch_size,
                seed=args.seed)

    solve_one = jax.jit(lambda u, a: burgers_solve(
        u, a[:, None, :], visc=0.01, T=0.1, dt=args.solver_dt, num_t=1)[:, -1])

    def rollout(trajs, explore_key=None):
        """Roll the policy 10 frames through the solver; returns
        (u_T, f_full (B,10,Nx), transitions list)."""
        b = trajs.shape[0]
        u = jnp.asarray(trajs[:, 0])
        u_tgt = trajs[:, -1]
        fs, trans = [], []
        for t in range(10):
            s = mdp_state(t, np.asarray(u), u_tgt)
            if explore_key is not None:
                explore_key, k = jax.random.split(explore_key)
                a = agent.select_action(jnp.asarray(s), k)
            else:
                a = agent.select_action(jnp.asarray(s))
            f_full = expand_action(jnp.asarray(a)) * args.action_scale
            u2 = solve_one(u, f_full)
            r = -np.asarray(((jnp.asarray(u_tgt) - u2) ** 2).sum(-1)) / nx
            r = r - args.reward_f * np.asarray((f_full**2).sum(-1))
            trans.append((s, np.asarray(a), r,
                          mdp_state(t + 1, np.asarray(u2), u_tgt),
                          0.0 if t == 9 else 1.0))
            fs.append(np.asarray(f_full))
            u = u2
        return np.asarray(u), np.stack(fs, 1), trans

    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed + 17)
    os.makedirs(os.path.dirname(args.save_file) or ".", exist_ok=True)
    results = {"episodes": []}
    for ep in range(args.num_episode):
        idx = rng.integers(0, args.n_data, args.train_batch_size)
        key, k = jax.random.split(key)
        _, _, trans = rollout(train_traj[idx], explore_key=k)
        for tr in trans:
            replay.push_batch(*tr)
        for _ in range(args.updates_per_step):
            ql, pl = agent.update(replay)
        if (ep + 1) % args.eval_every == 0 or ep == args.num_episode - 1:
            uT, f_all, _ = rollout(test_traj)  # deterministic policy
            j = float(((uT - test_traj[:, -1]) ** 2).mean())
            e = float((f_all**2).sum((-1, -2)).mean())
            print(f"episode {ep + 1}/{args.num_episode} q={ql:.4f} "
                  f"pi={pl:.4f} J_actual={j:.6f} energy={e:.1f}", flush=True)
            results["episodes"].append(
                {"episode": ep + 1, "q_loss": ql, "pi_loss": pl,
                 "J_actual_mse": j, "control_energy": e})

    results["J_actual_mse"] = results["episodes"][-1]["J_actual_mse"]
    results["control_energy"] = results["episodes"][-1]["control_energy"]
    with open(args.save_file, "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps({k: results[k] for k in
                      ("J_actual_mse", "control_energy")}))
    return results


if __name__ == "__main__":
    main(build_parser().parse_args())
