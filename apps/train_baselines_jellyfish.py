#!/usr/bin/env python
"""Train and evaluate the RL baselines (BC / BPPO / SAC) on jellyfish control.

Equivalent of /root/reference/baselines/BC_jellyfish/main_{FO,PO}.py,
baselines/BPPO_jellyfish and baselines/sac_jellyfish/
pde_2d_sac_train{,_pob}.py: the environment is the neural surrogate pipeline
(ForceUNet thrust + simulator next-state + boundary updater), action is the
per-step theta increment (action_dim = 1), the offline buffer is built from
dataset flapping trajectories, and --partially_observed mirrors the _pob /
PO variants (policy sees the pressure channel only). Scored with the same
objective as jellyfish inference: avg thrust - reg * sum dtheta^2
(reference inference_2d_jellyfish.py:107-110).

Examples:
  python apps/train_baselines_jellyfish.py --method bc
  python apps/train_baselines_jellyfish.py --method sac --partially_observed True
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--method", default="bc", choices=["bc", "bppo", "sac"])
    p.add_argument("--dataset_path", default="data/jellyfish", type=str)
    p.add_argument("--surrogate_folder", default="trained_models/surrogates",
                   type=str)
    p.add_argument("--n_sims", default=None, type=int)
    p.add_argument("--n_test", default=8, type=int)
    p.add_argument("--frames", default=20, type=int)
    p.add_argument("--bc_steps", default=2000, type=int)
    p.add_argument("--critic_steps", default=1000, type=int)
    p.add_argument("--bppo_steps", default=200, type=int)
    p.add_argument("--sac_steps", default=2000, type=int)
    p.add_argument("--sac_episodes_per_round", default=4, type=int)
    p.add_argument("--batch_size", default=256, type=int)
    p.add_argument("--hidden_dim", default=512, type=int)
    p.add_argument("--depth", default=2, type=int)
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--act_scale", default=0.1, type=float)
    p.add_argument("--reg_ratio", default=1000.0, type=float)
    p.add_argument("--partially_observed", default=False, type=eval,
                   help="pressure-only observation (reference"
                        " pde_2d_sac_train_pob.py / main_PO.py)")
    p.add_argument("--save_file", default="jellyfish_results/baselines.json")
    p.add_argument("--seed", default=0, type=int)
    return p


def build_env(args):
    import jax.numpy as jnp
    import numpy as np

    from diffphycon_tpu.baselines.envs import JellyfishRLEnv
    from diffphycon_tpu.benchmarks import jellyfish as bench
    from diffphycon_tpu.training.surrogates import load_surrogate

    cfg = bench.JellyfishConfig()
    net_sim = bench.build_simulator_unet(cfg)
    net_force = bench.build_force_unet(cfg)
    net_bd = bench.build_bd_updater(cfg)
    p_sim = load_surrogate(args.surrogate_folder, "simulator")
    p_force = load_surrogate(args.surrogate_folder, "force")
    p_bd = load_surrogate(args.surrogate_folder, "boundary_updater")
    # force net is trained on RAW pressure; env states are normalized
    import os
    import pickle

    with open(os.path.join(args.dataset_path, "train_data",
                           "normalization_max_min.pkl"), "rb") as fh:
        norm = pickle.load(fh)
    ppl = bench.SurrogatePipeline(cfg, net_sim.apply, p_sim, net_force.apply,
                                  p_force, net_bd.apply, p_bd,
                                  p_min=float(norm["p_min"]),
                                  p_max=float(norm["p_max"]))
    env = JellyfishRLEnv(ppl, frames=args.frames, act_scale=args.act_scale,
                         reg=args.reg_ratio,
                         partially_observed=args.partially_observed)
    return env, cfg


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
        RingReplay,
        ValueLearner,
    )
    from diffphycon_tpu.training.data import load_jellyfish_dataset

    rng = np.random.default_rng(args.seed)
    env, cfg = build_env(args)
    data = load_jellyfish_dataset(args.dataset_path, "train", n=args.n_sims,
                                  only_vis_pressure=False)
    states, bd, thetas = data["states"], data["bd"], data["thetas"]
    n, T = thetas.shape
    F = args.frames

    # ---- offline buffer from dataset flapping trajectories -----------------
    # observation at t via the env's own obs fn; action = the dataset's
    # dtheta (rescaled to [-1, 1]); reward = surrogate thrust - reg * dtheta^2
    t0 = time.time()
    obs_traj, act_traj, rew_traj = [], [], []
    n_train = min(n, 16) if args.n_sims is None else n
    for i in range(n_train):
        obs = env.reset(states[i, :1].repeat(1, axis=0),
                        bd[i, :1], thetas[i, :1])
        o_list, a_list, r_list = [obs], [], []
        for t in range(F - 1):
            d = float(thetas[i, t + 1] - thetas[i, t])
            a = np.asarray([[np.clip(d / args.act_scale, -1, 1)]],
                           np.float32)
            obs, r, _ = env.step(a)
            o_list.append(obs)
            a_list.append(a)
            r_list.append(np.asarray(r))
        obs_traj.append(np.concatenate(o_list))
        act_traj.append(np.concatenate(a_list))
        rew_traj.append(np.concatenate(r_list))
    obs_traj = np.stack(obs_traj)          # (n, F, obs)
    act_traj = np.stack(act_traj)          # (n, F-1, 1)
    rew_traj = np.stack(rew_traj).astype(np.float32)
    print(f"offline buffer {obs_traj.shape} in {time.time()-t0:.1f}s")
    buf = ReplayBuffer.from_trajectories(obs_traj, act_traj, rew_traj)

    obs_dim = obs_traj.shape[-1]
    results = {"method": args.method,
               "partially_observed": bool(args.partially_observed)}

    if args.method in ("bc", "bppo"):
        bc = BehaviorCloning(obs_dim, 1, args.hidden_dim, args.depth,
                             args.lr, batch_size=args.batch_size,
                             seed=args.seed)
        loss = float("nan")  # stays NaN when --bc_steps 0
        for _ in range(args.bc_steps):
            loss = bc.update(buf)
        results["bc_loss"] = loss
        policy_params = bc.params
        if args.method == "bppo":
            v = ValueLearner(obs_dim, args.hidden_dim, args.depth, args.lr,
                             batch_size=args.batch_size, seed=args.seed)
            q = QSarsaLearner(obs_dim, 1, args.hidden_dim, args.depth,
                              args.lr, batch_size=args.batch_size,
                              seed=args.seed)
            for _ in range(args.critic_steps):
                v.update(buf)
                q.update(buf)
            bppo = BPPO(bc, q, v, lr=args.lr, batch_size=args.batch_size,
                        seed=args.seed)
            for _ in range(args.bppo_steps):
                loss = bppo.update(buf)
            results["bppo_loss"] = loss
            policy_params = bppo.params
        select = jax.jit(lambda o: bc.select_action(policy_params, o))
    else:
        sac = SAC(obs_dim, 1, args.hidden_dim, args.depth, seed=args.seed,
                  batch_size=args.batch_size)
        replay = RingReplay(100_000, obs_dim, 1)
        for ep in range(rew_traj.shape[0]):
            replay.push_batch(
                obs_traj[ep, :-1], act_traj[ep], rew_traj[ep],
                obs_traj[ep, 1:],
                np.concatenate([np.ones(rew_traj.shape[1] - 1),
                                [0.0]]).astype(np.float32))
        key = jax.random.PRNGKey(args.seed)
        steps = 0
        while steps < args.sac_steps:
            for _ in range(args.sac_episodes_per_round):
                i = int(rng.integers(0, n))
                obs = env.reset(states[i, :1], bd[i, :1], thetas[i, :1])
                done = False
                while not done:
                    key, k = jax.random.split(key)
                    a = sac.select_action(obs, k)
                    obs2, r, done = env.step(np.asarray(a))
                    replay.push_batch(np.asarray(obs), np.asarray(a),
                                      np.asarray(r), np.asarray(obs2),
                                      np.asarray([0.0 if done else 1.0]))
                    obs = obs2
            for _ in range(args.frames * args.sac_episodes_per_round):
                ql, pl = sac.update(replay)
                steps += 1
        results["sac_q_loss"], results["sac_pi_loss"] = ql, pl
        select = jax.jit(lambda o: sac.select_action(o))

    # ---- closed-loop eval on held-out initial conditions --------------------
    data_test = load_jellyfish_dataset(args.dataset_path, "test",
                                       n=args.n_test,
                                       only_vis_pressure=False)
    s0 = data_test["states"][:, 0]
    b0 = data_test["bd"][:, 0]
    th0 = data_test["thetas"][:, 0]
    obs = env.reset(s0, b0, th0)
    done = False
    while not done:
        a = select(obs)
        obs, _, done = env.step(np.asarray(a))
    metrics = env.metrics()
    results.update(metrics)
    results["objective_convention"] = "jellyfish_objective"
    print(f"{args.method}: J={metrics['J_jellyfish']:.4f} "
          f"avg_force={metrics['avg_force']:.4f} "
          f"theta_reg={metrics['theta_reg']:.5f}")
    os.makedirs(os.path.dirname(args.save_file) or ".", exist_ok=True)
    with open(args.save_file, "a") as fh:
        fh.write(json.dumps(results) + "\n")
    return results


if __name__ == "__main__":
    main(build_parser().parse_args())
