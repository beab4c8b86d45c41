#!/usr/bin/env python
"""Train and evaluate the RL baselines (BC / BPPO / SAC) on smoke control.

Equivalent of /root/reference/baselines/{BC,BPPO}_smoke and
baselines/sac_smoke/pde_2d_sac_train.py: offline buffers come from generated
scenario data (or on-the-fly synthetic rollouts), SAC additionally interacts
online with the REAL 128^2 scenario solver (TPU-batched, replacing the
reference's neural-surrogate env), and every method is scored closed-loop
with the smoke J metrics (J_target = -final target-bucket smoke-out,
J_energy; reference inference_2d_smoke.py:405-417).

Examples:
  python apps/train_baselines_smoke.py --method bc --n_episodes 8
  python apps/train_baselines_smoke.py --method sac --sac_steps 500
  python apps/train_baselines_smoke.py --method bc --partially_observed True
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
    p.add_argument("--n_episodes", default=8, type=int,
                   help="behavior episodes for the offline buffer")
    p.add_argument("--behavior_from_dataset", default=None, type=str,
                   help="path to a generated smoke dataset (e.g. data/smoke);"
                        " builds the BC/BPPO offline buffer from its "
                        "trajectories instead of heuristic env rollouts — "
                        "the reference baselines' offline-data convention "
                        "(baselines/BC_smoke, BPPO_smoke)")
    p.add_argument("--n_test", default=4, type=int)
    p.add_argument("--frames", default=32, type=int)
    p.add_argument("--sub_steps", default=8, type=int)
    p.add_argument("--bc_steps", default=1000, type=int)
    p.add_argument("--critic_steps", default=500, type=int)
    p.add_argument("--bppo_steps", default=100, type=int)
    p.add_argument("--sac_steps", default=500, type=int)
    p.add_argument("--sac_episodes_per_round", default=2, type=int)
    p.add_argument("--batch_size", default=64, type=int)
    p.add_argument("--hidden_dim", default=512, type=int)
    p.add_argument("--depth", default=2, type=int)
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--act_scale", default=2.0, type=float)
    p.add_argument("--w_energy", default=0.0, type=float)
    p.add_argument("--partially_observed", default=False, type=eval,
                   help="policy sees the density channel only (the reference"
                        " smoke baselines' partial-observation setting)")
    p.add_argument("--eval_from_dataset", default=None, type=str,
                   help="score closed-loop from this dataset's test-split "
                        "initial densities (same episodes as the diffusion "
                        "eval) instead of fresh random start boxes")
    p.add_argument("--save_file", default="smoke_results/baselines.json")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--cpu", action="store_true",
                   help="force the host backend (micro-scale testing)")
    return p


def behavior_action(env, rng, t):
    """Heuristic behavior policy for offline data: noisy upward push on the
    periphery (the generated dataset's control drives smoke to the top exit,
    apps/generate_smoke.py)."""
    import numpy as np

    a = np.zeros((1, 64, 64, 2), np.float32)
    a[..., 1] = 0.4  # upward
    a += 0.2 * rng.normal(size=a.shape).astype(np.float32)
    return np.clip(a, -1, 1)


def mask_obs(obs, partially_observed):
    import jax.numpy as jnp

    if not partially_observed:
        return obs
    # density + time plane only; velocity channels zeroed
    return obs * jnp.asarray([1.0, 0.0, 0.0, 1.0])


def run_episode(env, select, batch, rng, partially_observed, density0=None):
    obs = env.reset(batch, rng, density0=density0)
    done = False
    transitions = []
    while not done:
        o = mask_obs(obs, partially_observed)
        a = select(o)
        obs2, r, done = env.step(a)
        transitions.append((o, a, r))
        obs = obs2
    return transitions, env.metrics()


def main(args):
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from diffphycon_tpu.baselines.envs import SmokeRLEnv
    from diffphycon_tpu.baselines.rl import (
        BPPO,
        SAC,
        BehaviorCloning,
        ConvGaussPolicy,
        ConvQ,
        QSarsaLearner,
        ReplayBuffer,
        RingReplay,
        ValueLearner,
    )

    rng = np.random.default_rng(args.seed)
    env = SmokeRLEnv(frames=args.frames, sub_steps=args.sub_steps,
                     act_scale=args.act_scale, w_energy=args.w_energy)
    obs_hw = env.obs_shape
    flat_obs = int(np.prod(obs_hw))
    flat_act = int(np.prod(env.action_shape))

    # ---- offline behavior data (BC / BPPO) --------------------------------
    t0 = time.time()
    if args.behavior_from_dataset:
        # reference convention: the offline buffer comes from the generated
        # dataset's own (state, control) trajectories
        from diffphycon_tpu.training.data import load_smoke_dataset

        traj = load_smoke_dataset(args.behavior_from_dataset, "train",
                                  n=args.n_episodes, rescale=False,
                                  frames=args.frames + 1)
        traj = traj[:, : args.frames + 1]  # (N, 33, 64, 64, 6)
        tt = np.arange(traj.shape[1], dtype=np.float32) / args.frames
        tt = np.broadcast_to(tt[None, :, None, None],
                             traj.shape[:4]).astype(np.float32)
        states = np.concatenate(
            [traj[..., 0:3], tt[..., None]], axis=-1)           # obs channels
        actions = np.clip(traj[:, :-1, :, :, 3:5] / args.act_scale, -1, 1)
        rate = traj[:, :, 0, 0, 5]  # smoke-portion channel (spatially const)
        energy = (actions ** 2).mean(axis=(2, 3, 4))
        rewards = (np.diff(rate, axis=1)
                   - args.w_energy * energy).astype(np.float32)
        states = states.astype(np.float32)
        actions = actions.astype(np.float32)
        if args.partially_observed:
            states = states * np.asarray([1.0, 0.0, 0.0, 1.0], np.float32)
    else:
        states, actions, rewards = [], [], []
        for ep in range(args.n_episodes):
            trans, _ = run_episode(
                env, lambda o: behavior_action(env, rng, 0), 1, rng,
                args.partially_observed)
            states.append(np.stack([np.asarray(tr[0][0]) for tr in trans]
                                   + [np.asarray(trans[-1][0][0])]))  # T+1
            actions.append(np.stack([np.asarray(tr[1][0]) for tr in trans]))
            rewards.append(np.stack([float(tr[2][0]) for tr in trans]))
        states = np.stack(states)
        actions = np.stack(actions)
        rewards = np.stack(rewards).astype(np.float32)
    print(f"behavior data: {states.shape} in {time.time()-t0:.1f}s")

    results = {"method": args.method,
               "partially_observed": bool(args.partially_observed)}

    if args.method in ("bc", "bppo"):
        # flat MLP policy on flattened fields (reference BC/BPPO use MLPs on
        # embedded states, BC_smoke/bppo.py)
        flat = lambda a: a.reshape(a.shape[0], a.shape[1], -1)
        buf = ReplayBuffer.from_trajectories(
            flat(states), flat(actions), rewards)
        bc = BehaviorCloning(flat_obs, flat_act, args.hidden_dim, args.depth,
                             args.lr, batch_size=args.batch_size,
                             seed=args.seed)
        loss = float("nan")  # stays NaN when --bc_steps 0
        for _ in range(args.bc_steps):
            loss = bc.update(buf)
        results["bc_loss"] = loss
        policy_params = bc.params

        if args.method == "bppo":
            v = ValueLearner(flat_obs, args.hidden_dim, args.depth, args.lr,
                             batch_size=args.batch_size, seed=args.seed)
            q = QSarsaLearner(flat_obs, flat_act, args.hidden_dim, args.depth,
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

        sel = jax.jit(lambda o: bc.select_action(
            policy_params, o.reshape(o.shape[0], -1)
        ).reshape(o.shape[0], *env.action_shape))
        select = lambda o: sel(o)
    else:
        # SAC: conv policy + conv twin critics on the field observations
        # (reference sac_smoke/scripts_SAC/net_2d.py), replay filled online
        # from the real solver env.
        obs0 = np.zeros((1, *obs_hw), np.float32)
        act0 = np.zeros((1, *env.action_shape), np.float32)
        sac = SAC(flat_obs, flat_act, seed=args.seed,
                  batch_size=args.batch_size,
                  policy=ConvGaussPolicy(action_channels=2),
                  q_module=ConvQ, obs_example=obs0, act_example=act0)
        replay = RingReplay(20_000, obs_hw, env.action_shape)
        key = jax.random.PRNGKey(args.seed)
        # seed replay with behavior data
        for ep in range(states.shape[0]):
            replay.push_batch(
                states[ep, :-1], actions[ep], rewards[ep], states[ep, 1:],
                np.concatenate([np.ones(rewards.shape[1] - 1),
                                [0.0]]).astype(np.float32))
        rounds = 0
        while rounds * args.sac_episodes_per_round * args.frames < args.sac_steps:
            for _ in range(args.sac_episodes_per_round):
                obs = env.reset(1, rng)
                done = False
                while not done:
                    o = mask_obs(obs, args.partially_observed)
                    key, k = jax.random.split(key)
                    a = sac.select_action(o, k)
                    obs2, r, done = env.step(a)
                    o2 = mask_obs(obs2, args.partially_observed)
                    replay.push_batch(np.asarray(o), np.asarray(a),
                                      np.asarray(r), np.asarray(o2),
                                      np.asarray([0.0 if done else 1.0]))
                    obs = obs2
            for _ in range(args.frames * args.sac_episodes_per_round):
                ql, pl = sac.update(replay)
            rounds += 1
        results["sac_q_loss"], results["sac_pi_loss"] = ql, pl
        select = jax.jit(lambda o: sac.select_action(o))

    # ---- closed-loop eval --------------------------------------------------
    # from the test set's initial densities when --eval_from_dataset (same
    # episodes the diffusion n=16 eval scores), else fresh random episodes
    t0 = time.time()
    density0 = None
    if args.eval_from_dataset:
        from diffphycon_tpu.training.data import load_smoke_dataset

        test = load_smoke_dataset(args.eval_from_dataset, "test",
                                  n=args.n_test)
        d64 = test[:, 0, :, :, 0]
        density0 = np.repeat(np.repeat(d64, 2, -2), 2, -1)
    _, metrics = run_episode(env, select, args.n_test, rng,
                             args.partially_observed, density0=density0)
    metrics["eval_walltime_s"] = round(time.time() - t0, 2)
    results.update(metrics)
    print(f"{args.method}: J_target={metrics['J_target']:.4f} "
          f"smoke_out={metrics['smoke_out']:.4f} "
          f"J_energy={metrics['J_energy']:.2f}")
    os.makedirs(os.path.dirname(args.save_file) or ".", exist_ok=True)
    with open(args.save_file, "a") as fh:
        fh.write(json.dumps(results) + "\n")
    return results


if __name__ == "__main__":
    main(build_parser().parse_args())
