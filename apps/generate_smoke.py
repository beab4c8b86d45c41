#!/usr/bin/env python
"""Generate the 2D smoke dataset with the TPU-native solver.

Equivalent of /root/reference/dataset/apps/a_gen_dataset_128.py
(exp2_same_side_128): sample a waypoint path from a random start box through
three horizontal target lines to the top exit, convert it into a
piecewise-constant peripheral control-velocity schedule, simulate 256 steps
on the 128^2 obstacle scenario, and write per-sim
Density/Velocity/Control/Smoke .npy files in the reference layout (H, W, C, T)
downsampled to 64^2 x 33 frames.

Where the reference forks CPU processes, this runs the solver batched on the
TPU device.

Example:
  python apps/generate_smoke.py --n_train 64 --n_test 8 --out data/smoke
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def closest_multiple(num, scale):
    lower = (num // scale) * scale
    upper = lower + scale
    return lower if abs(num - lower) < abs(num - upper) else upper


def sample_waypoints(rng):
    """(reference exp2_target_128, a_gen_dataset_128.py:348-378)."""
    m = 4
    start_x = closest_multiple(int(rng.integers(16 + 2 + m, 112 - 10 - m)), 2)
    start_y = closest_multiple(int(rng.integers(16 + 2 + m, 40 - 10 - m)), 2)
    a = 0 if start_x < 64 - 8 else 1
    t1_x = int(rng.integers(16 + m, 64 - 8)) if a == 0 else int(
        rng.integers(64, 112 - 8 - m))
    t2_x = int(rng.integers(16 + m, 64 - 8)) if a == 0 else int(
        rng.integers(64, 112 - 8 - m))
    t3_x = int(rng.integers(50, 80 - 1 - 8))
    end_x = int(rng.integers(64 - 8, 64 + 8 - 8))
    xs = [start_x, t1_x, t2_x, t3_x, end_x]
    ys = [start_y, 40, 50, 64, 112]
    return xs, ys


def control_schedule(rng, xs, ys, num_t=256, y_scale=4.0, min_scale=2.0,
                     max_scale=5.0, record_scale=8):
    """Piecewise-constant (vx, vy) per segment
    (reference get_per_vel, a_gen_dataset_128.py:300-346)."""
    seg = [
        np.hypot(xs[i + 1] - xs[i], ys[i + 1] - ys[i]) for i in range(4)
    ]
    dist = sum(seg)
    v = dist / num_t
    scale = rng.uniform(min_scale, max_scale)
    vxs, vys = [], []
    for i in range(4):
        vxs.append(scale * v * (xs[i + 1] - xs[i]) / seg[i])
        vys.append(y_scale * v * (ys[i + 1] - ys[i]) / seg[i])
    iv = [int(num_t * s / dist) for s in seg[:3]]
    iv = [closest_multiple(x, record_scale) for x in iv]
    intervals = [iv[0] + 1, iv[1], iv[2]]
    intervals.append(num_t - sum(intervals))
    c1 = np.zeros((num_t, 128, 128), np.float32)
    c2 = np.zeros((num_t, 128, 128), np.float32)
    t0 = 0
    for i, n in enumerate(intervals):
        c1[t0 : t0 + n] = vxs[i]
        c2[t0 : t0 + n] = vys[i]
        t0 += n
    return c1, c2


def main(args):
    import jax
    import jax.numpy as jnp

    from diffphycon_tpu.physics.fluids.smoke_env import SmokeSim, smoke_solver

    sim = SmokeSim.create(accuracy=args.accuracy,
                          max_iterations=args.max_iterations)
    run = jax.jit(
        lambda v, d, a, b: smoke_solver(sim, v, d, a, b, num_t=257)
    )

    for split, n_sims in [("train", args.n_train),
                          ("test/control", args.n_test)]:
        if n_sims == 0:
            continue
        base = os.path.join(args.out, split)
        os.makedirs(base, exist_ok=True)
        rng = np.random.default_rng(args.seed + (0 if split == "train" else 1))
        bs = args.batch
        for start in range(0, n_sims, bs):
            b = min(bs, n_sims - start)
            dens0 = np.zeros((b, 127, 127), np.float32)
            c1 = np.zeros((b, 256, 128, 128), np.float32)
            c2 = np.zeros((b, 256, 128, 128), np.float32)
            for j in range(b):
                xs, ys = sample_waypoints(rng)
                # 10x10 density block at the start (initialize_gas_exp2_128)
                dens0[j, ys[0] : ys[0] + 10, xs[0] : xs[0] + 10] = 1.0
                c1[j], c2[j] = control_schedule(rng, xs, ys)
            init_d = np.zeros((b, 128, 128), np.float32)
            init_d[:, :127, :127] = dens0
            init_v = jnp.zeros((b, 128, 128, 2)).at[..., 1].set(args.initial_vy)
            out = run(init_v, jnp.asarray(init_d), jnp.asarray(c1),
                      jnp.asarray(c2))
            dens = np.asarray(out["densitys"])[:, ::8, ::2, ::2]
            vel = np.asarray(out["velocitys"])[:, ::8, ::2, ::2]
            bucket = np.asarray(out["bucket_mass"])[:, ::8]  # (b, 33, 7)
            remain = np.asarray(out["zero_densitys"]).sum((-1, -2))[:, ::8]
            c1_rec = c1[:, ::8, ::2, ::2]
            c2_rec = c2[:, ::8, ::2, ::2]
            # c has only 32 frames of schedule; pad to 33 with the last frame
            c1_rec = np.concatenate([c1_rec, c1_rec[:, -1:]], 1)
            c2_rec = np.concatenate([c2_rec, c2_rec[:, -1:]], 1)
            for j in range(b):
                sim_dir = os.path.join(base, f"sim_{start + j:06d}")
                os.makedirs(sim_dir, exist_ok=True)
                # reference layout: (H, W, C, T)
                cc = np.ascontiguousarray
                np.save(os.path.join(sim_dir, "Density.npy"),
                        cc(np.transpose(dens[j][..., None], (1, 2, 3, 0))))
                np.save(os.path.join(sim_dir, "Velocity.npy"),
                        cc(np.transpose(vel[j], (1, 2, 3, 0))))
                ctrl = np.stack([c1_rec[j], c2_rec[j]], axis=-1)
                np.save(os.path.join(sim_dir, "Control.npy"),
                        cc(np.transpose(ctrl, (1, 2, 3, 0))))
                smoke = np.concatenate([bucket[j], remain[j][:, None]], -1)
                np.save(os.path.join(sim_dir, "Smoke.npy"), cc(smoke))
            print(f"{split}: wrote sims {start}..{start + b - 1}", flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="data/smoke", type=str)
    p.add_argument("--n_train", default=64, type=int)
    p.add_argument("--n_test", default=8, type=int)
    p.add_argument("--batch", default=8, type=int)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--initial_vy", default=0.0, type=float)
    p.add_argument("--accuracy", default=1e-6, type=float)
    p.add_argument("--max_iterations", default=500, type=int)
    main(p.parse_args())
