#!/usr/bin/env python
"""Generate the 2D smoke dataset with the TPU-native solver.

Equivalent of /root/reference/dataset/apps/a_gen_dataset_128.py
(exp2_same_side_128): sample a waypoint path from a random start box through
three horizontal target lines to the top exit, convert it into per-segment
control velocities, simulate 256 steps on the 128^2 obstacle scenario with
the reference's control semantics, and write per-sim
Density/Velocity/Control/Smoke .npy files in the reference layout (H, W, C, T)
downsampled to 64^2 x 33 frames.

Reference-parity semantics this generator reproduces (r4; the r3 version's
piecewise-constant controls only reached J_target -0.083):
  - per-segment velocities get get_real_vel jitter N(v, |v|/4)
    (a_gen_dataset_128.py:206-216);
  - fresh per-cell control draws N(v_seg, |v_seg|/10) at segment starts,
    velocity-carryover + N(0, 0.1) ring control in between (get_envolve
    :415-481) — a feedback loop, not a constant schedule;
  - initial velocity is the uniform updraft (0, 0.8)
    (evaluate_solver.init_velocity_ :113-115);
  - REJECTION SAMPLING: a scene is kept only if > filter_rate of its total
    smoke exits through the target bucket (index 1) and the total mass stays
    in a band (loop_write_0423 :852-860: target_rate > 0.8 under --filter).

The reference never records the CLI args used for its released dataset; the
y-velocity scale default here (y_scale=8) was calibrated empirically: running
the actual reference generator on CPU, y_scale=4 yields target_rate ~0.02
while y_scale=8 yields ~0.999 (see PERF.md r4).

Where the reference forks CPU processes, this runs the solver batched on the
TPU device and filters host-side.

Example:
  python apps/generate_smoke.py --n_train 512 --n_test 16 --out data/smoke
"""

import argparse
import json
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


def segment_schedule(rng, xs, ys, num_t=256, y_scale=8.0, min_scale=2.0,
                     max_scale=5.0, record_scale=8):
    """Per-segment (vx, vy) with get_real_vel jitter plus fresh-draw frame
    indices (reference get_per_vel, a_gen_dataset_128.py:300-346; the fresh
    draws land at steps 0, i0-1, i0+i1-1, i0+i1+i2-1 per the loop structure
    of loop_write_0423).

    Returns (seg_v (4, 2), seg_starts (4,) int32).
    """
    seg = [np.hypot(xs[i + 1] - xs[i], ys[i + 1] - ys[i]) for i in range(4)]
    dist = sum(seg)
    v = dist / num_t
    scale = rng.uniform(min_scale, max_scale)

    def real_vel(vel):
        # get_real_vel (:206-216): N(v, |v|/4)
        return rng.normal(vel, abs(vel) / 4.0)

    seg_v = np.zeros((4, 2), np.float32)
    for i in range(4):
        seg_v[i, 0] = real_vel(scale * v * (xs[i + 1] - xs[i]) / seg[i])
        seg_v[i, 1] = real_vel(y_scale * v * (ys[i + 1] - ys[i]) / seg[i])
    iv = [int(num_t * s / dist) for s in seg[:3]]
    iv = [closest_multiple(x, record_scale) for x in iv]
    intervals = [iv[0] + 1, iv[1], iv[2]]
    seg_starts = np.array(
        [0, intervals[0] - 1, intervals[0] + intervals[1] - 1,
         intervals[0] + intervals[1] + intervals[2] - 1], np.int32)
    return seg_v, seg_starts


def main(args):
    import jax

    if args.cpu:
        # the axon sitecustomize pins JAX_PLATFORMS=axon; only the config
        # update reliably forces the host backend (PERF.md runtime traps)
        jax.config.update("jax_platforms", "cpu")
    # rbg: threefry lowers each in-scan hash to a 5-iteration while loop
    # (~0.8 ms/instance/step on this runtime, PERF.md); the generator draws
    # two (B,128,128,2) normals per step
    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    import jax.numpy as jnp

    from diffphycon_tpu.physics.fluids.smoke_env import (
        SmokeSim,
        generator_rollout,
    )

    sim = SmokeSim.create(accuracy=args.accuracy,
                          max_iterations=args.max_iterations)
    run = jax.jit(
        lambda key, d, sv, ss: generator_rollout(
            sim, key, d, sv, ss, initial_vy=args.initial_vy, num_steps=256)
    )

    stats = {"attempted": 0, "accepted": 0, "rates": []}
    # test split first: it is ~30x cheaper than train, and a wall-clock
    # timeout cutting the train loop short must not strand the evaluator
    # without test sims (seeds are split-keyed, so order doesn't change
    # content)
    for split, n_sims in [("test/control", args.n_test),
                          ("train", args.n_train)]:
        if n_sims == 0:
            continue
        base = os.path.join(args.out, split)
        os.makedirs(base, exist_ok=True)
        rng = np.random.default_rng(args.seed + (0 if split == "train" else 1))
        bs = args.batch
        written = 0
        batch_i = 0
        # Rejection sampling must terminate even if a miscalibrated
        # y_scale/filter_rate/seed combo drives acceptance ~0 (ADVICE r4):
        # cap attempted batches at 50x the requested sims and fail loudly
        # with the observed acceptance rate.
        max_batches = max(1, (50 * n_sims + bs - 1) // bs)
        while written < n_sims:
            if batch_i >= max_batches:
                rates = stats["rates"]
                acc = (stats.get("accepted", written) / max(
                    stats["attempted"], 1))
                raise SystemExit(
                    f"generate_smoke: acceptance rate {acc:.4f} after "
                    f"{stats['attempted']} attempts (cap {max_batches} "
                    f"batches); max target_rate seen "
                    f"{max(rates) if rates else 0:.3f} vs filter_rate "
                    f"{args.filter_rate} — recalibrate y_scale/filter_rate")
            dens0 = np.zeros((bs, 128, 128), np.float32)
            seg_v = np.zeros((bs, 4, 2), np.float32)
            seg_starts = np.zeros((bs, 4), np.int32)
            for j in range(bs):
                xs, ys = sample_waypoints(rng)
                # 10x10 density block at the start (initialize_gas_exp2_128)
                dens0[j, ys[0] : ys[0] + 10, xs[0] : xs[0] + 10] = 1.0
                seg_v[j], seg_starts[j] = segment_schedule(
                    rng, xs, ys, y_scale=args.y_scale,
                    min_scale=args.min_scale, max_scale=args.max_scale)
            key = jax.random.PRNGKey(args.seed * 100003 + batch_i
                                     + (0 if split == "train" else 50021))
            batch_i += 1
            out = run(key, jnp.asarray(dens0), jnp.asarray(seg_v),
                      jnp.asarray(seg_starts))
            bucket = np.asarray(out["bucket_mass"])           # (b, 257, 7)
            remain_final = np.asarray(
                out["zero_densitys"][:, -1].sum((-1, -2)))    # (b,)
            total = bucket[:, -1].sum(-1) + remain_final
            target_rate = bucket[:, -1, 1] / np.maximum(total, 1e-9)
            mass_ok = ((total > 100.0 * args.min_sum_rate)
                       & (total < 100.0 * args.max_sum_rate))
            accept = (target_rate > args.filter_rate) & mass_ok
            stats["attempted"] += bs
            stats["rates"].extend(np.round(target_rate, 4).tolist())

            dens = np.asarray(out["densitys"])[:, ::8, ::2, ::2]
            vel = np.asarray(out["velocitys"])[:, ::8, ::2, ::2]
            bucket_rec = bucket[:, ::8]                       # (b, 33, 7)
            remain = np.asarray(
                out["zero_densitys"]).sum((-1, -2))[:, ::8]   # (b, 33)
            # control: 256 applied steps recorded at 0,8,...,248 (32 frames);
            # the 33rd frame is zeros, as in the reference (control_write is
            # never written at index 32)
            ctrl = np.asarray(out["controls"])[:, ::8, ::2, ::2]  # (b,32,...)
            ctrl = np.concatenate([ctrl, np.zeros_like(ctrl[:, :1])], 1)

            for j in range(bs):
                if not accept[j] or written >= n_sims:
                    continue
                sim_dir = os.path.join(base, f"sim_{written:06d}")
                os.makedirs(sim_dir, exist_ok=True)
                cc = np.ascontiguousarray
                # reference layout: (H, W, C, T)
                np.save(os.path.join(sim_dir, "Density.npy"),
                        cc(np.transpose(dens[j][..., None], (1, 2, 3, 0))))
                np.save(os.path.join(sim_dir, "Velocity.npy"),
                        cc(np.transpose(vel[j], (1, 2, 3, 0))))
                np.save(os.path.join(sim_dir, "Control.npy"),
                        cc(np.transpose(ctrl[j], (1, 2, 3, 0))))
                smoke = np.concatenate([bucket_rec[j], remain[j][:, None]], -1)
                np.save(os.path.join(sim_dir, "Smoke.npy"), cc(smoke))
                written += 1
                stats["accepted"] += 1
            print(f"{split}: batch {batch_i}: rates "
                  f"{np.round(target_rate, 3).tolist()} -> "
                  f"{int(accept.sum())} accepted, {written}/{n_sims} written",
                  flush=True)
    with open(os.path.join(args.out, "gen_stats.json"), "w") as fh:
        json.dump({**stats, "args": vars(args)}, fh)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="data/smoke", type=str)
    p.add_argument("--n_train", default=64, type=int)
    p.add_argument("--n_test", default=8, type=int)
    p.add_argument("--batch", default=8, type=int)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--initial_vy", default=0.8, type=float)
    p.add_argument("--y_scale", default=8.0, type=float)
    p.add_argument("--min_scale", default=2.0, type=float)
    p.add_argument("--max_scale", default=5.0, type=float)
    p.add_argument("--filter_rate", default=0.8, type=float,
                   help="reject scenes whose target-bucket share of total "
                        "smoke is below this (reference loop_write_0423 "
                        "target_rate > 0.8)")
    p.add_argument("--min_sum_rate", default=0.2, type=float)
    p.add_argument("--max_sum_rate", default=2.0, type=float)
    p.add_argument("--accuracy", default=1e-6, type=float)
    p.add_argument("--max_iterations", default=500, type=int)
    p.add_argument("--cpu", action="store_true",
                   help="force the host backend (micro-scale testing)")
    main(p.parse_args())
