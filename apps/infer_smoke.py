#!/usr/bin/env python
"""Guided inference / control evaluation for 2D smoke.

TPU-native equivalent of /root/reference/inference/inference_2d_smoke.py:
loads the joint 6-channel and prior 2-channel UNet3D models, runs two-model
DDIM sampling (prior reweighting gamma=w_prob_exp + smoke-out guidance), and
re-simulates the sampled control with the batched on-device solver at 128^2
(reference forks one CPU PhiFlow process per sample).

Example:
  python apps/infer_smoke.py --dataset_path data/smoke \
      --joint_folder trained_models/smoke --w_folder trained_models/smoke_w \
      --diffusion_joint_checkpoint 1 --diffusion_w_checkpoint 1
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def build_parser():
    p = argparse.ArgumentParser(description="Smoke guided inference (TPU)")
    p.add_argument("--dataset_path", default="data/smoke", type=str)
    p.add_argument("--batch_size", default=8, type=int)
    p.add_argument("--n_test_samples", default=8, type=int)
    p.add_argument("--joint_folder", default="trained_models/smoke", type=str)
    p.add_argument("--w_folder", default="trained_models/smoke_w", type=str)
    p.add_argument("--diffusion_joint_checkpoint", default=50, type=int)
    p.add_argument("--diffusion_w_checkpoint", default=17, type=int)
    p.add_argument("--use_ema", default=True, type=eval)
    p.add_argument("--inference_result_path", default="smoke_results", type=str)

    p.add_argument("--w_energy", default=0.0, type=float)
    p.add_argument("--using_ddim", default=True, type=eval)
    p.add_argument("--ddim_eta", default=1.0, type=float)
    p.add_argument("--ddim_sampling_steps", default=100, type=int)
    p.add_argument("--w_prob_exp", default=0.97, type=float)
    p.add_argument("--design_guidance", default="standard", type=str)
    p.add_argument("--standard_fixed_ratio", default=100000.0, type=float)
    p.add_argument("--coeff_ratio", default=0.0, type=float)
    p.add_argument("--dim", default=64, type=int)
    p.add_argument("--dim_mults", nargs="+", default=[1, 2, 4], type=int)
    p.add_argument("--beta_schedule", default="linear", type=str)
    p.add_argument("--solver_accuracy", default=1e-6, type=float)
    p.add_argument("--bf16", default=False, type=eval)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--cpu", action="store_true",
                   help="force the host backend (micro-scale testing)")
    p.add_argument("--calibrate", default=True, type=eval,
                   help="also evaluate zero-control and dataset-control "
                        "rollouts to anchor the J scale")
    p.add_argument("--calibrate_only", default=False, type=eval,
                   help="skip model loading/sampling; emit only the "
                        "calibration rows (dataset quality check)")
    p.add_argument("--scan_chunks", default=1, type=int,
                   help="split the denoise scan into N host-synced segments "
                        "(bit-identical; axon long-scan workaround)")
    return p


def main(args):
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from diffphycon_tpu.benchmarks import smoke as bench
    from diffphycon_tpu.physics.fluids.smoke_env import SmokeSim
    from diffphycon_tpu.training import Trainer
    from diffphycon_tpu.training.data import load_smoke_dataset

    cfg = bench.SmokeConfig(
        dim=args.dim, dim_mults=tuple(args.dim_mults),
        using_ddim=args.using_ddim, ddim_eta=args.ddim_eta,
        ddim_sampling_steps=args.ddim_sampling_steps,
        w_prob_exp=args.w_prob_exp,
        standard_fixed_ratio=args.standard_fixed_ratio,
        coeff_ratio=args.coeff_ratio, design_guidance=args.design_guidance,
        w_energy=args.w_energy, beta_schedule=args.beta_schedule,
        bf16=args.bf16,
    )
    cfg_w = bench.SmokeConfig(**{**cfg.__dict__, "is_w_model": True})

    if not args.calibrate_only:
        net_joint = bench.build_unet(cfg)
        net_w = bench.build_unet(cfg_w)
        params_joint = Trainer.load_params(args.joint_folder,
                                           args.diffusion_joint_checkpoint,
                                           use_ema=args.use_ema)
        params_w = Trainer.load_params(args.w_folder,
                                       args.diffusion_w_checkpoint,
                                       use_ema=args.use_ema)
        gd = bench.build_diffusion(cfg, net_joint.apply,
                                   model_w_apply=net_w.apply)
        guidance = bench.build_guidance(cfg)

    data = load_smoke_dataset(args.dataset_path, "test",
                              n=args.n_test_samples)  # (N, 33|256, 64, 64, 6)
    if data.shape[1] >= 256:
        # reference-layout test sims keep all 256 frames; the pipeline
        # subsamples ::8 to the 32-frame model rate (run_model
        # inference_2d_smoke.py:179-196). Self-generated test sims are
        # already recorded at 33 frames.
        data = data[:, ::8]
    n = data.shape[0]
    bs = min(args.batch_size, n)
    r = jnp.asarray(bench.RESCALER)

    if args.calibrate_only:
        sampler = None
    elif args.scan_chunks <= 1:
        sampler = jax.jit(
            lambda p, key, init: gd.sample(
                p, key, batch_size=init.shape[0],
                cond_vals={"init": init}, guidance=guidance,
            )
        )
    else:
        chunk_fn = jax.jit(
            lambda p, key, init, x, ts: gd.sample_chunk(
                p, key, x, ts, {"init": init}, guidance))

        def sampler(p, key, init):
            key2, k0 = jax.random.split(key)
            del key2
            x = gd.sample_init(k0, init.shape[0])
            ts = gd.sample_ts()
            n_steps = (ts[0] if isinstance(ts, tuple) else ts).shape[0]
            chunk = -(-n_steps // args.scan_chunks)
            for j in range(0, n_steps, chunk):
                sl = (tuple(a[j : j + chunk] for a in ts)
                      if isinstance(ts, tuple) else ts[j : j + chunk])
                x = chunk_fn(p, key, init, x, sl)
                np.asarray(x)  # host sync between segments
            return gd.sample_finalize(x)
    sim = SmokeSim.create(accuracy=args.solver_accuracy)
    evaluate = jax.jit(
        lambda pred, d: {
            k: v
            for k, v in bench.evaluate_samples(
                sim, pred, d, w_energy=args.w_energy
            ).items()
            if k != "sim_traj"
        }
    )

    metrics = []
    sample_s = 0.0
    t0 = time.time()
    steps_per_s = 0.0
    if not args.calibrate_only:
        for i in range(0, n, bs):
            d = jnp.asarray(data[i : i + bs])
            init = d[:, 0, :, :, 0] / r[0]
            ts = time.time()
            x = sampler((params_joint, params_w),
                        jax.random.PRNGKey(args.seed + i), init)
            jax.block_until_ready(x)
            _ = float(np.asarray(x).ravel()[0])  # force completion (PERF r2)
            sample_s += time.time() - ts
            m = evaluate(x, d)
            metrics.append({k: np.asarray(v) for k, v in m.items()})
            print(f"batch {i // bs}: "
                  f"J_target={float(m['J_target'].mean()):.4f} "
                  f"mse={float(m['mse'].mean()):.4f}", flush=True)
        n_loops = max(1, (n + bs - 1) // bs)
        steps_per_s = (args.ddim_sampling_steps * n_loops) / max(sample_s,
                                                                 1e-9)
        print(f"two-model DDIM loop: {steps_per_s:.2f} denoise steps/s "
              f"(batch {bs}, incl. first-batch compile)", flush=True)
    walltime = time.time() - t0

    agg = ({k: float(np.concatenate([m[k] for m in metrics]).mean())
            for k in metrics[0]} if metrics else {})
    if args.calibrate or args.calibrate_only:
        # anchor rows: what J the solver gives with no control at all and
        # with the dataset's own (ground-truth) control schedule
        cal = {"zero_control": [], "dataset_control": []}
        for i in range(0, n, bs):
            d = jnp.asarray(data[i : i + bs])
            base = d[:, :32] / r
            zero = base.at[..., 3:5].set(0.0)
            cal["zero_control"].append(
                np.asarray(evaluate(zero, d)["J_target"]))
            cal["dataset_control"].append(
                np.asarray(evaluate(base, d)["J_target"]))
        agg["J_target_zero_control"] = float(
            np.concatenate(cal["zero_control"]).mean())
        agg["J_target_dataset_control"] = float(
            np.concatenate(cal["dataset_control"]).mean())
        print(f"calibration: J_target zero-control "
              f"{agg['J_target_zero_control']:.4f}, dataset-control "
              f"{agg['J_target_dataset_control']:.4f}", flush=True)
    agg["walltime_s"] = round(walltime, 2)
    agg["sampling_steps_per_s"] = round(steps_per_s, 2)
    agg["n"] = n
    os.makedirs(args.inference_result_path, exist_ok=True)
    out_file = os.path.join(args.inference_result_path, "results.json")
    with open(out_file, "a") as fh:
        fh.write(json.dumps({"args": vars(args), "metrics": agg}) + "\n")
    if "J_total" in agg:
        print("J_total =", agg["J_total"], "J_target =", agg["J_target"],
              "J_energy =", agg["J_energy"])
        print("mse =", agg["mse"], "n_l2 =", agg["n_l2"])
    print("saved", out_file)
    return agg


if __name__ == "__main__":
    main(build_parser().parse_args())
