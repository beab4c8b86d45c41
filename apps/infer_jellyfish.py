#!/usr/bin/env python
"""Guided inference / control evaluation for the jellyfish benchmark.

TPU-native equivalent of /root/reference/inference/inference_2d_jellyfish.py
(DDPM path): loads the joint (7ch->4ch) and thetas (7ch->1ch) UNet3D models,
the ForceUNet and boundary updater, and runs guided sampling with the
boundary updater inside the scanned loop; reports the control objective
(time-weighted average thrust - reg * sum dtheta^2) evaluated with the
force surrogate, plus a closed-loop rollout through the neural simulator
pipeline (reference sim_ppl_2d.SurrogatePipeline).

Example:
  python apps/infer_jellyfish.py --dataset_path data/jellyfish \
      --joint_folder trained_models/jellyfish \
      --w_folder trained_models/jellyfish_w \
      --surrogate_folder trained_models/surrogates
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_path", default="data/jellyfish", type=str)
    p.add_argument("--n_test_samples", default=8, type=int)
    p.add_argument("--batch_size", default=8, type=int)
    p.add_argument("--joint_folder", default="trained_models/jellyfish")
    p.add_argument("--w_folder", default="trained_models/jellyfish_w")
    p.add_argument("--surrogate_folder", default="trained_models/surrogates")
    p.add_argument("--score_surrogate_folder", default=None,
                   help="surrogates for CLOSED-LOOP SCORING only (guidance "
                        "keeps --surrogate_folder). Point this at a "
                        "disjoint-split surrogate to test whether guidance "
                        "exploits the scoring pipeline (VERDICT r3 #5)")
    p.add_argument("--rescore_thetas", default=None,
                   help="npy of (N, F) saved pred thetas: skip sampling and "
                        "only closed-loop score them")
    p.add_argument("--diffusion_joint_checkpoint", default=1, type=int)
    p.add_argument("--diffusion_w_checkpoint", default=1, type=int)
    p.add_argument("--use_ema", default=True, type=eval)
    p.add_argument("--inference_result_path", default="jellyfish_results")

    p.add_argument("--frames", default=20, type=int)
    p.add_argument("--cond_steps", default=1, type=int)
    p.add_argument("--only_vis_pressure", default=False, type=eval)
    p.add_argument("--sampling_timesteps", default=1000, type=int)
    p.add_argument("--timesteps", default=1000, type=int)
    p.add_argument("--w_prob_exp", default=1.0, type=float)
    p.add_argument("--standard_fixed_ratio", default=0.01, type=float)
    p.add_argument("--coeff_ratio_J", default=0.3, type=float)
    p.add_argument("--coeff_ratio_w", default=0.3, type=float)
    p.add_argument("--design_guidance", default="standard", type=str)
    p.add_argument("--use_guidance_in_model_predictions", default=False,
                   type=eval)
    p.add_argument("--reg_ratio", default=0.0, type=float)
    p.add_argument("--dim", default=64, type=int)
    p.add_argument("--dim_mults", nargs="+", default=[1, 2, 4], type=int)
    p.add_argument("--bf16", default=False, type=eval)
    p.add_argument("--inference_method", default="DDPM",
                   choices=["DDPM", "MPC", "MPC_LBFGS"],
                   help="MPC = receding-horizon replanning through the "
                        "surrogate pipeline (reference "
                        "inference_2d_jellyfish.py:488-806)")
    p.add_argument("--num_iters", default=30, type=int,
                   help="MPC replanning iterations per step")
    p.add_argument("--coef_grad", default=0.05, type=float,
                   help="MPC step size")
    p.add_argument("--lamda", default=1000.0, type=float,
                   help="MPC theta-smoothness weight")
    p.add_argument("--coef_endcondition", default=0.0, type=float)
    p.add_argument("--coef_clip", default=0.0, type=float)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--scan_chunks", default=1, type=int,
                   help="split the denoise scan into N host-synced segments "
                        "(bit-identical numerics; workaround for the axon "
                        "runtime fault on very long on-chip scans, PERF.md)")
    return p


def run_mpc(args, cfg):
    """Receding-horizon MPC evaluation (no diffusion checkpoints needed)."""
    import jax.numpy as jnp
    import numpy as np

    from diffphycon_tpu.baselines.mpc_jellyfish import mpc_receding_horizon
    from diffphycon_tpu.benchmarks import jellyfish as bench
    from diffphycon_tpu.training.data import load_jellyfish_dataset
    from diffphycon_tpu.training.surrogates import load_surrogate

    net_sim = bench.build_simulator_unet(cfg)
    net_bd = bench.build_bd_updater(cfg)
    net_force = bench.build_force_unet(cfg)
    data = load_jellyfish_dataset(args.dataset_path, "test",
                                  n=args.n_test_samples,
                                  only_vis_pressure=args.only_vis_pressure)
    ppl = bench.SurrogatePipeline(
        cfg, net_sim.apply, load_surrogate(args.surrogate_folder, "simulator"),
        net_force.apply, load_surrogate(args.surrogate_folder, "force"),
        net_bd.apply, load_surrogate(args.surrogate_folder,
                                     "boundary_updater"),
        p_min=float(data["norm"]["p_min"]),
        p_max=float(data["norm"]["p_max"]))
    n = data["states"].shape[0]
    bs = min(args.batch_size, n)
    rows = []
    t0 = time.time()
    for i in range(0, n, bs):
        thetas, states, forces = mpc_receding_horizon(
            ppl,
            jnp.asarray(data["states"][i : i + bs, 0]),
            jnp.asarray(data["bd"][i : i + bs, 0]),
            jnp.asarray(data["thetas"][i : i + bs, 0]),
            frames=cfg.frames, num_iters=args.num_iters, lr=args.coef_grad,
            lamda=args.lamda, coef_endcondition=args.coef_endcondition,
            coef_clip=args.coef_clip,
            optimizer="lbfgs" if args.inference_method == "MPC_LBFGS"
            else "adam", seed=args.seed + i)
        from diffphycon_tpu.control.metrics import jellyfish_objective

        f = np.asarray(forces)
        d = np.diff(np.asarray(thetas), axis=1)
        rows.append(np.asarray(jellyfish_objective(f, d, args.reg_ratio)))
        print(f"batch {i // bs}: J={rows[-1].mean():.4f}", flush=True)
    agg = {
        "method": args.inference_method,
        "objective": float(np.concatenate(rows).mean()),
        "walltime_s": round(time.time() - t0, 2),
        "n": n,
    }
    os.makedirs(args.inference_result_path, exist_ok=True)
    with open(os.path.join(args.inference_result_path, "results.json"),
              "a") as fh:
        fh.write(json.dumps({"args": vars(args), "metrics": agg}) + "\n")
    print("MPC objective =", agg["objective"], "walltime:", agg["walltime_s"])
    return agg


def main(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffphycon_tpu.benchmarks import jellyfish as bench
    from diffphycon_tpu.training import Trainer
    from diffphycon_tpu.training.data import load_jellyfish_dataset
    from diffphycon_tpu.training.surrogates import load_surrogate

    cfg = bench.JellyfishConfig(
        dim=args.dim, dim_mults=tuple(args.dim_mults), frames=args.frames,
        cond_steps=args.cond_steps, only_vis_pressure=args.only_vis_pressure,
        timesteps=args.timesteps, sampling_timesteps=args.sampling_timesteps,
        w_prob_exp=args.w_prob_exp,
        standard_fixed_ratio=args.standard_fixed_ratio,
        coeff_ratio_J=args.coeff_ratio_J, coeff_ratio_w=args.coeff_ratio_w,
        design_guidance=args.design_guidance,
        use_guidance_in_model_predictions=args.use_guidance_in_model_predictions,
        reg_ratio=args.reg_ratio, bf16=args.bf16,
    )

    if args.inference_method in ("MPC", "MPC_LBFGS"):
        return run_mpc(args, cfg)

    net_joint = bench.build_joint_unet(cfg)
    net_thetas = bench.build_thetas_unet(cfg)
    net_bd = bench.build_bd_updater(cfg)
    net_force = bench.build_force_unet(cfg)

    params_joint = Trainer.load_params(args.joint_folder,
                                       args.diffusion_joint_checkpoint,
                                       use_ema=args.use_ema)
    params_thetas = Trainer.load_params(args.w_folder,
                                        args.diffusion_w_checkpoint,
                                        use_ema=args.use_ema)
    params_bd = load_surrogate(args.surrogate_folder, "boundary_updater")
    params_force = load_surrogate(args.surrogate_folder, "force")
    params_sim = load_surrogate(args.surrogate_folder, "simulator")
    net_sim = bench.build_simulator_unet(cfg)
    # closed-loop scoring may use a DISJOINT surrogate pipeline so the score
    # cannot be inflated by guidance exploiting the very nets that score it
    score_folder = args.score_surrogate_folder or args.surrogate_folder
    params_bd_sc = load_surrogate(score_folder, "boundary_updater")
    params_force_sc = load_surrogate(score_folder, "force")
    params_sim_sc = load_surrogate(score_folder, "simulator")

    # params as jit ARGUMENTS (closing over them embeds them in the compile
    # payload -> remote-compile HTTP 413, PERF.md measurement traps)
    data = load_jellyfish_dataset(args.dataset_path, "test",
                                  n=args.n_test_samples,
                                  only_vis_pressure=args.only_vis_pressure)
    norm = data["norm"]

    def _rollout(ps, pf, pb, s0, b0, th):
        ppl = bench.SurrogatePipeline(cfg, net_sim.apply, ps,
                                      net_force.apply, pf, net_bd.apply, pb,
                                      p_min=float(norm["p_min"]),
                                      p_max=float(norm["p_max"]))
        return ppl.rollout(s0, b0, th)

    rollout_jit = jax.jit(_rollout)
    rollout = lambda s0, b0, th: rollout_jit(params_sim_sc, params_force_sc,
                                             params_bd_sc, s0, b0, th)

    gd = bench.JellyfishDiffusion(cfg, net_joint.apply,
                                  thetas_apply=net_thetas.apply,
                                  bd_updater_apply=net_bd.apply)
    design_fn = bench.make_force_design_fn(
        cfg, net_force.apply, params_force, net_bd.apply, params_bd,
        norm["p_min"], norm["p_max"])

    if args.scan_chunks <= 1:
        sample = jax.jit(
            lambda p, key, s0, b0, th0: gd.sample(p, key, s0, b0, th0,
                                                  design_fn=design_fn)
        )
    else:
        chunk_fn = jax.jit(
            lambda p, key, s0, b0, th0, x, ts: gd.sample_chunk(
                p, key, s0, b0, th0, x, ts, design_fn=design_fn)
        )

        def sample(p, key, s0, b0, th0):
            k0, _ = jax.random.split(key)
            x = gd.sample_init(k0, s0, b0, th0)
            ts = gd.sample_ts()
            n = (ts[0] if isinstance(ts, tuple) else ts).shape[0]
            chunk = -(-n // args.scan_chunks)
            for i in range(0, n, chunk):
                sl = (tuple(a[i : i + chunk] for a in ts)
                      if isinstance(ts, tuple) else ts[i : i + chunk])
                x = chunk_fn(p, key, s0, b0, th0, x, sl)
                np.asarray(x)  # host sync between segments
            return gd.sample_finalize(x)

    def objective(pred_states, pred_theta, b0):
        """Guidance objective value of the sampled plan (reference
        inference_2d_jellyfish.py:107-110)."""
        pressure = pred_states[..., cfg.n_state - 1]
        pressure = (0.5 * pressure + 0.5) * (
            norm["p_max"] - norm["p_min"]) + norm["p_min"]
        # evaluate frame by frame with lax.map: the flattened (B*F) pass
        # through bd-updater + ForceUNet overruns v5e-1 HBM (r2 campaign)
        def frame_force(args_t):
            delta_t, press_t = args_t
            bd_t = net_bd.apply(params_bd, b0, delta_t)
            inp = jnp.concatenate([press_t[..., None], bd_t], axis=-1)
            return net_force.apply(params_force, inp)[:, 0]

        force = jax.lax.map(
            frame_force,
            (jnp.swapaxes(pred_theta, 0, 1),
             jnp.swapaxes(pressure, 0, 1)))
        force = jnp.swapaxes(force, 0, 1)  # (B, F)
        from diffphycon_tpu.control.metrics import jellyfish_objective

        dtheta = pred_theta[:, 1:] - pred_theta[:, :-1]
        return jellyfish_objective(force, dtheta, args.reg_ratio)

    n = data["states"].shape[0]
    bs = min(args.batch_size, n)
    all_obj, all_obj_cl, all_theta_mae, all_pred_theta = [], [], [], []
    t0 = time.time()
    from diffphycon_tpu.control.metrics import jellyfish_objective

    saved_thetas = (np.load(args.rescore_thetas)
                    if args.rescore_thetas else None)
    for i in range(0, n, bs):
        s0 = jnp.asarray(data["states"][i : i + bs, 0])
        b0 = jnp.asarray(data["bd"][i : i + bs, 0])
        th0 = jnp.asarray(data["thetas"][i : i + bs, 0])
        th_gt = data["thetas"][i : i + bs, : cfg.frames]
        p = (params_joint, params_thetas, params_bd)
        if saved_thetas is not None:
            pred_theta = jnp.asarray(saved_thetas[i : i + bs])
            obj = jnp.zeros((pred_theta.shape[0],))
        else:
            pred_states, pred_theta = sample(
                p, jax.random.PRNGKey(args.seed + i), s0, b0, th0)
            obj = objective(pred_states, pred_theta, b0)
        all_pred_theta.append(np.asarray(pred_theta))
        all_obj.append(np.asarray(obj))
        # closed-loop score: execute the sampled theta schedule through the
        # surrogate pipeline, the SAME evaluation MPC gets (reference
        # sim_ppl_2d rollouts) -> directly comparable objectives
        _, forces_cl = rollout(s0, b0, pred_theta)
        d_cl = np.diff(np.asarray(pred_theta), axis=1)
        all_obj_cl.append(np.asarray(
            jellyfish_objective(np.asarray(forces_cl), d_cl,
                                args.reg_ratio)))
        all_theta_mae.append(
            np.abs(np.asarray(pred_theta) - th_gt).mean(axis=1))
        print(f"batch {i // bs}: objective={float(np.asarray(obj).mean()):.4f}"
              f" closed_loop={float(all_obj_cl[-1].mean()):.4f}",
              flush=True)
    walltime = time.time() - t0

    agg = {
        # In --rescore_thetas mode no open-loop objective is computed; write
        # None rather than an indistinguishable-from-measured 0.0 (ADVICE r4).
        "objective": (None if saved_thetas is not None
                      else float(np.concatenate(all_obj).mean())),
        "objective_closed_loop": float(np.concatenate(all_obj_cl).mean()),
        "theta_mae_vs_gt": float(np.concatenate(all_theta_mae).mean()),
        "walltime_s": round(walltime, 2),
        "n": n,
    }
    os.makedirs(args.inference_result_path, exist_ok=True)
    if saved_thetas is None:
        # persist sampled theta schedules so later rounds can rescore them
        # through other surrogates without re-sampling (reference saves pred
        # npy too, inference_2d_jellyfish.py:316-326)
        np.save(os.path.join(args.inference_result_path,
                             f"pred_thetas_seed{args.seed}.npy"),
                np.concatenate(all_pred_theta, 0))
    with open(os.path.join(args.inference_result_path, "results.json"),
              "a") as fh:
        fh.write(json.dumps({"args": vars(args), "metrics": agg}) + "\n")
    print("objective =", agg["objective"], "walltime:", agg["walltime_s"])
    return agg


if __name__ == "__main__":
    main(build_parser().parse_args())
