#!/usr/bin/env python
"""Guided inference / control evaluation for Burgers.

TPU-native equivalent of /root/reference/inference/inference_1d_burgers.py:
loads the joint p(u,w) model (and optionally the prior p(w) model for
two-model prior reweighting), samples controls with guidance, re-simulates
them with the FD solver, and reports J_actual (MSE/MAE/NMSE/NMAE of the final
state) plus control energy. Entire guided sampling (denoiser x2 + guidance
gradient x 1000 steps) runs as one jitted scan on device.

Example:
  python apps/infer_burgers.py --exp_id E0 --wus 1000 --wfs 0 \
      --is_condition_u0 True --is_condition_uT True
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

none_or_str = lambda x: None if x in ("None", None) else x


def build_parser():
    p = argparse.ArgumentParser(description="Burgers guided inference (TPU)")
    p.add_argument("--exp_id", default="gen-control", type=str)
    p.add_argument("--exp_id__model_w", default=None, type=str)
    p.add_argument("--model_root", default="./trained_models", type=str)
    p.add_argument("--checkpoint", default=10, type=int)
    p.add_argument("--checkpoint__model_w", default=10, type=int)
    p.add_argument("--checkpoint_sweep", nargs="+", default=None, type=int,
                   help="evaluate several checkpoints in ONE process (params "
                        "are jit arguments, so the sampler compiles once and "
                        "each extra checkpoint costs only its sample time; "
                        "the same step number is used for the w model)")
    p.add_argument("--save_file", default="burgers_results/result.json", type=str)
    p.add_argument("--dataset", default="free_u_f_1e5", type=str)
    p.add_argument("--data_root", default="data", type=str)
    p.add_argument("--synthetic_data", default=0, type=int)
    p.add_argument("--n_test_samples", default=50, type=int)
    p.add_argument("--batch_size", default=50, type=int)
    p.add_argument("--use_ema", default=True, type=eval)

    p.add_argument("--partial_control", default="full", type=none_or_str)
    p.add_argument("--synthetic_partial_control", default=None,
                   type=none_or_str,
                   help="targets drawn from the partial-control synthetic "
                        "distribution (reference "
                        "free_u_f_1e5_front_rear_quarter)")
    p.add_argument("--partially_observed", default=None, type=none_or_str)
    p.add_argument("--train_on_partially_observed", default=None, type=none_or_str)
    p.add_argument("--set_unobserved_to_zero_during_sampling", default=False,
                   type=eval)

    p.add_argument("--using_ddim", default=False, type=eval)
    p.add_argument("--ddim_eta", default=0.0, type=float)
    p.add_argument("--ddim_sampling_steps", default=1000, type=int)
    p.add_argument("--J_scheduler", default=None, type=none_or_str)
    p.add_argument("--w_scheduler", default=None, type=none_or_str)
    p.add_argument("--proj_guidance", default=None, type=none_or_str,
                   choices=[None, "ep_orthogonal_F", "ep_orthogonal_1D_x",
                            "ep_orthogonal_1D_t"],
                   help="orthogonal-projection guidance combiner "
                        "(reference get_proj_ep_orthogonal_func)")
    p.add_argument("--recurrence", default=False, type=eval)
    p.add_argument("--recurrence_k", default=1, type=int)
    p.add_argument("--wfs", nargs="+", default=[0.0], type=float)
    p.add_argument("--wus", nargs="+", default=[0.0], type=float)
    p.add_argument("--wreg", default=0.0, type=float)

    p.add_argument("--is_condition_u0", default=False, type=eval)
    p.add_argument("--is_condition_uT", default=False, type=eval)
    p.add_argument("--is_condition_u0_zero_pred_noise", default=True, type=eval)
    p.add_argument("--is_condition_uT_zero_pred_noise", default=True, type=eval)

    p.add_argument("--dim", default=64, type=int)
    p.add_argument("--resnet_block_groups", default=1, type=int)
    p.add_argument("--dim_mults", "--dim_muls", dest="dim_mults",
                   nargs="+", default=[1, 2, 4, 8], type=int)
    # separate net hyperparams for the p(w) model (reference __model_w flags)
    p.add_argument("--dim__model_w", default=None, type=int)
    p.add_argument("--dim_mults__model_w", "--dim_muls__model_w",
                   dest="dim_mults__model_w", nargs="+", default=None, type=int)

    p.add_argument("--eval_two_models", default=False, type=eval)
    p.add_argument("--prior_beta", default=1, type=float)
    p.add_argument("--normalize_beta", default=False, type=eval)
    p.add_argument("--bf16", default=False, type=eval)
    p.add_argument("--impl", default="xla", choices=["xla", "pallas"],
                   help="pallas = per-block fused kernels: a MEASURED DEAD END on this runtime (2.6x slower than xla, PERF.md r2); kept for lowering regression coverage")
    return p


def get_target(args):
    """Test-split ground-truth trajectories, unscaled (reference get_target)."""
    import numpy as np

    if args.synthetic_data > 0:
        from diffphycon_tpu.training.data import synthetic_burgers

        u, _ = synthetic_burgers(args.synthetic_data, seed=12345,
                                 partial_control=args.synthetic_partial_control,
                                 cache_dir=os.path.join(args.data_root,
                                                        "synthetic"))
        return u[: args.n_test_samples]
    from diffphycon_tpu.training.data import load_burgers_h5

    path = os.path.join(args.data_root, args.dataset, "burgers_test.h5")
    u, _ = load_burgers_h5(path, "test")
    return u[: args.n_test_samples]


def main(args):
    import jax
    import numpy as np

    from diffphycon_tpu.benchmarks import burgers as bench
    from diffphycon_tpu.training import Trainer

    cfg = bench.BurgersConfig(
        dim=args.dim,
        dim_mults=tuple(args.dim_mults),
        resnet_block_groups=args.resnet_block_groups,
        using_ddim=args.using_ddim,
        ddim_sampling_steps=args.ddim_sampling_steps,
        ddim_eta=args.ddim_eta,
        is_condition_u0=args.is_condition_u0,
        is_condition_uT=args.is_condition_uT,
        partially_observed=args.partially_observed,
        partial_control=args.partial_control,
        train_on_partially_observed=args.train_on_partially_observed,
        set_unobserved_to_zero_during_sampling=args.set_unobserved_to_zero_during_sampling,
        prior_beta=args.prior_beta,
        normalize_beta=args.normalize_beta,
        recurrence=args.recurrence,
        recurrence_k=args.recurrence_k,
        bf16=args.bf16,
    )

    net = bench.build_unet(cfg)
    # with --checkpoint_sweep every checkpoint (incl. the first) is loaded
    # inside the sweep loop; skip the upfront read
    params = None if args.checkpoint_sweep else Trainer.load_params(
        os.path.join(args.model_root, "burgers", args.exp_id),
        args.checkpoint, use_ema=args.use_ema,
    )
    apply_fn = net.apply
    if args.impl == "pallas":
        import warnings

        warnings.warn(
            "--impl pallas selects the research-only per-block Pallas "
            "forward (diffphycon_tpu.research): measured 2.6x SLOWER than "
            "the default XLA path on this runtime (PERF.md r2). Use it only "
            "for kernel-lowering regression checks.", stacklevel=2)
        from diffphycon_tpu.research.pallas_unet2d import (
            pack_unet2d_params,
            unet2d_pallas_apply,
        )

        import jax.numpy as jnp

        params = pack_unet2d_params(
            params, args.dim, tuple(args.dim_mults), args.resnet_block_groups,
            weight_dtype=jnp.bfloat16 if args.bf16 else None)
        apply_fn = lambda p, x, t: unet2d_pallas_apply(p, x, t)
    if args.eval_two_models:
        params_w = None if args.checkpoint_sweep else Trainer.load_params(
            os.path.join(args.model_root, "burgers_w", args.exp_id__model_w),
            args.checkpoint__model_w, use_ema=args.use_ema,
        )
        import dataclasses as _dc

        cfg_w = _dc.replace(
            cfg,
            dim=args.dim__model_w or args.dim,
            dim_mults=tuple(getattr(args, 'dim_mults__model_w', None) or args.dim_mults),
        )
        net_w = bench.build_unet(cfg_w)
        apply_w_fn = net_w.apply
        if args.impl == "pallas":
            import jax.numpy as jnp

            params_w = pack_unet2d_params(
                params_w, cfg_w.dim, tuple(cfg_w.dim_mults),
                args.resnet_block_groups,
                weight_dtype=jnp.bfloat16 if args.bf16 else None)
            apply_w_fn = apply_fn
        gd = bench.build_diffusion(cfg, apply_fn, model_w_apply=apply_w_fn)
        all_params = (params, params_w)
    else:
        gd = bench.build_diffusion(cfg, apply_fn)
        all_params = params

    u_target_all = get_target(args)
    n, bs = args.n_test_samples, min(args.batch_size, args.n_test_samples)
    assert n % bs == 0

    # jit once with params/target as arguments so big param trees are not
    # embedded as HLO constants. The guidance WEIGHTS are traced arguments
    # too: the axon runtime memoizes executions on (program structure,
    # inputs) and ignores jit-baked constants, so two samplers differing
    # only in a constant wu return identical cached results (PERF.md r2).
    def make_sampler(wu, wf):
        def run(p, key, tgt, wu_t, wf_t):
            guidance = bench.build_guidance(
                cfg, tgt, wu=wu_t, wf=wf_t, wreg=args.wreg,
                j_scheduler=args.J_scheduler, w_scheduler=args.w_scheduler,
                proj_guidance=args.proj_guidance,
                enabled=bool(wu) or bool(wf) or bool(args.wreg),
            )
            cond_vals = {
                "u0": tgt[:, 0, :] / bench.RESCALER,
                "uT": tgt[:, 10, :] / bench.RESCALER,
            }
            return gd.sample(p, key, batch_size=bs, cond_vals=cond_vals,
                             guidance=guidance)

        return jax.jit(run)

    def load_all(ck):
        p_j = Trainer.load_params(
            os.path.join(args.model_root, "burgers", args.exp_id),
            ck, use_ema=args.use_ema)
        if not args.eval_two_models:
            return p_j
        p_w = Trainer.load_params(
            os.path.join(args.model_root, "burgers_w", args.exp_id__model_w),
            ck, use_ema=args.use_ema)
        return (p_j, p_w)

    sweep = args.checkpoint_sweep  # None -> single pre-loaded checkpoint
    results = {}
    for wu in args.wus:
        for wf in args.wfs:
            sampler = make_sampler(wu, wf)
            for ck in (sweep or [None]):
                if ck is not None:
                    all_params = load_all(ck)
                rows = []
                t_start = time.time()
                for i in range(n // bs):
                    tgt = jax.numpy.asarray(u_target_all[i * bs : (i + 1) * bs])
                    key = jax.random.PRNGKey(i)
                    x = sampler(all_params, key, tgt,
                                jax.numpy.float32(wu), jax.numpy.float32(wf))
                    res = bench.evaluate_samples(x, tgt, cfg)
                    rows.append(res)
                walltime = time.time() - t_start
                j_mse = np.concatenate([r.j_actual[0] for r in rows])
                j_mae = np.concatenate([r.j_actual[2] for r in rows])
                j_nmse = np.concatenate([r.j_actual[4] for r in rows])
                j_nmae = np.concatenate([r.j_actual[5] for r in rows])
                energy = np.concatenate([r.control_energy for r in rows])
                ddpm_mse = np.concatenate([r.ddpm_mse for r in rows])
                entry = {
                    "J_actual_mse": float(j_mse.mean()),
                    "J_actual_mae": float(j_mae.mean()),
                    "J_actual_nmse": float(j_nmse.mean()),
                    "J_actual_nmae": float(j_nmae.mean()),
                    "control_energy": float(energy.mean()),
                    "ddpm_mse": float(ddpm_mse.mean()),
                    "walltime_s": round(walltime, 3),
                    "n": n,
                }
                key_name = (f"wu={wu},wf={wf}" if ck is None
                            else f"ckpt={ck},wu={wu},wf={wf}")
                results[key_name] = entry
                print(f"[{key_name}] "
                      f"J_actual(mse)={entry['J_actual_mse']:.6f} "
                      f"energy={entry['control_energy']:.2f} "
                      f"ddpm_mse={entry['ddpm_mse']:.6f} ({walltime:.1f}s)",
                      flush=True)
                # save after every sweep point: a campaign clock-cut
                # mid-sweep must not erase the combos that already finished
                os.makedirs(os.path.dirname(args.save_file) or ".",
                            exist_ok=True)
                with open(args.save_file, "w") as fh:
                    json.dump(results, fh, indent=2)

    print("saved", args.save_file, flush=True)
    return results


if __name__ == "__main__":
    main(build_parser().parse_args())
