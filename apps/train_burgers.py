#!/usr/bin/env python
"""Train the Burgers joint p(u,w) or prior p(w) diffusion model.

TPU-native equivalent of /root/reference/train/train_1d_burgers.py — same
flag names; data-parallel over all local devices via the mesh instead of
accelerate launch.

Examples:
  python apps/train_burgers.py --dataset free_u_f_1e5 --is_condition_u0 True
  python apps/train_burgers.py --is_model_w True --is_condition_u0 True \
      --is_condition_uT True
  python apps/train_burgers.py --synthetic_data 2048 --train_num_steps 2000
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

none_or_str = lambda x: None if x in ("None", None) else x


def build_parser():
    p = argparse.ArgumentParser(description="Train Burgers DDPM (TPU)")
    p.add_argument("--exp_id", default="gen-control", type=str)
    p.add_argument("--dataset", default="free_u_f_1e5", type=str)
    p.add_argument("--data_root", default="data", type=str,
                   help="directory holding <dataset>/burgers_train.h5")
    p.add_argument("--synthetic_partial_control", default=None,
                   type=none_or_str,
                   help="generate the synthetic dataset with control "
                        "restricted to the front/rear quarter (the "
                        "reference's free_u_f_1e5_front_rear_quarter "
                        "FOPC/POPC dataset)")
    p.add_argument("--synthetic_data", default=0, type=int,
                   help="if >0, generate N synthetic samples with the JAX "
                        "solver instead of reading h5 (self-contained runs)")
    p.add_argument("--train_num_steps", default=100000, type=int)
    p.add_argument("--checkpoint_interval", default=10000, type=int)
    p.add_argument("--batch_size", default=16, type=int)
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--results_folder", default=None, type=str)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--cpu", action="store_true",
                   help="force the host backend")
    p.add_argument("--resume", default=False, type=eval,
                   help="auto-restore the latest checkpoint in results_folder")

    p.add_argument("--is_condition_u0", default=False, type=eval)
    p.add_argument("--is_condition_uT", default=False, type=eval)
    p.add_argument("--is_condition_u0_zero_pred_noise", default=True, type=eval)
    p.add_argument("--is_condition_uT_zero_pred_noise", default=True, type=eval)
    p.add_argument("--partially_observed", default=None, type=none_or_str)
    p.add_argument("--train_on_partially_observed", default=None, type=none_or_str)
    p.add_argument("--set_unobserved_to_zero_during_sampling", default=False,
                   type=eval)
    p.add_argument("--recurrence", default=False, type=eval)
    p.add_argument("--recurrence_k", default=1, type=int)
    p.add_argument("--using_ddim", default=False, type=eval)
    p.add_argument("--ddim_eta", default=0.0, type=float)
    p.add_argument("--ddim_sampling_steps", default=1000, type=int)

    p.add_argument("--dim", default=64, type=int)
    p.add_argument("--resnet_block_groups", default=1, type=int)
    p.add_argument("--dim_mults", "--dim_muls", dest="dim_mults",
                   nargs="+", default=[1, 2, 4, 8], type=int)

    p.add_argument("--is_model_w", default=False, type=eval)
    p.add_argument("--prior_beta", default=1, type=float)
    p.add_argument("--bf16", default=False, type=eval)
    return p


def main(args):
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from diffphycon_tpu.benchmarks import burgers as bench
    from diffphycon_tpu.training import Trainer, TrainerConfig
    from diffphycon_tpu.training.data import (
        ArrayDataset,
        load_burgers_h5,
        stack_burgers_uf,
        synthetic_burgers,
    )

    cfg = bench.BurgersConfig(
        dim=args.dim,
        dim_mults=tuple(args.dim_mults),
        resnet_block_groups=args.resnet_block_groups,
        using_ddim=args.using_ddim,
        ddim_sampling_steps=args.ddim_sampling_steps,
        ddim_eta=args.ddim_eta,
        is_condition_u0=args.is_condition_u0,
        is_condition_uT=args.is_condition_uT,
        is_condition_u0_zero_pred_noise=args.is_condition_u0_zero_pred_noise,
        is_condition_uT_zero_pred_noise=args.is_condition_uT_zero_pred_noise,
        train_on_partially_observed=args.train_on_partially_observed,
        set_unobserved_to_zero_during_sampling=args.set_unobserved_to_zero_during_sampling,
        partially_observed=args.partially_observed,
        is_model_w=args.is_model_w,
        prior_beta=args.prior_beta,
        recurrence=args.recurrence,
        recurrence_k=args.recurrence_k,
        bf16=args.bf16,
    )

    if args.synthetic_data > 0:
        u, f = synthetic_burgers(args.synthetic_data, seed=args.seed,
                                  partial_control=args.synthetic_partial_control,
                                  cache_dir=os.path.join(args.data_root, "synthetic"))
    else:
        path = os.path.join(args.data_root, args.dataset, "burgers_train.h5")
        u, f = load_burgers_h5(path, "train")
    data = stack_burgers_uf(
        u, f, rescaler=bench.RESCALER,
        partially_observed_fill_zero=args.partially_observed,
    )
    print(f"data: {data.shape} (rescaled by {bench.RESCALER})")

    net = bench.build_unet(cfg)
    params = bench.init_params(cfg, args.seed)
    gd = bench.build_diffusion(cfg, net.apply)

    sub = "burgers_w" if args.is_model_w else "burgers"
    results_folder = args.results_folder or f"./trained_models/{sub}/{args.exp_id}/"

    tcfg = TrainerConfig(
        train_batch_size=args.batch_size,
        train_lr=args.lr,
        train_num_steps=args.train_num_steps,
        save_and_sample_every=args.checkpoint_interval,
        results_folder=results_folder,
        seed=args.seed,
    )
    trainer = Trainer(
        gd, params, ArrayDataset(data).batches(args.batch_size, seed=args.seed),
        bench.derive_cond, tcfg,
    )
    if args.resume:
        if trainer.resume():
            print(f"resumed from step {int(trainer.state.step)}")
        else:
            print("no checkpoint found; starting fresh")
    trainer.train()
    trainer.save()
    print("training complete")


if __name__ == "__main__":
    main(build_parser().parse_args())
