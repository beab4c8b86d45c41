#!/usr/bin/env python
"""Train the smoke joint p(u,w) or prior p(w) video diffusion model.

TPU-native equivalent of /root/reference/train/train_2d_smoke.py: UNet3D over
(B, 32, 64, 64, C) with the initial-density conditioning; the w model trains
on the control channel slice [..., 3:5] (reference diffusion_2d_smoke.py:1016).

Example:
  python apps/train_smoke.py --dataset_path data/smoke --is_w_model False
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def build_parser():
    p = argparse.ArgumentParser(description="Train smoke DDPM (TPU)")
    p.add_argument("--dataset_path", default="data/smoke", type=str)
    p.add_argument("--n_sims", default=None, type=int,
                   help="limit number of training sims (None = all)")
    p.add_argument("--is_w_model", default=False, type=eval)
    p.add_argument("--train_num_steps", default=400000, type=int)
    p.add_argument("--checkpoint_interval", default=10000, type=int)
    p.add_argument("--batch_size", default=16, type=int)
    p.add_argument("--grad_accum", default=1, type=int)
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--results_folder", default=None, type=str)
    p.add_argument("--dim", default=64, type=int)
    p.add_argument("--dim_mults", nargs="+", default=[1, 2, 4], type=int)
    p.add_argument("--frames", default=32, type=int)
    p.add_argument("--image_size", default=64, type=int)
    p.add_argument("--beta_schedule", default="linear", type=str)
    p.add_argument("--bf16", default=False, type=eval)
    p.add_argument("--remat_all", default=True, type=eval,
                   help="rematerialize all UNet3D blocks in the train step "
                        "(v5e-1 HBM cannot hold batch-8 activations)")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--cpu", action="store_true",
                   help="force the host backend (micro-scale testing)")
    p.add_argument("--resume", default=False, type=eval,
                   help="auto-restore the latest checkpoint in results_folder")
    return p


def main(args):
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from diffphycon_tpu.benchmarks import smoke as bench
    from diffphycon_tpu.training import Trainer, TrainerConfig
    from diffphycon_tpu.training.data import ArrayDataset, load_smoke_dataset

    cfg = bench.SmokeConfig(
        dim=args.dim, dim_mults=tuple(args.dim_mults), frames=args.frames,
        image_size=args.image_size, is_w_model=args.is_w_model,
        beta_schedule=args.beta_schedule, bf16=args.bf16,
        remat_all=args.remat_all,
    )
    data = load_smoke_dataset(args.dataset_path, "train", n=args.n_sims,
                              frames=args.frames)
    if args.is_w_model:
        data = data[..., 3:5]  # control channels only (reference :1016-1017)
    print(f"data: {data.shape}")

    net = bench.build_unet(cfg)
    params = bench.init_params(cfg, args.seed)
    gd = bench.build_diffusion(cfg, net.apply)

    sub = "smoke_w" if args.is_w_model else "smoke"
    results_folder = args.results_folder or f"./trained_models/{sub}/"
    tcfg = TrainerConfig(
        train_batch_size=args.batch_size,
        train_lr=args.lr,
        train_num_steps=args.train_num_steps,
        gradient_accumulate_every=args.grad_accum,
        save_and_sample_every=args.checkpoint_interval,
        results_folder=results_folder,
        lr_schedule="multistep",
        seed=args.seed,
    )
    trainer = Trainer(
        gd, params,
        ArrayDataset(data).batches(args.batch_size, seed=args.seed),
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
