#!/usr/bin/env python
"""Train the jellyfish joint (EBM "states") or prior ("thetas") diffusion
model.

TPU-native equivalent of /root/reference/train/train_2d_jellyfish.py +
the jellyfish Trainer (diffusion_2d_jellyfish.py:1100-1299). The joint model
trains with the energy parameterization (loss on the gradient of
-||net(x)||^2, grad-of-grad); the thetas model is a plain eps matcher.

Example:
  python apps/train_jellyfish.py --dataset_path data/jellyfish \
      --model_type states
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def build_parser():
    p = argparse.ArgumentParser(description="Train jellyfish DDPM (TPU)")
    p.add_argument("--dataset_path", default="data/jellyfish", type=str)
    p.add_argument("--synthetic_data", default=0, type=int,
                   help="if >0, generate N synthetic sims into dataset_path")
    p.add_argument("--model_type", default="states",
                   choices=["states", "thetas"])
    p.add_argument("--n_sims", default=None, type=int)
    p.add_argument("--frames", default=20, type=int)
    p.add_argument("--cond_steps", default=1, type=int)
    p.add_argument("--only_vis_pressure", default=False, type=eval)
    p.add_argument("--train_num_steps", default=700000, type=int)
    p.add_argument("--checkpoint_interval", default=10000, type=int)
    p.add_argument("--batch_size", default=16, type=int)
    p.add_argument("--grad_accum", default=1, type=int,
                   help="micro-batch accumulation (EBM grad-of-grad training "
                        "needs tiny per-device batches on v5e-1)")
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--results_folder", default=None, type=str)
    p.add_argument("--dim", default=64, type=int)
    p.add_argument("--dim_mults", nargs="+", default=[1, 2, 4], type=int)
    p.add_argument("--joint_out_dim", default=None, type=int,
                   help="None: n_state+1 (inference-compatible); the "
                        "reference train entry used n_state (see SURVEY)")
    p.add_argument("--bf16", default=False, type=eval)
    p.add_argument("--remat_all", default=True, type=eval,
                   help="rematerialize all UNet3D blocks (EBM grad-of-grad "
                        "training otherwise exceeds v5e-1 HBM)")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--resume", default=False, type=eval,
                   help="auto-restore the latest checkpoint in results_folder")
    return p


def main(args):
    import numpy as np
    import jax

    from diffphycon_tpu.benchmarks import jellyfish as bench
    from diffphycon_tpu.training import Trainer, TrainerConfig
    from diffphycon_tpu.training.data import (
        load_jellyfish_dataset,
        synthetic_jellyfish,
    )

    if args.synthetic_data > 0:
        train_dir = os.path.join(args.dataset_path, "train_data")
        if not os.path.exists(os.path.join(train_dir, "states")):
            print(f"generating {args.synthetic_data} synthetic sims...")
            synthetic_jellyfish(args.synthetic_data, train_dir,
                                seed=args.seed)

    cfg = bench.JellyfishConfig(
        dim=args.dim, dim_mults=tuple(args.dim_mults), frames=args.frames,
        cond_steps=args.cond_steps, only_vis_pressure=args.only_vis_pressure,
        bf16=args.bf16, remat_all=args.remat_all,
    )
    data = load_jellyfish_dataset(args.dataset_path, "train", n=args.n_sims,
                                  only_vis_pressure=args.only_vis_pressure)
    states, bd, thetas = data["states"], data["bd"], data["thetas"]
    print(f"states {states.shape} bd {bd.shape} thetas {thetas.shape}")

    if args.model_type == "states":
        net = bench.build_joint_unet(cfg)
    else:
        net = bench.build_thetas_unet(cfg)
    import jax.numpy as jnp

    params = net.init(
        jax.random.PRNGKey(args.seed),
        jnp.zeros((1, cfg.frames, cfg.image_size, cfg.image_size,
                   cfg.joint_channels)),
        jnp.zeros((1,)),
    )
    gd = bench.JellyfishDiffusion(cfg, net.apply,
                                  thetas_apply=net.apply)

    # 20-frame training windows from 40-frame sims (reference Jellyfish
    # dataset windowing, data_2d.py:65-84)
    t_total = states.shape[1]
    n_windows = t_total - cfg.frames
    rng = np.random.default_rng(args.seed)

    def batches():
        while True:
            i = rng.integers(0, states.shape[0], args.batch_size)
            t0 = rng.integers(0, max(n_windows, 1))
            sl = slice(t0, t0 + cfg.frames)
            yield (states[i, sl], bd[i, sl], thetas[i, sl])

    sub = ("jellyfish" if args.model_type == "states" else "jellyfish_w")
    results_folder = args.results_folder or f"./trained_models/{sub}/"
    tcfg = TrainerConfig(
        train_batch_size=args.batch_size, train_lr=args.lr,
        train_num_steps=args.train_num_steps,
        gradient_accumulate_every=args.grad_accum,
        save_and_sample_every=args.checkpoint_interval,
        results_folder=results_folder, lr_schedule="multistep",
        seed=args.seed,
    )
    model_type = args.model_type

    class _GD:
        """Adapter: Trainer drives GaussianDiffusion.loss(params, key, batch,
        cond); route to the jellyfish loss instead."""

        @staticmethod
        def loss(params, key, batch, cond):
            return gd.loss(params, key, batch, model_type)

    trainer = Trainer(_GD, params, batches(), lambda b: None, tcfg)
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
