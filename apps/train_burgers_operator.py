#!/usr/bin/env python
"""Train the 1D Burgers latent surrogate operator (NetF/NetU/NetTrans).

TPU-native equivalent of the reference operator training
(/root/reference/model/pde_1d_surrogate_model/burgers_operator.py:255-358,
autoregress_steps=1 branch): per (u_t, f_t, u_{t+1}) triple

    loss = rel2(f_rec, f) + 0.5*rel(u_rec, u_t)
         + 2.5*rel(decode(trans_latent), u_{t+1})
         + rel(trans_latent, enc_u(u_{t+1}))

with joint Adam (weight_decay 1e-4) + cosine LR, fields scaled by
RESCALER=6.4519 (burgers_operator.py:27). The trained operator backs the
PID/SL/SAC baselines and partial-observation surrogate guidance
(Simu_surrogate_model.simulation, :120-158).

Example:
  python apps/train_burgers_operator.py --synthetic_data 4096 --num_steps 5000
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--synthetic_data", default=4096, type=int)
    p.add_argument("--data_root", default="data", type=str)
    p.add_argument("--num_steps", default=5000, type=int)
    p.add_argument("--batch_size", default=256, type=int)
    p.add_argument("--lr", default=1e-3, type=float)
    p.add_argument("--weight_decay", default=1e-4, type=float)
    p.add_argument("--grad_clip", default=1.0, type=float)
    p.add_argument("--s_ob", default=128, type=int,
                   help="observed resolution (64 = front/rear quarter PO)")
    p.add_argument("--results_folder",
                   default="trained_models/burgers_operator", type=str)
    p.add_argument("--init_from", default=None, type=str,
                   help="warm-start from an existing params_sob* checkpoint "
                        "(continued training at a lower peak lr)")
    p.add_argument("--seed", default=0, type=int)
    return p


def main(args):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from diffphycon_tpu.nets.burgers_operator import (
        RESCALER,
        NetU,
        SurrogateOperator,
    )
    from diffphycon_tpu.training.data import synthetic_burgers

    u, f = synthetic_burgers(args.synthetic_data, seed=0,
                             cache_dir=os.path.join(args.data_root,
                                                    "synthetic"))
    # triples (u_t, f_t, u_{t+1}), t = 0..9, scaled
    u = u / RESCALER
    f = f / RESCALER
    ut = u[:, :-1].reshape(-1, u.shape[-1])
    un = u[:, 1:].reshape(-1, u.shape[-1])
    ft = f.reshape(-1, f.shape[-1])
    if args.s_ob == 64:
        # front/rear-quarter observation (reference s_ob=64 branch :320-330)
        sl = np.r_[0:32, 96:128]
        ut, un = ut[:, sl], un[:, sl]
    print(f"triples: {ut.shape[0]}")

    op = SurrogateOperator(s=128, s_ob=args.s_ob)
    params = jax.jit(op.init, backend="cpu")(jax.random.PRNGKey(args.seed))
    if args.init_from:
        import orbax.checkpoint as ocp
        from pathlib import Path

        ckptr = ocp.StandardCheckpointer()
        params = ckptr.restore(Path(args.init_from).resolve(), params)
        ckptr.close()
        print(f"warm-started from {args.init_from}")
    params = jax.device_put(params)

    h4 = args.s_ob // 4

    def loss_fn(params, ut_b, ft_b, un_b):
        def rel(a, b):
            num = jnp.linalg.norm((a - b).reshape(a.shape[0], -1), axis=1)
            den = jnp.linalg.norm(b.reshape(b.shape[0], -1), axis=1) + 1e-8
            return num / den

        f_in = ft_b[..., None]
        u_in = ut_b[..., None]
        un_in = un_b[..., None]
        f_rec, f_lat = op.net_f.apply(params["f"], f_in)
        u_rec, u_lat = op.net_u.apply(params["u"], u_in)
        _, un_lat = op.net_u.apply(params["u"], un_in)
        if u_lat.shape[-1] < f_lat.shape[-1]:
            f_lat = f_lat[:, : u_lat.shape[-1]] + f_lat[:, u_lat.shape[-1] :]
        trans_lat = op.net_trans.apply(
            params["trans"],
            jnp.concatenate([u_lat.reshape(-1, 8, h4),
                             f_lat.reshape(-1, 8, h4)], axis=1))
        u_next = op.net_u.apply(params["u"], trans_lat.reshape(-1, 8 * h4),
                                method=NetU.decode)
        l1 = rel(f_rec, f_in).mean()
        l2 = rel(u_rec, u_in).mean()
        l3 = rel(u_next, un_in).mean()
        l5 = rel(trans_lat.reshape(-1, 8 * h4), un_lat).mean()
        return l1 + 0.5 * l2 + 2.5 * l3 + l5

    sched = optax.cosine_decay_schedule(args.lr, args.num_steps)
    # rel-norm losses have occasional tiny denominators; clip keeps Adam from
    # blowing up on those spikes (divergence observed at lr 1e-3 unclipped)
    tx = optax.chain(optax.clip_by_global_norm(args.grad_clip),
                     optax.adamw(sched, weight_decay=args.weight_decay))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, ut_b, ft_b, un_b):
        loss, grads = jax.value_and_grad(loss_fn)(params, ut_b, ft_b, un_b)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(args.seed)
    n = ut.shape[0]
    os.makedirs(args.results_folder, exist_ok=True)
    log = open(os.path.join(args.results_folder, "train_log.jsonl"), "a")
    t0 = time.time()
    for i in range(args.num_steps):
        idx = rng.integers(0, n, args.batch_size)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(ut[idx]), jnp.asarray(ft[idx]),
            jnp.asarray(un[idx]))
        if (i + 1) % 100 == 0:
            log.write(json.dumps({"step": i + 1, "loss": float(loss),
                                  "wall_s": round(time.time() - t0, 2)})
                      + "\n")
            log.flush()
            print(f"step {i + 1} loss {float(loss):.5f}", flush=True)

    import orbax.checkpoint as ocp
    from pathlib import Path

    ckptr = ocp.StandardCheckpointer()
    ckptr.save((Path(args.results_folder) / f"params_sob{args.s_ob}").resolve(),
               jax.device_get(params), force=True)
    ckptr.wait_until_finished()
    ckptr.close()

    # held-out one-step + rollout sanity vs the true solver scale
    m = min(256, u.shape[0])
    pred = op.simulate(params, jnp.asarray(ut[:m] * RESCALER),
                       jnp.asarray(ft[:m] * RESCALER))
    rel_err = float(np.linalg.norm(np.asarray(pred) / RESCALER - un[:m])
                    / (np.linalg.norm(un[:m]) + 1e-8))
    print(f"one-step relative L2 on {m} train triples: {rel_err:.4f}")
    log.write(json.dumps({"final_one_step_rel_l2": rel_err}) + "\n")
    log.close()


if __name__ == "__main__":
    main(build_parser().parse_args())
