#!/usr/bin/env python
"""Evaluate the PID and SL (adjoint) Burgers baselines on the shared
held-out set and append rows to burgers_results/baselines.json.

Counterpart of the reference's PID / SL mini-projects
(/root/reference/baselines/PID_burgers/pde_1d_control_PID.py,
baselines/sl_burgers/sl_burgers_control.py). Both controllers are scored by
re-simulating their forcings through the TRUE FD solver with the same
J_actual (final-state MSE) metric and held-out split as
apps/train_baselines_burgers.py. SL runs in two forms:

  - sl (true solver): adjoint optimization directly through the
    differentiable solver — the strongest form of this baseline;
  - sl_surrogate: optimization through the trained latent operator
    (the reference's actual formulation, burgers_operator.py:120-158),
    requires a trained_models/burgers_operator checkpoint
    (apps/train_burgers_operator.py).

Example:
  python apps/eval_pid_sl_burgers.py --n_data 512 --n_test 32
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--n_data", default=512, type=int,
                   help="offset into the generator stream; the held-out "
                        "targets match train_baselines_burgers.py defaults")
    p.add_argument("--n_test", default=32, type=int)
    p.add_argument("--pid_steps", default=100, type=int)
    p.add_argument("--sl_steps", default=100, type=int)
    p.add_argument("--sl_lr", default=5e-2, type=float)
    p.add_argument("--solver_dt", default=1e-3, type=float)
    p.add_argument("--partial_control", default=None, type=str)
    p.add_argument("--operator_folder",
                   default="trained_models/burgers_operator", type=str)
    p.add_argument("--methods", default="pid,sl,sl_surrogate", type=str,
                   help="comma-separated subset of pid,sl,sl_surrogate")
    p.add_argument("--save_file", default="burgers_results/baselines.json")
    p.add_argument("--seed", default=0, type=int)
    return p


def main(args):
    import jax.numpy as jnp
    import numpy as np

    from diffphycon_tpu.baselines.pid_burgers import pid_control
    from diffphycon_tpu.baselines.sl_burgers import sl_optimize_control
    from diffphycon_tpu.physics.burgers import burgers_solve, make_burgers_data

    u0_all, f_all = make_burgers_data(args.n_data + args.n_test,
                                      seed=args.seed,
                                      partial_control=args.partial_control)
    # per-sample independent solve: only the held-out tail is ever scored
    target = np.asarray(burgers_solve(jnp.asarray(u0_all[args.n_data:]),
                                      jnp.asarray(f_all[args.n_data:]),
                                      dt=args.solver_dt))  # (n_test, 11, Nx)
    u0 = jnp.asarray(target[:, 0, :])
    tgt_T = jnp.asarray(target[:, -1, :])

    os.makedirs(os.path.dirname(args.save_file) or ".", exist_ok=True)
    rows = []
    methods = set(args.methods.split(","))

    def score(f):
        """Re-simulate through the true solver; J_actual + control energy."""
        sim = burgers_solve(u0, f, visc=0.01, T=1.0, dt=args.solver_dt,
                            num_t=10)
        j = float(((sim[:, -1] - tgt_T) ** 2).mean(-1).mean())
        e = float((f ** 2).sum(axis=(-1, -2)).mean())
        return j, e

    # ---- PID (gains tuned through the differentiable rollout)
    if "pid" in methods:
        run_pid(args, u0, target, score, rows)
    if "sl" in methods:
        run_sl(args, u0, tgt_T, score, rows)
    if "sl_surrogate" in methods:
        run_sl_surrogate(args, u0, tgt_T, score, rows)

    with open(args.save_file, "a") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    return rows


def run_pid(args, u0, target, score, rows):
    import jax.numpy as jnp

    from diffphycon_tpu.baselines.pid_burgers import pid_control

    mask = None
    if args.partial_control == "front_rear_quarter":
        # actuation restriction applied INSIDE the tuning rollout, so the
        # gains are optimized for the same masked plant that scores them
        nx = u0.shape[-1]
        mask = jnp.zeros((nx,)).at[: nx // 4].set(1.0).at[3 * nx // 4:].set(1.0)
    _, f_pid, traj_pid, hist = pid_control(
        u0, jnp.asarray(target), lr=1e-2, steps=args.pid_steps,
        dt=args.solver_dt, seed=args.seed, control_mask=mask)
    j, e = score(f_pid)
    rows.append({"method": "pid", "partially_observed": None,
                 "partial_control": args.partial_control,
                 "n_test": args.n_test, "J_actual_mse": j,
                 "control_energy": e})
    print(f"pid: J_actual={j:.6f} energy={e:.2f}")


def run_sl(args, u0, tgt_T, score, rows):
    from diffphycon_tpu.baselines.sl_burgers import sl_optimize_control

    # ---- SL through the true solver
    f_sl, _ = sl_optimize_control(u0, tgt_T, lr=args.sl_lr,
                                  steps=args.sl_steps,
                                  solver_dt=args.solver_dt,
                                  partial_control=args.partial_control)
    j, e = score(f_sl)
    rows.append({"method": "sl", "partially_observed": None,
                 "partial_control": args.partial_control,
                 "n_test": args.n_test, "J_actual_mse": j,
                 "control_energy": e})
    print(f"sl (true solver): J_actual={j:.6f} energy={e:.2f}")


def run_sl_surrogate(args, u0, tgt_T, score, rows):
    from diffphycon_tpu.baselines.sl_burgers import sl_optimize_control

    # ---- SL through the trained latent operator (reference formulation)
    ckpt = os.path.join(args.operator_folder, "params_sob128")
    if os.path.isdir(ckpt):
        import jax
        import orbax.checkpoint as ocp
        from pathlib import Path

        from diffphycon_tpu.nets.burgers_operator import SurrogateOperator

        op = SurrogateOperator(s=128, s_ob=128)
        template = jax.jit(op.init, backend="cpu")(jax.random.PRNGKey(0))
        ckptr = ocp.StandardCheckpointer()
        params = ckptr.restore(Path(ckpt).resolve(), template)
        f_ss, _ = sl_optimize_control(u0, tgt_T, lr=args.sl_lr,
                                      steps=args.sl_steps,
                                      solver_dt=args.solver_dt,
                                      partial_control=args.partial_control,
                                      surrogate=(op, params))
        j, e = score(f_ss)
        rows.append({"method": "sl_surrogate", "partially_observed": None,
                     "partial_control": args.partial_control,
                     "n_test": args.n_test, "J_actual_mse": j,
                     "control_energy": e})
        print(f"sl (latent operator): J_actual={j:.6f} energy={e:.2f}")
    else:
        print(f"no operator checkpoint at {ckpt}; skipping sl_surrogate")


if __name__ == "__main__":
    main(build_parser().parse_args())
