"""Training for the jellyfish surrogate models (force / simulator / boundary
updater).

Equivalent of /root/reference/train/train_surrogate_models_jellyfish.py: plain
regression (MSE) with Adam + MultiStepLR, evaluated by relative error. Data
pairs are built from the jellyfish trajectory files
(/root/reference/dataset/data_surrogate_models_jellyfish.py:14-237):

  force:    (pressure_t, bd_t) (B,H,W,4)      -> force_t (B,1), clamped +-50
  simulator:(state_t, bd_t) + theta_delta_t    -> state_{t+1} (B,H,W,ns)
  bd:       bd_0 + (theta_t - theta_0)         -> bd_t (B,H,W,3)
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from diffphycon_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from diffphycon_tpu.training.train_state import (
    EMAConfig,
    TrainState,
    make_optimizer,
    multistep_lr,
)


def make_surrogate_pairs(data: dict, kind: str, force_labels=None):
    """Build (inputs..., target) arrays from a loaded jellyfish dataset dict
    (states (N,40,H,W,ns), bd (N,40,H,W,3), thetas (N,40))."""
    states, bd, thetas = data["states"], data["bd"], data["thetas"]
    n, t = thetas.shape
    if kind == "force":
        # reference ForceData (data_surrogate_models_jellyfish.py:62-86):
        # RAW pressure with +-50 outliers replaced by the inlier mean,
        # label = x-force summed over boundaries, NaN -> 0, no clipping
        norm = data.get("norm")
        pressure = states[..., -1]
        if norm is not None:
            pressure = (0.5 * pressure + 0.5) * (
                norm["p_max"] - norm["p_min"]) + norm["p_min"]
        flat = pressure.reshape(n * t, -1)
        # raw-NaN cells (solid interior): the reference's NaN never passes
        # abs(p) <= 50, so they are excluded from the inlier mean, skipped by
        # the outlier rule, and finally zeroed by x[isnan(x)] = 0 — whereas
        # the loader's normalized-space nan_to_num would have turned them
        # into the denormalized midpoint (ADVICE r3)
        p_nan = data.get("p_nan")
        nan_mask = (p_nan.reshape(n * t, -1) if p_nan is not None
                    else np.zeros_like(flat, bool))
        inlier = (np.abs(flat) <= 50.0) & ~nan_mask
        means = np.where(
            inlier.any(1),
            (flat * inlier).sum(1) / np.maximum(inlier.sum(1), 1), 0.0)
        flat = np.where((np.abs(flat) > 50.0) & ~nan_mask, means[:, None], flat)
        flat = np.where(nan_mask, 0.0, flat)
        pressure = flat.reshape(n, t, *bd.shape[2:4], 1).astype(np.float32)
        x = np.concatenate([pressure, bd], axis=-1).reshape(
            n * t, *bd.shape[2:4], 4)
        if force_labels is None:
            raise ValueError("force training requires force labels")
        y = np.nan_to_num(force_labels.reshape(n * t, 1)).astype(np.float32)
        return (x,), y
    if kind == "simulator":
        x = np.concatenate([states[:, :-1], bd[:, :-1]], axis=-1)
        x = x.reshape(n * (t - 1), *bd.shape[2:4], x.shape[-1])
        delta = (thetas[:, 1:] - thetas[:, :-1]).reshape(n * (t - 1))
        y = states[:, 1:].reshape(n * (t - 1), *states.shape[2:])
        return (x, delta), y
    if kind == "boundary_updater":
        bd0 = np.repeat(bd[:, :1], t, 1).reshape(n * t, *bd.shape[2:])
        delta = (thetas - thetas[:, :1]).reshape(n * t)
        y = bd.reshape(n * t, *bd.shape[2:])
        return (bd0, delta), y
    raise ValueError(kind)


@dataclasses.dataclass
class SurrogateTrainConfig:
    lr: float = 1e-4
    batch_size: int = 16
    num_steps: int = 10_000
    lr_milestones: tuple = (5_000, 8_000)
    lr_gamma: float = 0.1
    log_every: int = 100
    save_every: int = 0  # 0 = no periodic full-state checkpoints
    results_folder: str = "./trained_models/surrogate"
    seed: int = 0


def _state_ckpt_save(state, out_dir: Path):
    import orbax.checkpoint as ocp

    payload = {
        "step": int(jax.device_get(state.step)),
        "params": jax.device_get(state.params),
        "ema_params": jax.device_get(state.ema_params),
        "opt_state": jax.device_get(state.opt_state),
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save((out_dir / "resume_state").resolve(), payload, force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def _state_ckpt_restore(state, out_dir: Path):
    import orbax.checkpoint as ocp

    path = (out_dir / "resume_state").resolve()
    if not path.is_dir():
        return state, False
    target = {
        "step": int(jax.device_get(state.step)),
        "params": jax.device_get(state.params),
        "ema_params": jax.device_get(state.ema_params),
        "opt_state": jax.device_get(state.opt_state),
    }
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(path, target=target)
    ckptr.close()
    return state.replace(
        step=jnp.asarray(payload["step"], jnp.int32),
        params=payload["params"],
        ema_params=payload["ema_params"],
        opt_state=payload["opt_state"],
    ), True


def train_surrogate(apply_fn: Callable, params, inputs: tuple,
                    targets: np.ndarray, cfg: SurrogateTrainConfig,
                    mesh=None, resume: bool = False):
    """Generic jitted regression loop; returns (state, final_loss).

    resume=True restores <results_folder>/resume_state when present
    (reference --resume_training,
    train_surrogate_models_jellyfish.py:64-68,129-148)."""
    mesh = mesh if mesh is not None else make_mesh()
    tx = make_optimizer(
        multistep_lr(cfg.lr, cfg.lr_milestones, cfg.lr_gamma))
    state = replicate(mesh, TrainState.create(params, tx, EMAConfig()))

    def loss_fn(params, batch):
        *xs, y = batch
        pred = apply_fn(params, *xs)
        return ((pred - y) ** 2).mean()

    @jax.jit
    def step(state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        return state.apply_gradients(grads), loss

    n = targets.shape[0]
    out_dir = Path(cfg.results_folder)
    out_dir.mkdir(parents=True, exist_ok=True)
    start = 0
    if resume:
        state, ok = _state_ckpt_restore(state, out_dir)
        if ok:
            state = replicate(mesh, state)
            start = int(jax.device_get(state.step))
    rng = np.random.default_rng(cfg.seed + start)
    t0 = time.time()
    last = None
    with open(out_dir / "train_log.jsonl", "a") as logf:
        for i in range(start, cfg.num_steps):
            idx = rng.integers(0, n, cfg.batch_size)
            batch = tuple(jnp.asarray(x[idx]) for x in inputs) + (
                jnp.asarray(targets[idx]),)
            batch = shard_batch(mesh, batch)
            state, loss = step(state, batch)
            if (i + 1) % cfg.log_every == 0:
                last = float(jax.device_get(loss))
                logf.write(json.dumps(
                    {"step": i + 1, "loss": last,
                     "wall_s": round(time.time() - t0, 2)}) + "\n")
                logf.flush()
            if cfg.save_every and (i + 1) % cfg.save_every == 0:
                _state_ckpt_save(state, out_dir)
    return state, last


def save_surrogate(state, results_folder: str, name: str):
    import orbax.checkpoint as ocp

    path = (Path(results_folder) / name).resolve()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state.ema_params), force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def load_surrogate(results_folder: str, name: str, target=None):
    import orbax.checkpoint as ocp

    path = (Path(results_folder) / name).resolve()
    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(path, target=target)
    ckptr.close()
    return params
