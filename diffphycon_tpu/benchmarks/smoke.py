"""Smoke benchmark wiring: config, builders, guidance, on-device evaluation.

TPU equivalent of /root/reference/inference/inference_2d_smoke.py and the
smoke entries in /root/reference/train/train_2d_smoke.py. The evaluation
re-simulation runs the batched JAX smoke solver on device instead of one CPU
process per sample (reference multi_evaluate, inference_2d_smoke.py:317-427).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from diffphycon_tpu.diffusion import GaussianDiffusion, GuidanceSpec
from diffphycon_tpu.diffusion.conditioning import (
    smoke_cond_spec,
    smoke_derive_cond,
)
from diffphycon_tpu.nets.unet3d import UNet3D
from diffphycon_tpu.physics.fluids.smoke_env import SmokeSim, smoke_solver

# per-channel rescaler (reference dataset/data_2d.py:167):
# (density, vx, vy, c1, c2, smoke-portion)
RESCALER = np.array([2.0, 18.0, 20.0, 16.0, 20.0, 1.0], np.float32)


@dataclasses.dataclass
class SmokeConfig:
    dim: int = 64
    dim_mults: Sequence[int] = (1, 2, 4)
    frames: int = 32
    image_size: int = 64
    timesteps: int = 1000
    using_ddim: bool = True
    ddim_sampling_steps: int = 100
    ddim_eta: float = 1.0
    beta_schedule: str = "linear"  # reference train_2d_smoke.py beta_schedule
    is_w_model: bool = False
    w_prob_exp: float = 0.97
    standard_fixed_ratio: float = 1e5
    coeff_ratio: float = 0.0
    design_guidance: str = "standard"  # 'standard' | 'standard-alpha'
    w_energy: float = 0.0
    bf16: bool = False
    remat_all: bool = False  # full remat for training on small-HBM chips


def channels(cfg: SmokeConfig) -> int:
    return 2 if cfg.is_w_model else 6


def build_unet(cfg: SmokeConfig) -> UNet3D:
    return UNet3D(
        dim=cfg.dim,
        dim_mults=tuple(cfg.dim_mults),
        channels=channels(cfg),
        out_dim=channels(cfg),
        resnet_groups=8,
        remat_all=cfg.remat_all,
        dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32,
    )


def init_params(cfg: SmokeConfig, seed: int = 0):
    net = build_unet(cfg)
    return net.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, cfg.frames, cfg.image_size, cfg.image_size,
                   channels(cfg))),
        jnp.zeros((1,)),
    )


def build_diffusion(cfg: SmokeConfig, model_apply, model_w_apply=None
                    ) -> GaussianDiffusion:
    """Single-model (training) or two-model (eval) smoke diffusion
    (reference GaussianDiffusion, diffusion_2d_smoke.py:451-523)."""
    return GaussianDiffusion(
        model_apply=model_apply,
        model_w_apply=model_w_apply,
        sample_shape=(cfg.frames, cfg.image_size, cfg.image_size,
                      channels(cfg) if model_w_apply is None else 6),
        timesteps=cfg.timesteps,
        sampling_timesteps=(cfg.ddim_sampling_steps if cfg.using_ddim
                            else cfg.timesteps),
        ddim_sampling_eta=cfg.ddim_eta,
        beta_schedule=cfg.beta_schedule,
        cond=smoke_cond_spec(cfg.is_w_model),
        prior_beta=cfg.w_prob_exp,
        combine_w_with_guidance=model_w_apply is not None,
        clip_denoised=True,
    )


derive_cond = smoke_derive_cond


def build_guidance(cfg: SmokeConfig) -> GuidanceSpec:
    """Smoke control objective: maximize final smoke-out portion, penalize
    control energy (reference guidance_fn, inference_2d_smoke.py:29-44).

    The reference's gradient is taken w.r.t. the RESCALED state; the returned
    nabla_j therefore evaluates grad J at x * RESCALER.
    """
    r = jnp.asarray(RESCALER)

    def loss_fn(z):  # z: rescaled state (B, F, H, W, 6)
        success = z[:, -1, :, :, -1].mean((-1, -2)).sum()
        energy = (z[..., 3:5] ** 2).mean((1, 2, 3, 4)).sum()
        return -success + cfg.w_energy * energy

    def nabla_j(x):
        return jax.grad(loss_fn)(x * r)

    if cfg.design_guidance == "standard":
        j_schedule = jnp.full((cfg.timesteps,), cfg.standard_fixed_ratio,
                              jnp.float32)
    elif cfg.design_guidance == "standard-alpha":
        from diffphycon_tpu.diffusion.core import DiffusionConstants

        consts = DiffusionConstants.create(cfg.timesteps, cfg.beta_schedule)
        j_schedule = cfg.coeff_ratio * jnp.flip(consts.betas, 0)
    else:
        raise ValueError(cfg.design_guidance)

    return GuidanceSpec(nabla_j=nabla_j, j_schedule=j_schedule)


# ---------------------------------------------------------------------------
# evaluation (reference multi_evaluate, inference_2d_smoke.py:317-427)
# ---------------------------------------------------------------------------


def evaluate_samples(sim: SmokeSim, pred, data, w_energy: float = 0.0):
    """Re-simulate sampled controls and score.

    pred: (B, 32, 64, 64, 6) raw model samples in model scale (rescale
    applied internally); data: (B, 256, 64, 64, 6) unscaled test trajectories.
    Returns dict of per-batch scalars.
    """
    pred = jnp.asarray(pred) * jnp.asarray(RESCALER)
    data = jnp.asarray(data)
    b = pred.shape[0]

    # smoke-portion channel: spatial mean expanded (run_model :196)
    sp = pred[..., 5].mean((-1, -2))[..., None, None]
    pred = pred.at[..., 5].set(jnp.broadcast_to(sp, pred[..., 5].shape))
    # pin initial density from the data (multi_evaluate :323)
    pred = pred.at[:, 0, :, :, 0].set(data[:, 0, :, :, 0])
    # indirect control: zero interior (multi_evaluate :330; interior ring in
    # 64-resolution coordinates is [8:56))
    pred = pred.at[:, :, 8:56, 8:56, 3:5].set(0.0)

    init_v = jnp.zeros((b, 128, 128, 2)).at[..., 1].set(0.8)
    out = smoke_solver(
        sim, init_v, data[:, 0, :, :, 0], pred[..., 3], pred[..., 4],
        num_t=256,
    )
    # assemble re-simulated trajectory at 64^2, 32 frames; control channels
    # carry the (interior-zeroed) applied control, as in the reference
    # (multi_evaluate solver_out assembly, inference_2d_smoke.py:368-377)
    def down(a):  # (B, 256, 128, 128) -> (B, 32, 64, 64)
        return a[:, ::8, ::2, ::2]

    smoke_ch = jnp.broadcast_to(
        out["smoke_out_record"][:, ::8, None, None], (b, 32, 64, 64)
    )
    sim_traj = jnp.stack(
        [
            down(out["densitys"]),
            down(out["velocitys"][..., 0]),
            down(out["velocitys"][..., 1]),
            pred[..., 3],
            pred[..., 4],
            smoke_ch,
        ],
        axis=-1,
    )

    # mask frame 0 (multi_evaluate :402-404)
    mask = jnp.ones_like(pred).at[:, 0].set(0.0)
    p = pred * mask
    d = sim_traj * mask

    diff = p - d
    mse = jnp.concatenate([diff[..., :3], diff[..., 5:6]], -1) ** 2
    mse = mse.mean((1, 2, 3, 4))
    sq = lambda a: (a**2).sum((1, 2, 3))
    n_l2 = jnp.sqrt((diff[..., :3] ** 2).sum((1, 2, 3, 4))) / jnp.sqrt(
        (d[..., :3] ** 2).sum((1, 2, 3, 4))
    )
    n_l2_density = jnp.sqrt(sq(diff[..., 0])) / jnp.sqrt(sq(d[..., 0]))
    n_l2_v1 = jnp.sqrt(sq(diff[..., 1])) / jnp.sqrt(sq(d[..., 1]))
    n_l2_v2 = jnp.sqrt(sq(diff[..., 2])) / jnp.sqrt(sq(d[..., 2]))
    mae_smoke = jnp.abs(
        p[:, -1, :, :, 5].mean((1, 2)) - d[:, -1, :, :, 5].mean((1, 2))
    )

    j_target = -sim_traj[:, -1, 0, 0, 5]
    j_energy = (d[..., 3:5] ** 2).mean((1, 2, 3, 4))
    j_total = j_target + w_energy * j_energy
    return {
        "J_total": j_total,
        "J_target": j_target,
        "J_energy": j_energy,
        "mse": mse,
        "n_l2": n_l2,
        "n_l2_density": n_l2_density,
        "n_l2_v1": n_l2_v1,
        "n_l2_v2": n_l2_v2,
        "mae_smoke": mae_smoke,
        "sim_traj": sim_traj,
    }
