"""Burgers benchmark wiring: config, model/diffusion builders, evaluation.

The TPU equivalent of the reference entry points
(/root/reference/train/train_1d_burgers.py:106-169 ``get_2d_ddpm`` and
/root/reference/inference/inference_1d_burgers.py:261-399
``diffuse_2dconv``/``evaluate``), shared by apps/train_burgers.py and
apps/infer_burgers.py. Flag names/defaults mirror the reference CLIs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffphycon_tpu.control.guidance import burgers_guidance_from_x, make_nabla_j
from diffphycon_tpu.control.metrics import burgers_metric, mse_deviation
from diffphycon_tpu.diffusion import (
    GaussianDiffusion,
    GuidanceSpec,
    burgers_cond_spec,
    burgers_derive_cond,
    make_guidance_schedule,
)
from diffphycon_tpu.nets import UNet2D
from diffphycon_tpu.physics.burgers import burgers_solve

RESCALER = 10.0  # reference inference_1d_burgers.py:14 / train rescaler=10.


@dataclasses.dataclass
class BurgersConfig:
    # unet (reference train_1d_burgers.py:66-72)
    dim: int = 64
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    # deprecated alias (pre-r4 checkpoints/scripts used `dim_muls`); when
    # given it overrides dim_mults, and both attributes stay readable.
    dim_muls: Optional[Sequence[int]] = None
    resnet_block_groups: int = 1
    # ddpm
    timesteps: int = 1000
    using_ddim: bool = False
    ddim_sampling_steps: int = 1000
    ddim_eta: float = 0.0
    beta_schedule: str = "cosine"
    # conditioning
    is_condition_u0: bool = False
    is_condition_uT: bool = False
    is_condition_u0_zero_pred_noise: bool = True
    is_condition_uT_zero_pred_noise: bool = True
    condition_idx: int = 10
    train_on_partially_observed: Optional[str] = None
    set_unobserved_to_zero_during_sampling: bool = False
    train_on_padded_locations: bool = True
    partially_observed: Optional[str] = None
    partial_control: Optional[str] = "full"
    # two-model
    is_model_w: bool = False
    prior_beta: float = 1.0
    normalize_beta: bool = False
    # sampling extras
    recurrence: bool = False
    recurrence_k: int = 1
    # compute
    bf16: bool = False

    nt_total: int = 11
    nx: int = 128
    pad_t: int = 16

    def __post_init__(self):
        if self.dim_muls is not None:
            self.dim_mults = tuple(self.dim_muls)
        self.dim_mults = tuple(self.dim_mults)
        # Reset the alias so dataclasses.replace(cfg, dim_mults=...) round-trips:
        # replace() re-runs __post_init__, and a stale non-None dim_muls would
        # silently revert the new dim_mults (ADVICE r4, medium).
        self.dim_muls = None


def build_unet(cfg: BurgersConfig) -> UNet2D:
    return UNet2D(
        dim=cfg.dim,
        out_dim=2,
        dim_mults=tuple(cfg.dim_mults),
        channels=2,
        resnet_block_groups=cfg.resnet_block_groups,
        dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32,
    )


def build_diffusion(
    cfg: BurgersConfig,
    model_apply,
    model_w_apply=None,
) -> GaussianDiffusion:
    cond = burgers_cond_spec(
        is_condition_u0=cfg.is_condition_u0,
        is_condition_uT=cfg.is_condition_uT,
        is_condition_u0_zero_pred_noise=cfg.is_condition_u0_zero_pred_noise,
        is_condition_uT_zero_pred_noise=cfg.is_condition_uT_zero_pred_noise,
        condition_idx=cfg.condition_idx,
        is_model_w=cfg.is_model_w and model_w_apply is None,
        train_on_partially_observed=cfg.train_on_partially_observed,
        set_unobserved_to_zero_during_sampling=cfg.set_unobserved_to_zero_during_sampling,
        train_on_padded_locations=cfg.train_on_padded_locations,
    )
    return GaussianDiffusion(
        model_apply=model_apply,
        model_w_apply=model_w_apply,
        sample_shape=(cfg.pad_t, cfg.nx, 2),
        timesteps=cfg.timesteps,
        sampling_timesteps=(cfg.ddim_sampling_steps if cfg.using_ddim
                            else cfg.timesteps),
        ddim_sampling_eta=cfg.ddim_eta,
        beta_schedule=cfg.beta_schedule,
        cond=cond,
        is_model_w=cfg.is_model_w and model_w_apply is None,
        prior_beta=cfg.prior_beta,
        normalize_beta=cfg.normalize_beta,
        recurrence=cfg.recurrence,
        recurrence_k=cfg.recurrence_k,
    )


def init_params(cfg: BurgersConfig, seed: int = 0):
    net = build_unet(cfg)
    return net.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, cfg.pad_t, cfg.nx, 2)),
        jnp.zeros((1,)),
    )


derive_cond = burgers_derive_cond


@dataclasses.dataclass
class EvalResult:
    """Per-batch metrics (reference diffuse_2dconv returns,
    inference_1d_burgers.py:261-305)."""

    ddpm_mse: np.ndarray
    j_actual: Tuple[np.ndarray, ...]  # (mse, mse_med, mae, mae_med, nmse, nmae)
    j_diffused: Tuple[np.ndarray, ...]
    control_energy: np.ndarray


def evaluate_samples(x, u_target, cfg: BurgersConfig) -> EvalResult:
    """Re-simulate sampled controls with the solver and score
    (reference diffuse_2dconv, inference_1d_burgers.py:276-305).

    x: (B, 16, 128, 2) raw samples in model scale; u_target (B, 11, 128)
    unscaled ground truth.
    """
    x = jnp.asarray(x) * RESCALER
    u = x[:, : cfg.nt_total, :, 0]
    u0 = x[:, 0, :, 0]
    f = x[:, : cfg.nt_total - 1, :, 1]

    # re-simulate from the *diffused* u0 for ddpm_mse (:294-296)
    x_gt = burgers_solve(u0, f, visc=0.01, T=1.0, dt=1e-4,
                         num_t=cfg.nt_total - 1)
    ddpm_mse = mse_deviation(u, x_gt, partially_observed=cfg.partially_observed)

    j_diffused, _ = burgers_metric(
        jnp.asarray(u_target), f, partial_control=cfg.partial_control,
        report_all=True, diffused_u=u, evaluate_u=True,
        partially_observed=cfg.partially_observed,
    )
    # J_actual re-simulates from the *target's* u0 (utils.py:1212)
    j_actual, energy = burgers_metric(
        jnp.asarray(u_target), f, partial_control=cfg.partial_control,
        report_all=True, partially_observed=cfg.partially_observed,
    )
    to_np = lambda t: tuple(np.asarray(v) for v in t)
    return EvalResult(
        ddpm_mse=np.asarray(ddpm_mse),
        j_actual=to_np(j_actual),
        j_diffused=to_np(j_diffused),
        control_energy=np.asarray(energy),
    )


def build_guidance(cfg: BurgersConfig, u_target, wu=0.0, wf=0.0, wreg=0.0,
                   j_scheduler: Optional[str] = None,
                   w_scheduler: Optional[str] = None,
                   proj_guidance: Optional[str] = None,
                   enabled: Optional[bool] = None) -> GuidanceSpec:
    """Guidance closure over the (rescaled) target
    (reference get_nablaJ_2dconv, inference_1d_burgers.py:129-168).
    proj_guidance: None = additive combiner; 'ep_orthogonal_F' /
    'ep_orthogonal_1D_x' / 'ep_orthogonal_1D_t' = the reference's
    orthogonal projection (diffusion_1d_burgers.py:51-66)."""
    loss_fn = burgers_guidance_from_x(
        jnp.asarray(u_target) / RESCALER, wu=wu, wf=wf, wreg=wreg,
        use_dist_reg=wreg != 0,
        partially_observed=cfg.partially_observed,
        nt_u=cfg.nt_total, nt_f=cfg.nt_total - 1,
    )
    kwargs = {}
    if proj_guidance:
        from diffphycon_tpu.diffusion import get_proj_ep_orthogonal

        norm = proj_guidance.removeprefix("ep_orthogonal_")
        kwargs["proj"] = get_proj_ep_orthogonal(norm)
    if enabled is None:
        # wu/wf may be tracers (passed as jit arguments to defeat the axon
        # runtime's constant-blind execution memoization); callers then say
        # explicitly whether guidance is active via ``enabled``
        enabled = bool(wu) or bool(wf) or bool(wreg)
    return GuidanceSpec(
        nabla_j=make_nabla_j(loss_fn) if enabled else None,
        j_schedule=(make_guidance_schedule(j_scheduler, cfg.timesteps)
                    if j_scheduler else None),
        w_schedule=(make_guidance_schedule(w_scheduler, cfg.timesteps)
                    if w_scheduler else None),
        **kwargs,
    )
