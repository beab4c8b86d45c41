"""Jellyfish benchmark: EBM joint diffusion + prior reweighting + boundary
updater in the sampling loop + force-surrogate guidance.

TPU equivalent of /root/reference/diffusion/diffusion_2d_jellyfish.py:529-1096
and /root/reference/inference/inference_2d_jellyfish.py. The state tensor is
channels-last (B, 20, 64, 64, 7): 3 state channels (vx, vy, pressure), 3
boundary channels (mask, offset_x, offset_y), 1 theta plane. Only
[states, theta] (4ch) are denoised; the boundary channels are recomputed from
theta each step by the neural boundary updater (update_bd, :809-817).

Sampling runs as one ``lax.scan`` whose body contains: joint UNet3D forward,
prior UNet3D forward, the guidance gradient through ForceUNet + boundary
updater (``jax.grad``), the posterior update, the boundary-updater call, and
condition re-pinning (or repaint-style noisy conditioning, :867-875).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from diffphycon_tpu.diffusion.core import DiffusionConstants, _extract, _extract1
from diffphycon_tpu.nets.unet2dv2 import ForceUNet, UNet2Dv2
from diffphycon_tpu.nets.unet3d import UNet3D


@dataclasses.dataclass
class JellyfishConfig:
    dim: int = 64
    dim_mults: Sequence[int] = (1, 2, 4)
    frames: int = 20
    image_size: int = 64
    cond_steps: int = 1
    timesteps: int = 1000
    sampling_timesteps: int = 1000
    ddim_eta: float = 0.0
    beta_schedule: str = "linear"
    only_vis_pressure: bool = False
    w_prob_exp: float = 1.0
    standard_fixed_ratio: float = 0.01
    coeff_ratio_J: float = 0.3
    coeff_ratio_w: float = 0.3
    design_guidance: str = "standard"  # 'standard' | 'standard-alpha'
    use_guidance_in_model_predictions: bool = False
    reg_ratio: float = 0.0
    bf16: bool = False
    remat_all: bool = False  # full UNet3D remat (EBM double-backprop HBM)

    @property
    def n_state(self) -> int:
        return 1 if self.only_vis_pressure else 3

    @property
    def joint_channels(self) -> int:  # input: state + bd(3) + theta(1)
        return self.n_state + 4

    @property
    def joint_out(self) -> int:  # denoised subset: state + theta
        return self.n_state + 1


def build_joint_unet(cfg: JellyfishConfig) -> UNet3D:
    """(reference inference_2d_jellyfish.py:124-134: 7ch -> 4ch)."""
    return UNet3D(dim=cfg.dim, dim_mults=tuple(cfg.dim_mults),
                  channels=cfg.joint_channels, out_dim=cfg.joint_out,
                  remat_all=cfg.remat_all,
                  dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32)


def build_thetas_unet(cfg: JellyfishConfig) -> UNet3D:
    """(reference :180-186: 7ch -> 1ch)."""
    return UNet3D(dim=cfg.dim, dim_mults=tuple(cfg.dim_mults),
                  channels=cfg.joint_channels, out_dim=1,
                  remat_all=cfg.remat_all,
                  dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32)


def build_bd_updater(cfg: JellyfishConfig) -> UNet2Dv2:
    """(reference :270-277: Unet 3ch -> 3ch, theta-delta via time MLP)."""
    return UNet2Dv2(dim=cfg.image_size, out_dim=3, dim_mults=(1, 2, 4, 8),
                    channels=3)


def build_force_unet(cfg: JellyfishConfig) -> ForceUNet:
    """(reference :262-267: ForceUnet 4ch -> 1)."""
    return ForceUNet(dim=cfg.image_size, out_dim=1, dim_mults=(1, 2, 4, 8),
                     channels=4)


def build_simulator_unet(cfg: JellyfishConfig) -> UNet2Dv2:
    """Neural simulator surrogate (reference sim_ppl_2d.py:130-140:
    Unet 6ch -> 3ch, theta-delta via time MLP)."""
    return UNet2Dv2(dim=cfg.image_size, out_dim=cfg.n_state,
                    dim_mults=(1, 2, 4, 8), channels=cfg.n_state + 3)




def _frame_mask(x, f0: int, f1: int):
    """(1, F, 1, 1, 1) mask for frames [f0, f1). Fused-arithmetic frame
    pinning — integer-indexed .at[].set() updates stall the TPU pipeline
    inside scan bodies (see diffusion/conditioning.py performance note)."""
    ff = jnp.arange(x.shape[1])
    m = ((ff >= f0) & (ff < f1)).astype(x.dtype)
    return m.reshape((1, -1) + (1,) * (x.ndim - 2))


def _pin_frames(x, value, f0: int, f1: int):
    """x with frames [f0, f1) replaced by (broadcastable) value."""
    m = _frame_mask(x, f0, f1)
    return x * (1 - m) + value * m


# ---------------------------------------------------------------------------
# diffusion core
# ---------------------------------------------------------------------------


class JellyfishDiffusion:
    """Two-model jellyfish diffusion with bd-updater-in-the-loop sampling.

    Args:
      joint_apply: fn(params, x7, t) -> eps over [state, theta] (4ch).
      thetas_apply: fn(params, x7, t) -> eps over theta (1ch).
      bd_updater_apply: fn(params, bd (N,H,W,3), theta_delta (N,)) -> bd'.
    """

    def __init__(self, cfg: JellyfishConfig, joint_apply, thetas_apply=None,
                 bd_updater_apply=None):
        self.cfg = cfg
        self.joint_apply = joint_apply
        self.thetas_apply = thetas_apply
        self.bd_updater_apply = bd_updater_apply
        self.consts = DiffusionConstants.create(cfg.timesteps,
                                                cfg.beta_schedule)

    # -- training losses ----------------------------------------------------

    def q_sample(self, x0, t, noise):
        c, nd = self.consts, x0.ndim
        return (_extract(c.sqrt_alphas_cumprod, t, nd) * x0
                + _extract(c.sqrt_one_minus_alphas_cumprod, t, nd) * noise)

    def p_losses_states(self, params, key, state0, bd0, thetas0, t):
        """EBM loss for the states model: the model output's negative squared
        norm is an energy whose gradient w.r.t. the noisy state must match
        the noise (reference p_losses 'states', diffusion_2d_jellyfish.py:
        1019-1049 — double backprop, natural as jax.grad-of-grad).

        state0: (B, F, H, W, n_state); bd0: (B, F, H, W, 3);
        thetas0: (B, F).
        """
        cfg = self.cfg
        noise = jax.random.normal(key, state0.shape, state0.dtype)
        h = state0.shape[2]
        theta_plane = jnp.broadcast_to(
            thetas0[:, :, None, None, None],
            state0.shape[:2] + (h, h, 1),
        )
        state = self.q_sample(state0, t, noise)
        if cfg.cond_steps > 0:
            cs = cfg.cond_steps
            state = _pin_frames(state, state0, 0, cs)
            noise = noise * (1 - _frame_mask(noise, 0, cs))

        def energy(s):
            x = jnp.concatenate([s, bd0, theta_plane], axis=-1)
            out = self.joint_apply(params, x, t)
            return -jnp.sum(out**2)

        state_grad = jax.grad(energy)(state)
        return ((state_grad - noise) ** 2).mean()

    def p_losses_thetas(self, params, key, state0, bd0, thetas0, t):
        """Plain eps-matching for the thetas (prior) model conditioned on
        state0 (reference p_losses 'thetas', :1051-1082)."""
        cfg = self.cfg
        b, f = thetas0.shape
        h = state0.shape[2]
        k_bd, k_th = jax.random.split(key)
        theta_plane = jnp.broadcast_to(
            thetas0[:, :, None, None, None], (b, f, h, h, 1))
        noise_bd = jax.random.normal(k_bd, bd0.shape, bd0.dtype)
        noise_th = jax.random.normal(k_th, theta_plane.shape, bd0.dtype)
        bd = self.q_sample(bd0, t, noise_bd)
        theta = self.q_sample(theta_plane, t, noise_th)
        if cfg.cond_steps > 0:
            state_cond = jnp.broadcast_to(
                state0[:, : cfg.cond_steps][:, :1], state0.shape)
            cs = cfg.cond_steps
            bd = _pin_frames(bd, bd0, 0, cs)
            noise_th = noise_th * (1 - _frame_mask(noise_th, 0, cs))
            noise_th = noise_th * (1 - _frame_mask(noise_th, f - cs, f))
        else:
            state_cond = state0
        x = jnp.concatenate([state_cond, bd, theta], axis=-1)
        out = self.thetas_apply(params, x, t)
        return ((out - noise_th) ** 2).mean()

    def loss(self, params, key, batch, model_type: str):
        state0, bd0, thetas0 = batch
        kt, kn = jax.random.split(key)
        t = jax.random.randint(kt, (state0.shape[0],), 0, self.cfg.timesteps)
        if model_type == "states":
            return self.p_losses_states(params, kn, state0, bd0, thetas0, t)
        if model_type == "thetas":
            return self.p_losses_thetas(params, kn, state0, bd0, thetas0, t)
        raise ValueError(model_type)

    # -- sampling -----------------------------------------------------------

    def _update_bd(self, params_bd, theta_expand, bd_0_expand, thetas_0):
        """(reference update_bd, :809-817). theta_expand: (B,F,H,W,1);
        bd_0_expand: (B,F,H,W,3); thetas_0: (B,)."""
        b, f, h, w, _ = bd_0_expand.shape
        theta = theta_expand.mean(axis=(2, 3))[..., 0]  # (B, F)
        delta = (theta - thetas_0[:, None]).reshape(b * f)
        bd = bd_0_expand.reshape(b * f, h, w, 3)
        out = self.bd_updater_apply(params_bd, bd, delta)
        return out.reshape(b, f, h, w, 3)

    def sample(self, params, key, state_0, bd_0, thetas_0,
               design_fn: Optional[Callable] = None):
        """Guided sampling (reference p_sample_loop :820-881 / ddim :883-971).

        params: (params_joint, params_thetas, params_bd_updater).
        state_0: (B, H, W, n_state); bd_0: (B, H, W, 3); thetas_0: (B,).
        design_fn(x_start4, bd_0_expand) -> guidance gradient (B,F,H,W,4).
        Returns (pred_states, pred_theta): (B,F,H,W,n_state), (B,F).
        """
        k0, key = jax.random.split(key)
        x = self.sample_init(k0, state_0, bd_0, thetas_0)
        body, ts = self._make_body(params, key, state_0, bd_0, thetas_0,
                                   design_fn)
        x, _ = jax.lax.scan(body, x, ts)
        return self.sample_finalize(x)

    def sample_init(self, k0, state_0, bd_0, thetas_0):
        """Initial noisy trajectory with conditioned frames pinned."""
        cfg = self.cfg
        b = state_0.shape[0]
        f, h = cfg.frames, cfg.image_size
        ns = cfg.n_state
        ks, kb, kt = jax.random.split(k0, 3)
        noise_state = jax.random.normal(ks, (b, f, h, h, ns))
        noise_bd = jax.random.normal(kb, (b, f, h, h, 3))
        noise_th = jax.random.normal(kt, (b, f, h, h, 1))

        thetas_0_expand = jnp.broadcast_to(
            thetas_0[:, None, None, None, None], (b, 1, h, h, 1))

        cs = cfg.cond_steps
        if cs > 0:
            noise_state = _pin_frames(noise_state, state_0[:, None], 0, cs)
            noise_bd = _pin_frames(noise_bd, bd_0[:, None], 0, cs)
            noise_th = _pin_frames(noise_th, thetas_0_expand, 0, cs)
            noise_th = _pin_frames(noise_th, thetas_0_expand, f - cs, f)

        return jnp.concatenate([noise_state, noise_bd, noise_th], axis=-1)

    def _make_body(self, params, key, state_0, bd_0, thetas_0,
                   design_fn: Optional[Callable] = None):
        """Build the denoise-scan body + the full timestep sequence.

        Shared by sample() (one scan) and sample_chunk() (host-synced
        segments — the axon-runtime workaround for very long on-chip scans,
        PERF.md round 2). Chunking cannot change numerics: the per-step
        randomness is fold_in(key, t), independent of scan position.
        """
        cfg = self.cfg
        c = self.consts
        params_joint, params_thetas, params_bd = params
        b = state_0.shape[0]
        f, h = cfg.frames, cfg.image_size
        ns = cfg.n_state
        cs = cfg.cond_steps

        thetas_0_expand = jnp.broadcast_to(
            thetas_0[:, None, None, None, None], (b, 1, h, h, 1))
        bd_0_expand = jnp.broadcast_to(bd_0[:, None], (b, f, h, h, 3))
        state_cond = jnp.broadcast_to(state_0[:, None], (b, f, h, h, ns))

        sfr = cfg.standard_fixed_ratio
        eta_J_sched = cfg.coeff_ratio_J * jnp.flip(c.betas, 0)
        eta_w_sched = cfg.coeff_ratio_w * jnp.flip(c.betas, 0)

        def model_predictions(x, t, use_guidance_inside):
            tb = jnp.full((b,), t, jnp.int32)
            eps_joint = self.joint_apply(params_joint, x, tb)  # (B,F,H,W,4)
            x_w = jnp.concatenate([state_cond, x[..., ns:]], axis=-1)
            eps_w1 = self.thetas_apply(params_thetas, x_w, tb)  # (B,F,H,W,1)
            x4 = jnp.concatenate([x[..., :ns], x[..., -1:]], axis=-1)
            x_start = self.predict_start_from_noise(x4, t, eps_joint)
            eps_w = jnp.concatenate(
                [jnp.zeros_like(x4[..., :ns]), eps_w1], axis=-1)
            if use_guidance_inside:
                g = (design_fn(x_start, bd_0_expand)
                     if design_fn is not None else 0.0)
                if cfg.design_guidance == "standard":
                    grad_final = sfr * g + (cfg.w_prob_exp - 1.0) * eps_w
                else:
                    grad_final = (_extract(eta_J_sched, t, 5) * g
                                  - _extract(eta_w_sched, t, 5) * eps_w)
                eps_joint = eps_joint + grad_final
            return eps_joint, eps_w, x_start, x4

        def postprocess(pred4, t_for_repaint, key_rp):
            """Split, run bd updater, re-pin conditions, recat
            (reference :852-878)."""
            pred_states = pred4[..., :ns]
            pred_theta_expand = pred4[..., ns:]
            pred_bd = self._update_bd(params_bd, pred_theta_expand,
                                      bd_0_expand, thetas_0)
            if cs > 0:
                pred_states = _pin_frames(pred_states, state_0[:, None], 0, cs)
                pred_bd = _pin_frames(pred_bd, bd_0[:, None], 0, cs)
                pred_bd = _pin_frames(pred_bd, bd_0[:, None], f - cs, f)
                pred_theta_expand = _pin_frames(
                    pred_theta_expand, thetas_0_expand, 0, cs)
                pred_theta_expand = _pin_frames(
                    pred_theta_expand, thetas_0_expand, f - cs, f)
            else:
                # repaint-style noisy conditioning (reference :867-875)
                tb = jnp.full((b,), t_for_repaint, jnp.int32)
                krs, krb, krt = jax.random.split(key_rp, 3)
                s0t = self.q_sample(
                    state_0, tb,
                    jax.random.normal(krs, state_0.shape))[:, None]
                b0t = self.q_sample(
                    bd_0, tb, jax.random.normal(krb, bd_0.shape))[:, None]
                th0 = jnp.broadcast_to(
                    thetas_0[:, None, None, None, None], (b, 1, h, h, 1))
                th0t = self.q_sample(
                    th0, tb, jax.random.normal(krt, th0.shape))
                pred_states = _pin_frames(pred_states, s0t, 0, 1)
                pred_bd = _pin_frames(pred_bd, b0t, 0, 1)
                pred_theta_expand = _pin_frames(pred_theta_expand, th0t, 0, 1)
                pred_theta_expand = _pin_frames(pred_theta_expand, th0t,
                                                f - 1, f)
            x_new = jnp.concatenate(
                [pred_states, pred_bd, pred_theta_expand], axis=-1)
            return x_new, pred_states, pred_theta_expand

        is_ddim = cfg.sampling_timesteps < cfg.timesteps

        if not is_ddim:
            def body(x, t):
                kk = jax.random.fold_in(key, t)
                k_noise, k_rp = jax.random.split(kk)
                eps, eps_w, x_start, x4 = model_predictions(
                    x, t, cfg.use_guidance_in_model_predictions)
                x_start = jnp.clip(x_start, -1.0, 1.0)
                mean, log_var = self.q_posterior(x_start, x4, t)
                noise = jax.random.normal(k_noise, x4.shape)
                noise = noise * (t > 0).astype(noise.dtype)
                pred = mean + jnp.exp(0.5 * log_var) * noise
                if (not cfg.use_guidance_in_model_predictions
                        and design_fn is not None):
                    g = design_fn(x_start, bd_0_expand)
                    if cfg.design_guidance == "standard":
                        grad_final = sfr * g - sfr * eps_w
                    else:
                        grad_final = (_extract(eta_J_sched, t, 5) * g
                                      - _extract(eta_w_sched, t, 5) * eps_w)
                    pred = pred - grad_final
                x_new, ps, pt = postprocess(pred, t, k_rp)
                return x_new, None

            return body, jnp.arange(cfg.timesteps - 1, -1, -1)
        else:
            times = np.linspace(-1, cfg.timesteps - 1,
                                cfg.sampling_timesteps + 1).astype(int)
            times = list(reversed(times.tolist()))
            t_curr = jnp.asarray(times[:-1], jnp.int32)
            t_next = jnp.asarray(times[1:], jnp.int32)
            eta = cfg.ddim_eta

            def body(x, tt):
                t, tn = tt
                kk = jax.random.fold_in(key, t)
                k_noise, k_rp = jax.random.split(kk)
                # DDIM always uses in-model guidance (reference :927-928)
                eps, eps_w, x_start, x4 = model_predictions(x, t, True)
                alpha = _extract1(c.alphas_cumprod, t)
                alpha_next = jnp.where(
                    tn >= 0, _extract1(c.alphas_cumprod, jnp.maximum(tn, 0)),
                    1.0)
                sigma = eta * jnp.sqrt(jnp.clip(
                    (1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha),
                    0.0, None))
                coef = jnp.sqrt(jnp.clip(1 - alpha_next - sigma**2, 0.0, None))
                noise = jax.random.normal(k_noise, x4.shape)
                pred = (x_start * jnp.sqrt(alpha_next) + coef * eps
                        + sigma * noise)
                last = (tn < 0).astype(pred.dtype)
                pred = last * x_start + (1 - last) * pred
                x_new, ps, pt = postprocess(pred, t, k_rp)
                return x_new, None

            return body, (t_curr, t_next)

    def sample_chunk(self, params, key, state_0, bd_0, thetas_0, x, ts,
                     design_fn: Optional[Callable] = None):
        """Run |ts| denoise steps on carry ``x`` (a slice of sample_ts()).

        Jit once and call per chunk with equal-length ts slices; host-sync
        (np.asarray) between calls. Identical numerics to sample() for any
        chunking — the workaround for the axon fault on very long scans.
        """
        _, key = jax.random.split(key)  # consume k0 exactly like sample()
        body, _ = self._make_body(params, key, state_0, bd_0, thetas_0,
                                  design_fn)
        x, _ = jax.lax.scan(body, x, ts)
        return x

    def sample_ts(self):
        """Full timestep scan inputs (DDPM: int array; DDIM: (t, t_next))."""
        cfg = self.cfg
        if cfg.sampling_timesteps >= cfg.timesteps:
            return jnp.arange(cfg.timesteps - 1, -1, -1)
        times = np.linspace(-1, cfg.timesteps - 1,
                            cfg.sampling_timesteps + 1).astype(int)
        times = list(reversed(times.tolist()))
        return (jnp.asarray(times[:-1], jnp.int32),
                jnp.asarray(times[1:], jnp.int32))

    def sample_finalize(self, x):
        ns = self.cfg.n_state
        pred_states = x[..., :ns]
        pred_theta = x[..., -1:].mean(axis=(2, 3))[..., 0]
        return pred_states, pred_theta

    # -- helpers shared with the core --------------------------------------

    def predict_start_from_noise(self, x_t, t, noise):
        c, nd = self.consts, x_t.ndim
        return (_extract(c.sqrt_recip_alphas_cumprod, t, nd) * x_t
                - _extract(c.sqrt_recipm1_alphas_cumprod, t, nd) * noise)

    def q_posterior(self, x_start, x_t, t):
        c, nd = self.consts, x_t.ndim
        mean = (_extract(c.posterior_mean_coef1, t, nd) * x_start
                + _extract(c.posterior_mean_coef2, t, nd) * x_t)
        log_var = _extract(c.posterior_log_variance_clipped, t, nd)
        return mean, log_var


# ---------------------------------------------------------------------------
# guidance (reference force_fn, inference_2d_jellyfish.py:85-114)
# ---------------------------------------------------------------------------


def reg_theta(theta):
    """sum_t (theta_{t+1} - theta_t)^2 (reference :49-60)."""
    return ((theta[:, 1:] - theta[:, :-1]) ** 2).sum(axis=1)


def make_force_design_fn(cfg: JellyfishConfig, force_apply, params_force,
                         bd_updater_apply, params_bd,
                         p_min: float, p_max: float):
    """Returns design_fn(x_start4, bd_0_expand) -> (B,F,H,W,ns+1) gradient.

    J = -(time-weighted mean thrust) + reg_ratio * sum (dtheta)^2;
    gradients w.r.t. state and the theta plane are concatenated
    (reference force_fn + design_fn, inference_2d_jellyfish.py:85-114,278-281).
    """
    ns = cfg.n_state

    def guidance_scalar(state, theta_expand, bd_0_expand):
        b, f = state.shape[0], state.shape[1]
        theta = theta_expand.mean(axis=(2, 3))  # (B, F)
        pressure = state[..., ns - 1]  # last state channel
        pressure = (0.5 * pressure + 0.5) * (p_max - p_min) + p_min
        h, w = bd_0_expand.shape[2], bd_0_expand.shape[3]
        delta = theta.reshape(b * f)
        bd = bd_0_expand.reshape(b * f, h, w, 3)
        pred_bd = bd_updater_apply(params_bd, bd, delta)
        inp = jnp.concatenate(
            [pressure.reshape(b * f, h, w, 1), pred_bd], axis=-1)
        force = force_apply(params_force, inp).reshape(b, f)
        weight = jnp.arange(f, 0, -1, dtype=jnp.float32)[None]
        avg_v = (force * weight).mean(axis=1)
        return jnp.sum(-avg_v + cfg.reg_ratio * reg_theta(theta))

    def design_fn(x_start4, bd_0_expand):
        state = x_start4[..., :ns]
        theta_expand = x_start4[..., ns]
        g_state, g_theta = jax.grad(guidance_scalar, argnums=(0, 1))(
            state, theta_expand, bd_0_expand)
        return jnp.concatenate([g_state, g_theta[..., None]], axis=-1)

    return design_fn


# ---------------------------------------------------------------------------
# closed-loop surrogate pipeline (reference inference/sim_ppl_2d.py:20-107)
# ---------------------------------------------------------------------------


class SurrogatePipeline:
    """Neural 'simulator': force readout + next-state prediction + boundary
    update, used for closed-loop evaluation and the SAC/MPC baselines."""

    def __init__(self, cfg: JellyfishConfig, simulator_apply, params_sim,
                 force_apply, params_force, bd_updater_apply, params_bd,
                 p_min=None, p_max=None):
        self.cfg = cfg
        self.simulator_apply = simulator_apply
        self.params_sim = params_sim
        self.force_apply = force_apply
        self.params_force = params_force
        self.bd_updater_apply = bd_updater_apply
        self.params_bd = params_bd
        # The ForceUNet is trained on RAW pressure (reference ForceData,
        # data_surrogate_models_jellyfish.py:62-86) while pipeline states are
        # min-max normalized to [-1,1]; p_min/p_max denormalize the pressure
        # channel before the force readout. None = pass through unscaled
        # (force nets trained on normalized pressure).
        self.p_min = p_min
        self.p_max = p_max

    def step(self, state, mask_offsets, theta_delta=None):
        """One pipeline step (reference SurrogatePipeline.run :62-86).

        state: (B, H, W, n_state); mask_offsets: (B, H, W, 3);
        theta_delta: (B,) or None.
        Returns (states_next, force_x) or force_x.
        """
        pressure = state[..., -1:]
        if self.p_min is not None:
            pressure = (0.5 * pressure + 0.5) * (
                self.p_max - self.p_min) + self.p_min
        inp = jnp.concatenate([pressure, mask_offsets], axis=-1)
        force = self.force_apply(self.params_force, inp)[:, 0]
        if theta_delta is None:
            return force
        x = jnp.concatenate([state, mask_offsets], axis=-1)
        states_next = self.simulator_apply(self.params_sim, x, theta_delta)
        return states_next, force

    def rollout(self, state_0, bd_0, thetas):
        """Closed-loop rollout over a theta schedule as a lax.scan.

        state_0: (B, H, W, ns); bd_0: (B, H, W, 3); thetas: (B, F).
        Returns (states (B,F,H,W,ns), forces (B,F))."""
        deltas = jnp.diff(thetas, axis=1)  # (B, F-1)

        def body(carry, delta_t):
            state, bd, theta = carry
            states_next, force = self.step(state, bd, delta_t)
            bd_next = self.bd_updater_apply(self.params_bd, bd, delta_t)
            return (states_next, bd_next, theta + delta_t), (state, force)

        carry, (states, forces) = jax.lax.scan(
            body, (state_0, bd_0, thetas[:, 0]),
            jnp.swapaxes(deltas, 0, 1))
        last_force = self.step(carry[0], carry[1])
        states = jnp.concatenate(
            [jnp.swapaxes(states, 0, 1), carry[0][:, None]], axis=1)
        forces = jnp.concatenate(
            [jnp.swapaxes(forces, 0, 1), last_force[:, None]], axis=1)
        return states, forces
