"""Diffusion noise schedules and guidance-strength schedules.

All schedules are built in float64 numpy (for numerical fidelity of the
cumulative products) and returned as float32 arrays, mirroring the reference's
float64-build / float32-buffer convention
(cf. /root/reference/diffusion/diffusion_1d_burgers.py:122-138,296-339).

Guidance schedules (used to anneal the guidance gradient or the prior-model
step size during sampling) are returned as *arrays indexed by diffusion time
t* so that a jitted ``lax.scan`` sampler can look them up with a gather
instead of calling a Python function per step
(cf. reference per-step calls at diffusion_1d_burgers.py:405,432).
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp


def linear_beta_schedule(timesteps: int) -> np.ndarray:
    """Linear beta schedule (reference diffusion_1d_burgers.py:122-126)."""
    scale = 1000.0 / timesteps
    beta_start = scale * 0.0001
    beta_end = scale * 0.02
    return np.linspace(beta_start, beta_end, timesteps, dtype=np.float64)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Cosine beta schedule (reference diffusion_1d_burgers.py:128-138)."""
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps, dtype=np.float64)
    alphas_cumprod = np.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


def sigmoid_beta_schedule(
    timesteps: int, start: float = -3, end: float = 3, tau: float = 1
) -> np.ndarray:
    """Sigmoid beta schedule (reference diffusion_2d_smoke.py:425-439)."""

    def _sigmoid(v):
        return 1.0 / (1.0 + np.exp(-v))

    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps, dtype=np.float64) / timesteps
    v_start = _sigmoid(start / tau)
    v_end = _sigmoid(end / tau)
    alphas_cumprod = (-_sigmoid((x * (end - start) + start) / tau) + v_end) / (
        v_end - v_start
    )
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


BETA_SCHEDULES = {
    "linear": linear_beta_schedule,
    "cosine": cosine_beta_schedule,
    "sigmoid": sigmoid_beta_schedule,
}


# ---------------------------------------------------------------------------
# Guidance-strength schedules eta(t), evaluated for every diffusion step t.
# These mirror the per-t scalar schedulers of the reference
# (diffusion_1d_burgers.py:71-118) but are materialized as arrays.
# ---------------------------------------------------------------------------


def _cosine_beta_eta(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Increasing: beta of the cosine schedule (reference :71-82)."""
    return cosine_beta_schedule(timesteps, s)


def _plain_cosine_eta(timesteps: int, s: float = 0.0) -> np.ndarray:
    """Decreasing cosine, flipped so eta[t=0] is smallest (reference :84-92)."""
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps, dtype=np.float64)
    eta = np.cos((x + s) / (timesteps + s))
    return eta[::-1][:timesteps].copy()


def _sigmoid_eta(timesteps: int) -> np.ndarray:
    """Sigmoid-schedule betas as eta (reference :94-108)."""
    return sigmoid_beta_schedule(timesteps)


def _sigmoid_flip_eta(timesteps: int) -> np.ndarray:
    """sigmoid_schedule(T-1-t): eta[t=0] largest (reference :110-111)."""
    return _sigmoid_eta(timesteps)[::-1].copy()


GUIDANCE_SCHEDULES = {
    "cosine": _cosine_beta_eta,
    "plain_cosine": _plain_cosine_eta,
    "sigmoid": _sigmoid_eta,
    "sigmoid_flip": _sigmoid_flip_eta,
}


def make_guidance_schedule(name: str | None, timesteps: int) -> jnp.ndarray:
    """Return eta[t] for t in [0, timesteps) as a float32 array.

    ``None`` means no scheduling: eta == 1 everywhere (reference
    get_guidance_options, diffusion_1d_burgers.py:491).
    """
    if name is None or name == "none":
        return jnp.ones((timesteps,), dtype=jnp.float32)
    if name not in GUIDANCE_SCHEDULES:
        raise ValueError(f"unknown guidance schedule: {name!r}")
    return jnp.asarray(GUIDANCE_SCHEDULES[name](timesteps), dtype=jnp.float32)
