"""1D viscous Burgers equation: explicit finite-difference integrator.

TPU-native re-implementation of the reference solver
(/root/reference/dataset/apps/generate_burgers.py:113-299). The reference
builds scipy LIL stencil matrices and steps with gather+einsum in torch; here
the same scheme is expressed as shifted-slice stencils inside a nested
``lax.scan`` — fully jittable, batched, and differentiable.

Scheme (matching the reference exactly):
  - grid: ``s`` interior points on (0, 1), dx = 1/(s+1); the two boundary
    points carry u = 0 (the reference zeroes them by re-padding every step:
    generate_burgers.py:184-185, so its one-sided boundary stencil rows never
    influence the interior — the interior update only ever sees zeros at the
    walls).
  - update: ``u <- u + dt * (-1/2 * D1(u^2) + visc * D2(u) + f)`` with
    central stencils D1 = (u_{i+1}-u_{i-1})/(2 dx), D2 = (u_{i-1}-2u_i+u_{i+1})/dx^2.
  - forcing: f has ``num_t`` frames; frame k is applied for steps
    [k*record, (k+1)*record) where record = floor(steps/num_t)
    (generate_burgers.py:190-192); u is recorded at the end of each frame.

Returned trajectory stacks u0 in front: shape (N, num_t+1, s)
(generate_burgers.py:298).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _stencil_step(u, f_frame, dt, dx, visc):
    """One explicit Euler step on the interior points (zero Dirichlet walls)."""
    up = jnp.pad(u, ((0, 0), (1, 1)))
    u2 = up * up
    transport = (u2[:, 2:] - u2[:, :-2]) / (2.0 * dx)
    diffusion = (up[:, :-2] - 2.0 * up[:, 1:-1] + up[:, 2:]) * (visc / dx**2)
    return u + dt * (-0.5 * transport + diffusion + f_frame)


@partial(jax.jit, static_argnames=("T", "dt", "num_t", "checkpoint"))
def burgers_solve(
    u0: jax.Array,
    f: jax.Array,
    visc: float = 0.01,
    T: float = 1.0,
    dt: float = 1e-4,
    num_t: int = 10,
    checkpoint: bool = True,
) -> jax.Array:
    """Simulate paired trajectories: sample i uses u0[i] and f[i].

    Equivalent of ``burgers_numeric_solve_free`` (generate_burgers.py:207-299).

    Args:
      u0: (N, s) initial states.
      f:  (N, num_t, s) piecewise-constant-in-time forcing.
      T, dt: physical horizon and step size; steps = ceil(T/dt).
      num_t: number of forcing frames / recorded snapshots.
      checkpoint: remat each forcing-frame chunk so reverse-mode AD through
        the 10^4-step integration stays within memory.

    Returns:
      (N, num_t + 1, s) trajectory including u0 as frame 0.
    """
    steps = math.ceil(T / dt)
    record = steps // num_t  # steps per forcing frame
    # The reference applies frame k for steps [k*record, (k+1)*record) and any
    # remainder steps past num_t*record reuse the last frame; with the default
    # (steps = 10^4, num_t = 10) there is no remainder.
    remainder = steps - record * num_t
    s = u0.shape[-1]
    dx = 1.0 / (s + 1)
    u0 = u0.astype(jnp.float32)
    f = f.astype(jnp.float32)

    def chunk(u, f_frame):
        def body(uu, _):
            return _stencil_step(uu, f_frame, dt, dx, visc), None

        u, _ = jax.lax.scan(body, u, None, length=record)
        return u, u  # carry, record at end of chunk

    if checkpoint:
        chunk = jax.checkpoint(chunk)

    uT, snaps = jax.lax.scan(chunk, u0, jnp.swapaxes(f, 0, 1))
    if remainder:
        last = f[:, -1, :]
        for _ in range(remainder):
            uT = _stencil_step(uT, last, dt, dx, visc)
        snaps = snaps.at[-1].set(uT)
    traj = jnp.concatenate([u0[None], snaps], axis=0)  # (num_t+1, N, s)
    return jnp.swapaxes(traj, 0, 1)


@partial(jax.jit, static_argnames=("T", "dt", "num_t"))
def burgers_solve_paired(u0, f, visc=0.01, T=1.0, dt=1e-4, num_t=10):
    """Cross-product variant (generate_burgers.py:113-205): every u0 is paired
    with every f. u0: (Nu0, s), f: (Nf, num_t, s) -> (Nu0, Nf, num_t+1, s)."""
    solve = lambda u0_i: burgers_solve(
        jnp.broadcast_to(u0_i[None], (f.shape[0], u0_i.shape[-1])),
        f, visc=visc, T=T, dt=dt, num_t=num_t,
    )
    return jax.vmap(solve)(u0)


# ---------------------------------------------------------------------------
# Data generation (reference make_data_varying_f, generate_burgers.py:338-418)
# ---------------------------------------------------------------------------


def _gaussian_bumps_u0(rng: np.random.Generator, n: int, x: np.ndarray):
    loc1 = rng.uniform(0.2, 0.4, (n, 1))
    amp1 = rng.uniform(0, 2, (n, 1))
    sig1 = rng.uniform(0.05, 0.15, (n, 1))
    g1 = amp1 * np.exp(-0.5 * (x[None, :] - loc1) ** 2 / sig1**2)
    loc2 = rng.uniform(0.6, 0.8, (n, 1))
    amp2 = rng.uniform(-2, 0, (n, 1))
    sig2 = rng.uniform(0.05, 0.15, (n, 1))
    g2 = amp2 * np.exp(-0.5 * (x[None, :] - loc2) ** 2 / sig2**2)
    return g1 + g2


def make_burgers_data(
    n: int,
    s: int = 128,
    t: int = 10,
    seed: int = 0,
    partial_control: str | None = None,
    amp_compensate: float = 2.0,
    alpha: float = 1.0,
):
    """Random two-bump initial states and spatio-temporal Gaussian forcings.

    Mirrors ``make_data_varying_f`` (generate_burgers.py:338-418): u0 is a sum
    of a positive bump on (0.2,0.4) and a negative bump on (0.6,0.8); f is a
    sum of 8 separable space-time Gaussian bumps (the first with guaranteed
    nonzero amplitude), optionally masked to the front/rear quarter of the
    domain (partial control) and scaled/clamped by ``alpha`` for
    distribution-shift studies.

    Returns (u0, f) as float32 numpy arrays of shape (n, s) and (n, t, s).
    """
    rng = np.random.default_rng(seed)
    dx = 1.0 / (s + 1)
    x = np.linspace(dx, 1.0 - dx, s)
    dt_ = 1.0 / (t + 1)
    ts = np.linspace(dt_, 1.0 - dt_, t)

    u0 = _gaussian_bumps_u0(rng, n, x)

    if partial_control is None:
        space_mask = np.ones((1, 1, s))
    elif partial_control == "front_rear_quarter":
        space_mask = np.zeros((1, 1, s))
        space_mask[:, :, : s // 4] = 1.0
        space_mask[:, :, 3 * s // 4 :] = 1.0
        amp_compensate = amp_compensate * 2
    else:
        raise ValueError(f"invalid partial control mode: {partial_control!r}")

    def rand_f(rand_amp: bool):
        if rand_amp:
            amp = rng.integers(0, 2, (n, 1, 1)) * rng.uniform(-1.5, 1.5, (n, 1, 1))
        else:
            amp = rng.uniform(-1.5, 1.5, (n, 1, 1))
        loc_x = rng.uniform(0, 1, (n, 1, 1))
        sig_x = rng.uniform(0.1, 0.4, (n, 1, 1)) * 0.5
        exp_space = np.exp(-0.5 * (x[None, None, :] - loc_x) ** 2 / sig_x**2)
        exp_space = exp_space * space_mask
        loc_t = rng.uniform(0, 1, (n, 1, 1))
        sig_t = rng.uniform(0.1, 0.4, (n, 1, 1)) * 0.5
        exp_time = amp_compensate * np.exp(
            -0.5 * (ts[None, :, None] - loc_t) ** 2 / sig_t**2
        )
        return amp * exp_space * exp_time

    f = rand_f(rand_amp=False)
    for _ in range(7):
        f = f + rand_f(rand_amp=True)
    if alpha != 1.0:
        f = np.clip(f * alpha, -10.0, 10.0)
    return u0.astype(np.float32), f.astype(np.float32)
