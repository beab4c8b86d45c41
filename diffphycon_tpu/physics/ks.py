"""1D Kuramoto-Sivashinsky equation: spectral ETDRK4 integrator.

Companion solver for the KS operator-learning machinery
(/root/reference/model/pde_1d_surrogate_model/{ks_operator.py,data_ks_1d.py};
the reference ships only pre-generated KS data and the same latent operator
nets as Burgers — see diffphycon_tpu.nets.burgers_operator). This provides
the missing data generator as a TPU-native spectral solver:

  u_t = -u u_x - u_xx - u_xxxx + f

on a periodic domain of length L, integrated with the standard ETDRK4
exponential time differencing scheme; batched, jittable, differentiable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _etdrk4_coeffs(s: int, L: float, dt: float, n_quad: int = 32):
    """Precompute ETDRK4 scalar coefficient arrays (complex contour quadrature
    for numerical stability of the phi-functions)."""
    k = 2 * np.pi * np.fft.fftfreq(s, d=L / s)
    lin = k**2 - k**4  # -u_xx - u_xxxx in Fourier space
    E = np.exp(dt * lin)
    E2 = np.exp(dt * lin / 2)
    # contour integral evaluation of phi functions
    r = np.exp(1j * np.pi * (np.arange(1, n_quad + 1) - 0.5) / n_quad)
    lr = dt * lin[:, None] + r[None, :]
    Q = dt * np.real(np.mean((np.exp(lr / 2) - 1) / lr, axis=1))
    f1 = dt * np.real(np.mean(
        (-4 - lr + np.exp(lr) * (4 - 3 * lr + lr**2)) / lr**3, axis=1))
    f2 = dt * np.real(np.mean(
        (2 + lr + np.exp(lr) * (-2 + lr)) / lr**3, axis=1))
    f3 = dt * np.real(np.mean(
        (-4 - 3 * lr - lr**2 + np.exp(lr) * (4 - lr)) / lr**3, axis=1))
    g = -0.5j * k  # nonlinear term -(u^2/2)_x
    j = lambda a: jnp.asarray(a)
    return (j(E), j(E2), j(Q), j(f1), j(f2), j(f3), j(g.astype(np.complex64)))


@partial(jax.jit, static_argnames=("s", "num_t", "substeps", "L", "dt"))
def ks_solve(u0: jax.Array, f: jax.Array, L: float = 22.0, dt: float = 0.025,
             num_t: int = 10, substeps: int = 40, s: int = 128) -> jax.Array:
    """Integrate KS with piecewise-constant forcing.

    u0: (B, s); f: (B, num_t, s) forcing frames (each applied for
    ``substeps`` ETDRK4 steps). Returns (B, num_t + 1, s).
    """
    E, E2, Q, f1, f2, f3, g = _etdrk4_coeffs(s, L, dt)

    def nonlin(v_hat, f_hat):
        u = jnp.fft.ifft(v_hat, axis=-1).real
        return g * jnp.fft.fft(u * u, axis=-1) + f_hat

    def step(v, f_hat):
        nv = nonlin(v, f_hat)
        a = E2 * v + Q * nv
        na = nonlin(a, f_hat)
        b = E2 * v + Q * na
        nb = nonlin(b, f_hat)
        c = E2 * a + Q * (2 * nb - nv)
        nc = nonlin(c, f_hat)
        return E * v + nv * f1 + 2 * (na + nb) * f2 + nc * f3

    v0 = jnp.fft.fft(u0.astype(jnp.float32), axis=-1)

    def frame(v, f_t):
        f_hat = jnp.fft.fft(f_t, axis=-1)

        def sub(vv, _):
            return step(vv, f_hat), None

        v, _ = jax.lax.scan(sub, v, None, length=substeps)
        return v, jnp.fft.ifft(v, axis=-1).real

    _, us = jax.lax.scan(frame, v0, jnp.swapaxes(f.astype(jnp.float32), 0, 1))
    traj = jnp.concatenate([u0[None], us], axis=0)
    return jnp.swapaxes(traj, 0, 1)


def make_ks_data(n: int, s: int = 128, t: int = 10, seed: int = 0,
                 L: float = 22.0):
    """Random smooth initial states + Gaussian-bump forcings for KS
    (same bump construction as the Burgers generator)."""
    from diffphycon_tpu.physics.burgers import make_burgers_data

    u0, f = make_burgers_data(n, s=s, t=t, seed=seed)
    return u0, f
