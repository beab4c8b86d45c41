"""Burgers FD solver: parity with the reference torch implementation and
basic physical sanity (SURVEY.md §4: solver-as-oracle)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffphycon_tpu.physics.burgers import (
    burgers_solve,
    make_burgers_data,
)


def test_matches_reference_solver(reference_path):
    import torch
    from dataset.apps.generate_burgers import burgers_numeric_solve_free

    rng = np.random.default_rng(0)
    u0 = rng.normal(size=(4, 128)).astype(np.float32) * 0.5
    f = rng.normal(size=(4, 10, 128)).astype(np.float32) * 0.3

    ref = burgers_numeric_solve_free(
        torch.from_numpy(u0), torch.from_numpy(f), visc=0.01, T=1.0,
        dt=1e-3, num_t=10,
    ).numpy()
    ours = np.asarray(burgers_solve(u0, f, visc=0.01, T=1.0, dt=1e-3, num_t=10))

    assert ours.shape == ref.shape == (4, 11, 128)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_matches_reference_solver_full_resolution(reference_path):
    """Full dt=1e-4 (10^4 steps) on a small batch."""
    import torch
    from dataset.apps.generate_burgers import burgers_numeric_solve_free

    u0, f = make_burgers_data(2, s=128, t=10, seed=1)
    ref = burgers_numeric_solve_free(
        torch.from_numpy(u0), torch.from_numpy(f), visc=0.01, T=1.0,
        dt=1e-4, num_t=10,
    ).numpy()
    ours = np.asarray(burgers_solve(u0, f))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=5e-5)


def test_zero_forcing_decays():
    """With f=0 and viscosity, energy must decay monotonically."""
    u0, _ = make_burgers_data(3, seed=2)
    f = np.zeros((3, 10, 128), np.float32)
    traj = np.asarray(burgers_solve(u0, f))
    energy = (traj**2).sum(-1)
    assert (np.diff(energy, axis=1) <= 1e-6).all()


def test_differentiable():
    """The solver is differentiable end-to-end (used for guidance-through-
    solver experiments and the SL baseline)."""
    u0, f = make_burgers_data(2, seed=3)

    def loss(f):
        traj = burgers_solve(u0, jnp.asarray(f), dt=1e-3)
        return (traj[:, -1] ** 2).mean()

    g = jax.grad(loss)(jnp.asarray(f))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_forcing_frame_alignment():
    """Each forcing frame k must influence only snapshots > k."""
    u0 = np.zeros((1, 128), np.float32)
    f = np.zeros((1, 10, 128), np.float32)
    f[0, 5, 64] = 1.0  # impulse in frame 5
    traj = np.asarray(burgers_solve(u0, f, dt=1e-3))
    assert np.abs(traj[0, :6]).max() == 0.0
    assert np.abs(traj[0, 6]).max() > 0.0
