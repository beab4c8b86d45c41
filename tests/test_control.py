"""Guidance objectives and control metrics: parity with reference utils.py."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffphycon_tpu.control.guidance import (
    burgers_guidance_from_x,
    ddpm_guidance_loss,
    make_nabla_j,
    mse_dist_reg,
)
from diffphycon_tpu.control.metrics import burgers_metric, mse_deviation


@pytest.fixture()
def ref_utils(reference_path):
    import utils

    return utils


def _rand(shape, seed=0, scale=1.0):
    return (np.random.default_rng(seed).normal(size=shape) * scale).astype(
        np.float32
    )


@pytest.mark.parametrize("po", [None, "front_rear_quarter"])
def test_guidance_loss_parity(ref_utils, po):
    import torch

    u_t = _rand((4, 11, 128), 0)
    u = _rand((4, 11, 128), 1)
    f = _rand((4, 10, 128), 2)
    ref = ref_utils.ddpm_guidance_loss(
        torch.from_numpy(u_t), torch.from_numpy(u), torch.from_numpy(f),
        wu=2.0, wf=0.5, wreg=0.1,
        dist_reg=ref_utils.mse_dist_reg, partially_observed=po,
    ).item()
    ours = ddpm_guidance_loss(
        jnp.asarray(u_t), jnp.asarray(u), jnp.asarray(f),
        wu=2.0, wf=0.5, wreg=0.1, dist_reg=mse_dist_reg,
        partially_observed=po,
    )
    np.testing.assert_allclose(float(ours), ref, rtol=1e-5)


def test_nabla_j_matches_torch_autograd(ref_utils):
    import torch

    u_t = _rand((2, 11, 128), 0)
    x = _rand((2, 16, 128, 2), 1)

    loss_fn = burgers_guidance_from_x(jnp.asarray(u_t), wu=3.0, wf=0.7)
    g = make_nabla_j(loss_fn)(jnp.asarray(x))

    # torch grad through the same objective (reference get_nablaJ, :34-49)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).requires_grad_(True)
    J = ref_utils.ddpm_guidance_loss(
        torch.from_numpy(u_t), xt[:, 0, :11, :], xt[:, 1, :10, :],
        wu=3.0, wf=0.7,
    )
    (g_ref,) = torch.autograd.grad(J, xt)
    np.testing.assert_allclose(
        np.transpose(np.asarray(g), (0, 3, 1, 2)), g_ref.numpy(),
        rtol=1e-4, atol=1e-6,
    )


@pytest.mark.parametrize("po", [None, "front_rear_quarter"])
def test_mse_deviation_parity(ref_utils, po):
    import torch

    u1, u2 = _rand((3, 11, 128), 0), _rand((3, 11, 128), 1)
    ref = ref_utils.mse_deviation(
        torch.from_numpy(u1), torch.from_numpy(u2), partially_observed=po,
        report_all=True,
    )
    ours = mse_deviation(jnp.asarray(u1), jnp.asarray(u2),
                         partially_observed=po, report_all=True)
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(o), r.numpy(), rtol=1e-5)


def test_burgers_metric_parity_evaluate_u(ref_utils):
    """Parity on the evaluate_u path (no solver call, pure metric math)."""
    import torch

    u_t = _rand((3, 11, 128), 0)
    f = _rand((3, 10, 128), 1)
    du = _rand((3, 11, 128), 2)
    ref_J, ref_E = ref_utils.burgers_metric(
        torch.from_numpy(u_t), torch.from_numpy(f), target="final_u",
        partial_control="front_rear_quarter", report_all=True,
        diffused_u=torch.from_numpy(du), evaluate_u=True,
        partially_observed="front_rear_quarter",
    )
    our_J, our_E = burgers_metric(
        jnp.asarray(u_t), jnp.asarray(f),
        partial_control="front_rear_quarter", report_all=True,
        diffused_u=jnp.asarray(du), evaluate_u=True,
        partially_observed="front_rear_quarter",
    )
    np.testing.assert_allclose(np.asarray(our_E), ref_E.numpy(), rtol=1e-5)
    for o, r in zip(our_J, ref_J):
        np.testing.assert_allclose(np.asarray(o), r.numpy(), rtol=1e-4,
                                   atol=1e-6)


def test_burgers_metric_with_solver_runs():
    u_t = _rand((2, 11, 128), 0, 0.3)
    f = _rand((2, 10, 128), 1, 0.3)
    J, E = burgers_metric(jnp.asarray(u_t), jnp.asarray(f))
    assert J.shape == (2,) and E.shape == (2,)
    assert np.isfinite(np.asarray(J)).all()
