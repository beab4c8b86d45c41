"""Smoke benchmark: diffusion parity with the reference (stub denoisers),
conditioning, guidance ordering, and the evaluation pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffphycon_tpu.benchmarks import smoke as bench
from diffphycon_tpu.diffusion import GaussianDiffusion, GuidanceSpec
from diffphycon_tpu.diffusion.conditioning import (
    smoke_cond_spec,
    smoke_derive_cond,
)

F, H, W = 4, 8, 8


def _stub_joint(params, x, t):
    tb = jnp.asarray(t, jnp.float32).reshape(-1, 1, 1, 1, 1)
    return 0.1 * x + 0.01 * tb


def _stub_w(params, x, t):
    return 0.2 * x + 0.05


def make_gd(two_model=True, **kw):
    cond = smoke_cond_spec()
    defaults = dict(
        model_apply=_stub_joint,
        model_w_apply=_stub_w if two_model else None,
        sample_shape=(F, H, W, 6),
        timesteps=50,
        beta_schedule="linear",
        cond=cond,
        prior_beta=0.97,
        combine_w_with_guidance=two_model,
    )
    defaults.update(kw)
    return GaussianDiffusion(**defaults)


@pytest.fixture()
def ref_smoke(reference_path):
    from diffusion import diffusion_2d_smoke as m

    return m


def _ref_two_model_gd(ref_smoke, sfr=100.0, coeff_ratio=0.0,
                      design_guidance="standard"):
    import torch

    class StubJoint(torch.nn.Module):
        channels = 6
        self_condition = False

        def forward(self, x, t, sc=None):
            return 0.1 * x + 0.01 * t.float().reshape(-1, 1, 1, 1, 1)

    class StubW(torch.nn.Module):
        channels = 2
        self_condition = False

        def forward(self, x, t, sc=None):
            return 0.2 * x + 0.05

    return ref_smoke.GaussianDiffusion(
        (StubJoint(), StubW()),
        image_size=H, frames=F, timesteps=50, loss_type="l2",
        objective="pred_noise", beta_schedule="linear",
        standard_fixed_ratio=sfr, coeff_ratio=coeff_ratio,
        eval_2ddpm=True, w_prob_exp=0.97, device="cpu",
    )


def test_model_predictions_two_model_guidance_parity(ref_smoke):
    """eps' = eps_joint + sfr*g + (gamma-1)*eps_w with x_start-for-guidance
    from the unreweighted eps (reference diffusion_2d_smoke.py:610-643)."""
    import torch

    ref = _ref_two_model_gd(ref_smoke, sfr=100.0)
    rng = np.random.default_rng(0)
    # reference layout (B, F, C, H, W)
    x = rng.normal(size=(2, F, 6, H, W)).astype(np.float32)
    t = np.array([30, 30])

    def torch_design_fn(z, low=None, init=None, init_u=None):
        z = z.clone().detach().requires_grad_(True)
        J = (z**2).sum()
        (g,) = torch.autograd.grad(J, z)
        return g

    ref_noise, ref_x0 = ref.model_predictions(
        None, torch.from_numpy(x), torch.from_numpy(t),
        design_fn=torch_design_fn, design_guidance="standard",
    )

    gd = make_gd()
    guidance = GuidanceSpec(
        nabla_j=lambda z: jax.grad(lambda zz: (zz**2).sum())(z),
        j_schedule=jnp.full((50,), 100.0),
    )
    x_cl = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    pn, x0 = gd.model_predictions((None, None), x_cl, jnp.asarray(t), {},
                                  guidance)
    np.testing.assert_allclose(
        np.transpose(np.asarray(pn), (0, 1, 4, 2, 3)),
        ref_noise.detach().numpy(), rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(x0), (0, 1, 4, 2, 3)),
        ref_x0.detach().numpy(), rtol=1e-4, atol=1e-4,
    )


def test_p_losses_parity(ref_smoke):
    """Training loss parity incl. frame-0 density pin + zero target
    (reference p_losses, diffusion_2d_smoke.py:809-831)."""
    import torch

    class StubJoint(torch.nn.Module):
        channels = 6
        self_condition = False

        def forward(self, x, t, sc=None):
            return 0.1 * x + 0.01 * t.float().reshape(-1, 1, 1, 1, 1)

    ref = ref_smoke.GaussianDiffusion(
        StubJoint(), image_size=H, frames=F, timesteps=50, loss_type="l2",
        objective="pred_noise", beta_schedule="linear", device="cpu",
    )
    rng = np.random.default_rng(1)
    x0 = rng.normal(size=(3, F, 6, H, W)).astype(np.float32)
    noise = rng.normal(size=x0.shape).astype(np.float32)
    t = np.array([5, 25, 49])
    ref_loss = ref.p_losses(torch.from_numpy(x0.copy()), torch.from_numpy(t),
                            noise=torch.from_numpy(noise.copy())).item()

    gd = make_gd(two_model=False, combine_w_with_guidance=False)
    x0_cl = jnp.asarray(np.transpose(x0, (0, 1, 3, 4, 2)))
    noise_cl = jnp.asarray(np.transpose(noise, (0, 1, 3, 4, 2)))
    cond = smoke_derive_cond(x0_cl)
    x = gd.q_sample(x0_cl, jnp.asarray(t), noise_cl)
    x = gd.cond.pin(x, cond)
    out = gd.model_apply(None, x, jnp.asarray(t))
    target = gd.cond.zero_target(noise_cl, cond)
    # reference uses a plain global-mean l2, no per-sample loss_weight (:826)
    loss = float(((out - target) ** 2).mean())
    np.testing.assert_allclose(loss, ref_loss, rtol=1e-4)


def test_sampler_pins_init_and_runs():
    gd = make_gd(sampling_timesteps=10, ddim_sampling_eta=1.0)
    init = jnp.ones((2, H, W)) * 0.5
    guidance = GuidanceSpec(
        nabla_j=lambda z: jax.grad(lambda zz: (zz**2).sum())(z),
        j_schedule=jnp.full((50,), 0.01),
    )
    x = gd.sample((None, None), jax.random.PRNGKey(0), batch_size=2,
                  cond_vals={"init": init}, guidance=guidance)
    assert x.shape == (2, F, H, W, 6)
    assert np.isfinite(np.asarray(x)).all()


def test_evaluate_samples_runs():
    from diffphycon_tpu.physics.fluids.smoke_env import SmokeSim

    sim = SmokeSim.create(accuracy=1e-4, max_iterations=50)
    rng = np.random.default_rng(2)
    pred = rng.normal(size=(2, 32, 64, 64, 6)).astype(np.float32) * 0.1
    data = np.abs(rng.normal(size=(2, 33, 64, 64, 6))).astype(np.float32)
    m = bench.evaluate_samples(sim, jnp.asarray(pred), jnp.asarray(data),
                               w_energy=0.1)
    for k in ["J_total", "J_target", "J_energy", "mse", "n_l2", "mae_smoke"]:
        assert m[k].shape == (2,), k
        assert np.isfinite(np.asarray(m[k])).all(), k


def test_guidance_gradient_scaling():
    """nabla_j evaluates the gradient at the RESCALED state
    (reference guidance_fn, inference_2d_smoke.py:29-44)."""
    cfg = bench.SmokeConfig(w_energy=0.0, standard_fixed_ratio=1.0)
    g = bench.build_guidance(cfg)
    x = jnp.ones((1, 32, 64, 64, 6)) * 0.5
    grad = g.nabla_j(x)
    # J = -mean smoke portion of final frame; gradient only on channel 5,
    # final frame
    assert float(jnp.abs(grad[..., :5]).max()) == 0.0
    assert float(jnp.abs(grad[:, :-1, :, :, 5]).max()) == 0.0
    expected = -1.0 / (64 * 64)
    np.testing.assert_allclose(np.asarray(grad[:, -1, :, :, 5]), expected,
                               rtol=1e-5)
