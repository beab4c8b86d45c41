"""Jellyfish benchmark: EBM training loss parity, thetas loss parity,
sampler machinery, guidance, and surrogate pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffphycon_tpu.benchmarks import jellyfish as bench

F, H = 4, 16


def small_cfg(**kw):
    # cosine schedule: the linear schedule degenerates at tiny timesteps
    # (beta_end = 50*0.02 = 1.0 -> alpha_cumprod = 0)
    d = dict(dim=8, dim_mults=(1, 2), frames=F, image_size=H, cond_steps=1,
             timesteps=20, sampling_timesteps=20, beta_schedule="cosine")
    d.update(kw)
    return bench.JellyfishConfig(**d)


def _stub_joint(params, x, t):
    """Deterministic denoiser: depends on all 7 input channels."""
    del params
    w = jnp.arange(1, x.shape[-1] + 1, dtype=x.dtype) / x.shape[-1]
    s = (x * w).sum(-1, keepdims=True)
    return jnp.concatenate([0.1 * s] * 4, axis=-1)


def _stub_thetas(params, x, t):
    del params
    return 0.2 * x.sum(-1, keepdims=True) / x.shape[-1]


def _stub_bd(params, bd, delta):
    del params
    return bd * 0.9 + delta.reshape(-1, 1, 1, 1) * 0.01


@pytest.fixture()
def ref_jelly(reference_path):
    from diffusion import diffusion_2d_jellyfish as m

    return m


def _torch_stub_joint():
    import torch

    class Stub(torch.nn.Module):
        channels = 7
        self_condition = False

        def forward(self, x, t, sc=None):
            w = torch.arange(1, x.shape[2] + 1, dtype=x.dtype,
                             device=x.device) / x.shape[2]
            s = (x * w.reshape(1, 1, -1, 1, 1)).sum(2, keepdim=True)
            return torch.cat([0.1 * s] * 4, dim=2)

    return Stub()


def test_p_losses_states_parity(ref_jelly):
    """EBM grad-of-grad loss == reference p_losses 'states'
    (diffusion_2d_jellyfish.py:1019-1049)."""
    import torch

    ref = ref_jelly.GaussianDiffusion(
        _torch_stub_joint(), image_size=H, frames=F, cond_steps=1,
        timesteps=20, loss_type="l2", objective="pred_noise",
        beta_schedule="cosine", device="cpu",
    )
    rng = np.random.default_rng(0)
    state0 = rng.normal(size=(2, F, 3, H, H)).astype(np.float32)
    bd0 = rng.normal(size=(2, F, 3, H, H)).astype(np.float32)
    thetas0 = rng.normal(size=(2, F)).astype(np.float32)
    noise = rng.normal(size=state0.shape).astype(np.float32)
    t = np.array([3, 17])

    ref_loss = ref.p_losses(
        torch.from_numpy(state0.copy()), torch.from_numpy(bd0.copy()),
        torch.from_numpy(thetas0.copy()), torch.from_numpy(t), "states",
        noise=torch.from_numpy(noise.copy()),
    ).item()

    cfg = small_cfg()
    gd = bench.JellyfishDiffusion(cfg, _stub_joint)
    # replicate with fixed noise: inline the loss with the given noise
    s0 = jnp.asarray(np.transpose(state0, (0, 1, 3, 4, 2)))
    b0 = jnp.asarray(np.transpose(bd0, (0, 1, 3, 4, 2)))
    th0 = jnp.asarray(thetas0)
    nz = jnp.asarray(np.transpose(noise, (0, 1, 3, 4, 2)))
    tt = jnp.asarray(t)
    theta_plane = jnp.broadcast_to(th0[:, :, None, None, None],
                                   (2, F, H, H, 1))
    state = gd.q_sample(s0, tt, nz)
    state = state.at[:, :1].set(s0[:, :1])
    nz2 = nz.at[:, :1].set(0.0)

    def energy(s):
        x = jnp.concatenate([s, b0, theta_plane], axis=-1)
        return -jnp.sum(_stub_joint(None, x, tt) ** 2)

    g = jax.grad(energy)(state)
    loss = float(((g - nz2) ** 2).mean())
    np.testing.assert_allclose(loss, ref_loss, rtol=1e-3)


def test_p_losses_thetas_parity(ref_jelly):
    import torch

    class StubTheta(torch.nn.Module):
        channels = 7
        self_condition = False

        def forward(self, x, t, sc=None):
            return 0.2 * x.sum(2, keepdim=True) / x.shape[2]

    ref = ref_jelly.GaussianDiffusion(
        StubTheta(), image_size=H, frames=F, cond_steps=1, timesteps=20,
        loss_type="l2", objective="pred_noise", beta_schedule="linear",
        device="cpu",
    )
    rng = np.random.default_rng(1)
    state0 = rng.normal(size=(2, F, 3, H, H)).astype(np.float32)
    bd0 = rng.normal(size=(2, F, 3, H, H)).astype(np.float32)
    thetas0 = rng.normal(size=(2, F)).astype(np.float32)
    t = np.array([5, 12])

    torch.manual_seed(0)
    ref_loss = ref.p_losses(
        torch.from_numpy(state0.copy()), torch.from_numpy(bd0.copy()),
        torch.from_numpy(thetas0.copy()), torch.from_numpy(t), "thetas",
    ).item()
    # the reference draws its own noise; compare statistically over seeds
    cfg = small_cfg()
    gd = bench.JellyfishDiffusion(cfg, _stub_joint, thetas_apply=_stub_thetas)
    losses = [
        float(gd.p_losses_thetas(
            None, jax.random.PRNGKey(s),
            jnp.asarray(np.transpose(state0, (0, 1, 3, 4, 2))),
            jnp.asarray(np.transpose(bd0, (0, 1, 3, 4, 2))),
            jnp.asarray(thetas0), jnp.asarray(t)))
        for s in range(8)
    ]
    # same distribution: mean within 25%
    assert abs(np.mean(losses) - ref_loss) / ref_loss < 0.25


def test_sampler_runs_ddpm_and_ddim():
    cfg = small_cfg()
    gd = bench.JellyfishDiffusion(cfg, _stub_joint, thetas_apply=_stub_thetas,
                                  bd_updater_apply=_stub_bd)
    rng = np.random.default_rng(2)
    s0 = jnp.asarray(rng.normal(size=(2, H, H, 3)).astype(np.float32))
    b0 = jnp.asarray(rng.normal(size=(2, H, H, 3)).astype(np.float32))
    th0 = jnp.asarray(rng.normal(size=(2,)).astype(np.float32))

    states, theta = gd.sample((None, None, None), jax.random.PRNGKey(0),
                              s0, b0, th0)
    assert states.shape == (2, F, H, H, 3)
    assert theta.shape == (2, F)
    assert np.isfinite(np.asarray(states)).all()
    # cond pinning: frame 0 = state_0
    np.testing.assert_allclose(np.asarray(states[:, 0]), np.asarray(s0),
                               rtol=1e-5)
    # theta pinned at both ends
    np.testing.assert_allclose(np.asarray(theta[:, 0]), np.asarray(th0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(theta[:, -1]), np.asarray(th0),
                               rtol=1e-4, atol=1e-5)

    cfg_ddim = small_cfg(sampling_timesteps=5)
    gd2 = bench.JellyfishDiffusion(cfg_ddim, _stub_joint,
                                   thetas_apply=_stub_thetas,
                                   bd_updater_apply=_stub_bd)
    states2, theta2 = gd2.sample((None, None, None), jax.random.PRNGKey(0),
                                 s0, b0, th0)
    assert np.isfinite(np.asarray(states2)).all()


def test_sampler_with_guidance_and_repaint():
    cfg = small_cfg(cond_steps=0, standard_fixed_ratio=0.01)
    gd = bench.JellyfishDiffusion(cfg, _stub_joint, thetas_apply=_stub_thetas,
                                  bd_updater_apply=_stub_bd)
    rng = np.random.default_rng(3)
    s0 = jnp.asarray(rng.normal(size=(1, H, H, 3)).astype(np.float32))
    b0 = jnp.asarray(rng.normal(size=(1, H, H, 3)).astype(np.float32))
    th0 = jnp.asarray(rng.normal(size=(1,)).astype(np.float32))

    def design_fn(x_start4, bd_0_expand):
        return jax.grad(lambda z: (z**2).sum())(x_start4)

    states, theta = gd.sample((None, None, None), jax.random.PRNGKey(1),
                              s0, b0, th0, design_fn=design_fn)
    assert np.isfinite(np.asarray(states)).all()


def test_force_design_fn_shapes():
    cfg = small_cfg(reg_ratio=0.1)

    def force_apply(params, x):
        return x.mean(axis=(1, 2))[:, :1]

    fn = bench.make_force_design_fn(cfg, force_apply, None, _stub_bd, None,
                                    p_min=-2.0, p_max=3.0)
    x4 = jnp.asarray(
        np.random.default_rng(4).normal(size=(2, F, H, H, 4)).astype(
            np.float32))
    bd0e = jnp.zeros((2, F, H, H, 3))
    g = fn(x4, bd0e)
    assert g.shape == (2, F, H, H, 4)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_surrogate_pipeline_rollout():
    cfg = small_cfg()

    def sim_apply(params, x, delta):
        return x[..., : cfg.n_state] * 0.95

    def force_apply(params, x):
        return x.mean(axis=(1, 2))[:, :1]

    ppl = bench.SurrogatePipeline(cfg, sim_apply, None, force_apply, None,
                                  _stub_bd, None)
    rng = np.random.default_rng(5)
    s0 = jnp.asarray(rng.normal(size=(2, H, H, 3)).astype(np.float32))
    b0 = jnp.asarray(rng.normal(size=(2, H, H, 3)).astype(np.float32))
    thetas = jnp.asarray(rng.normal(size=(2, F)).astype(np.float32))
    states, forces = ppl.rollout(s0, b0, thetas)
    assert states.shape == (2, F, H, H, 3)
    assert forces.shape == (2, F)
    np.testing.assert_allclose(np.asarray(states[:, 0]), np.asarray(s0))


def test_surrogate_pipeline_pressure_denorm():
    """The force net consumes RAW pressure (reference ForceData recipe,
    data_surrogate_models_jellyfish.py:62-86); pipeline states are
    normalized to [-1,1], so step() must denormalize the pressure channel
    with p_min/p_max before the force readout."""
    cfg = small_cfg()
    seen = {}

    def force_apply(params, x):
        seen["pressure"] = x[..., 0]
        return x.mean(axis=(1, 2))[:, :1]

    p_min, p_max = -37.0, 12.0
    ppl = bench.SurrogatePipeline(cfg, None, None, force_apply, None,
                                  _stub_bd, None, p_min=p_min, p_max=p_max)
    rng = np.random.default_rng(7)
    state = jnp.asarray(rng.uniform(-1, 1, size=(2, H, H, 3)).astype(np.float32))
    bd = jnp.asarray(rng.normal(size=(2, H, H, 3)).astype(np.float32))
    ppl.step(state, bd)
    expect = (0.5 * state[..., -1] + 0.5) * (p_max - p_min) + p_min
    np.testing.assert_allclose(np.asarray(seen["pressure"]),
                               np.asarray(expect), rtol=1e-6)
    # default (None): pass-through for force nets trained on normalized p
    ppl0 = bench.SurrogatePipeline(cfg, None, None, force_apply, None,
                                   _stub_bd, None)
    ppl0.step(state, bd)
    np.testing.assert_allclose(np.asarray(seen["pressure"]),
                               np.asarray(state[..., -1]), rtol=1e-6)


def test_reg_theta():
    """sum_t (theta_{t+1}-theta_t)^2 (reference inference_2d_jellyfish.py:
    49-60; that module reads data files at import so the oracle is inline)."""
    th = np.random.default_rng(6).normal(size=(3, F)).astype(np.float32)
    ref = ((th[:, 1:] - th[:, :-1]) ** 2).sum(1)
    ours = np.asarray(bench.reg_theta(jnp.asarray(th)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_sample_chunked_matches_unchunked():
    """Host-synced chunked scanning (the axon long-scan workaround,
    apps/infer_jellyfish.py --scan_chunks) is bit-identical to one scan,
    for both the DDPM and DDIM paths."""
    rng = np.random.default_rng(7)
    s0 = jnp.asarray(rng.normal(size=(2, H, H, 3)).astype(np.float32))
    b0 = jnp.asarray(rng.normal(size=(2, H, H, 3)).astype(np.float32))
    th0 = jnp.asarray(rng.normal(size=(2,)).astype(np.float32))
    params = (None, None, None)

    for cfg in (small_cfg(), small_cfg(sampling_timesteps=6)):
        gd = bench.JellyfishDiffusion(cfg, _stub_joint,
                                      thetas_apply=_stub_thetas,
                                      bd_updater_apply=_stub_bd)
        key = jax.random.PRNGKey(3)
        ref_states, ref_theta = gd.sample(params, key, s0, b0, th0)

        k0, _ = jax.random.split(key)
        x = gd.sample_init(k0, s0, b0, th0)
        ts = gd.sample_ts()
        n = (ts[0] if isinstance(ts, tuple) else ts).shape[0]
        chunk = n // 2
        for i in range(0, n, chunk):
            sl = (tuple(a[i : i + chunk] for a in ts)
                  if isinstance(ts, tuple) else ts[i : i + chunk])
            x = gd.sample_chunk(params, key, s0, b0, th0, x, sl)
            x = jnp.asarray(np.asarray(x))  # host sync between chunks
        states, theta = gd.sample_finalize(x)
        np.testing.assert_array_equal(np.asarray(ref_states),
                                      np.asarray(states))
        np.testing.assert_array_equal(np.asarray(ref_theta),
                                      np.asarray(theta))
