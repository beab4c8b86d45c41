"""UNet2Dv2 / ForceUNet: parity with the reference WS-conv nets."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffphycon_tpu.nets.unet2dv2 import ForceUNet, UNet2Dv2, WSConv
from diffphycon_tpu.utils.torch_convert import (
    convert_force_unet,
    convert_unet2dv2,
)


def test_ws_conv_matches_torch(reference_path):
    import torch
    from diffusion.diffusion_2d_jellyfish import WeightStandardizedConv2d

    torch.manual_seed(0)
    tconv = WeightStandardizedConv2d(3, 8, 3, padding=1).eval()
    x = np.random.default_rng(0).normal(size=(2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()
    conv = WSConv(8)
    params = {"params": {
        "kernel": np.transpose(tconv.weight.detach().numpy(), (2, 3, 1, 0)),
        "bias": tconv.bias.detach().numpy(),
    }}
    out = conv.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref, rtol=1e-3, atol=1e-5)


def test_unet2dv2_parity(reference_path):
    import torch
    from diffusion.diffusion_2d_jellyfish import Unet as TorchUnet

    torch.manual_seed(0)
    tnet = TorchUnet(dim=16, out_dim=3, dim_mults=(1, 2), channels=3).eval()
    x = np.random.default_rng(1).normal(size=(2, 3, 16, 16)).astype(np.float32)
    t = np.array([0.3, -0.2], np.float32)  # theta-delta style conditioning
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x), torch.from_numpy(t)).numpy()

    net = UNet2Dv2(dim=16, out_dim=3, dim_mults=(1, 2), channels=3)
    params = {"params": convert_unet2dv2(tnet.state_dict(), num_levels=2)}
    out = net.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                    jnp.asarray(t))
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref, rtol=2e-3, atol=3e-4)


def test_force_unet_parity(reference_path):
    import torch
    from diffusion.diffusion_2d_jellyfish import ForceUnet as TorchForce

    torch.manual_seed(0)
    # the reference hardcodes final = Linear(512, out) so the net only works
    # with dim * dim_mults[-1] == 512 (diffusion_2d_jellyfish.py:454)
    tnet = TorchForce(dim=64, out_dim=1, dim_mults=(1, 2, 4, 8),
                      channels=4).eval()
    x = np.random.default_rng(2).normal(size=(1, 4, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x)).numpy()
    net = ForceUNet(dim=64, out_dim=1, dim_mults=(1, 2, 4, 8), channels=4)
    params = {"params": convert_force_unet(tnet.state_dict(), num_levels=4)}
    out = net.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=3e-4)
