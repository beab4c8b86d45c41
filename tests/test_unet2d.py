"""UNet2D: shape checks and numerical parity with the reference torch Unet2D
via the checkpoint converter."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffphycon_tpu.nets.unet2d import UNet2D
from diffphycon_tpu.utils.torch_convert import convert_unet2d


def small_net(**kw):
    return UNet2D(dim=16, out_dim=2, dim_mults=(1, 2), channels=2,
                  resnet_block_groups=1, **kw)


def test_shapes_and_jit():
    net = small_net()
    x = jnp.zeros((2, 16, 128, 2))
    t = jnp.array([3.0, 500.0])
    params = net.init(jax.random.PRNGKey(0), x, t)
    out = jax.jit(net.apply)(params, x, t)
    assert out.shape == (2, 16, 128, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_time_dependence():
    net = small_net()
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 128, 2))
    params = net.init(jax.random.PRNGKey(0), x, jnp.array([0.0]))
    o1 = net.apply(params, x, jnp.array([0.0]))
    o2 = net.apply(params, x, jnp.array([999.0]))
    assert float(jnp.abs(o1 - o2).max()) > 1e-4


@pytest.mark.parametrize("dim,dim_mults", [(16, (1, 2)), (32, (1, 2, 4, 8))])
def test_parity_with_reference(reference_path, dim, dim_mults):
    import torch
    from model.burgers_1d.unet import Unet2D as TorchUnet2D

    torch.manual_seed(0)
    tnet = TorchUnet2D(
        dim=dim, out_dim=2, dim_mults=dim_mults, channels=2,
        resnet_block_groups=1, attn_dim_head=32, attn_heads=4,
    ).eval()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 2, 16, 128)).astype(np.float32)
    t = np.array([17.0, 940.0], np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x), torch.from_numpy(t)).numpy()

    net = UNet2D(dim=dim, out_dim=2, dim_mults=dim_mults, channels=2,
                 resnet_block_groups=1)
    params = {"params": convert_unet2d(tnet.state_dict(),
                                       num_levels=len(dim_mults))}
    # channels-last input
    x_nhwc = np.transpose(x, (0, 2, 3, 1))
    out = net.apply(params, jnp.asarray(x_nhwc), jnp.asarray(t))
    out_nchw = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out_nchw, ref, rtol=2e-3, atol=2e-4)


def test_burgers_config_replace_roundtrip():
    """dataclasses.replace(cfg, dim_mults=...) must not be reverted by the
    deprecated dim_muls alias re-applying in __post_init__ (ADVICE r4,
    medium: infer_burgers cfg_w built the wrong w-model architecture)."""
    import dataclasses

    from diffphycon_tpu.benchmarks.burgers import BurgersConfig

    cfg = BurgersConfig(dim=8, dim_muls=(1, 2))
    assert cfg.dim_mults == (1, 2)
    cfg2 = dataclasses.replace(cfg, dim_mults=(1, 2, 4))
    assert cfg2.dim_mults == (1, 2, 4)
    # alias still wins at construction time
    cfg3 = BurgersConfig(dim=8, dim_mults=(1, 2, 4), dim_muls=(1, 4))
    assert cfg3.dim_mults == (1, 4)
