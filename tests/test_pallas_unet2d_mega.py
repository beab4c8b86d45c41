"""Whole-forward mega-kernel matches the Flax UNet2D (interpret mode)."""

import jax
import jax.numpy as jnp
import pytest

from diffphycon_tpu.nets.unet2d import UNet2D
from diffphycon_tpu.research import pallas_unet2d_mega as mega


@pytest.fixture(autouse=True)
def _interpret():
    mega.set_interpret(True)
    yield
    mega.set_interpret(False)


def test_mega_parity_small():
    net = UNet2D(dim=16, dim_mults=(1, 2, 4), channels=2, out_dim=2,
                 resnet_block_groups=1)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 128, 2))
    t = jnp.array([3.0, 500.0, 999.0, 0.0])
    params = net.init(jax.random.PRNGKey(0), x, t)
    ref = net.apply(params, x, t)
    packed = mega.pack_unet2d_mega(params, dim=16, dim_mults=(1, 2, 4),
                                   weight_dtype=None)
    out = mega.unet2d_mega_apply(packed, x, t, batch_tile=2)
    assert out.shape == ref.shape
    err = float(jnp.abs(ref - out).max())
    assert err < 5e-5 * max(1.0, float(jnp.abs(ref).max()))


def test_mega_parity_two_levels_odd_batch():
    net = UNet2D(dim=8, dim_mults=(1, 2), channels=3, out_dim=3,
                 resnet_block_groups=1)
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 8, 64, 3))
    t = jnp.array([10.0, 400.0, 900.0])
    params = net.init(jax.random.PRNGKey(3), x, t)
    ref = net.apply(params, x, t)
    packed = mega.pack_unet2d_mega(params, dim=8, dim_mults=(1, 2),
                                   weight_dtype=None)
    out = mega.unet2d_mega_apply(packed, x, t, batch_tile=1)
    err = float(jnp.abs(ref - out).max())
    assert err < 5e-5 * max(1.0, float(jnp.abs(ref).max()))
