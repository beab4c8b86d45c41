"""Fused Pallas UNet2D forward matches the Flax reference (interpret mode)."""

import jax
import jax.numpy as jnp
import pytest

from diffphycon_tpu.nets.unet2d import UNet2D
from diffphycon_tpu.research import pallas_unet2d as pu


@pytest.fixture(autouse=True)
def _interpret():
    pu.set_interpret(True)
    yield
    pu.set_interpret(False)


def _parity(dim, mults, shape, batch, tol=5e-5):
    net = UNet2D(dim=dim, dim_mults=mults, channels=shape[-1],
                 out_dim=shape[-1], resnet_block_groups=1)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch,) + shape)
    t = jnp.linspace(0.0, 999.0, batch)
    params = net.init(jax.random.PRNGKey(0), x, t)
    ref = net.apply(params, x, t)
    packed = pu.pack_unet2d_params(params, dim=dim, dim_mults=mults)
    out = pu.unet2d_pallas_apply(packed, x, t)
    assert out.shape == ref.shape
    assert float(jnp.abs(ref - out).max()) < tol * max(
        1.0, float(jnp.abs(ref).max()))


def test_parity_small():
    _parity(16, (1, 2, 4), (16, 128, 2), batch=4)


def test_parity_three_channels_batch_not_power_of_two():
    # odd batch exercises the batch-tile divisor search
    _parity(8, (1, 2), (8, 64, 3), batch=3)


def test_film_projection_matches_per_block():
    """The single batched FiLM matmul equals per-block Dense projections."""
    net = UNet2D(dim=16, dim_mults=(1, 2), channels=2, out_dim=2,
                 resnet_block_groups=1)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 64, 2))
    t = jnp.array([5.0, 700.0])
    params = net.init(jax.random.PRNGKey(0), x, t)
    packed = pu.pack_unet2d_params(params, dim=16, dim_mults=(1, 2))
    temb = pu._time_embedding(packed, t)
    film = pu._film_all(packed, temb)
    h = jax.nn.silu(temb)
    for nm in pu._res_names(2):
        expect = h @ packed[nm]["film_w"] + packed[nm]["film_b"]
        assert float(jnp.abs(film[nm] - expect).max()) < 1e-6


def test_parity_bf16_weights():
    """bf16 matmul weights keep outputs within bf16-ish tolerance."""
    import jax.numpy as jnp

    net = UNet2D(dim=16, dim_mults=(1, 2), channels=2, out_dim=2,
                 resnet_block_groups=1)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 64, 2))
    t = jnp.array([5.0, 700.0])
    params = net.init(jax.random.PRNGKey(0), x, t)
    ref = net.apply(params, x, t)
    packed = pu.pack_unet2d_params(params, dim=16, dim_mults=(1, 2),
                                   weight_dtype=jnp.bfloat16)
    out = pu.unet2d_pallas_apply(packed, x, t)
    err = float(jnp.abs(ref - out).max())
    assert err < 0.05 * max(1.0, float(jnp.abs(ref).max()))
