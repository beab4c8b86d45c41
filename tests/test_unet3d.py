"""UNet3D: shape checks and numerical parity with the reference
Unet3D_with_Conv3D (via faithful stubs for its missing rotary/einops deps)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffphycon_tpu.nets.unet3d import UNet3D, t5_relative_position_buckets
from diffphycon_tpu.utils.torch_convert import convert_unet3d


def test_shapes_and_jit():
    net = UNet3D(dim=8, dim_mults=(1, 2), channels=6, out_dim=6,
                 resnet_groups=8)
    x = jnp.zeros((2, 4, 16, 16, 6))
    t = jnp.array([3.0, 500.0])
    params = net.init(jax.random.PRNGKey(0), x, t)
    out = jax.jit(net.apply)(params, x, t)
    assert out.shape == (2, 4, 16, 16, 6)
    assert np.isfinite(np.asarray(out)).all()


def test_t5_buckets_match_reference(reference_path):
    import torch
    from model.video_diffusion_pytorch.video_diffusion_pytorch_conv3d import (
        RelativePositionBias,
    )

    ref = RelativePositionBias._relative_position_bucket(
        torch.arange(8)[None, :] - torch.arange(8)[:, None],
        num_buckets=32, max_distance=32,
    ).numpy()
    ours = t5_relative_position_buckets(8, 32, 32)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("channels,out_dim", [(6, 6), (2, 2)])
def test_parity_with_reference(reference_path, channels, out_dim):
    import torch
    from model.video_diffusion_pytorch.video_diffusion_pytorch_conv3d import (
        Unet3D_with_Conv3D,
    )

    torch.manual_seed(0)
    tnet = Unet3D_with_Conv3D(
        dim=16, dim_mults=(1, 2), channels=channels, out_dim=out_dim,
        attn_heads=4, attn_dim_head=32, resnet_groups=8,
    ).eval()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 4, channels, 16, 16)).astype(np.float32)
    t = np.array([700.0], np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x), torch.from_numpy(t)).numpy()

    net = UNet3D(dim=16, dim_mults=(1, 2), channels=channels, out_dim=out_dim,
                 resnet_groups=8)
    params = {"params": convert_unet3d(tnet.state_dict(), num_levels=2)}
    x_cl = np.transpose(x, (0, 1, 3, 4, 2))  # (B,F,C,H,W)->(B,F,H,W,C)
    out = net.apply(params, jnp.asarray(x_cl), jnp.asarray(t))
    out_ref_layout = np.transpose(np.asarray(out), (0, 1, 4, 2, 3))
    np.testing.assert_allclose(out_ref_layout, ref, rtol=2e-3, atol=3e-4)


def test_remat_all_matches_plain_forward():
    """remat_all changes memory behavior only, not numerics."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffphycon_tpu.nets.unet3d import UNet3D

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 4, 8, 8, 6)).astype(np.float32))
    t = jnp.zeros((1,))
    a = UNet3D(dim=8, dim_mults=(1, 2), channels=6, out_dim=6,
               resnet_groups=2, remat_all=False)
    b = UNet3D(dim=8, dim_mults=(1, 2), channels=6, out_dim=6,
               resnet_groups=2, remat_all=True)
    p = a.init(jax.random.PRNGKey(0), x, t)
    ya = a.apply(p, x, t)
    yb = b.apply(p, x, t)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=1e-6)
    # grad path (the reason remat exists) stays finite
    g = jax.grad(lambda p: b.apply(p, x, t).sum())(p)
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree.leaves(g))
