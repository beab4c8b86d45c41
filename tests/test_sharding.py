"""Multi-device sharding: solver rollouts and guided sampling data-parallel
over the 8-virtual-device mesh (gradient/eval collectives fall out of
sharded autodiff; SURVEY.md §2.8)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from diffphycon_tpu.parallel import make_mesh, shard_batch


def test_burgers_solver_sharded_batch():
    from diffphycon_tpu.physics.burgers import burgers_solve, make_burgers_data

    mesh = make_mesh()
    u0, f = make_burgers_data(16, seed=0)
    u0s, fs = shard_batch(mesh, (jnp.asarray(u0), jnp.asarray(f)))
    traj = jax.jit(lambda u, ff: burgers_solve(u, ff, dt=1e-3))(u0s, fs)
    ref = burgers_solve(jnp.asarray(u0), jnp.asarray(f), dt=1e-3)
    np.testing.assert_allclose(np.asarray(traj), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)
    # output keeps the data sharding
    assert traj.sharding.spec == P("data")


def test_guided_sampler_sharded_batch():
    from diffphycon_tpu.benchmarks import burgers as bench

    mesh = make_mesh()
    cfg = bench.BurgersConfig(dim=8, dim_muls=(1, 2), timesteps=5,
                              is_condition_u0=True)
    net = bench.build_unet(cfg)
    params = bench.init_params(cfg, 0)
    gd = bench.build_diffusion(cfg, net.apply)

    u0 = jnp.zeros((8, 128))
    cv = {"u0": u0}
    cv_sharded = shard_batch(mesh, cv)
    sample = jax.jit(
        lambda p, k, cv: gd.sample(p, k, batch_size=8, cond_vals=cv)
    )
    x = sample(params, jax.random.PRNGKey(0), cv_sharded)
    assert x.shape == (8, 16, 128, 2)
    assert np.isfinite(np.asarray(x)).all()


def test_smoke_projection_sharded_batch():
    from diffphycon_tpu.physics.fluids.smoke_env import (
        SmokeSim,
        control_step_velocity,
    )

    mesh = make_mesh()
    sim = SmokeSim.create(accuracy=1e-4, max_iterations=30)
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.normal(size=(8, 128, 128, 2)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(8, 128, 128)).astype(np.float32))
    prev_s, c_s = shard_batch(mesh, (prev, c))
    out = jax.jit(lambda p, cc: control_step_velocity(sim, p, cc, cc))(
        prev_s, c_s)
    ref = control_step_velocity(sim, prev, c, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)
