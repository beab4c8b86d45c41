"""KS spectral solver and fluidformat scene IO."""

import numpy as np
import jax
import jax.numpy as jnp

from diffphycon_tpu.physics.ks import ks_solve, make_ks_data
from diffphycon_tpu.utils.fluidformat import (
    Scene,
    get_fieldnames,
    get_indices,
    read_sim_frame,
    read_zipped_array,
    write_sim_frame,
    write_zipped_array,
)


def test_ks_shapes_and_boundedness():
    u0, f = make_ks_data(2, seed=0)
    traj = ks_solve(jnp.asarray(u0), jnp.asarray(f) * 0.1)
    assert traj.shape == (2, 11, 128)
    assert np.isfinite(np.asarray(traj)).all()
    # KS attractor stays bounded
    assert float(jnp.abs(traj).max()) < 50


def test_ks_forcing_has_effect():
    u0, f = make_ks_data(2, seed=1)
    t0 = ks_solve(jnp.asarray(u0), jnp.zeros_like(jnp.asarray(f)))
    t1 = ks_solve(jnp.asarray(u0), jnp.asarray(f))
    assert float(jnp.abs(t1 - t0).max()) > 1e-3


def test_ks_differentiable():
    u0, f = make_ks_data(1, seed=2)

    def loss(ff):
        return (ks_solve(jnp.asarray(u0), ff)[:, -1] ** 2).mean()

    g = jax.grad(loss)(jnp.asarray(f))
    assert np.isfinite(np.asarray(g)).all()


def test_scene_roundtrip(tmp_path):
    arr = np.random.default_rng(0).normal(size=(1, 8, 8, 2)).astype(np.float32)
    p = str(tmp_path / "field.npz")
    write_zipped_array(p, arr)
    # reference semantics: stored stripped of the singleton batch dim,
    # re-added on read (phi/fluidformat.py:7-19)
    with np.load(p) as f:
        assert f[f.files[0]].shape == (8, 8, 2)
    np.testing.assert_array_equal(read_zipped_array(p), arr)
    # a file written by the reference pipeline (already stripped) also loads
    # with the leading singleton
    p2 = str(tmp_path / "field2.npz")
    np.savez_compressed(p2, arr[0])
    np.testing.assert_array_equal(read_zipped_array(p2), arr)

    sc = Scene.create(str(tmp_path), "smoke")
    sc.write_sim_frame([arr, arr * 2], ["Density", "Velocity"], 3)
    d, v = read_sim_frame(sc.path, ["Density", "Velocity"], 3)
    np.testing.assert_array_equal(v, arr * 2)
    assert get_fieldnames(sc.path) == ["Density", "Velocity"]
    assert get_indices(sc.path) == [3]

    sc2 = Scene.create(str(tmp_path), "smoke")
    assert sc2.index == sc.index + 1
    sc2.properties = {"note": "test"}
    assert Scene.list(str(tmp_path), "smoke")[1].properties["note"] == "test"


def test_burgers_graph_dataset_matches_reference_semantics():
    """Graph view vs the reference Burgers dataset's get() field semantics
    (dataset/apps/burgers_h5py.py:134-201): 1D chain edge_index interleaved
    [i,i+1],[i+1,i], snapped +-1/129 edge attrs, input/output windows."""
    import numpy as np

    from diffphycon_tpu.training.data import (
        BurgersGraphDataset,
        burgers_graph_edges,
    )

    ei, ea = burgers_graph_edges(128)
    assert ei.shape == (2, 254) and ea.shape == (254, 1)
    assert (ei[:, 0] == [0, 1]).all() and (ei[:, 1] == [1, 0]).all()
    # reference update_edge_attr_1d snaps to +-1/129: edge from node i to
    # i+1 has attr x_pos[i]-x_pos[i+1] = -1/129
    assert np.isclose(ea[0, 0], -1 / 129) and np.isclose(ea[1, 0], 1 / 129)

    rng = np.random.default_rng(0)
    u = rng.normal(size=(3, 11, 128)).astype(np.float32)
    f = rng.normal(size=(3, 128)).astype(np.float32)
    ds = BurgersGraphDataset(u, f)
    # T=11, input 1, output 10 -> exactly one effective stamp per sim
    assert ds.time_stamps_effective == 1 and len(ds) == 3
    item = ds.get(2)
    assert item["x"].shape == (128, 1, 1)
    assert item["y"].shape == (128, 10, 1)
    np.testing.assert_allclose(item["x"][:, 0, 0], u[2, 0])
    np.testing.assert_allclose(item["y"][:, 0, 0], u[2, 1])
    np.testing.assert_allclose(item["y"][:, -1, 0], u[2, 10])
    np.testing.assert_allclose(item["f"][:, 0], f[2])
    assert item["x_bdd"][0, 0] == 0 and item["x_bdd"][-1, 0] == 0
    assert item["x_bdd"][1:-1].min() == 1
