"""Geometry utils: parity of the force integration with the reference torch
implementation; functional checks of clustering/boundary ordering."""

import numpy as np
import jax.numpy as jnp
import pytest

from diffphycon_tpu.control import geometry as G


def test_force_integration_parity(reference_path):
    import torch
    import utils as ref_utils

    rng = np.random.default_rng(0)
    pressure = rng.normal(size=(62, 62)).astype(np.float32)
    # a simple closed square outline
    t = np.linspace(0, 2 * np.pi, 40, endpoint=False)
    boundary = np.stack([31 + 10 * np.cos(t), 31 + 6 * np.sin(t)], -1).astype(
        np.float32)

    fx_ref, fy_ref = ref_utils.compute_pressForce(
        torch.from_numpy(pressure), torch.from_numpy(boundary))
    fx, fy = G.compute_pressforce(jnp.asarray(pressure), jnp.asarray(boundary))
    np.testing.assert_allclose(float(fx), fx_ref.item(), rtol=1e-4)
    np.testing.assert_allclose(float(fy), fy_ref.item(), rtol=1e-4)


def test_force_on_constant_pressure_closed_loop_is_zero():
    """Closed curve in constant pressure: net force ~ 0 (divergence thm)."""
    t = np.linspace(0, 2 * np.pi, 100, endpoint=False)
    boundary = jnp.asarray(
        np.stack([30 + 8 * np.cos(t), 30 + 8 * np.sin(t)], -1))
    pressure = jnp.ones((62, 62)) * 3.0
    fx, fy = G.compute_pressforce(pressure, boundary)
    assert abs(float(fx)) < 1e-3
    assert abs(float(fy)) < 1e-3


def test_cluster_and_boundary_roundtrip():
    mask = np.zeros((32, 32))
    mask[8:14, 5:12] = 1   # solid 1
    mask[20:26, 18:27] = 1  # solid 2
    clustered = G.find_filtered_clusters(mask)
    assert clustered.max() == 2
    bnds = G.find_cluster_boundary(clustered)
    assert len(bnds) == 2
    # each outline encloses its rectangle corners
    b0 = bnds[0]
    assert b0[:, 0].min() <= 5 and b0[:, 0].max() >= 11


def test_isolated_point_filtering():
    mask = np.zeros((16, 16))
    mask[4:8, 4:8] = 1
    mask[12, 12] = 1  # isolated
    out = G.filter_isolated_points(mask)
    assert out[12, 12] == 0
    assert out[5, 5] == 1


def test_reconstruct_boundary_subpixel():
    mask = np.zeros((32, 32))
    mask[10:16, 10:18] = 1
    off = np.zeros((32, 32, 2), np.float32)
    off[..., 0] = 0.25
    pts = G.reconstruct_boundary(mask, off)
    assert pts.shape[1] == 2
    frac = pts[:, 0] - np.floor(pts[:, 0])
    np.testing.assert_allclose(frac, 0.75, atol=1e-6)


def test_find_clusters_fast_matches_reference_algorithm():
    """8-connected components + min_samples=2 semantics == find_clusters
    (DBSCAN eps=1.5) on dataset-like masks with speckles."""
    from diffphycon_tpu.control.geometry import find_clusters, find_clusters_fast

    rng = np.random.default_rng(0)
    grid = np.zeros((40, 40), int)
    grid[5:12, 6:20] = 1            # blob A
    grid[25:30, 22:33] = 1          # blob B
    grid[2, 35] = 1                 # singleton -> noise under min_samples=2
    grid[20, 3] = grid[20, 4] = 1   # 2-cell cluster
    a = find_clusters(grid)
    b = find_clusters_fast(grid)
    np.testing.assert_array_equal(a, b)


def test_compute_pressforce_from_mask_dataset_frame():
    """Finite per-wing forces from a real dataset frame, consistent with the
    per-cluster integrator on the same outlines."""
    import os

    from diffphycon_tpu.control.geometry import compute_pressforce_from_mask

    root = "data/jellyfish/train_data"
    if not os.path.isdir(root):
        pytest.skip("jellyfish data not present")
    st = np.load(os.path.join(root, "states", "sim_000000.npz"))["a"]
    bd = np.load(os.path.join(root, "bdry_merged_mask_offsets",
                              "sim_000000.npz"))["a"]
    out = compute_pressforce_from_mask(np.nan_to_num(st[0, 2]), bd[0],
                                       pad_shift=1.0)
    assert out.ndim == 2 and out.shape[1] == 2
    assert out.shape[0] >= 2  # at least the two wings
    assert np.isfinite(out).all()
