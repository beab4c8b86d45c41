"""Fluids core: validated against independent loop-based numpy oracles.

NOTE: the bundled PhiFlow itself cannot run under modern numpy (list-of-slice
indexing was removed), so the oracles here are independent transliterations of
the documented semantics (phi/math/nd.py, phi/solver/sparse.py,
phi/math/scipy_backend.py) written as explicit loops / scipy calls — an
implementation path disjoint from the vectorized JAX code under test.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.interpolate
import scipy.sparse
import scipy.sparse.linalg

from diffphycon_tpu.physics.fluids import (
    FluidDomain,
    advect_centered,
    divergence_free,
    masked_laplacian,
    resample_linear,
    solve_pressure_cg,
    staggered_at_centers,
    staggered_divergence,
    staggered_gradient,
)
from diffphycon_tpu.physics.fluids.smoke_env import (
    SmokeSim,
    bucket_masks,
    control_step_velocity,
    smoke_domain_128,
    smoke_solver,
)

# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------


def oracle_divergence(stag):
    """Forward-difference MAC divergence (nd.py:367-377), loops."""
    b, hp, wp, _ = stag.shape
    h, w = hp - 1, wp - 1
    out = np.zeros((b, h, w, 1), np.float32)
    for i in range(h):
        for j in range(w):
            out[:, i, j, 0] = (
                stag[:, i + 1, j, 1] - stag[:, i, j, 1]
                + stag[:, i, j + 1, 0] - stag[:, i, j, 0]
            )
    return out


def oracle_gradient(scalar):
    """Staggered gradient w/ symmetric pad (nd.py:602-614), loops."""
    b, h, w, _ = scalar.shape
    f = np.pad(scalar[..., 0], ((0, 0), (1, 1), (1, 1)), mode="symmetric")
    out = np.zeros((b, h + 1, w + 1, 2), np.float32)
    for i in range(h + 1):
        for j in range(w + 1):
            out[:, i, j, 1] = f[:, i + 1, j + 1] - f[:, i, j + 1]
            out[:, i, j, 0] = f[:, i + 1, j + 1] - f[:, i + 1, j]
    return out


def oracle_at_centers(stag):
    b, hp, wp, _ = stag.shape
    h, w = hp - 1, wp - 1
    out = np.zeros((b, h, w, 2), np.float32)
    for i in range(h):
        for j in range(w):
            out[:, i, j, 1] = (stag[:, i + 1, j, 1] + stag[:, i, j, 1]) / 2
            out[:, i, j, 0] = (stag[:, i, j + 1, 0] + stag[:, i, j, 0]) / 2
    return out


def oracle_resample(field, coords):
    """scipy interpn with the reference clamp (scipy_backend.py:58-78,181)."""
    b, h, w, c = field.shape
    coords = coords.copy()
    shape_rev = (w, h)  # reference passes shape[1:-1][::-1]
    for i in range(2):
        coords[..., i] = np.maximum(0, np.minimum(shape_rev[i], coords[..., i]))
    points = (np.arange(h), np.arange(w))
    out = []
    for bi in range(b):
        comps = [
            scipy.interpolate.interpn(
                points, field[bi, ..., ci], coords[bi], method="linear",
                bounds_error=False, fill_value=0,
            )
            for ci in range(c)
        ]
        out.append(np.stack(comps, -1))
    return np.stack(out).astype(np.float32)


def oracle_laplacian_matrix(active, fluid, open_boundary=True):
    """Dense obstacle Laplacian built with loops (sparse.py:27-78 rules)."""
    h, w = active.shape
    pad_val = 1.0 if open_boundary else 0.0
    act = np.pad(active, 1, constant_values=0.0)
    fld = np.pad(fluid, 1, constant_values=pad_val)
    n = h * w
    A = scipy.sparse.lil_matrix((n, n), dtype=np.float32)
    lin = lambda i, j: i * w + j
    for i in range(h):
        for j in range(w):
            ii, jj = i + 1, j + 1  # extended coords
            center = -(fld[ii + 1, jj] + fld[ii - 1, jj]
                       + fld[ii, jj + 1] + fld[ii, jj - 1])
            A[lin(i, j), lin(i, j)] = min(center, -1.0)
            if i + 1 < h:
                A[lin(i, j), lin(i + 1, j)] = act[ii + 1, jj] * act[ii, jj]
            if i - 1 >= 0:
                A[lin(i, j), lin(i - 1, j)] = act[ii - 1, jj] * act[ii, jj]
            if j + 1 < w:
                A[lin(i, j), lin(i, j + 1)] = act[ii, jj + 1] * act[ii, jj]
            if j - 1 >= 0:
                A[lin(i, j), lin(i, j - 1)] = act[ii, jj - 1] * act[ii, jj]
    return A.tocsr()


def oracle_velocity_mask(fluid, open_boundary=True):
    """(flow.py:456-473) staggered mask, loops."""
    h, w = fluid.shape
    pad_val = 1.0 if open_boundary else 0.0
    f = np.pad(fluid, 1, constant_values=pad_val)
    out = np.zeros((h + 1, w + 1, 2), np.float32)
    for i in range(h + 1):
        for j in range(w + 1):
            out[i, j, 1] = min(f[i + 1, j + 1], f[i, j + 1])
            out[i, j, 0] = min(f[i + 1, j + 1], f[i + 1, j])
    return out


def _rand_stag(seed=0, n=128, scale=1.0):
    return (np.random.default_rng(seed).normal(size=(1, n, n, 2)) * scale
            ).astype(np.float32)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_staggered_ops():
    s = _rand_stag(0, n=12)
    np.testing.assert_allclose(
        np.asarray(staggered_divergence(jnp.asarray(s))), oracle_divergence(s),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(staggered_at_centers(jnp.asarray(s))), oracle_at_centers(s),
        rtol=1e-5, atol=1e-6,
    )
    scalar = np.random.default_rng(1).normal(size=(1, 11, 11, 1)).astype(
        np.float32
    )
    np.testing.assert_allclose(
        np.asarray(staggered_gradient(jnp.asarray(scalar))),
        oracle_gradient(scalar), rtol=1e-5, atol=1e-6,
    )


def test_resample_replicate():
    rng = np.random.default_rng(2)
    field = rng.normal(size=(2, 20, 20, 2)).astype(np.float32)
    # spread coords across in-range, negative, and beyond-range
    coords = (rng.normal(size=(2, 15, 17, 2)) * 12 + 8).astype(np.float32)
    ref = oracle_resample(field, coords)
    ours = resample_linear(jnp.asarray(field), jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_advect_matches_oracle():
    s = _rand_stag(3, n=16, scale=2.0)
    field = np.abs(np.random.default_rng(4).normal(size=(1, 15, 15, 1))
                   ).astype(np.float32)
    vel = oracle_at_centers(s)[..., ::-1]
    idx = np.stack(np.meshgrid(np.arange(15), np.arange(15), indexing="ij"),
                   -1)[None].astype(np.float32)
    ref = oracle_resample(field, idx - vel)
    ours = advect_centered(jnp.asarray(s), jnp.asarray(field), dt=1.0)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def dom128():
    return smoke_domain_128()


@pytest.fixture(scope="module")
def oracle_A(dom128):
    return oracle_laplacian_matrix(dom128.active, dom128.fluid,
                                   dom128.open_boundary)


def test_laplacian_matches_matrix(dom128, oracle_A):
    rng = np.random.default_rng(5)
    p = rng.normal(size=(2, 127, 127)).astype(np.float32)
    ref = np.stack([
        (oracle_A @ p[i].reshape(-1)).reshape(127, 127) for i in range(2)
    ])
    ours = masked_laplacian(jnp.asarray(p), dom128.laplacian_coeffs())
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_velocity_mask(dom128):
    ref = oracle_velocity_mask(dom128.fluid, dom128.open_boundary)
    np.testing.assert_array_equal(np.asarray(dom128.velocity_mask()), ref)


def test_pressure_solve_vs_direct(dom128, oracle_A):
    """CG solution vs scipy direct sparse solve of the same system."""
    rng = np.random.default_rng(6)
    div = (rng.normal(size=(1, 127, 127)) * 0.1).astype(np.float32)
    ref = scipy.sparse.linalg.spsolve(
        oracle_A.astype(np.float64), div[0].reshape(-1).astype(np.float64)
    ).reshape(127, 127)
    ours = solve_pressure_cg(jnp.asarray(div), dom128.laplacian_coeffs(),
                             1e-8, 2000)
    np.testing.assert_allclose(np.asarray(ours)[0], ref, rtol=2e-2, atol=2e-2)


def test_divergence_free_removes_divergence(dom128):
    """Divergence vanishes in interior active cells. (At the OPEN domain
    boundary the reference's symmetric-padded gradient disagrees with the
    open-boundary Laplacian, so boundary cells retain divergence — a PhiFlow
    property we reproduce faithfully; cf. StaggeredGrid.gradient symmetric
    pad nd.py:607 vs pad_fluid open=1 flow.py:418-423.)"""
    stag = jnp.asarray(_rand_stag(7))
    out = divergence_free(stag, dom128, accuracy=1e-6)
    div = staggered_divergence(out)
    act = jnp.asarray(dom128.active)[None, ..., None]
    interior = (div * act)[:, 1:-1, 1:-1]
    assert float(jnp.abs(interior).max()) < 5e-4


def test_control_step_is_indirect(dom128):
    """The interior must evolve only through projection, not direct control."""
    sim = SmokeSim.create(accuracy=1e-6)
    prev = jnp.zeros((1, 128, 128, 2))
    c1 = jnp.ones((1, 128, 128))
    c2 = jnp.ones((1, 128, 128))
    vel = control_step_velocity(sim, prev, c1, c2)
    assert np.isfinite(np.asarray(vel)).all()
    # control ring cells carry velocity (modulo masks)
    assert float(jnp.abs(vel[:, :, :16]).max()) > 0


def test_smoke_solver_runs_and_conserves():
    sim = SmokeSim.create(accuracy=1e-5, max_iterations=200)
    b = 2
    rng = np.random.default_rng(8)
    init_v = jnp.zeros((b, 128, 128, 2))
    init_d = jnp.asarray(np.abs(rng.normal(size=(b, 64, 64))).astype(np.float32))
    c1 = jnp.asarray((rng.normal(size=(b, 8, 64, 64)) * 0.3).astype(np.float32))
    c2 = jnp.asarray((rng.normal(size=(b, 8, 64, 64)) * 0.3).astype(np.float32))
    out = jax.jit(lambda *a: smoke_solver(sim, *a, num_t=16))(
        init_v, init_d, c1, c2
    )
    assert out["densitys"].shape == (b, 16, 128, 128)
    assert out["velocitys"].shape == (b, 16, 128, 128, 2)
    assert out["smoke_out_record"].shape == (b, 16)
    assert np.isfinite(np.asarray(out["densitys"])).all()
    assert np.isfinite(np.asarray(out["smoke_out_record"])).all()
    # smoke-out fractions are monotone non-decreasing in time (mass only
    # accumulates in buckets)
    rec = np.asarray(out["smoke_outs"])
    assert (rec >= -1e-6).all()


def test_gradient_through_projection(dom128):
    coeffs = dom128.laplacian_coeffs()
    vmask = dom128.velocity_mask()

    def loss(stag):
        out = divergence_free(stag, None, coeffs=coeffs, velocity_mask=vmask,
                              accuracy=1e-5, max_iterations=100)
        return (out**2).sum()

    g = jax.grad(loss)(jnp.asarray(_rand_stag(9, scale=0.1)))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
