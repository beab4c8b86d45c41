"""Staggered (MAC) grid operators in JAX, channels-last.

TPU-native equivalents of the bundled PhiFlow grid math
(/root/reference/phi/math/nd.py): fields are (B, H, W, C) with spatial dims in
(y, x) order; staggered velocity arrays are (B, H+1, W+1, 2) with channel
0 = x-component, 1 = y-component (reference component convention:
StaggeredGrid stacks reversed-dim components, nd.py:342,365).

All operators are pure jnp slicing/padding — XLA fuses them into a handful of
elementwise kernels, and they are differentiable by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def staggered_divergence(stag: jax.Array) -> jax.Array:
    """Forward-difference divergence of a staggered field
    (reference StaggeredGrid.divergence, nd.py:367-377).

    stag: (B, H+1, W+1, 2) -> (B, H, W, 1).
    """
    # y-dim (dimension 0) uses component 1; x-dim uses component 0
    dy = stag[:, 1:, :-1, 1] - stag[:, :-1, :-1, 1]
    dx = stag[:, :-1, 1:, 0] - stag[:, :-1, :-1, 0]
    return (dy + dx)[..., None]


def staggered_gradient(scalar: jax.Array) -> jax.Array:
    """Staggered gradient of a centered scalar field with symmetric padding
    (reference StaggeredGrid.gradient, nd.py:602-614).

    scalar: (B, H, W, 1) -> staggered (B, H+1, W+1, 2).
    """
    f = jnp.pad(scalar[..., 0], ((0, 0), (1, 1), (1, 1)), mode="symmetric")
    # dim 0 (y): upper f[1:, 1:], lower f[:-1, 1:]
    gy = f[:, 1:, 1:] - f[:, :-1, 1:]
    # dim 1 (x): upper f[1:, 1:], lower f[1:, :-1]
    gx = f[:, 1:, 1:] - f[:, 1:, :-1]
    return jnp.stack([gx, gy], axis=-1)


def staggered_at_centers(stag: jax.Array) -> jax.Array:
    """Average face samples to cell centers
    (reference StaggeredGrid.at_centers, nd.py:332-342).

    stag: (B, H+1, W+1, 2) -> (B, H, W, 2) (channel 0=x, 1=y).
    """
    vy = (stag[:, 1:, :-1, 1] + stag[:, :-1, :-1, 1]) / 2.0
    vx = (stag[:, :-1, 1:, 0] + stag[:, :-1, :-1, 0]) / 2.0
    return jnp.stack([vx, vy], axis=-1)


def staggered_at_faces(stag: jax.Array, face_dim_xyz: int) -> jax.Array:
    """Interpolate all components to the faces of dimension ``face_dim_xyz``
    (0=x, 1=y) (reference StaggeredGrid.at_faces, nd.py:344-365).

    stag: (B, H+1, W+1, 2) -> (B, H+1, W+1, 2).
    """
    rank = 2
    face_dim_zyx = rank - face_dim_xyz - 1
    components = []
    for d in range(rank):  # y, x
        comp = rank - d - 1
        if d == face_dim_zyx:
            components.append(stag[..., comp])
        else:
            t = stag[..., comp]
            for d2 in range(rank):
                ax = 1 + d2
                upper = jax.lax.slice_in_dim(t, 1, t.shape[ax], axis=ax)
                lower = jax.lax.slice_in_dim(t, 0, t.shape[ax] - 1, axis=ax)
                t = upper + lower
                pad = [(0, 0), (0, 0), (0, 0)]
                pad[ax] = (0, 1) if d2 == d else (1, 0)
                t = jnp.pad(t, pad) / 2.0
            components.append(t)
    return jnp.stack(components[::-1], axis=-1)


def resample_linear(field: jax.Array, coords: jax.Array) -> jax.Array:
    """Bilinear resample with the reference's REPLICATE-boundary semantics
    (phi/math/scipy_backend.py:58-78 + clamp :181-185): coordinates are
    clamped to [0, dim] (note: one PAST the last index), then values outside
    [0, dim-1] fill with 0 (scipy.interpn fill_value=0).

    field: (B, H, W, C); coords: (B, H', W', 2) in (y, x) index order.
    Returns (B, H', W', C).
    """
    b, h, w, c = field.shape
    y = jnp.clip(coords[..., 0], 0.0, float(h))
    x = jnp.clip(coords[..., 1], 0.0, float(w))
    in_range = (y <= h - 1) & (x <= w - 1)

    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    fy = y - y0
    fx = x - x0
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)

    def gather(yi, xi):
        # (B, H', W') index grids -> (B, H', W', C)
        return jax.vmap(lambda f, yy, xx: f[yy, xx])(field, yi, xi)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)
    fy = fy[..., None]
    fx = fx[..., None]
    out = (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )
    return jnp.where(in_range[..., None], out, 0.0)


def _index_grid(h: int, w: int) -> jax.Array:
    """(1, H, W, 2) index tensor in (y, x) order (reference indices_tensor,
    nd.py:19-31)."""
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    idx = jnp.stack([jnp.broadcast_to(yy, (h, w)),
                     jnp.broadcast_to(xx, (h, w))], axis=-1)
    return idx[None]


def advect_centered(stag: jax.Array, field: jax.Array, dt: float = 1.0
                    ) -> jax.Array:
    """Semi-Lagrangian advection of a centered field by a staggered velocity
    (reference StaggeredGrid._advect_centered_field, nd.py:422-427).

    stag: (B, H+1, W+1, 2); field: (B, H, W, C) -> (B, H, W, C).
    """
    b, h, w, _ = field.shape
    idx = _index_grid(h, w)
    vel = staggered_at_centers(stag)  # (B, H, W, 2) channels (x, y)
    vel_yx = vel[..., ::-1]  # -> (y, x) to match idx
    coords = idx - vel_yx * dt
    return resample_linear(field, coords)


def advect_staggered(stag: jax.Array, field_stag: jax.Array, dt: float = 1.0
                     ) -> jax.Array:
    """Semi-Lagrangian advection of a staggered field by this staggered
    velocity (reference _advect_mac, nd.py:429-444)."""
    b, hp, wp, _ = field_stag.shape
    idx = _index_grid(hp, wp)
    comps = []
    for d in range(2):  # z,y,x loop over spatial dims (y, x)
        face_dim = 2 - d - 1
        vel_faces = staggered_at_faces(stag, face_dim)[..., ::-1]
        coords = idx - vel_faces * dt
        d_comp = 2 - d - 1
        comps.append(resample_linear(field_stag[..., d_comp:d_comp + 1],
                                     coords))
    return jnp.concatenate(comps[::-1], axis=-1)
