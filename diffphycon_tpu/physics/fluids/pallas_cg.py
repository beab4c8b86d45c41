"""Pallas TPU kernel: fused conjugate-gradient pressure solve.

The TPU-native counterpart of the reference's in-kernel CUDA CG
(/root/reference/phi/solver/cuda/src/pressure_solve_op.cu.cc: builds the
banded obstacle Laplacian on device and runs the full CG loop inside one
kernel with cuBLAS dots + shared-memory banded mat-vec). Here one
``pallas_call`` program runs the entire CG solve for one batch element with
every buffer (pressure, residual, momentum, A*momentum and the 5 stencil
coefficient fields) resident in VMEM — no HBM traffic between iterations,
no per-iteration XLA while_loop overhead.

The 127x127 grids are padded to (128, 128) lanes; the stencil coefficients
already carry the obstacle masks and zero out-of-range neighbors, so padding
rows/cols stay identically zero through the iteration.

Used by ``solve_pressure_cg`` when ``use_pallas=True`` (falls back to the
jnp while_loop implementation elsewhere, e.g. on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cg_kernel(div_ref, center_ref, upy_ref, loy_ref, upx_ref, lox_ref,
               out_ref, accuracy_ref, maxiter_ref):
    """One batch element: full CG in VMEM.

    All refs are (H, W) blocks in VMEM except accuracy (SMEM scalar).
    """
    h = div_ref.shape[0]
    center = center_ref[:]
    up_y, lo_y = upy_ref[:], loy_ref[:]
    up_x, lo_x = upx_ref[:], lox_ref[:]

    def matvec(p):
        out = center * p
        # neighbor shifts via jnp.roll; coefficients at out-of-range sites
        # are zero so the wrapped values are masked out
        out = out + up_y * jnp.roll(p, -1, axis=0)
        out = out + lo_y * jnp.roll(p, 1, axis=0)
        out = out + up_x * jnp.roll(p, -1, axis=1)
        out = out + lo_x * jnp.roll(p, 1, axis=1)
        return out

    div = div_ref[:]
    x = jnp.zeros_like(div)
    momentum = div
    residual = div
    a_mom = matvec(momentum)
    accuracy = accuracy_ref[0]
    max_iter = maxiter_ref[0]

    def cond(state):
        _, _, _, residual, i = state
        return (jnp.max(jnp.abs(residual)) >= accuracy) & (i < max_iter)

    def body(state):
        x, momentum, a_mom, residual, i = state
        tmp = jnp.sum(momentum * a_mom)
        a = jnp.sum(momentum * residual) / tmp
        x = x + a * momentum
        residual = residual - a * a_mom
        b = -jnp.sum(residual * a_mom) / tmp
        momentum = residual + b * momentum
        a_mom = matvec(momentum)
        return (x, momentum, a_mom, residual, i + 1)

    x, _, _, _, _ = jax.lax.while_loop(
        cond, body, (x, momentum, a_mom, residual, jnp.int32(0)))
    out_ref[:] = x


@functools.partial(jax.jit, static_argnames=("accuracy", "max_iterations",
                                             "interpret"))
def pallas_solve_pressure(div: jax.Array, coeffs, accuracy: float = 1e-8,
                          max_iterations: int = 500,
                          interpret: bool = False) -> jax.Array:
    """div: (B, H, W) -> pressure (B, H, W). coeffs as from
    FluidDomain.laplacian_coeffs()."""
    b, h, w = div.shape
    center, up_y, lo_y, up_x, lo_x = coeffs

    # pad to TPU lane multiples; coefficient padding is zero so padded cells
    # never couple into the solve
    hp = (h + 7) // 8 * 8
    wp = (w + 127) // 128 * 128
    pad2 = lambda a: jnp.pad(a, ((0, hp - h), (0, wp - w)))
    pad3 = lambda a: jnp.pad(a, ((0, 0), (0, hp - h), (0, wp - w)))

    div_p = pad3(div.astype(jnp.float32))
    cfs = [jnp.broadcast_to(pad2(c)[None], (b, hp, wp)) for c in
           (center, up_y, lo_y, up_x, lo_x)]
    acc = jnp.full((1,), accuracy, jnp.float32)
    mi = jnp.full((1,), max_iterations, jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 6 + [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    def kernel(div_ref, c_ref, uy_ref, ly_ref, ux_ref, lx_ref, acc_ref,
               mi_ref, out_ref):
        _cg_kernel(
            div_ref.at[0], c_ref.at[0], uy_ref.at[0], ly_ref.at[0],
            ux_ref.at[0], lx_ref.at[0], out_ref.at[0], acc_ref, mi_ref,
        )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hp, wp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(div_p, *cfs, acc, mi)
    return out[:, :h, :w]
