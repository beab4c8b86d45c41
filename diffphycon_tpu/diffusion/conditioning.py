"""Benchmark conditioning specs.

Each factory returns a :class:`CondSpec` of pure functions plus a ``derive``
helper that extracts the conditioning arrays from a clean training batch.

Burgers layout here is channels-last: x is (B, 16, 128, 2) with
channel 0 = u (11 valid rows + padding) and channel 1 = f (10 valid rows),
versus the reference's (B, 2, 16, 128)
(/root/reference/dataset/data_1d.py:62-69).

PERFORMANCE NOTE: every operation here runs inside the scanned samplers'
bodies. Integer-indexed updates (``x.at[..., 0].set(v)``) lower to
scatter-like ops that stall the TPU pipeline for ~15-20 ms per occurrence on
this runtime (measured on v5e; see diffusion/core.py::_extract for the
sibling gather pathology). All conditioning is therefore expressed as fused
mask arithmetic (``x * (1-m) + v * m``) with masks built from iota
comparisons — compile-time constants that fuse into neighboring elementwise
ops.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from diffphycon_tpu.diffusion.core import CondSpec


def _time_chan_mask(x, t_idx: int, chan: int):
    """(1, T, 1, C) mask: 1 where (time == t_idx and channel == chan)."""
    tdim, cdim = x.shape[1], x.shape[-1]
    m_t = (jnp.arange(tdim) == t_idx).astype(x.dtype)
    m_c = (jnp.arange(cdim) == chan).astype(x.dtype)
    return m_t[None, :, None, None] * m_c[None, None, None, :]


def _timerange_chan_mask(x, t0: int, t1: int, chan: int):
    tdim, cdim = x.shape[1], x.shape[-1]
    tt = jnp.arange(tdim)
    m_t = ((tt >= t0) & (tt < t1)).astype(x.dtype)
    m_c = (jnp.arange(cdim) == chan).astype(x.dtype)
    return m_t[None, :, None, None] * m_c[None, None, None, :]


def burgers_cond_spec(
    *,
    is_condition_u0: bool = False,
    is_condition_uT: bool = False,
    is_condition_u0_zero_pred_noise: bool = True,
    is_condition_uT_zero_pred_noise: bool = True,
    condition_idx: int = 10,
    is_model_w: bool = False,
    train_on_partially_observed: Optional[str] = None,
    set_unobserved_to_zero_during_sampling: bool = False,
    train_on_padded_locations: bool = True,
) -> CondSpec:
    """Conditioning for the Burgers joint/prior DDPMs.

    Mirrors set_condition / p_losses masking of the reference
    (diffusion_1d_burgers.py:500-522, 741-816). ``train_on_padded_locations=True``
    intentionally reproduces the reference's "faulty" default of also training
    on the zero-padded rows (:223).
    """
    ci = condition_idx

    def pin(x, cond):
        if is_condition_u0:
            m = _time_chan_mask(x, 0, 0)
            x = x * (1 - m) + cond["u0"][:, None, :, None] * m
        if is_condition_uT:
            m = _time_chan_mask(x, ci, 0)
            x = x * (1 - m) + cond["uT"][:, None, :, None] * m
        return x

    def zero_target(target, cond):
        if is_condition_u0 and is_condition_u0_zero_pred_noise:
            target = target * (1 - _time_chan_mask(target, 0, 0))
        if is_condition_uT and is_condition_uT_zero_pred_noise:
            target = target * (1 - _time_chan_mask(target, ci, 0))
        return target

    def w_zero_input(x, cond):
        # p(w) never sees u_[1..T-1] (reference :412, :771)
        return x * (1 - _timerange_chan_mask(x, 1, ci, 0))

    def w_zero_output(out, cond):
        # p(w) only outputs w, never u (reference :402, :414)
        cdim = out.shape[-1]
        keep = (jnp.arange(cdim) != 0).astype(out.dtype)
        return out * keep[None, None, None, :]

    def sampling_mask(x, cond):
        if set_unobserved_to_zero_during_sampling:
            nx = x.shape[2]
            xx = jnp.arange(nx)
            m_x = ((xx >= nx // 4) & (xx < (3 * nx) // 4)).astype(x.dtype)
            m_c = (jnp.arange(x.shape[-1]) == 0).astype(x.dtype)
            m = m_x[None, None, :, None] * m_c[None, None, None, :]
            x = x * (1 - m)
        return x

    def loss_mask_pre(model_out, target, cond):
        if train_on_partially_observed is None:
            return model_out
        nx = model_out.shape[2]
        xx = jnp.arange(nx)
        m_x = ((xx >= nx // 4) & (xx < (3 * nx) // 4)).astype(model_out.dtype)
        if train_on_partially_observed == "front_rear_quarter":
            m_c = (jnp.arange(model_out.shape[-1]) == 0).astype(
                model_out.dtype)
            m = m_x[None, None, :, None] * m_c[None, None, None, :]
        elif train_on_partially_observed == "front_rear_quarter_u_and_f":
            # reference's faulty variant masks both channels (:793-796)
            m = m_x[None, None, :, None]
        else:
            raise NotImplementedError(train_on_partially_observed)
        return model_out * (1 - m) + target * m

    def loss_mask_post(model_out, target, cond):
        if is_model_w:
            # no loss on the u channel (reference :808-810)
            m = (jnp.arange(model_out.shape[-1]) == 0).astype(model_out.dtype)
            m = m[None, None, None, :]
            model_out = model_out * (1 - m) + target * m
        if not train_on_padded_locations:
            # no loss on padded rows (reference :812-816)
            m_u = _timerange_chan_mask(model_out, ci + 1, model_out.shape[1],
                                       0)
            m_f = _timerange_chan_mask(model_out, ci, model_out.shape[1], 1)
            m = jnp.clip(m_u + m_f, 0, 1)
            model_out = model_out * (1 - m) + target * m
        return model_out

    return CondSpec(
        pin=pin,
        zero_target=zero_target,
        w_zero_input=w_zero_input,
        w_zero_output=w_zero_output,
        sampling_mask=sampling_mask,
        loss_mask_pre=loss_mask_pre,
        loss_mask_post=loss_mask_post,
    )


def burgers_derive_cond(x_start):
    """Extract {u0, uT} from a clean stacked batch (B, 16, 128, 2)
    (reference p_losses conditioning source, diffusion_1d_burgers.py:743-752)."""
    return {"u0": x_start[:, 0, :, 0], "uT": x_start[:, 10, :, 0]}


# ---------------------------------------------------------------------------
# Smoke (2D indirect control)
# ---------------------------------------------------------------------------


def _frame_chan_mask5(x, f_idx: int, chan: int):
    """(1, F, 1, 1, C) mask for 5D video tensors."""
    fdim, cdim = x.shape[1], x.shape[-1]
    m_f = (jnp.arange(fdim) == f_idx).astype(x.dtype)
    m_c = (jnp.arange(cdim) == chan).astype(x.dtype)
    return m_f[None, :, None, None, None] * m_c[None, None, None, None, :]


def smoke_cond_spec(is_w_model: bool = False) -> CondSpec:
    """Conditioning for the smoke video DDPMs over (B, 32, 64, 64, C).

    Joint model: C=6 (density, vx, vy, c1, c2, smoke-portion); the initial
    density (frame 0, channel 0) is pinned every step and its noise target
    zeroed (reference diffusion_2d_smoke.py:712-720, 815-816).

    w model: C=2 (c1, c2) sliced by the trainer
    (diffusion_2d_smoke.py:1016-1017); the same p_losses pins frame-0
    channel-0 (then c1) — a reference quirk preserved here.

    Two-model sampling adapters: the w model sees only channels 3:5 of the
    joint tensor and its output is zero-embedded back
    (diffusion_2d_smoke.py:612-615).
    """

    def pin(x, cond):
        if "init" in cond:
            m = _frame_chan_mask5(x, 0, 0)
            x = x * (1 - m) + cond["init"][:, None, :, :, None] * m
        return x

    def zero_target(target, cond):
        return target * (1 - _frame_chan_mask5(target, 0, 0))

    def w_slice_input(x, cond):
        # joint (B,F,H,W,6) -> w-model input (B,F,H,W,2) = (c1, c2);
        # contiguous lane slice, fuses cleanly
        return x[..., 3:5]

    def w_embed_output(out_w, cond):
        # (B,F,H,W,2) -> zero-padded (B,F,H,W,6) at channels 3:5 via concat
        z3 = jnp.zeros(out_w.shape[:-1] + (3,), out_w.dtype)
        z1 = jnp.zeros(out_w.shape[:-1] + (1,), out_w.dtype)
        return jnp.concatenate([z3, out_w, z1], axis=-1)

    return CondSpec(
        pin=pin,
        zero_target=zero_target,
        w_zero_input=w_slice_input,
        w_zero_output=w_embed_output,
    )


def smoke_derive_cond(x_start):
    """{init}: frame-0 density from a clean batch (B, 32, 64, 64, C)
    (reference p_losses conditioning source, diffusion_2d_smoke.py:815)."""
    return {"init": x_start[:, 0, :, :, 0]}


def get_proj_ep_orthogonal(norm: str = "F"):
    """Orthogonal-projection guidance combiner, the TPU port of the
    reference's get_proj_ep_orthogonal_func
    (/root/reference/diffusion/diffusion_1d_burgers.py:51-66): instead of the
    additive default ``eps + g`` it removes the component of ``g`` parallel
    to ``eps``, i.e. eps + g - <g, eps> * eps / ||eps||.

    Layout: channels-last (B, T, X, C) here vs the reference's (B, C, T, X);
    the reduction axes map accordingly (F: over (T, X); 1D_x: over X;
    1D_t: over T).

    Quirks preserved from the reference: the 'F' inner product
    ``(nabla_J * ep).sum()`` is a GLOBAL scalar (summed over batch and
    channels too) while the denominator is a per-(batch, channel) norm.
    Deviation: the reference's '1D_t' multiplies a (B, C, X) tensor with a
    (B, C, T, X) one, which torch cannot broadcast (it raises for T != C);
    we implement the evident intent by keeping the reduced axis.
    """
    if norm == "F":

        def proj(ep, g):
            num = (g * ep).sum()
            den = jnp.sqrt(jnp.square(ep).sum(axis=(1, 2), keepdims=True))
            return ep + g - num * ep / den

    elif norm == "1D_x":

        def proj(ep, g):
            num = (g * ep).sum(axis=2, keepdims=True)
            den = jnp.sqrt(jnp.square(ep).sum(axis=2, keepdims=True))
            return ep + g - num * ep / den

    elif norm == "1D_t":

        def proj(ep, g):
            num = (g * ep).sum(axis=1, keepdims=True)
            den = jnp.sqrt(jnp.square(ep).sum(axis=1, keepdims=True))
            return ep + g - num * ep / den

    else:
        raise NotImplementedError(f"unknown proj norm {norm!r}")

    return proj
