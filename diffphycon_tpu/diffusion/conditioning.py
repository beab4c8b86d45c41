"""Benchmark conditioning specs.

Each factory returns a :class:`CondSpec` of pure functions plus a ``derive``
helper that extracts the conditioning arrays from a clean training batch.

Burgers layout here is channels-last: x is (B, 16, 128, 2) with
channel 0 = u (11 valid rows + padding) and channel 1 = f (10 valid rows),
versus the reference's (B, 2, 16, 128)
(/root/reference/dataset/data_1d.py:62-69).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from diffphycon_tpu.diffusion.core import CondSpec


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
            x = x.at[:, 0, :, 0].set(cond["u0"])
        if is_condition_uT:
            x = x.at[:, ci, :, 0].set(cond["uT"])
        return x

    def zero_target(target, cond):
        if is_condition_u0 and is_condition_u0_zero_pred_noise:
            target = target.at[:, 0, :, 0].set(0.0)
        if is_condition_uT and is_condition_uT_zero_pred_noise:
            target = target.at[:, ci, :, 0].set(0.0)
        return target

    def w_zero_input(x, cond):
        # p(w) never sees u_[1..T-1] (reference :412, :771)
        return x.at[:, 1:ci, :, 0].set(0.0)

    def w_zero_output(out, cond):
        # p(w) only outputs w, never u (reference :402, :414)
        return out.at[:, :, :, 0].set(0.0)

    def sampling_mask(x, cond):
        if set_unobserved_to_zero_during_sampling:
            nx = x.shape[2]
            x = x.at[:, :, nx // 4 : (3 * nx) // 4, 0].set(0.0)
        return x

    def loss_mask_pre(model_out, target, cond):
        if train_on_partially_observed == "front_rear_quarter":
            nx = model_out.shape[2]
            sl = (slice(None), slice(None), slice(nx // 4, (3 * nx) // 4), 0)
            model_out = model_out.at[sl].set(target[sl])
        elif train_on_partially_observed == "front_rear_quarter_u_and_f":
            # reference's faulty variant masks both channels (:793-796)
            nx = model_out.shape[2]
            sl = (slice(None), slice(None), slice(nx // 4, (3 * nx) // 4))
            model_out = model_out.at[sl].set(target[sl])
        elif train_on_partially_observed is not None:
            raise NotImplementedError(train_on_partially_observed)
        return model_out

    def loss_mask_post(model_out, target, cond):
        if is_model_w:
            # no loss on the u channel (reference :808-810)
            model_out = model_out.at[:, :, :, 0].set(target[:, :, :, 0])
        if not train_on_padded_locations:
            # no loss on padded rows (reference :812-816)
            model_out = model_out.at[:, ci + 1 :, :, 0].set(
                target[:, ci + 1 :, :, 0]
            )
            model_out = model_out.at[:, ci:, :, 1].set(target[:, ci:, :, 1])
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
            x = x.at[:, 0, :, :, 0].set(cond["init"])
        return x

    def zero_target(target, cond):
        return target.at[:, 0, :, :, 0].set(0.0)

    def w_slice_input(x, cond):
        # joint (B,F,H,W,6) -> w-model input (B,F,H,W,2) = (c1, c2)
        return x[..., 3:5]

    def w_embed_output(out_w, cond):
        # (B,F,H,W,2) -> zero-padded (B,F,H,W,6) at channels 3:5
        b, f, h, w, _ = out_w.shape
        full = jnp.zeros((b, f, h, w, 6), out_w.dtype)
        return full.at[..., 3:5].set(out_w)

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
