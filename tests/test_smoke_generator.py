"""Tests for the r4 smoke data generator: reference control semantics
(velocity carryover + noise, fresh segment draws, updraft init) and the
schedule builder (/root/reference/dataset/apps/a_gen_dataset_128.py
get_envolve :415-481, get_per_vel :300-346, loop_write_0423 :608-860)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffphycon_tpu.physics.fluids.smoke_env import (
    SmokeSim,
    generator_rollout,
)

RING = np.zeros((128, 128), bool)
RING[:, :16] = RING[:, 112:] = RING[112:, :] = RING[:16, :] = True


@pytest.fixture(scope="module")
def rollout_small():
    sim = SmokeSim.create(accuracy=1e-3, max_iterations=20)
    b = 2
    d0 = np.zeros((b, 128, 128), np.float32)
    d0[:, 26:36, 60:70] = 1.0
    seg_v = np.tile(np.array([[1.5, 3.0], [0.5, 2.0], [-0.5, 2.5],
                              [0.1, 1.0]], np.float32), (b, 1, 1))
    seg_starts = np.tile(np.array([0, 3, 5, 7], np.int32), (b, 1))
    out = generator_rollout(sim, jax.random.PRNGKey(0), jnp.asarray(d0),
                            jnp.asarray(seg_v), jnp.asarray(seg_starts),
                            initial_vy=0.8, num_steps=8)
    return {k: np.asarray(v) for k, v in out.items()}, seg_v, seg_starts


def test_controls_interior_always_zero(rollout_small):
    out, _, _ = rollout_small
    interior = out["controls"][:, :, 16:112, 16:112, :]
    assert np.abs(interior).max() == 0.0


def test_fresh_draw_statistics(rollout_small):
    """Segment-start control is per-cell N(v_seg, |v_seg|/10) on the ring
    (reference get_envolve vx!=None branch :456-481)."""
    out, seg_v, seg_starts = rollout_small
    c0 = out["controls"][0, 0]  # step 0 = segment 0 start
    ring_vals_x = c0[RING, 0]
    ring_vals_y = c0[RING, 1]
    assert abs(ring_vals_x.mean() - seg_v[0, 0, 0]) < 0.02
    assert abs(ring_vals_y.mean() - seg_v[0, 0, 1]) < 0.05
    assert abs(ring_vals_x.std() - abs(seg_v[0, 0, 0]) / 10) < 0.02
    assert abs(ring_vals_y.std() - abs(seg_v[0, 0, 1]) / 10) < 0.05


def test_carryover_is_prev_velocity_plus_noise(rollout_small):
    """Interior-of-segment control = previous projected ring velocity +
    N(0, 0.1) (reference get_envolve vx==None branch :430-455)."""
    out, _, seg_starts = rollout_small
    t = 1  # not a segment start
    assert t not in seg_starts[0]
    prev_vel = out["velocitys"][0, t]  # state after step t (= carry at t+1)?
    # body at scan index t uses carry vel = velocitys[:, t] (velocitys[0] is
    # the initial updraft, velocitys[k] the post-projection velocity of step
    # k); controls[:, t] was built from velocitys[:, t-1+1]... verify via the
    # recorded sequence: ctrl_t - vel_t restricted to the ring ~ N(0, 0.1)
    diff = (out["controls"][0, t] - out["velocitys"][0, t])[RING]
    assert abs(diff.mean()) < 0.02
    assert abs(diff.std() - 0.1) < 0.02


def test_initial_updraft_and_accounting(rollout_small):
    out, _, _ = rollout_small
    # velocitys[0] is the uniform updraft
    assert np.allclose(out["velocitys"][:, 0, :, :, 1], 0.8)
    assert np.allclose(out["velocitys"][:, 0, :, :, 0], 0.0)
    # bucket masses are cumulative and non-negative
    bm = out["bucket_mass"]
    assert (bm >= -1e-6).all()
    assert (np.diff(bm, axis=1) >= -1e-4).all()


def test_segment_schedule_structure():
    from apps.generate_smoke import sample_waypoints, segment_schedule

    rng = np.random.default_rng(0)
    for _ in range(16):
        xs, ys = sample_waypoints(rng)
        seg_v, seg_starts = segment_schedule(rng, xs, ys, y_scale=8.0)
        # fresh draws land at 0, i0-1, i0+i1-1, i0+i1+i2-1 (loop_write_0423
        # call structure) — strictly inside the 256-step episode
        assert seg_starts[0] == 0
        assert (np.diff(seg_starts) > 0).all()
        assert seg_starts[-1] < 256
        # vy pushes toward the exit (ys increase along the path)
        assert (seg_v[:, 1] > 0).all()
