"""The 2D smoke indirect-control scenario as a jittable, batched lax.scan.

TPU-native equivalent of /root/reference/dataset/apps/evaluate_solver.py: a
127x127-cell domain (staggered velocity 128x128) with hand-placed obstacle
walls and 7 exit buckets; per step the control (c1, c2) is written into the
peripheral ring only (indirect control), the velocity is projected
divergence-free with the obstacle-aware CG, and density fields are advected
semi-Lagrangian; per-bucket smoke-out mass is accumulated and those cells
zeroed.

Where the reference forks one CPU process per sample
(inference_2d_smoke.py:338-364), this implementation is batched over samples
and runs as a single compiled scan on device.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffphycon_tpu.physics.fluids.grids import advect_centered
from diffphycon_tpu.physics.fluids.pressure import FluidDomain, divergence_free


def obstacles_128():
    """(y, x, size_y, size_x) rectangles (reference build_obstacles_pi_128,
    evaluate_solver.py:32-63; note set_obstacle takes (size), (origin))."""
    return [
        (16, 16, 1, 96),          # bottom
        (16, 16, 8, 1),           # left down
        (40, 16, 16, 1),          # left medium
        (72, 16, 40, 1),          # left up
        (16, 112, 8, 1),          # right down
        (40, 112, 16, 1),         # right medium
        (72, 112, 40, 1),         # right up
        (112, 16, 1, 8),          # buckets
        (112, 40, 1, 16),
        (112, 72, 1, 16),
        (112, 104, 1, 8),
        (64, 48, 16, 1),          # y-axis obstacles
        (96, 48, 16, 1),
        (64, 80, 16, 1),
        (96, 80, 16, 1),
        (40, 40, 1, 128 - 80),    # x-axis
    ]


def smoke_domain_128() -> FluidDomain:
    """127x127 open-boundary domain with the pi-maze obstacles
    (reference init_sim_128, evaluate_solver.py:94-97)."""
    return FluidDomain.from_obstacles((127, 127), obstacles_128(),
                                      open_boundary=True)


def obstacles_64():
    """Half-resolution scenario (reference build_obstacles_pi_64,
    evaluate_solver.py:66-92)."""
    return [
        (8, 8, 1, 48),
        (8, 8, 4, 1),
        (20, 8, 8, 1),
        (36, 8, 20, 1),
        (8, 56, 4, 1),
        (20, 56, 8, 1),
        (36, 56, 20, 1),
        (56, 8, 1, 4),
        (56, 20, 1, 8),
        (56, 36, 1, 8),
        (56, 52, 1, 4),
        (32, 24, 8, 1),
        (48, 24, 8, 1),
        (32, 40, 8, 1),
        (48, 40, 8, 1),
        (20, 20, 1, 64 - 40),
    ]


def smoke_domain_64() -> FluidDomain:
    """(reference init_sim_64, evaluate_solver.py:99-102)."""
    return FluidDomain.from_obstacles((63, 63), obstacles_64(),
                                      open_boundary=True)


def bucket_masks() -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """7 bucket measurement masks + union + keep-mask
    (reference get_bucket_mask, evaluate_solver.py:150-171).

    Returns (cal_smoke: (7, 128, 128), concat: (128, 128), keep: (128, 128)).
    Bucket 1 (top middle exit) is the control target.
    """
    bucket_pos = [(112, 22, 15, 20), (112, 54, 15, 20), (112, 86, 15, 20)]
    bucket_pos_y = [(22, 0, 20, 16), (54, 0, 20, 16),
                    (22, 112, 20, 15), (54, 112, 20, 15)]
    cal_list = []
    keep = np.ones((128, 128), np.float32)
    concat = np.zeros((128, 128), np.float32)
    for y, x, ly, lx in bucket_pos + bucket_pos_y:
        m = np.zeros((128, 128), np.float32)
        m[y : y + ly, x : x + lx] = 1
        concat[y : y + ly, x : x + lx] = 1
        keep[y : y + ly, x : x + lx] = 0
        cal_list.append(m)
    return np.stack(cal_list), concat, keep


@dataclasses.dataclass(frozen=True)
class SmokeSim:
    """Precomputed static data for the 128^2 smoke simulation."""

    coeffs: tuple
    velocity_mask: jax.Array
    cal_smoke: jax.Array   # (7, 128, 128)
    keep: jax.Array        # (128, 128)
    accuracy: float = 1e-8
    max_iterations: int = 500

    @classmethod
    def create(cls, accuracy: float = 1e-8, max_iterations: int = 500):
        dom = smoke_domain_128()
        cal, _, keep = bucket_masks()
        return cls(
            coeffs=dom.laplacian_coeffs(),
            velocity_mask=dom.velocity_mask(),
            cal_smoke=jnp.asarray(cal),
            keep=jnp.asarray(keep),
            accuracy=accuracy,
            max_iterations=max_iterations,
        )


def control_step_velocity(sim: SmokeSim, prev_stag: jax.Array,
                          c1: jax.Array, c2: jax.Array) -> jax.Array:
    """One control + projection step (reference get_envolve,
    evaluate_solver.py:118-147).

    prev_stag: (B, 128, 128, 2); c1, c2: (B, 128, 128) control at this frame.
    The control writes only into the peripheral ring (interior [16:112)^2 is
    zeroed = indirect control); the interior keeps the previous velocity.
    """
    ctrl = jnp.stack([c1, c2], axis=-1)
    ctrl = ctrl.at[:, 16:112, 16:112, :].set(0.0)

    cur = jnp.zeros_like(prev_stag)
    cur = cur.at[:, 16:112, 16:112, :].set(prev_stag[:, 16:112, 16:112, :])
    cur = cur.at[:, :, :16, :].set(ctrl[:, :, :16, :])
    cur = cur.at[:, :, 112:, :].set(ctrl[:, :, 112:, :])
    cur = cur.at[:, 112:, 16:112, :].set(ctrl[:, 112:, 16:112, :])
    cur = cur.at[:, :16, 16:112, :].set(ctrl[:, :16, 16:112, :])

    vel = divergence_free(cur, None, coeffs=sim.coeffs,
                          velocity_mask=sim.velocity_mask,
                          accuracy=sim.accuracy,
                          max_iterations=sim.max_iterations)
    return vel * sim.velocity_mask[None]


def _bucket_accounting(sim: SmokeSim, density127: jax.Array,
                       smoke_outs: jax.Array):
    """Accumulate per-bucket mass and zero those cells (reference
    evaluate_solver.py:258-267; the reference's if-sum>0 guard is a no-op for
    non-negative densities so it is applied unconditionally here).

    density127: (B, 127, 127); smoke_outs: (B, 7)."""
    d128 = jnp.pad(density127, ((0, 0), (0, 1), (0, 1)))
    adds = jnp.einsum("byx,kyx->bk", d128, sim.cal_smoke)
    smoke_outs = smoke_outs + adds
    density127 = density127 * sim.keep[:-1, :-1][None]
    return density127, smoke_outs


def smoke_solver(sim: SmokeSim, init_velocity: jax.Array,
                 init_density: jax.Array, c1: jax.Array, c2: jax.Array,
                 num_t: int = 256):
    """Full scenario rollout (reference solver, evaluate_solver.py:205-310).

    Args:
      init_velocity: (B, 128, 128, 2) staggered initial velocity.
      init_density: (B, nx, nx) initial density (upsampled to 128 if needed).
      c1, c2: (B, nt, nx, nx) control; tiled to (num_t, 128, 128).
      num_t: total physical frames (reference per_timelength=256).

    Returns dict with densitys (B, num_t, 128, 128), zero_densitys,
    velocitys (B, num_t, 128, 128, 2), smoke_out_record (B, num_t),
    smoke_outs (B, 7).
    """
    b, nt, nx, _ = c1.shape
    t_rep, s_rep = num_t // nt, 128 // nx
    up_s = lambda a: jnp.repeat(jnp.repeat(a, s_rep, -2), s_rep, -1)
    init_density = up_s(init_density)  # (B, 128, 128)
    c1 = jnp.repeat(up_s(c1), t_rep, axis=1)
    c2 = jnp.repeat(up_s(c2), t_rep, axis=1)

    density = init_density[:, :-1, :-1]      # (B, 127, 127)
    density_zero = density
    smoke_outs = jnp.zeros((b, 7), jnp.float32)
    vel = init_velocity

    # step 0 accounting (evaluate_solver.py:250-268)
    density_zero, smoke_outs = _bucket_accounting(sim, density_zero, smoke_outs)

    def pad128(d):
        return jnp.pad(d, ((0, 0), (0, 1), (0, 1)))

    def smoke_rate(smoke_outs, dz):
        return smoke_outs[:, 1] / (smoke_outs.sum(-1) + dz.sum((-1, -2)))

    rec0 = (pad128(density), pad128(density_zero), vel,
            smoke_rate(smoke_outs, pad128(density_zero)), smoke_outs)

    def body(carry, ctrl_t):
        vel, density, density_zero, smoke_outs = carry
        c1_t, c2_t = ctrl_t
        vel = control_step_velocity(sim, vel, c1_t, c2_t)
        density = advect_centered(vel, density[..., None])[..., 0]
        density_zero = advect_centered(vel, density_zero[..., None])[..., 0]
        density_zero, smoke_outs = _bucket_accounting(sim, density_zero,
                                                      smoke_outs)
        rec = (pad128(density), pad128(density_zero), vel,
               smoke_rate(smoke_outs, pad128(density_zero)), smoke_outs)
        return (vel, density, density_zero, smoke_outs), rec

    ctrl_seq = (jnp.swapaxes(c1[:, : num_t - 1], 0, 1),
                jnp.swapaxes(c2[:, : num_t - 1], 0, 1))
    carry, recs = jax.lax.scan(body, (vel, density, density_zero, smoke_outs),
                               ctrl_seq)

    stack = lambda r0, rs: jnp.concatenate([r0[None], rs], 0).swapaxes(0, 1)
    return {
        "densitys": stack(rec0[0], recs[0]),
        "zero_densitys": stack(rec0[1], recs[1]),
        "velocitys": stack(rec0[2], recs[2]),
        "smoke_out_record": stack(rec0[3], recs[3]),
        "bucket_mass": stack(rec0[4], recs[4]),  # (B, num_t, 7)
        "smoke_outs": carry[3],
    }


def generator_rollout(sim: SmokeSim, key: jax.Array, init_density: jax.Array,
                      seg_v: jax.Array, seg_starts: jax.Array,
                      initial_vy: float = 0.8, num_steps: int = 256):
    """Data-generation rollout with the REFERENCE generator's control
    semantics (a_gen_dataset_128.py get_envolve :415-481, loop_write_0423
    :608-860), batched on device:

    - at each segment-start frame t in seg_starts, the control is a fresh
      per-cell draw N(v_seg, |v_seg|/10) over the whole 128^2 field
      (interior zeroed before use and before recording);
    - at every other frame the control is the PREVIOUS projected velocity on
      the peripheral ring plus per-cell N(0, 0.1) noise (velocity carryover —
      a feedback loop, not a constant schedule);
    - the initial velocity is a uniform updraft (0, initial_vy)
      (evaluate_solver.init_velocity_ :113-115 uses vy=0.8).

    Args:
      key: PRNG key (per batch).
      init_density: (B, 128, 128) initial density (127^2 content).
      seg_v: (B, 4, 2) per-segment (vx, vy) AFTER get_real_vel jitter.
      seg_starts: (B, 4) int32 frame indices where each segment's fresh
        control draw happens (segment 0 starts at frame 0).

    Returns the same dict as smoke_solver plus "controls"
    (B, num_steps, 128, 128, 2) — the actual (noisy, interior-zeroed) control
    fields used, which are what the dataset records.
    """
    b = init_density.shape[0]
    density = init_density[:, :-1, :-1]
    density_zero = density
    smoke_outs = jnp.zeros((b, 7), jnp.float32)
    vel = jnp.zeros((b, 128, 128, 2)).at[..., 1].set(initial_vy)

    density_zero, smoke_outs = _bucket_accounting(sim, density_zero,
                                                  smoke_outs)

    def pad128(d):
        return jnp.pad(d, ((0, 0), (0, 1), (0, 1)))

    rec0 = (pad128(density), pad128(density_zero), vel, smoke_outs)

    ring = jnp.zeros((128, 128, 1), jnp.float32)
    ring = ring.at[:, :16].set(1.0).at[:, 112:].set(1.0)
    ring = ring.at[112:, :].set(1.0).at[:16, :].set(1.0)

    def body(carry, t):
        vel, density, density_zero, smoke_outs = carry
        kt = jax.random.fold_in(key, t)
        # fresh segment-start draw: N(v_seg, |v_seg|/10) per cell
        seg_idx = jnp.clip((t >= seg_starts).sum(-1) - 1, 0, 3)  # (B,)
        v_seg = jnp.take_along_axis(seg_v, seg_idx[:, None, None],
                                    axis=1)[:, 0]                # (B, 2)
        fresh_noise = jax.random.normal(kt, (b, 128, 128, 2))
        fresh = (v_seg[:, None, None, :]
                 + fresh_noise * jnp.abs(v_seg[:, None, None, :]) / 10.0)
        # carryover: previous projected ring velocity + N(0, 0.1)
        carry_noise = jax.random.normal(jax.random.fold_in(kt, 1),
                                        (b, 128, 128, 2)) * 0.1
        carried = vel + carry_noise
        is_fresh = (t == seg_starts).any(-1)                     # (B,)
        ctrl = jnp.where(is_fresh[:, None, None, None], fresh, carried)
        ctrl = ctrl * ring[None]
        vel = control_step_velocity(sim, vel, ctrl[..., 0], ctrl[..., 1])
        density = advect_centered(vel, density[..., None])[..., 0]
        density_zero = advect_centered(vel, density_zero[..., None])[..., 0]
        density_zero, smoke_outs = _bucket_accounting(sim, density_zero,
                                                      smoke_outs)
        rec = (pad128(density), pad128(density_zero), vel, smoke_outs, ctrl)
        return (vel, density, density_zero, smoke_outs), rec

    carry, recs = jax.lax.scan(body, (vel, density, density_zero, smoke_outs),
                               jnp.arange(num_steps))

    stack = lambda r0, rs: jnp.concatenate([r0[None], rs], 0).swapaxes(0, 1)
    return {
        "densitys": stack(rec0[0], recs[0]),
        "zero_densitys": stack(rec0[1], recs[1]),
        "velocitys": stack(rec0[2], recs[2]),
        "bucket_mass": stack(rec0[3], recs[3]),   # (B, num_steps+1, 7)
        "controls": recs[4].swapaxes(0, 1),       # (B, num_steps, 128, 128, 2)
        "smoke_outs": carry[3],
    }
