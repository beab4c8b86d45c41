"""RL environment adapters for the smoke and jellyfish benchmarks.

The reference ships per-benchmark baseline mini-projects
(/root/reference/baselines/sac_smoke/pde_2d_sac_train.py,
baselines/sac_jellyfish/pde_2d_sac_train{,_pob}.py, baselines/BC_smoke,
baselines/BC_jellyfish/main_{FO,PO}.py) whose environments are driven by
neural surrogate simulators on CPU/GPU. Here the environments are jittable
adapters over the TPU-native physics:

  SmokeRLEnv      — the real 128^2 bucket scenario solver (smoke_env), batched
                    on device; the policy sees 64^2 observations and emits
                    peripheral control fields (interior zeroed = indirect
                    control, reference pde_2d_sac_train.py:189,203).
  JellyfishRLEnv  — the SurrogatePipeline (force + simulator + boundary
                    updater), action = per-step theta increment
                    (reference pde_2d_sac_train.py action_dim=1).

Both expose reset(batch, rng) -> obs and step(action) -> (obs, reward, done)
with flat or field observations, plus the episode-level J metrics the
inference pipelines report.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffphycon_tpu.physics.fluids.grids import advect_centered
from diffphycon_tpu.physics.fluids.smoke_env import (
    SmokeSim,
    _bucket_accounting,
    control_step_velocity,
)


def _avg_pool2(x):
    """(B, 2H, 2W) -> (B, H, W) average pooling."""
    b, h, w = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4))


class SmokeRLEnv:
    """Batched smoke-control episode on the real 128^2 scenario.

    Episode = ``frames`` control decisions, each held for ``sub_steps``
    physical steps (reference: 32 observed frames over 256 solver steps,
    dataset/data_2d.py:142-209). Observations are (B, 64, 64, 4):
    density, vx, vy (2x average-pooled) and a normalized-time plane
    (reference pde_2d_sac_train.py:188 cat(state[:, :3], time/frames)).
    Actions are (B, 64, 64, 2) in [-1, 1], scaled by ``act_scale``; the
    interior is zeroed by the solver's indirect-control write.

    Reward: increment of the target-bucket smoke-out fraction per control
    frame minus ``w_energy`` x mean control energy — the same J_target /
    J_energy decomposition the smoke inference reports
    (reference inference_2d_smoke.py:405-417).
    """

    obs_shape = (64, 64, 4)
    action_shape = (64, 64, 2)

    def __init__(self, frames: int = 32, sub_steps: int = 8,
                 act_scale: float = 2.0, w_energy: float = 0.0,
                 accuracy: float = 1e-6, max_iterations: int = 200):
        self.sim = SmokeSim.create(accuracy=accuracy,
                                   max_iterations=max_iterations)
        self.frames = frames
        self.sub_steps = sub_steps
        self.act_scale = act_scale
        self.w_energy = w_energy
        self._jit_reset = jax.jit(self._reset_impl)
        self._jit_step = jax.jit(self._step_impl)
        self.state = None

    # -- pure impls ---------------------------------------------------------

    def _obs(self, density, vel, t):
        d = _avg_pool2(jnp.pad(density, ((0, 0), (0, 1), (0, 1))))
        vx = _avg_pool2(vel[..., 0])
        vy = _avg_pool2(vel[..., 1])
        tt = jnp.full_like(d, t / self.frames)
        return jnp.stack([d, vx, vy, tt], axis=-1)

    def _reset_impl(self, density0, vel0):
        density = density0[:, :-1, :-1]
        dz, outs = _bucket_accounting(self.sim, density,
                                      jnp.zeros((density0.shape[0], 7)))
        st = dict(density=density, density_zero=dz, vel=vel0, smoke_outs=outs,
                  t=jnp.zeros((), jnp.int32),
                  energy=jnp.zeros((density0.shape[0],)))
        return st, self._obs(density, vel0, 0)

    def _rate(self, st):
        dz = jnp.pad(st["density_zero"], ((0, 0), (0, 1), (0, 1)))
        return st["smoke_outs"][:, 1] / (
            st["smoke_outs"].sum(-1) + dz.sum((-1, -2)))

    def _step_impl(self, st, action):
        a = jnp.clip(action, -1.0, 1.0) * self.act_scale
        c = jnp.repeat(jnp.repeat(a, 2, axis=1), 2, axis=2)  # 64 -> 128
        rate0 = self._rate(st)

        def body(carry, _):
            density, dz, vel, outs = carry
            vel = control_step_velocity(self.sim, vel, c[..., 0], c[..., 1])
            density = advect_centered(vel, density[..., None])[..., 0]
            dz = advect_centered(vel, dz[..., None])[..., 0]
            dz, outs = _bucket_accounting(self.sim, dz, outs)
            return (density, dz, vel, outs), None

        (density, dz, vel, outs), _ = jax.lax.scan(
            body,
            (st["density"], st["density_zero"], st["vel"], st["smoke_outs"]),
            None, length=self.sub_steps)
        e = (a ** 2).mean(axis=(1, 2, 3))
        new = dict(density=density, density_zero=dz, vel=vel,
                   smoke_outs=outs, t=st["t"] + 1,
                   energy=st["energy"] + (a ** 2).sum(axis=(1, 2, 3)))
        reward = (self._rate(new) - rate0) - self.w_energy * e
        return new, self._obs(density, vel, new["t"]), reward

    # -- stateful API -------------------------------------------------------

    def reset(self, batch: int, rng: np.random.Generator,
              density0: Optional[np.ndarray] = None):
        """Random 10x10 start box + uniform 0.8 updraft, matching the data
        generator / eval convention (reference exp2_same_side_128 start
        sampling a_gen_dataset_128.py:348-378, initialize_gas_exp2_128,
        init_velocity_ evaluate_solver.py:113-115). ``density0`` overrides
        the start block (e.g. a dataset sample's initial density at 128^2)."""
        if density0 is None:
            d0 = np.zeros((batch, 128, 128), np.float32)
            for i in range(batch):
                sx = int(rng.integers(22, 98))
                sy = int(rng.integers(22, 26))
                d0[i, sy : sy + 10, sx : sx + 10] = 1.0
        else:
            d0 = np.asarray(density0, np.float32)
        v0 = np.zeros((batch, 128, 128, 2), np.float32)
        v0[..., 1] = 0.8
        self.state, obs = self._jit_reset(jnp.asarray(d0), jnp.asarray(v0))
        return obs

    def step(self, action):
        self.state, obs, reward = self._jit_step(self.state,
                                                 jnp.asarray(action))
        done = int(self.state["t"]) >= self.frames
        return obs, reward, done

    def metrics(self):
        """Episode J metrics (reference inference_2d_smoke.py:405-417)."""
        rate = np.asarray(self._rate(self.state))
        energy = np.asarray(self.state["energy"])
        return {
            "J_target": float((-rate).mean()),
            "smoke_out": float(rate.mean()),
            "J_energy": float(energy.mean()),
        }


@dataclasses.dataclass
class JellyfishRLEnv:
    """Jellyfish flapping episode through the neural surrogate pipeline.

    Observation: the (64, 64) state channels + boundary channels + a theta
    plane, flattened (full observation, reference
    sac_jellyfish/pde_2d_sac_train.py) or the pressure channel + boundary
    only (partial observation, pde_2d_sac_train_pob.py).
    Action: scalar delta-theta in [-1, 1] x ``act_scale`` per step.
    Reward: ForceUNet thrust - reg * dtheta^2 (reference
    inference_2d_jellyfish.py:107-110).
    """

    pipeline: object  # benchmarks.jellyfish.SurrogatePipeline
    frames: int = 20
    act_scale: float = 0.1
    reg: float = 1000.0
    partially_observed: bool = False

    def __post_init__(self):
        self._jit_step = jax.jit(self._step_impl)
        self.state = None

    def obs_dim(self, n_state: int) -> int:
        ch = (1 if self.partially_observed else n_state) + 3 + 1
        return 64 * 64 * ch

    def _obs_impl(self, state, bd, theta):
        tplane = jnp.broadcast_to(theta[:, None, None, None],
                                  state[..., :1].shape)
        fields = state[..., -1:] if self.partially_observed else state
        o = jnp.concatenate([fields, bd, tplane], axis=-1)
        return o.reshape(o.shape[0], -1)

    def _step_impl(self, st, action):
        state, bd, theta = st
        delta = jnp.clip(action[:, 0], -1.0, 1.0) * self.act_scale
        state_next, force = self.pipeline.step(state, bd, delta)
        bd_next = self.pipeline.bd_updater_apply(self.pipeline.params_bd,
                                                 bd, delta)
        theta_next = theta + delta
        reward = force - self.reg * delta ** 2
        new = (state_next, bd_next, theta_next)
        return new, self._obs_impl(*new), reward

    def reset(self, state0, bd0, theta0):
        self.state = (jnp.asarray(state0), jnp.asarray(bd0),
                      jnp.asarray(theta0))
        self._t = 0
        self._forces = []
        self._deltas = []
        return self._obs_impl(*self.state)

    def step(self, action):
        theta_prev = self.state[2]
        self.state, obs, reward = self._jit_step(self.state,
                                                 jnp.asarray(action))
        self._t += 1
        self._forces.append(np.asarray(
            reward + self.reg * np.asarray(self.state[2] - theta_prev) ** 2))
        self._deltas.append(np.asarray(self.state[2] - theta_prev))
        return obs, reward, self._t >= self.frames

    def metrics(self):
        """Weighted average thrust - reg * sum dtheta^2
        (reference inference_2d_jellyfish.py:107-110), via the shared
        control.metrics.jellyfish_objective convention."""
        from diffphycon_tpu.control.metrics import jellyfish_objective

        f = np.stack(self._forces, 1)  # (B, T)
        d = np.stack(self._deltas, 1)
        score = np.asarray(jellyfish_objective(f, d, self.reg))
        return {
            "avg_force": float(f.mean()),
            "theta_reg": float((d ** 2).sum(1).mean()),
            "J_jellyfish": float(score.mean()),
        }
