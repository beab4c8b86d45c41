"""Offline-RL baselines: Behavior Cloning and BPPO (behavior-proximal policy
optimization), plus the shared policy/critic nets and replay buffer.

Equivalents of /root/reference/baselines/{BC,BPPO}_burgers (bppo.py, net.py,
critic.py, buffer.py), generic over the benchmark: states and actions are
flat vectors (Burgers: u_t (Nx,) -> f_t (Nx,); smoke/jellyfish variants flatten
their observations the same way).

Nets (reference net.py):
  GaussPolicyMLP: ReLU MLP, tanh head emitting (mu, log_std) with
    soft-clamped log_std in [-5, 0].
  ValueMLP / QMLP: ReLU MLPs with tanh heads.

Training (reference critic.py / bppo.py):
  V(s)  <- mse to the stored (discounted) return.
  Q(s,a)<- SARSA TD target r + gamma * mask * Q_target(s', a').
  BC    <- maximize log pi(a|s).
  BPPO  <- clipped-ratio improvement against the frozen BC policy with
           advantage Q(s, a~old) - V(s), entropy bonus, clip decay.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

CONST_EPS = 1e-10


def soft_clamp(x, low, high):
    """(reference net.py:7-12): tanh-style rescale of a tanh output."""
    return low + 0.5 * (high - low) * (x + 1.0)


class MLP(nn.Module):
    hidden_dim: int
    depth: int
    output_dim: int
    final_activation: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden_dim)(x))
        for _ in range(self.depth - 1):
            x = nn.relu(nn.Dense(self.hidden_dim)(x))
        x = nn.Dense(self.output_dim)(x)
        if self.final_activation == "relu":
            x = nn.relu(x)
        elif self.final_activation == "tanh":
            x = jnp.tanh(x)
        return x


class GaussPolicyMLP(nn.Module):
    """(reference net.py:70-93)."""

    hidden_dim: int
    depth: int
    action_dim: int

    @nn.compact
    def __call__(self, s):
        out = MLP(self.hidden_dim, self.depth, 2 * self.action_dim, "tanh")(s)
        mu, log_std = jnp.split(out, 2, axis=-1)
        log_std = soft_clamp(log_std, -5.0, 0.0)
        return mu, jnp.exp(log_std)


def gauss_log_prob(mu, std, action):
    """Diagonal normal log prob summed over all action dims (flat vectors or
    control fields) (reference utils.log_prob_func)."""
    lp = (-0.5 * ((action - mu) / std) ** 2 - jnp.log(std)
          - 0.5 * jnp.log(2 * jnp.pi))
    return lp.reshape(lp.shape[0], -1).sum(-1, keepdims=True)


class _ConvEncoder(nn.Module):
    """Strided-conv encoder for (B, H, W, C) field observations
    (reference sac_smoke/scripts_SAC/net_2d.py conv stacks)."""

    features: int = 32

    @nn.compact
    def __call__(self, x):
        f = self.features
        for mult in (1, 2, 4):  # 64 -> 8
            x = nn.relu(nn.Conv(f * mult, (3, 3), strides=(2, 2))(x))
        return x


class ConvGaussPolicy(nn.Module):
    """CNN Gaussian policy emitting a per-pixel action FIELD (mu, std) at the
    input resolution (smoke control (c1, c2); reference
    sac_smoke/scripts_SAC/net_2d.GaussianPolicy)."""

    action_channels: int = 2
    features: int = 32

    @nn.compact
    def __call__(self, s):
        h = _ConvEncoder(self.features)(s)
        for mult in (2, 1, 1):  # 8 -> 64
            h = nn.relu(nn.ConvTranspose(self.features * mult, (3, 3),
                                         strides=(2, 2))(h))
        out = nn.Conv(2 * self.action_channels, (3, 3))(h)
        # mu stays unbounded: SAC's tanh squash is the single bounding
        # (a tanh here would make greedy eval return tanh(tanh(x)),
        # systematically shrunk vs the stochastic training path)
        mu, log_std = jnp.split(out, 2, axis=-1)
        log_std = soft_clamp(log_std, -5.0, 0.0)
        return mu, jnp.exp(log_std)


class ConvQ(nn.Module):
    """Q over (field obs, field action): conv encoder + dense head."""

    features: int = 32
    hidden_dim: int = 256

    @nn.compact
    def __call__(self, s, a):
        x = jnp.concatenate([s, a], axis=-1)
        h = _ConvEncoder(self.features)(x)
        h = h.reshape(h.shape[0], -1)
        h = nn.relu(nn.Dense(self.hidden_dim)(h))
        return jnp.tanh(nn.Dense(1)(h))


class ValueMLP(nn.Module):
    hidden_dim: int
    depth: int

    @nn.compact
    def __call__(self, s):
        return MLP(self.hidden_dim, self.depth, 1, "tanh")(s)


class QMLP(nn.Module):
    hidden_dim: int
    depth: int

    @nn.compact
    def __call__(self, s, a):
        return MLP(self.hidden_dim, self.depth, 1, "tanh")(
            jnp.concatenate([s, a], axis=-1))


# ---------------------------------------------------------------------------
# replay buffer (reference buffer.py: stores (s, a, r, s', mask) and
# discounted returns)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ReplayBuffer:
    state: np.ndarray       # (N, state_dim)
    action: np.ndarray      # (N, action_dim)
    reward: np.ndarray      # (N,) immediate reward
    ret: np.ndarray         # (N,) discounted return-to-go
    next_state: np.ndarray
    next_action: np.ndarray
    mask: np.ndarray        # (N,) 0 at episode ends

    @classmethod
    def from_trajectories(cls, states, actions, rewards, gamma=0.99):
        """states (B, T+1, D), actions (B, T, A), rewards (B, T)."""
        b, t = rewards.shape
        ret = np.zeros_like(rewards)
        acc = np.zeros(b)
        for i in range(t - 1, -1, -1):
            acc = rewards[:, i] + gamma * acc
            ret[:, i] = acc
        mask = np.ones((b, t), np.float32)
        mask[:, -1] = 0.0
        next_action = np.concatenate(
            [actions[:, 1:], np.zeros_like(actions[:, :1])], axis=1)
        flat = lambda a: a.reshape(b * t, *a.shape[2:]).astype(np.float32)
        return cls(
            state=flat(states[:, :t]),
            action=flat(actions),
            reward=flat(rewards),
            ret=flat(ret),
            next_state=flat(states[:, 1 : t + 1]),
            next_action=flat(next_action),
            mask=flat(mask),
        )

    def sample(self, rng: np.random.Generator, batch_size: int):
        idx = rng.integers(0, len(self.state), batch_size)
        return tuple(
            jnp.asarray(getattr(self, f)[idx])
            for f in ("state", "action", "reward", "ret", "next_state",
                      "next_action", "mask")
        )


class RingReplay:
    """Online replay memory with push semantics (reference
    sac_burgers/scripts/replay_memory.py: fixed capacity, FIFO overwrite,
    uniform sampling of (s, a, r, s', mask) transitions).

    ``sample`` returns the same 7-tuple layout as :class:`ReplayBuffer`
    (``ret`` and ``next_action`` zero-filled) so ``SAC.update`` accepts
    either buffer."""

    def __init__(self, capacity: int, state_dim, action_dim):
        """state_dim / action_dim: flat sizes (int) or field shapes (tuple)."""
        as_shape = lambda d: (d,) if isinstance(d, int) else tuple(d)
        self.capacity = capacity
        self.state = np.zeros((capacity, *as_shape(state_dim)), np.float32)
        self.action = np.zeros((capacity, *as_shape(action_dim)), np.float32)
        self.reward = np.zeros((capacity,), np.float32)
        self.next_state = np.zeros_like(self.state)
        self.mask = np.zeros((capacity,), np.float32)
        self.pos = 0
        self.size = 0

    def push_batch(self, s, a, r, s2, mask):
        s, a = np.asarray(s, np.float32), np.asarray(a, np.float32)
        r, s2 = np.asarray(r, np.float32), np.asarray(s2, np.float32)
        mask = np.broadcast_to(np.asarray(mask, np.float32), r.shape)
        n = s.shape[0]
        idx = (self.pos + np.arange(n)) % self.capacity
        self.state[idx], self.action[idx] = s, a
        self.reward[idx], self.next_state[idx] = r, s2
        self.mask[idx] = mask
        self.pos = int((self.pos + n) % self.capacity)
        self.size = int(min(self.size + n, self.capacity))

    def sample(self, rng: np.random.Generator, batch_size: int):
        idx = rng.integers(0, self.size, batch_size)
        z = jnp.zeros((batch_size,))
        return (jnp.asarray(self.state[idx]), jnp.asarray(self.action[idx]),
                jnp.asarray(self.reward[idx]), z,
                jnp.asarray(self.next_state[idx]),
                jnp.zeros_like(jnp.asarray(self.action[idx])),
                jnp.asarray(self.mask[idx]))


# ---------------------------------------------------------------------------
# learners
# ---------------------------------------------------------------------------


class BehaviorCloning:
    """(reference bppo.py:10-73)."""

    def __init__(self, state_dim, action_dim, hidden_dim=512, depth=2,
                 lr=1e-4, batch_size=512, seed=0, policy=None,
                 obs_example=None):
        """policy/obs_example: optional custom flax module (e.g.
        ConvGaussPolicy for field observations) + an example input to init."""
        self.policy = (policy if policy is not None
                       else GaussPolicyMLP(hidden_dim, depth, action_dim))
        s0 = (jnp.asarray(obs_example) if obs_example is not None
              else jnp.zeros((1, state_dim)))
        self.params = self.policy.init(jax.random.PRNGKey(seed), s0)
        self.tx = optax.adam(lr)
        self.opt_state = self.tx.init(self.params)
        self.batch_size = batch_size
        self._rng = np.random.default_rng(seed)

        @jax.jit
        def step(params, opt_state, s, a):
            def loss_fn(p):
                mu, std = self.policy.apply(p, s)
                return -gauss_log_prob(mu, std, a).mean()

            loss, g = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(g, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        self._step = step

    def update(self, buffer: ReplayBuffer) -> float:
        s, a, *_ = buffer.sample(self._rng, self.batch_size)
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, s, a)
        return float(loss)

    def select_action(self, params, s, key=None):
        mu, std = self.policy.apply(params, s)
        if key is not None:
            mu = mu + std * jax.random.normal(key, mu.shape)
        return jnp.clip(mu, -1.0, 1.0)


class ValueLearner:
    """V(s) regression onto stored returns (reference critic.py:8-55)."""

    def __init__(self, state_dim, hidden_dim=512, depth=2, lr=1e-4,
                 batch_size=512, seed=0):
        self.net = ValueMLP(hidden_dim, depth)
        self.params = self.net.init(jax.random.PRNGKey(seed),
                                    jnp.zeros((1, state_dim)))
        self.tx = optax.adam(lr)
        self.opt_state = self.tx.init(self.params)
        self.batch_size = batch_size
        self._rng = np.random.default_rng(seed)

        @jax.jit
        def step(params, opt_state, s, ret):
            def loss_fn(p):
                return ((self.net.apply(p, s) - ret[:, None]) ** 2).mean()

            loss, g = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(g, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        self._step = step

    def update(self, buffer: ReplayBuffer) -> float:
        s, _, _, ret, *_ = buffer.sample(self._rng, self.batch_size)
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, s, ret)
        return float(loss)


class QSarsaLearner:
    """Q with SARSA TD target + soft target updates
    (reference critic.py QLearner/QSarsaLearner)."""

    def __init__(self, state_dim, action_dim, hidden_dim=512, depth=2,
                 lr=1e-4, batch_size=512, gamma=0.99, tau=5e-3, seed=0):
        self.net = QMLP(hidden_dim, depth)
        self.params = self.net.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, state_dim)),
            jnp.zeros((1, action_dim)))
        self.target_params = jax.tree.map(jnp.copy, self.params)
        self.tx = optax.adam(lr)
        self.opt_state = self.tx.init(self.params)
        self.batch_size = batch_size
        self.gamma = gamma
        self.tau = tau
        self._rng = np.random.default_rng(seed)

        @jax.jit
        def step(params, target_params, opt_state, s, a, r, s2, a2, mask):
            target = r[:, None] + gamma * mask[:, None] * self.net.apply(
                target_params, s2, a2)
            target = jax.lax.stop_gradient(target)

            def loss_fn(p):
                return ((self.net.apply(p, s, a) - target) ** 2).mean()

            loss, g = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(g, opt_state)
            params = optax.apply_updates(params, updates)
            target_params2 = jax.tree.map(
                lambda tp, p: (1 - tau) * tp + tau * p, target_params, params)
            return params, target_params2, opt_state, loss

        self._step = step

    def update(self, buffer: ReplayBuffer) -> float:
        s, a, r, _, s2, a2, mask = buffer.sample(self._rng, self.batch_size)
        (self.params, self.target_params, self.opt_state, loss) = self._step(
            self.params, self.target_params, self.opt_state, s, a, r, s2, a2,
            mask)
        return float(loss)


class BPPO:
    """Behavior-proximal policy optimization (reference bppo.py:100-230):
    starts from the BC policy and improves with a clipped-ratio objective
    against the frozen old policy, advantage = Q(s, a~old) - V(s)."""

    def __init__(self, bc: BehaviorCloning, q: QSarsaLearner, v: ValueLearner,
                 lr=1e-4, clip_ratio=0.25, clip_decay=0.96,
                 entropy_weight=0.0, batch_size=512, seed=0):
        self.policy = bc.policy
        self.params = jax.tree.map(jnp.copy, bc.params)
        self.old_params = jax.tree.map(jnp.copy, bc.params)
        self.q = q
        self.v = v
        self.tx = optax.adam(lr)
        self.opt_state = self.tx.init(self.params)
        self.clip_ratio = clip_ratio
        self.clip_decay = clip_decay
        self.entropy_weight = entropy_weight
        self.batch_size = batch_size
        self._rng = np.random.default_rng(seed)

        policy = self.policy
        q_net, v_net = q.net, v.net

        @partial(jax.jit, static_argnames=())
        def step(params, old_params, q_params, v_params, opt_state, s, key,
                 clip):
            mu_o, std_o = policy.apply(old_params, s)
            a = mu_o + std_o * jax.random.normal(key, mu_o.shape)
            adv = q_net.apply(q_params, s, a) - v_net.apply(v_params, s)
            adv = (adv - adv.mean()) / (adv.std() + CONST_EPS)
            old_lp = gauss_log_prob(mu_o, std_o, a)

            def loss_fn(p):
                mu, std = policy.apply(p, s)
                new_lp = gauss_log_prob(mu, std, a)
                ratio = jnp.exp(new_lp - old_lp)
                l1 = ratio * adv
                l2 = jnp.clip(ratio, 1 - clip, 1 + clip) * adv
                entropy = (0.5 * (1 + jnp.log(2 * jnp.pi)) +
                           jnp.log(std)).sum(-1, keepdims=True)
                return -(jnp.minimum(l1, l2)
                         + entropy * entropy_weight).mean()

            loss, g = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(g, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        self._step = step
        self._key = jax.random.PRNGKey(seed)

    def update(self, buffer: ReplayBuffer, is_clip_decay=True) -> float:
        s, *_ = buffer.sample(self._rng, self.batch_size)
        self._key, k = jax.random.split(self._key)
        self.params, self.opt_state, loss = self._step(
            self.params, self.old_params, self.q.params, self.v.params,
            self.opt_state, s, k, self.clip_ratio)
        if is_clip_decay:
            self.clip_ratio *= self.clip_decay
        return float(loss)

    def replace_old(self):
        self.old_params = jax.tree.map(jnp.copy, self.params)


# ---------------------------------------------------------------------------
# SAC (reference baselines/sac_burgers/scripts_SAC/sac_2d.py,
# sac_jellyfish/pde_2d_sac_train.py): standard twin-Q soft actor-critic with
# tanh-squashed Gaussian policy and automatic entropy tuning, trained against
# a jittable environment step (the differentiable solver frame or a
# surrogate operator).
# ---------------------------------------------------------------------------


class SAC:
    def __init__(self, state_dim, action_dim, hidden_dim=512, depth=2,
                 lr=3e-4, gamma=0.99, tau=5e-3, batch_size=256, seed=0,
                 target_entropy=None, policy=None, q_module=None,
                 obs_example=None, act_example=None):
        """policy/q_module + obs_example/act_example: optional custom flax
        modules for field observations/actions (ConvGaussPolicy/ConvQ)."""
        self.policy = (policy if policy is not None
                       else GaussPolicyMLP(hidden_dim, depth, action_dim))
        make_q = (q_module if q_module is not None
                  else (lambda: QMLP(hidden_dim, depth)))
        self.q1 = make_q()
        self.q2 = make_q()
        k = jax.random.split(jax.random.PRNGKey(seed), 3)
        s0 = (jnp.asarray(obs_example) if obs_example is not None
              else jnp.zeros((1, state_dim)))
        a0 = (jnp.asarray(act_example) if act_example is not None
              else jnp.zeros((1, action_dim)))
        self.pi_params = self.policy.init(k[0], s0)
        self.q1_params = self.q1.init(k[1], s0, a0)
        self.q2_params = self.q2.init(k[2], s0, a0)
        self.q1_target = jax.tree.map(jnp.copy, self.q1_params)
        self.q2_target = jax.tree.map(jnp.copy, self.q2_params)
        self.log_alpha = jnp.zeros(())
        self.target_entropy = (-float(np.prod(a0.shape[1:]))
                               if target_entropy is None else target_entropy)
        self.tx_pi = optax.adam(lr)
        self.tx_q = optax.adam(lr)
        self.tx_a = optax.adam(lr)
        self.opt_pi = self.tx_pi.init(self.pi_params)
        self.opt_q1 = self.tx_q.init(self.q1_params)
        self.opt_q2 = self.tx_q.init(self.q2_params)
        self.opt_a = self.tx_a.init(self.log_alpha)
        self.gamma, self.tau = gamma, tau
        self.batch_size = batch_size
        self._rng = np.random.default_rng(seed)
        self._key = jax.random.PRNGKey(seed + 1)
        self._build()

    def _sample_action(self, params, s, key):
        mu, std = self.policy.apply(params, s)
        eps = jax.random.normal(key, mu.shape)
        pre = mu + std * eps
        a = jnp.tanh(pre)
        corr = jnp.log(1 - a**2 + 1e-6)
        logp = gauss_log_prob(mu, std, pre) - corr.reshape(
            corr.shape[0], -1).sum(-1, keepdims=True)
        return a, logp

    def _build(self):
        policy, q1, q2 = self.policy, self.q1, self.q2
        gamma, tau = self.gamma, self.tau
        sample_action = self._sample_action
        t_ent = self.target_entropy

        @jax.jit
        def step(state, batch, key):
            (pi_p, q1_p, q2_p, q1_t, q2_t, log_a,
             opt_pi, opt_q1, opt_q2, opt_a) = state
            s, a, r, s2, mask = batch
            k1, k2 = jax.random.split(key)
            alpha = jnp.exp(log_a)

            a2, logp2 = sample_action(pi_p, s2, k1)
            tq = jnp.minimum(q1.apply(q1_t, s2, a2), q2.apply(q2_t, s2, a2))
            target = r[:, None] + gamma * mask[:, None] * (
                tq - alpha * logp2)
            target = jax.lax.stop_gradient(target)

            def q_loss(p, net):
                return ((net.apply(p, s, a) - target) ** 2).mean()

            l1, g1 = jax.value_and_grad(lambda p: q_loss(p, q1))(q1_p)
            u1, opt_q1 = self.tx_q.update(g1, opt_q1)
            q1_p = optax.apply_updates(q1_p, u1)
            l2, g2 = jax.value_and_grad(lambda p: q_loss(p, q2))(q2_p)
            u2, opt_q2 = self.tx_q.update(g2, opt_q2)
            q2_p = optax.apply_updates(q2_p, u2)

            def pi_loss(p):
                an, logp = sample_action(p, s, k2)
                qv = jnp.minimum(q1.apply(q1_p, s, an),
                                 q2.apply(q2_p, s, an))
                return (alpha * logp - qv).mean(), logp

            (lp, logp), gp = jax.value_and_grad(pi_loss, has_aux=True)(pi_p)
            up, opt_pi = self.tx_pi.update(gp, opt_pi)
            pi_p = optax.apply_updates(pi_p, up)

            def a_loss(la):
                return (-jnp.exp(la) * jax.lax.stop_gradient(
                    logp + t_ent)).mean()

            _, ga = jax.value_and_grad(a_loss)(log_a)
            ua, opt_a = self.tx_a.update(ga, opt_a)
            log_a = optax.apply_updates(log_a, ua)

            q1_t = jax.tree.map(lambda t, p: (1 - tau) * t + tau * p, q1_t,
                                q1_p)
            q2_t = jax.tree.map(lambda t, p: (1 - tau) * t + tau * p, q2_t,
                                q2_p)
            return ((pi_p, q1_p, q2_p, q1_t, q2_t, log_a, opt_pi, opt_q1,
                     opt_q2, opt_a), (l1 + l2, lp))

        self._step = step

    @property
    def _state(self):
        return (self.pi_params, self.q1_params, self.q2_params,
                self.q1_target, self.q2_target, self.log_alpha, self.opt_pi,
                self.opt_q1, self.opt_q2, self.opt_a)

    def _set_state(self, st):
        (self.pi_params, self.q1_params, self.q2_params, self.q1_target,
         self.q2_target, self.log_alpha, self.opt_pi, self.opt_q1,
         self.opt_q2, self.opt_a) = st

    def update(self, buffer: ReplayBuffer):
        s, a, r, _, s2, _, mask = buffer.sample(self._rng, self.batch_size)
        self._key, k = jax.random.split(self._key)
        st, (ql, pl) = self._step(self._state, (s, a, r, s2, mask), k)
        self._set_state(st)
        return float(ql), float(pl)

    def select_action(self, s, key=None):
        if key is None:
            mu, _ = self.policy.apply(self.pi_params, s)
            return jnp.tanh(mu)
        a, _ = self._sample_action(self.pi_params, s, key)
        return a
