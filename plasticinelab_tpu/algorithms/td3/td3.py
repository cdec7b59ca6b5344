"""TD3 in JAX/flax/optax.

Behavioral reference: plb/algorithms/TD3/TD3.py (twin critics, delayed policy
updates, target policy smoothing; same default hyperparameters — discount
0.99, tau 0.005, policy_noise 0.2, noise_clip 0.5, policy_freq 2, lr 3e-4).
Update steps are jitted; parameters live on device.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..common import Actor, ReplayBuffer, TwinQ, soft_update


class TD3State(NamedTuple):
    actor: dict
    actor_target: dict
    actor_opt: optax.OptState
    critic: dict
    critic_target: dict
    critic_opt: optax.OptState
    step: jnp.ndarray


class TD3:
    def __init__(self, state_dim, action_dim, max_action=1.0, discount=0.99,
                 tau=0.005, policy_noise=0.2, noise_clip=0.5, policy_freq=2,
                 lr=3e-4, seed=0):
        self.max_action = max_action
        self.discount = discount
        self.tau = tau
        self.policy_noise = policy_noise
        self.noise_clip = noise_clip
        self.policy_freq = policy_freq

        # state_dim: int (reference parity) or (H, W, C) image shape —
        # conv torsos + uint8 [0,255] -> [0,1] scaling (BASELINE configs[3]).
        self.visual = isinstance(state_dim, (tuple, list))
        if self.visual:
            from ..common import VisualActor, VisualTwinQ

            self.actor_def = VisualActor(action_dim=action_dim,
                                         max_action=max_action)
            self.critic_def = VisualTwinQ()
            obs = jnp.zeros((1,) + tuple(state_dim))
        else:
            self.actor_def = Actor(action_dim=action_dim, max_action=max_action)
            self.critic_def = TwinQ()
            obs = jnp.zeros((1, state_dim))
        key = jax.random.PRNGKey(seed)
        k1, k2, self._key = jax.random.split(key, 3)
        act = jnp.zeros((1, action_dim))
        actor_params = self.actor_def.init(k1, obs)
        critic_params = self.critic_def.init(k2, obs, act)
        self.actor_tx = optax.adam(lr)
        self.critic_tx = optax.adam(lr)
        self.state = TD3State(
            actor=actor_params, actor_target=actor_params,
            actor_opt=self.actor_tx.init(actor_params),
            critic=critic_params, critic_target=critic_params,
            critic_opt=self.critic_tx.init(critic_params),
            step=jnp.zeros((), jnp.int32),
        )
        self._select = jax.jit(
            lambda p, o: self.actor_def.apply(p, o)
        )
        self._update = jax.jit(self._update_impl)
        self._train_many = jax.jit(self._train_many_impl)
        self._train_many_device = jax.jit(
            self._train_many_device_impl, static_argnums=(4, 5))

    def select_action(self, state: np.ndarray) -> np.ndarray:
        if self.visual:
            state = state.astype(np.float32) / 255.0
        return np.asarray(self._select(self.state.actor, state[None]))[0]

    def select_action_batch(self, states: np.ndarray) -> np.ndarray:
        """One dispatch for a (B, ...) observation stack (vec collection)."""
        if self.visual:
            states = states.astype(np.float32) / 255.0
        return np.asarray(self._select(self.state.actor, states))

    # ------------------------------------------------------------------
    def _update_impl(self, ts: TD3State, batch, key):
        state, action, next_state, reward, not_done = batch

        noise = jnp.clip(
            jax.random.normal(key, action.shape) * self.policy_noise,
            -self.noise_clip, self.noise_clip,
        )
        next_action = jnp.clip(
            self.actor_def.apply(ts.actor_target, next_state) + noise,
            -self.max_action, self.max_action,
        )
        tq1, tq2 = self.critic_def.apply(ts.critic_target, next_state, next_action)
        target_q = reward + not_done * self.discount * jnp.minimum(tq1, tq2)
        target_q = jax.lax.stop_gradient(target_q)

        def critic_loss_fn(cp):
            q1, q2 = self.critic_def.apply(cp, state, action)
            return jnp.mean((q1 - target_q) ** 2) + jnp.mean((q2 - target_q) ** 2)

        closs, cgrad = jax.value_and_grad(critic_loss_fn)(ts.critic)
        cupd, copt = self.critic_tx.update(cgrad, ts.critic_opt)
        critic = optax.apply_updates(ts.critic, cupd)

        def do_actor(_):
            def actor_loss_fn(ap):
                a = self.actor_def.apply(ap, state)
                q1, _ = self.critic_def.apply(critic, state, a)
                return -jnp.mean(q1)

            _, agrad = jax.value_and_grad(actor_loss_fn)(ts.actor)
            aupd, aopt = self.actor_tx.update(agrad, ts.actor_opt)
            actor = optax.apply_updates(ts.actor, aupd)
            actor_target = soft_update(ts.actor_target, actor, self.tau)
            critic_target = soft_update(ts.critic_target, critic, self.tau)
            return actor, actor_target, aopt, critic_target

        def skip_actor(_):
            return ts.actor, ts.actor_target, ts.actor_opt, ts.critic_target

        actor, actor_target, aopt, critic_target = jax.lax.cond(
            (ts.step + 1) % self.policy_freq == 0, do_actor, skip_actor, None
        )
        return TD3State(
            actor=actor, actor_target=actor_target, actor_opt=aopt,
            critic=critic, critic_target=critic_target, critic_opt=copt,
            step=ts.step + 1,
        ), closs

    def train(self, replay_buffer: ReplayBuffer, batch_size: int = 256,
              rng: np.random.Generator = None):
        rng = rng or np.random.default_rng(0)
        batch = replay_buffer.sample(batch_size, rng)
        self._key, sub = jax.random.split(self._key)
        self.state, loss = self._update(self.state, batch, sub)
        # Device scalar — float() at the logging site, not per update step.
        return loss

    def _train_many_impl(self, ts: TD3State, batches, key):
        def body(carry, batch):
            ts, key = carry
            key, sub = jax.random.split(key)
            ts, loss = self._update_impl(ts, batch, sub)
            return (ts, key), loss

        (ts, key), losses = jax.lax.scan(body, (ts, key), batches)
        return ts, losses[-1], key

    def train_many(self, replay_buffer, batch_size=256, rng=None, n=1):
        """n gradient updates in ONE dispatch (scanned minibatches) — see
        SAC.update_many; used by the vectorized visual collection loop."""
        if n <= 1:
            return self.train(replay_buffer, batch_size, rng)
        rng = rng or np.random.default_rng(0)
        parts = [replay_buffer.sample(batch_size, rng) for _ in range(n)]
        batches = tuple(np.stack(p) for p in zip(*parts))
        self.state, loss, self._key = self._train_many(
            self.state, batches, self._key)
        return loss

    def _train_many_device_impl(self, ts: TD3State, bufs, size, key,
                                batch_size, n, obs_stats=None):
        from ..common import normalize_obs, sample_device_batch

        def body(carry, _):
            ts, key = carry
            key, ks, sub = jax.random.split(key, 3)
            batch = sample_device_batch(bufs, size, batch_size, ks)
            if self.visual:  # uint8-stored frames -> float [0, 1] in-graph
                batch = ((batch[0].astype(jnp.float32) / 255.0, batch[1],
                          batch[2].astype(jnp.float32) / 255.0)
                         + batch[3:])
            elif obs_stats is not None:
                batch = ((normalize_obs(batch[0], obs_stats), batch[1],
                          normalize_obs(batch[2], obs_stats)) + batch[3:])
            ts, loss = self._update_impl(ts, batch, sub)
            return (ts, key), loss

        (ts, key), losses = jax.lax.scan(body, (ts, key), None, length=n)
        return ts, losses[-1], key

    def train_many_device(self, replay_buffer, batch_size=256, n=1,
                          obs_stats=None):
        """n gradient updates in ONE dispatch with minibatches sampled
        IN-GRAPH from a Device(Image)ReplayBuffer — no host round-trip for
        the training data (see SAC.update_many_device). obs_stats: optional
        (mean, inv_std) for in-graph normalization of raw stored obs."""
        self.state, loss, self._key = self._train_many_device(
            self.state, replay_buffer.arrays(),
            jnp.asarray(replay_buffer.size), self._key, batch_size, n,
            obs_stats)
        return loss

    # model save/load (reference TD3.py:152-159)
    def save(self, filename):
        import os
        import pickle

        d = os.path.dirname(filename)
        if d:  # don't lose a multi-hour run to a missing save directory
            os.makedirs(d, exist_ok=True)
        with open(filename + ".pkl", "wb") as f:
            pickle.dump(jax.device_get(self.state), f)

    def load(self, filename):
        import pickle

        with open(filename + ".pkl", "rb") as f:
            self.state = jax.device_put(pickle.load(f))
