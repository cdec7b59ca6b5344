"""GAIL discriminator (behavioral reference: plb/algorithms/ppo/ppo/gail.py —
the vendored baseline ships adversarial imitation alongside PPO: a
(state, action) discriminator with a gradient penalty; policy rewards become
-log(1 - D) style predictions on agent transitions)."""
from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax


class Discriminator(nn.Module):
    hidden: int = 100

    @nn.compact
    def __call__(self, obs, act):
        x = jnp.concatenate([obs, act], axis=-1)
        x = jnp.tanh(nn.Dense(self.hidden)(x))
        x = jnp.tanh(nn.Dense(self.hidden)(x))
        return nn.Dense(1)(x).squeeze(-1)  # logits


class GAILState(NamedTuple):
    params: dict
    opt: optax.OptState


class GAIL:
    def __init__(self, obs_dim, act_dim, hidden=100, lr=3e-4, seed=0):
        self.net = Discriminator(hidden=hidden)
        key = jax.random.PRNGKey(seed)
        k, self._key = jax.random.split(key)
        params = self.net.init(k, jnp.zeros((1, obs_dim)), jnp.zeros((1, act_dim)))
        self.tx = optax.adam(lr)
        self.state = GAILState(params=params, opt=self.tx.init(params))
        self._update = jax.jit(self._update_impl)
        self._reward = jax.jit(self._reward_impl)

    def _update_impl(self, ts: GAILState, expert, agent, key):
        eo, ea = expert
        po, pa = agent

        def loss_fn(params):
            e_logit = self.net.apply(params, eo, ea)
            a_logit = self.net.apply(params, po, pa)
            expert_loss = optax.sigmoid_binary_cross_entropy(
                e_logit, jnp.ones_like(e_logit)
            ).mean()
            agent_loss = optax.sigmoid_binary_cross_entropy(
                a_logit, jnp.zeros_like(a_logit)
            ).mean()

            # gradient penalty on interpolated samples (gail.py grad_pen)
            alpha = jax.random.uniform(key, (eo.shape[0], 1))
            mo = alpha * eo + (1 - alpha) * po
            ma = alpha * ea + (1 - alpha) * pa

            def disc_sum(o, a):
                return self.net.apply(params, o, a).sum()

            go, ga = jax.grad(disc_sum, argnums=(0, 1))(mo, ma)
            g = jnp.concatenate([go, ga], axis=-1)
            grad_pen = ((jnp.linalg.norm(g, axis=-1) - 1) ** 2).mean() * 10.0
            return expert_loss + agent_loss + grad_pen

        loss, grad = jax.value_and_grad(loss_fn)(ts.params)
        upd, opt = self.tx.update(grad, ts.opt)
        return GAILState(optax.apply_updates(ts.params, upd), opt), loss

    def update(self, expert_batch, agent_batch):
        self._key, sub = jax.random.split(self._key)
        self.state, loss = self._update(self.state, expert_batch, agent_batch, sub)
        return float(loss)

    def _reward_impl(self, params, obs, act):
        s = jax.nn.sigmoid(self.net.apply(params, obs, act))
        return s.clip(1e-7, 1 - 1e-7)

    def predict_reward(self, obs, act, gamma=0.99, masks=None):
        """reference gail.py predict_reward: r = log(D) - log(1 - D)."""
        s = self._reward(self.state.params, jnp.asarray(obs), jnp.asarray(act))
        return np.asarray(jnp.log(s) - jnp.log(1 - s))
