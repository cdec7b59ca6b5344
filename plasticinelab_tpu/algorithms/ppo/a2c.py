"""A2C (behavioral reference: plb/algorithms/ppo/ppo/algo/a2c_acktr.py —
single-pass advantage actor-critic over the rollout, value coef 0.5, entropy
coef 0.01, max grad norm 0.5; the ACKTR variant swaps the optimizer for KFAC,
which is out of scope here — use PPO or A2C)."""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .ppo import ActorCritic, PPOState, gaussian_entropy, gaussian_logp


class A2C:
    def __init__(self, state_dim, action_dim, value_loss_coef=0.5,
                 entropy_coef=0.01, lr=7e-4, eps=1e-5, alpha=0.99,
                 max_grad_norm=0.5, seed=0):
        self.value_loss_coef = value_loss_coef
        self.entropy_coef = entropy_coef
        self.net = ActorCritic(action_dim=action_dim)
        key = jax.random.PRNGKey(seed)
        k, self._key = jax.random.split(key)
        params = self.net.init(k, jnp.zeros((1, state_dim)))
        self.tx = optax.chain(
            optax.clip_by_global_norm(max_grad_norm),
            optax.rmsprop(lr, decay=alpha, eps=eps),
        )
        self.state = PPOState(params=params, opt=self.tx.init(params))
        self._act = jax.jit(self._act_impl)
        self._update = jax.jit(self._update_impl)

    def _act_impl(self, params, obs, key):
        mean, log_std, value = self.net.apply(params, obs)
        action = mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape)
        return action, gaussian_logp(mean, log_std, action), value

    def act(self, obs: np.ndarray):
        self._key, sub = jax.random.split(self._key)
        a, logp, v = self._act(self.state.params, obs[None], sub)
        return np.asarray(a)[0], float(logp[0]), float(v[0])

    def get_value(self, obs: np.ndarray) -> float:
        _, _, v = self.net.apply(self.state.params, obs[None])
        return float(v[0])

    def _update_impl(self, ts: PPOState, obs, act, returns):
        def loss_fn(params):
            mean, log_std, value = self.net.apply(params, obs)
            adv = returns - value
            logp = gaussian_logp(mean, log_std, act)
            action_loss = -(jax.lax.stop_gradient(adv) * logp).mean()
            value_loss = (adv**2).mean()
            ent = gaussian_entropy(log_std).mean()
            return (
                action_loss + self.value_loss_coef * value_loss
                - self.entropy_coef * ent
            )

        loss, grad = jax.value_and_grad(loss_fn)(ts.params)
        upd, opt = self.tx.update(grad, ts.opt, ts.params)
        return PPOState(optax.apply_updates(ts.params, upd), opt), loss

    def update(self, rollouts: dict):
        self.state, loss = self._update(
            self.state, rollouts["obs"], rollouts["actions"],
            rollouts["returns"],
        )
        return float(loss)
