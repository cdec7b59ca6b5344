"""PPO (clipped surrogate) in JAX/flax/optax.

Behavioral reference: plb/algorithms/ppo (vendored ikostrikov baseline):
tanh MLP actor-critic (64x64), state-independent diagonal-Gaussian log-std,
GAE(0.95), 10 epochs x 32 minibatches per update, clip 0.2, value coef 0.5,
entropy coef 0.01, max grad norm 0.5, Adam(3e-4, eps=1e-5) with linear decay.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax


class ActorCritic(nn.Module):
    action_dim: int
    hidden: Sequence[int] = (64, 64)

    @nn.compact
    def __call__(self, obs):
        ha = obs
        hc = obs
        for w in self.hidden:
            ha = jnp.tanh(nn.Dense(w)(ha))
            hc = jnp.tanh(nn.Dense(w)(hc))
        mean = nn.Dense(self.action_dim)(ha)
        value = nn.Dense(1)(hc).squeeze(-1)
        log_std = self.param(
            "log_std", nn.initializers.zeros, (self.action_dim,)
        )
        return mean, log_std, value


class VisualActorCritic(nn.Module):
    """ConvEncoder torso + the state ActorCritic heads on (H, W, C) image
    obs in [0, 1] (visual-RL extension — BASELINE configs[3])."""

    action_dim: int

    @nn.compact
    def __call__(self, img):
        from ..common import ConvEncoder

        f = ConvEncoder()(img)
        return ActorCritic(action_dim=self.action_dim)(f)


def gaussian_logp(mean, log_std, action):
    var = jnp.exp(2 * log_std)
    return (
        -0.5 * ((action - mean) ** 2) / var - log_std - 0.5 * jnp.log(2 * jnp.pi)
    ).sum(-1)


def gaussian_entropy(log_std):
    return (log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e)).sum(-1)


class PPOState(NamedTuple):
    params: dict
    opt: optax.OptState


class PPO:
    def __init__(self, state_dim, action_dim, clip_param=0.2, ppo_epoch=10,
                 num_mini_batch=32, value_loss_coef=0.5, entropy_coef=0.01,
                 lr=3e-4, eps=1e-5, max_grad_norm=0.5, seed=0):
        self.clip_param = clip_param
        self.ppo_epoch = ppo_epoch
        self.num_mini_batch = num_mini_batch
        self.value_loss_coef = value_loss_coef
        self.entropy_coef = entropy_coef
        # state_dim: int (reference parity) or (H, W, C) image shape — conv
        # torso on [0,1]-scaled frames (BASELINE configs[3]).
        self.visual = isinstance(state_dim, (tuple, list))
        if self.visual:
            self.net = VisualActorCritic(action_dim=action_dim)
            obs0 = jnp.zeros((1,) + tuple(state_dim))
        else:
            self.net = ActorCritic(action_dim=action_dim)
            obs0 = jnp.zeros((1, state_dim))
        key = jax.random.PRNGKey(seed)
        k, self._key = jax.random.split(key)
        params = self.net.init(k, obs0)
        self.base_lr = lr
        self.tx = optax.chain(
            optax.clip_by_global_norm(max_grad_norm),
            optax.inject_hyperparams(optax.adam)(learning_rate=lr, eps=eps),
        )
        self.state = PPOState(params=params, opt=self.tx.init(params))
        self._act = jax.jit(self._act_impl)
        self._minibatch_update = jax.jit(self._minibatch_update_impl)

    def set_lr(self, lr: float):
        self.state.opt[1].hyperparams["learning_rate"] = jnp.asarray(lr)

    def _act_impl(self, params, obs, key):
        mean, log_std, value = self.net.apply(params, obs)
        action = mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape)
        logp = gaussian_logp(mean, log_std, action)
        return action, logp, value

    def act(self, obs: np.ndarray, deterministic=False):
        self._key, sub = jax.random.split(self._key)
        a, logp, v = self._act(self.state.params, obs[None], sub)
        if deterministic:
            mean, _, v = self.net.apply(self.state.params, obs[None])
            return np.asarray(mean)[0], None, float(v[0])
        return np.asarray(a)[0], float(logp[0]), float(v[0])

    def get_value(self, obs: np.ndarray) -> float:
        _, _, v = self.net.apply(self.state.params, obs[None])
        return float(v[0])

    def act_batch(self, obs: np.ndarray):
        """(B, obs_dim) -> (actions, logp, values) as numpy — the vec-env
        collection path."""
        self._key, sub = jax.random.split(self._key)
        a, logp, v = self._act(self.state.params, obs, sub)
        return np.asarray(a), np.asarray(logp), np.asarray(v)

    def get_value_batch(self, obs: np.ndarray) -> np.ndarray:
        _, _, v = self.net.apply(self.state.params, obs)
        return np.asarray(v)

    # ------------------------------------------------------------------
    def _minibatch_update_impl(self, ts: PPOState, obs, act, old_logp, returns,
                               adv, old_value):
        def loss_fn(params):
            mean, log_std, value = self.net.apply(params, obs)
            logp = gaussian_logp(mean, log_std, act)
            ratio = jnp.exp(logp - old_logp)
            surr1 = ratio * adv
            surr2 = jnp.clip(ratio, 1 - self.clip_param, 1 + self.clip_param) * adv
            action_loss = -jnp.minimum(surr1, surr2).mean()

            # clipped value loss (ikostrikov ppo.py use_clipped_value_loss)
            value_clipped = old_value + jnp.clip(
                value - old_value, -self.clip_param, self.clip_param
            )
            vloss = 0.5 * jnp.maximum(
                (value - returns) ** 2, (value_clipped - returns) ** 2
            ).mean()
            ent = gaussian_entropy(log_std).mean()
            total = (
                action_loss + self.value_loss_coef * vloss - self.entropy_coef * ent
            )
            return total, (action_loss, vloss, ent)

        (loss, aux), grad = jax.value_and_grad(loss_fn, has_aux=True)(ts.params)
        upd, opt = self.tx.update(grad, ts.opt, ts.params)
        params = optax.apply_updates(ts.params, upd)
        return PPOState(params=params, opt=opt), loss, aux

    def update(self, rollouts: dict, rng: np.random.Generator):
        """rollouts: dict of stacked arrays obs, actions, logp, returns,
        values; advantages computed by the caller."""
        obs = rollouts["obs"]
        n = len(obs)
        adv = rollouts["returns"] - rollouts["values"]
        adv = (adv - adv.mean()) / (adv.std() + 1e-5)
        total_loss = 0.0
        count = 0
        mb_size = max(n // self.num_mini_batch, 1)
        for _ in range(self.ppo_epoch):
            perm = rng.permutation(n)
            for start in range(0, n - mb_size + 1, mb_size):
                ind = perm[start : start + mb_size]
                self.state, loss, _ = self._minibatch_update(
                    self.state, obs[ind], rollouts["actions"][ind],
                    rollouts["logp"][ind], rollouts["returns"][ind],
                    adv[ind], rollouts["values"][ind],
                )
                total_loss += float(loss)
                count += 1
        return total_loss / max(count, 1)
