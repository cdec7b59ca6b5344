"""DDPG (behavioral reference: plb/algorithms/TD3/OurDDPG.py — the cleaned-up
DDPG the TD3 package ships alongside TD3: single critic, no target policy
smoothing, no delayed updates; tau 0.005, discount 0.99, lr 3e-4)."""
from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..common import Actor, MLP, ReplayBuffer, soft_update


class Critic(nn.Module):
    hidden: tuple = (400, 300)  # reference OurDDPG.py:31-37

    @nn.compact
    def __call__(self, obs, act):
        x = jnp.concatenate([obs, act], axis=-1)
        return MLP(self.hidden, 1)(x).squeeze(-1)


class DDPGState(NamedTuple):
    actor: dict
    actor_target: dict
    actor_opt: optax.OptState
    critic: dict
    critic_target: dict
    critic_opt: optax.OptState


class DDPG:
    def __init__(self, state_dim, action_dim, max_action=1.0, discount=0.99,
                 tau=0.005, lr=3e-4, seed=0, actor_tx=None, critic_tx=None):
        self.max_action = max_action
        self.discount = discount
        self.tau = tau
        self.actor_def = Actor(action_dim=action_dim, max_action=max_action,
                               hidden=(400, 300))  # OurDDPG.py:14-28
        self.critic_def = Critic()
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        obs = jnp.zeros((1, state_dim))
        act = jnp.zeros((1, action_dim))
        actor_params = self.actor_def.init(k1, obs)
        critic_params = self.critic_def.init(k2, obs, act)
        self.actor_tx = actor_tx if actor_tx is not None else optax.adam(lr)
        self.critic_tx = (critic_tx if critic_tx is not None
                          else optax.adam(lr))
        self.state = DDPGState(
            actor=actor_params, actor_target=actor_params,
            actor_opt=self.actor_tx.init(actor_params),
            critic=critic_params, critic_target=critic_params,
            critic_opt=self.critic_tx.init(critic_params),
        )
        self._select = jax.jit(lambda p, o: self.actor_def.apply(p, o))
        self._update = jax.jit(self._update_impl)

    def select_action(self, state):
        return np.asarray(self._select(self.state.actor, state[None]))[0]

    def _update_impl(self, ts: DDPGState, batch):
        state, action, next_state, reward, not_done = batch
        target_q = reward + not_done * self.discount * self.critic_def.apply(
            ts.critic_target, next_state,
            self.actor_def.apply(ts.actor_target, next_state),
        )
        target_q = jax.lax.stop_gradient(target_q)

        def critic_loss_fn(cp):
            q = self.critic_def.apply(cp, state, action)
            return jnp.mean((q - target_q) ** 2)

        closs, cgrad = jax.value_and_grad(critic_loss_fn)(ts.critic)
        cupd, copt = self.critic_tx.update(cgrad, ts.critic_opt, ts.critic)
        critic = optax.apply_updates(ts.critic, cupd)

        def actor_loss_fn(ap):
            return -jnp.mean(
                self.critic_def.apply(critic, state, self.actor_def.apply(ap, state))
            )

        _, agrad = jax.value_and_grad(actor_loss_fn)(ts.actor)
        aupd, aopt = self.actor_tx.update(agrad, ts.actor_opt, ts.actor)
        actor = optax.apply_updates(ts.actor, aupd)

        return DDPGState(
            actor=actor,
            actor_target=soft_update(ts.actor_target, actor, self.tau),
            actor_opt=aopt,
            critic=critic,
            critic_target=soft_update(ts.critic_target, critic, self.tau),
            critic_opt=copt,
        ), closs

    def train(self, replay_buffer: ReplayBuffer, batch_size=256, rng=None):
        rng = rng or np.random.default_rng(0)
        batch = replay_buffer.sample(batch_size, rng)
        self.state, loss = self._update(self.state, batch)
        # Device scalar — float() at the logging site, not per update step.
        return loss

    # model save/load (reference DDPG.py save/load)
    def save(self, filename):
        import pickle

        with open(filename + "_ddpg.pkl", "wb") as f:
            pickle.dump(jax.device_get(self.state), f)

    def load(self, filename):
        import pickle

        with open(filename + "_ddpg.pkl", "rb") as f:
            self.state = jax.device_put(pickle.load(f))


class OriginalDDPG(DDPG):
    """The TD3 package's vanilla-DDPG baseline (reference
    plb/algorithms/TD3/DDPG.py:48-58): tau 0.001, actor Adam lr 1e-4,
    critic Adam lr 1e-3 with L2 weight penalty 1e-2 (torch `weight_decay`
    adds wd*param to the gradient BEFORE Adam — optax.add_decayed_weights
    in front of adam reproduces that, unlike decoupled adamw)."""

    def __init__(self, state_dim, action_dim, max_action=1.0, discount=0.99,
                 tau=0.001, seed=0):
        super().__init__(
            state_dim, action_dim, max_action=max_action, discount=discount,
            tau=tau, seed=seed,
            actor_tx=optax.adam(1e-4),
            critic_tx=optax.chain(optax.add_decayed_weights(1e-2),
                                  optax.scale_by_adam(),
                                  optax.scale(-1e-3)),
        )
