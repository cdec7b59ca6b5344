"""DisCor-weighted SAC (behavioral reference:
plb/algorithms/discor/algorithm/discor.py — an auxiliary twin error network
estimates Bellman-error accumulation; Q targets get importance weights
softmax(-gamma * err(s', a') / tau_err) and tau_err tracks the mean error)."""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..common import GaussianPolicy, ReplayBuffer, TwinQ, soft_update
from .sac import SAC, SACState


class DisCorState(NamedTuple):
    err: dict
    err_target: dict
    err_opt: optax.OptState
    tau1: jnp.ndarray
    tau2: jnp.ndarray


class DisCor(SAC):
    """SAC + DisCor error model. Same interface as SAC."""

    def __init__(self, state_dim, action_dim, error_lr=3e-4, tau_init=10.0,
                 **kwargs):
        super().__init__(state_dim, action_dim, **kwargs)
        if self.visual:
            # conv torso stands in for the reference's 3-layer MLP (the
            # reference has no visual path); see PARITY.md
            from ..common import VisualTwinQ

            self.err_def = VisualTwinQ()
            obs = jnp.zeros((1,) + tuple(state_dim))
        else:
            # reference error_hidden_units=[256, 256, 256] (run_discor.py)
            self.err_def = TwinQ(hidden=(256, 256, 256))
            obs = jnp.zeros((1, state_dim))
        key = jax.random.PRNGKey(kwargs.get("seed", 0) + 123)
        act = jnp.zeros((1, action_dim))
        err_params = self.err_def.init(key, obs, act)
        self.err_tx = optax.adam(error_lr)
        self.dstate = DisCorState(
            err=err_params, err_target=err_params,
            err_opt=self.err_tx.init(err_params),
            tau1=jnp.asarray(tau_init), tau2=jnp.asarray(tau_init),
        )
        self._update_discor = jax.jit(self._update_discor_impl)
        self._update_many_device_discor = jax.jit(
            self._update_many_device_discor_impl, static_argnums=(5, 6))

    def _update_discor_impl(self, ts: SACState, ds: DisCorState, batch, key):
        state, action, next_state, reward, not_done = batch
        k1, k2, k3 = jax.random.split(key, 3)
        alpha = jnp.exp(ts.log_alpha)

        mean, log_std = self.policy_def.apply(ts.policy, next_state)
        next_action, next_logp = GaussianPolicy.sample(mean, log_std, k1)

        # importance weights from the target error net (discor.py:94-117)
        e1, e2 = self.err_def.apply(ds.err_target, next_state, next_action)
        w1 = jax.nn.softmax(-self.gamma * e1 * not_done / ds.tau1) * e1.shape[0]
        w2 = jax.nn.softmax(-self.gamma * e2 * not_done / ds.tau2) * e2.shape[0]

        tq1, tq2 = self.q_def.apply(ts.q_target, next_state, next_action)
        target_q = reward + not_done * self.gamma * (
            jnp.minimum(tq1, tq2) - alpha * next_logp
        )
        target_q = jax.lax.stop_gradient(target_q)

        def q_loss_fn(qp):
            q1, q2 = self.q_def.apply(qp, state, action)
            return (
                jnp.mean(w1 * (q1 - target_q) ** 2)
                + jnp.mean(w2 * (q2 - target_q) ** 2)
            ), (q1, q2)

        (qloss, (q1, q2)), qgrad = jax.value_and_grad(q_loss_fn, has_aux=True)(ts.q)
        qupd, qopt = self.q_tx.update(qgrad, ts.q_opt)
        q = optax.apply_updates(ts.q, qupd)

        # error-net regression targets: |bellman error| + gamma * err(s',a')
        curr_e1, curr_e2 = self.err_def.apply(ds.err, state, action)
        tgt_e1 = jnp.abs(q1 - target_q) + not_done * self.gamma * e1
        tgt_e2 = jnp.abs(q2 - target_q) + not_done * self.gamma * e2
        tgt_e1 = jax.lax.stop_gradient(tgt_e1)
        tgt_e2 = jax.lax.stop_gradient(tgt_e2)

        def err_loss_fn(ep):
            c1, c2 = self.err_def.apply(ep, state, action)
            return jnp.mean((c1 - tgt_e1) ** 2) + jnp.mean((c2 - tgt_e2) ** 2)

        _, egrad = jax.value_and_grad(err_loss_fn)(ds.err)
        eupd, eopt = self.err_tx.update(egrad, ds.err_opt)
        err = optax.apply_updates(ds.err, eupd)

        # policy + alpha updates (same as SAC)
        def policy_loss_fn(pp):
            m, ls = self.policy_def.apply(pp, state)
            a, logp = GaussianPolicy.sample(m, ls, k2)
            pq1, pq2 = self.q_def.apply(q, state, a)
            return jnp.mean(alpha * logp - jnp.minimum(pq1, pq2)), logp

        (_, logp), pgrad = jax.value_and_grad(policy_loss_fn, has_aux=True)(ts.policy)
        pupd, popt = self.policy_tx.update(pgrad, ts.policy_opt)
        policy = optax.apply_updates(ts.policy, pupd)

        def alpha_loss_fn(la):
            # linear-in-log_alpha form, matching the reference and SAC
            # (see sac.py alpha_loss_fn for the runaway analysis)
            return -jnp.mean(
                la * jax.lax.stop_gradient(logp + self.target_entropy)
            )

        _, agrad = jax.value_and_grad(alpha_loss_fn)(ts.log_alpha)
        aupd, aopt = self.alpha_tx.update(agrad, ts.alpha_opt)
        log_alpha = optax.apply_updates(ts.log_alpha, aupd)
        # alpha cap — same stability guard as SAC (see sac.py)
        log_alpha = jnp.clip(log_alpha, -9.2, self.log_alpha_max)

        new_ts = SACState(
            policy=policy, policy_opt=popt, q=q,
            q_target=soft_update(ts.q_target, q, self.tau), q_opt=qopt,
            log_alpha=log_alpha, alpha_opt=aopt,
        )
        # tau tracks the ONLINE error net's current mean prediction on
        # (s, a) (reference discor.py curr_errs.detach().mean())
        new_ds = DisCorState(
            err=err, err_target=soft_update(ds.err_target, err, self.tau),
            err_opt=eopt,
            tau1=ds.tau1 * (1 - self.tau) + self.tau * jnp.mean(curr_e1),
            tau2=ds.tau2 * (1 - self.tau) + self.tau * jnp.mean(curr_e2),
        )
        return new_ts, new_ds, qloss

    def update(self, replay_buffer: ReplayBuffer, batch_size=256, rng=None):
        rng = rng or np.random.default_rng(0)
        batch = replay_buffer.sample(batch_size, rng)
        self._key, sub = jax.random.split(self._key)
        self.state, self.dstate, loss = self._update_discor(
            self.state, self.dstate, batch, sub
        )
        # device scalar — float() it at the logging site (see SAC.update)
        return loss

    def _update_many_device_discor_impl(self, ts, ds, bufs, size, key,
                                        batch_size, n, obs_stats=None):
        from ..common import normalize_obs, sample_device_batch

        def body(carry, _):
            ts, ds, key = carry
            key, ks, ku = jax.random.split(key, 3)
            batch = sample_device_batch(bufs, size, batch_size, ks)
            if self.visual:  # uint8-stored frames -> float [0, 1] in-graph
                batch = ((batch[0].astype(jnp.float32) / 255.0, batch[1],
                          batch[2].astype(jnp.float32) / 255.0)
                         + batch[3:])
            elif obs_stats is not None:
                batch = ((normalize_obs(batch[0], obs_stats), batch[1],
                          normalize_obs(batch[2], obs_stats)) + batch[3:])
            ts, ds, loss = self._update_discor_impl(ts, ds, batch, ku)
            return (ts, ds, key), loss

        (ts, ds, key), losses = jax.lax.scan(
            body, (ts, ds, key), None, length=n)
        return ts, ds, losses[-1], key

    def update_many_device(self, replay_buffer, batch_size=256, n=1,
                           obs_stats=None):
        """DisCor version of SAC.update_many_device: n scanned updates with
        in-graph minibatch sampling, threading the error-model state too —
        so `--algo discor --vec_envs B` keeps the device-resident loop."""
        self.state, self.dstate, loss, self._key = (
            self._update_many_device_discor(
                self.state, self.dstate, replay_buffer.arrays(),
                jnp.asarray(replay_buffer.size), self._key, batch_size, n,
                obs_stats))
        return loss

    def save_models(self, path):
        import os
        import pickle

        super().save_models(path)
        with open(os.path.join(path, "discor_state.pkl"), "wb") as f:
            pickle.dump(jax.device_get(self.dstate), f)

    def load_models(self, path):
        import os
        import pickle

        super().load_models(path)
        dpath = os.path.join(path, "discor_state.pkl")
        if os.path.exists(dpath):
            with open(dpath, "rb") as f:
                self.dstate = jax.device_put(pickle.load(f))
        else:
            # checkpoint written by plain SAC (or pre-DisCor): keep the
            # freshly-initialized error model, the SAC weights loaded fine
            print(f"[discor] no discor_state.pkl under {path}; "
                  "keeping fresh error model")
