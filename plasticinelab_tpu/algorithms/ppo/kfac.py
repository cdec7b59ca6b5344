"""K-FAC natural-gradient optimizer + ACKTR learner, pure JAX.

Behavioral reference: plb/algorithms/ppo/ppo/algo/kfac.py:1-242 (KFAC with
per-layer Kronecker factors, eigendecomposed every Tf steps, KL-clipped
step, SGD-momentum application at lr*(1-momentum)) and a2c_acktr.py:54-68
(the Fisher statistics pass: -mean log-prob actor loss plus the sampled
value-function Fisher loss). The reference hooks torch modules to capture
layer inputs and output gradients; here the ActorCritic MLP is mirrored
explicitly so the per-layer inputs and pre-activation cotangents are plain
JAX values — biases are treated as separate AddBias layers exactly like the
reference's SplitBias wrapper (their input factor is the scalar 1).
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .ppo import ActorCritic, PPOState, gaussian_entropy, gaussian_logp

# flax @nn.compact creation order in ActorCritic.__call__: the hidden loop
# alternates actor/critic layers, then the two heads.
_ACTOR = ("Dense_0", "Dense_2", "Dense_4")
_CRITIC = ("Dense_1", "Dense_3", "Dense_5")
_LAYERS = ("Dense_0", "Dense_1", "Dense_2", "Dense_3", "Dense_4", "Dense_5")


def _forward(params, obs, eps):
    """Explicit mirror of ActorCritic: returns (mean, log_std, value,
    layer_inputs). `eps` adds zero perturbations to every pre-activation so
    grad(eps) yields the per-layer output cotangents (the reference's
    backward hooks)."""
    p = params["params"]
    inputs = {}

    def dense(name, h):
        inputs[name] = h
        return h @ p[name]["kernel"] + p[name]["bias"] + eps[name]

    ha, hc = obs, obs
    ha = jnp.tanh(dense("Dense_0", ha))
    hc = jnp.tanh(dense("Dense_1", hc))
    ha = jnp.tanh(dense("Dense_2", ha))
    hc = jnp.tanh(dense("Dense_3", hc))
    mean = dense("Dense_4", ha)
    value = dense("Dense_5", hc).squeeze(-1)
    return mean, p["log_std"], value, inputs


class KFACState(NamedTuple):
    m_aa: Dict[str, jnp.ndarray]   # running input covariances (in+?, ...)
    m_gg: Dict[str, jnp.ndarray]   # running output-grad covariances
    q_a: Dict[str, jnp.ndarray]    # eigenvectors, refreshed every Tf steps
    q_g: Dict[str, jnp.ndarray]
    d_a: Dict[str, jnp.ndarray]    # eigenvalues (clipped at 1e-6)
    d_g: Dict[str, jnp.ndarray]
    mom: Dict[str, jnp.ndarray]    # SGD momentum buffers per parameter leaf
    step: jnp.ndarray              # ()


class KFACOptimizer:
    """The reference's vendored hyperparameters (kfac.py:88-98)."""

    def __init__(self, lr=0.25, momentum=0.9, stat_decay=0.99, kl_clip=0.001,
                 damping=1e-2, weight_decay=0.0, Ts=1, Tf=10):
        self.lr = lr
        self.momentum = momentum
        self.stat_decay = stat_decay
        self.kl_clip = kl_clip
        self.damping = damping
        self.weight_decay = weight_decay
        self.Ts = Ts
        self.Tf = Tf

    def init(self, params) -> KFACState:
        p = params["params"]
        m_aa, m_gg, q_a, q_g, d_a, d_g, mom = {}, {}, {}, {}, {}, {}, {}
        for name in _LAYERS:
            din, dout = p[name]["kernel"].shape
            m_aa[name] = jnp.zeros((din, din))
            m_gg[name] = jnp.zeros((dout, dout))
            q_a[name] = jnp.eye(din)
            q_g[name] = jnp.eye(dout)
            d_a[name] = jnp.zeros((din,))
            d_g[name] = jnp.zeros((dout,))
            # AddBias sibling: input factor is the scalar 1
            bn = name + "/bias"
            m_aa[bn] = jnp.zeros((1, 1))
            m_gg[bn] = jnp.zeros((dout, dout))
            q_a[bn] = jnp.eye(1)
            q_g[bn] = jnp.eye(dout)
            d_a[bn] = jnp.zeros((1,))
            d_g[bn] = jnp.zeros((dout,))
            mom[name] = jnp.zeros((din, dout))
            mom[bn] = jnp.zeros((dout,))
        mom["log_std"] = jnp.zeros_like(p["log_std"])
        return KFACState(m_aa, m_gg, q_a, q_g, d_a, d_g, mom,
                         jnp.zeros((), jnp.int32))

    # -- statistics ---------------------------------------------------------

    def accumulate_stats(self, st: KFACState, params, obs, key) -> KFACState:
        """The Fisher pass (a2c_acktr.py:54-68): actor log-prob Fisher +
        sampled value Fisher; layer input/output-grad covariances with the
        reference's running-average update."""
        B = obs.shape[0]
        zeros = {n: jnp.zeros(()) for n in _LAYERS}

        def fisher_loss(eps):
            mean, log_std, value, inputs = _forward(params, obs, eps)
            k1, _ = jax.random.split(key)
            action = mean + jnp.exp(log_std) * jax.random.normal(
                k1, mean.shape)
            pg = -gaussian_logp(mean, log_std,
                                jax.lax.stop_gradient(action)).mean()
            noise = jax.random.normal(key, value.shape)
            sample_v = jax.lax.stop_gradient(value + noise)
            vf = -((value - sample_v) ** 2).mean()
            return pg + vf, inputs

        eps0 = {n: jnp.zeros((B, params["params"][n]["kernel"].shape[1]))
                for n in _LAYERS}
        (_, inputs), g_eps = jax.value_and_grad(fisher_loss, has_aux=True)(eps0)

        decay = self.stat_decay
        m_aa, m_gg = dict(st.m_aa), dict(st.m_gg)
        first = st.step == 0
        for name in _LAYERS:
            a = inputs[name]
            aa = a.T @ (a / B)
            g_ = g_eps[name] * B
            gg = g_.T @ (g_ / B)
            ones = jnp.ones((B, 1))
            aab = ones.T @ (ones / B)
            m_aa[name] = jnp.where(first, aa,
                                   decay * m_aa[name] + (1 - decay) * aa)
            m_aa[name + "/bias"] = jnp.where(
                first, aab, decay * m_aa[name + "/bias"] + (1 - decay) * aab)
            for kname in (name, name + "/bias"):
                m_gg[kname] = jnp.where(first, gg,
                                        decay * m_gg[kname] + (1 - decay) * gg)
        return st._replace(m_aa=m_aa, m_gg=m_gg)

    # -- the step -----------------------------------------------------------

    def step(self, st: KFACState, params, grads):
        """Natural-gradient step: returns (new_params, new_state)."""
        p = params["params"]
        g = grads["params"]

        # Amortized factor eigendecomposition (reference kfac.py:88-98 runs
        # it every Tf steps): lax.cond skips the eigh work entirely on
        # non-refresh steps rather than computing and discarding it.
        def _eig(_):
            q_a, q_g, d_a, d_g = {}, {}, {}, {}
            for name in list(st.m_aa):
                da_new, qa_new = jnp.linalg.eigh(st.m_aa[name])
                dg_new, qg_new = jnp.linalg.eigh(st.m_gg[name])
                q_a[name] = qa_new
                q_g[name] = qg_new
                d_a[name] = da_new * (da_new > 1e-6)
                d_g[name] = dg_new * (dg_new > 1e-6)
            return q_a, q_g, d_a, d_g

        def _keep(_):
            return dict(st.q_a), dict(st.q_g), dict(st.d_a), dict(st.d_g)

        q_a, q_g, d_a, d_g = jax.lax.cond(
            st.step % self.Tf == 0, _eig, _keep, None)

        la = self.damping + self.weight_decay
        updates = {}
        vg_sum = jnp.zeros(())
        for name in _LAYERS:
            # weight: grad matrix is (out, in) in the reference's layout
            gw = g[name]["kernel"].T
            v1 = q_g[name].T @ gw @ q_a[name]
            v2 = v1 / (d_g[name][:, None] * d_a[name][None, :] + la)
            vw = q_g[name] @ v2 @ q_a[name].T
            updates[name] = vw.T
            vg_sum += jnp.sum(vw.T * g[name]["kernel"]
                              * self.lr * self.lr)

            bn = name + "/bias"
            gb = g[name]["bias"][:, None]  # (out, 1)
            v1 = q_g[bn].T @ gb @ q_a[bn]
            v2 = v1 / (d_g[bn][:, None] * d_a[bn][None, :] + la)
            vb = (q_g[bn] @ v2 @ q_a[bn].T)[:, 0]
            updates[bn] = vb
            vg_sum += jnp.sum(vb * g[name]["bias"] * self.lr * self.lr)

        nu = jnp.minimum(1.0, jnp.sqrt(self.kl_clip / (vg_sum + 1e-30)))

        mom = dict(st.mom)
        eff_lr = self.lr * (1 - self.momentum)
        out = {k: dict(v) if isinstance(v, dict) else v for k, v in p.items()}
        for name in _LAYERS:
            gk = updates[name] * nu
            mom[name] = self.momentum * mom[name] + gk
            out[name]["kernel"] = p[name]["kernel"] - eff_lr * mom[name]
            gb = updates[name + "/bias"] * nu
            mom[name + "/bias"] = self.momentum * mom[name + "/bias"] + gb
            out[name]["bias"] = p[name]["bias"] - eff_lr * mom[name + "/bias"]
        # log_std follows plain SGD-momentum on its raw gradient
        mom["log_std"] = self.momentum * mom["log_std"] + g["log_std"]
        out["log_std"] = p["log_std"] - eff_lr * mom["log_std"]

        return {"params": out}, st._replace(
            q_a=q_a, q_g=q_g, d_a=d_a, d_g=d_g, mom=mom, step=st.step + 1)


class A2C_ACKTR:
    """A2C with the KFAC natural-gradient optimizer (reference
    a2c_acktr.py with acktr=True; value coef 0.5, entropy coef 0.01)."""

    def __init__(self, state_dim, action_dim, value_loss_coef=0.5,
                 entropy_coef=0.01, seed=0, **kfac_kwargs):
        self.value_loss_coef = value_loss_coef
        self.entropy_coef = entropy_coef
        self.net = ActorCritic(action_dim=action_dim)
        key = jax.random.PRNGKey(seed)
        k, self._key = jax.random.split(key)
        self.params = self.net.init(k, jnp.zeros((1, state_dim)))
        self.kfac = KFACOptimizer(**kfac_kwargs)
        self.kstate = self.kfac.init(self.params)
        self._act = jax.jit(self._act_impl)
        self._update = jax.jit(self._update_impl)

    def _act_impl(self, params, obs, key):
        mean, log_std, value = self.net.apply(params, obs)
        action = mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape)
        return action, gaussian_logp(mean, log_std, action), value

    def act(self, obs: np.ndarray):
        self._key, sub = jax.random.split(self._key)
        a, logp, v = self._act(self.params, obs[None], sub)
        return np.asarray(a)[0], float(logp[0]), float(v[0])

    def get_value(self, obs: np.ndarray) -> float:
        _, _, v = self.net.apply(self.params, obs[None])
        return float(v[0])

    def _update_impl(self, params, kstate, obs, act, returns, key):
        kstate = self.kfac.accumulate_stats(kstate, params, obs, key)

        def loss_fn(prm):
            mean, log_std, value = self.net.apply(prm, obs)
            adv = returns - value
            logp = gaussian_logp(mean, log_std, act)
            action_loss = -(jax.lax.stop_gradient(adv) * logp).mean()
            value_loss = (adv ** 2).mean()
            ent = gaussian_entropy(log_std).mean()
            return (action_loss + self.value_loss_coef * value_loss
                    - self.entropy_coef * ent)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, kstate = self.kfac.step(kstate, params, grads)
        return params, kstate, loss

    def update(self, rollouts: dict):
        self._key, sub = jax.random.split(self._key)
        self.params, self.kstate, loss = self._update(
            self.params, self.kstate, rollouts["obs"], rollouts["actions"],
            rollouts["returns"], sub)
        return float(loss)
