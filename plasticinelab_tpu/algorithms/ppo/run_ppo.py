"""PPO training loop (behavioral reference: plb/algorithms/ppo/run_ppo.py —
2500-step rollouts on the single env, VecNormalize-style obs/return
normalization, GAE(0.95) with proper time limits, linear lr decay)."""
from __future__ import annotations

import os

import numpy as np

from .ppo import PPO


class RunningMeanStd:
    """VecNormalize statistics (openai-baselines semantics)."""

    def __init__(self, shape):
        self.mean = np.zeros(shape, np.float64)
        self.var = np.ones(shape, np.float64)
        self.count = 1e-4

    def update(self, x):
        x = np.asarray(x, np.float64).reshape(-1, *self.mean.shape)
        bmean, bvar, bcount = x.mean(0), x.var(0), x.shape[0]
        delta = bmean - self.mean
        tot = self.count + bcount
        self.mean = self.mean + delta * bcount / tot
        m_a = self.var * self.count
        m_b = bvar * bcount
        self.var = (m_a + m_b + delta**2 * self.count * bcount / tot) / tot
        self.count = tot


def _reset(env):
    out = env.reset()
    return out[0] if isinstance(out, tuple) else out


def _step(env, action):
    out = env.step(action)
    if len(out) == 5:
        obs, r, term, trunc, info = out
        return obs, r, bool(term), bool(trunc), info
    obs, r, done, info = out
    return obs, r, done, done, info


def train_ppo(env, path, logger, old_args, algo="ppo"):
    num_env_steps = old_args.num_steps
    # ACKTR updates on short rollouts (reference a2c_acktr.py semantics);
    # PPO keeps the reference's 2500-step rollouts (run_ppo.py:45-46).
    rollout_len = 2500 if algo == "ppo" else 200
    gamma, gae_lambda = 0.99, 0.95
    clip_obs, clip_rew = 10.0, 10.0

    os.makedirs(path, exist_ok=True)
    obs_dim = env.observation_space.shape[0]
    act_dim = env.action_space.shape[0]
    if algo == "acktr":
        from .kfac import A2C_ACKTR

        agent = A2C_ACKTR(obs_dim, act_dim, seed=old_args.seed)
    else:
        agent = PPO(obs_dim, act_dim, seed=old_args.seed)
    rng = np.random.default_rng(old_args.seed)

    ob_rms = RunningMeanStd((obs_dim,))
    ret_rms = RunningMeanStd(())
    ret_acc = 0.0

    def norm_obs(o):
        return np.clip(
            (o - ob_rms.mean) / np.sqrt(ob_rms.var + 1e-8), -clip_obs, clip_obs
        ).astype(np.float32)

    raw_obs = _reset(env)
    ob_rms.update(raw_obs)
    obs = norm_obs(raw_obs)
    episode_t = 0
    num_updates = max(num_env_steps // rollout_len, 1)

    if logger is not None:
        logger.reset()

    for update in range(num_updates):
        if algo == "ppo":  # linear decay; KFAC manages its own step size
            agent.set_lr(agent.base_lr * (1 - update / num_updates))
        buf = {k: [] for k in ("obs", "actions", "logp", "values", "rewards",
                               "masks", "bad_masks")}
        for t in range(rollout_len):
            action, logp, value = agent.act(obs)
            raw_next, reward, term, trunc, info = _step(env, np.clip(action, -1, 1))
            episode_t += 1
            if logger is not None:
                logger.step(None, None, reward, None,
                            term or trunc or episode_t >= env._max_episode_steps,
                            info)

            ob_rms.update(raw_next)
            ret_acc = ret_acc * gamma + reward
            ret_rms.update(np.array([ret_acc]))
            norm_rew = np.clip(
                reward / np.sqrt(ret_rms.var + 1e-8), -clip_rew, clip_rew
            )

            done = term or trunc or episode_t >= env._max_episode_steps
            buf["obs"].append(obs)
            buf["actions"].append(action)
            buf["logp"].append(logp)
            buf["values"].append(value)
            buf["rewards"].append(norm_rew)
            buf["masks"].append(0.0 if done else 1.0)
            # bad_mask=0 only on true termination; time-limit ends keep value
            buf["bad_masks"].append(0.0 if term else 1.0)

            if done:
                raw_next = _reset(env)
                ob_rms.update(raw_next)
                episode_t = 0
                ret_acc = 0.0
                if logger is not None:
                    logger.reset()
            obs = norm_obs(raw_next)

        # GAE with proper time limits (ikostrikov storage.py)
        last_value = agent.get_value(obs)
        T = rollout_len
        values = np.asarray(buf["values"] + [last_value], np.float64)
        rewards = np.asarray(buf["rewards"], np.float64)
        masks = np.asarray(buf["masks"], np.float64)
        bad_masks = np.asarray(buf["bad_masks"], np.float64)
        returns = np.zeros(T)
        gae = 0.0
        for t in reversed(range(T)):
            delta = rewards[t] + gamma * values[t + 1] * masks[t] - values[t]
            gae = delta + gamma * gae_lambda * masks[t] * gae
            gae = gae * bad_masks[t]  # reset at time-limit boundaries
            returns[t] = gae + values[t]

        rollouts = {
            "obs": np.asarray(buf["obs"], np.float32),
            "actions": np.asarray(buf["actions"], np.float32),
            "logp": np.asarray(buf["logp"], np.float32),
            "returns": returns.astype(np.float32),
            "values": values[:-1].astype(np.float32),
        }
        if algo == "ppo":
            loss = agent.update(rollouts, rng)
        else:
            loss = agent.update(rollouts)
        print(f"[{algo.upper()}] update {update + 1}/{num_updates} "
              f"loss={loss:.4f}")

    # save actor + normalizer (reference run_ppo.py:200-211)
    import pickle

    with open(os.path.join(path, "ppo_model.pkl"), "wb") as f:
        import jax

        params = (agent.params if algo == "acktr"
                  else agent.state.params)
        pickle.dump(
            {"params": jax.device_get(params),
             "ob_rms": (ob_rms.mean, ob_rms.var)}, f,
        )
    return agent
