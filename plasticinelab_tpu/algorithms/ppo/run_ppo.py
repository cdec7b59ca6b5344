"""PPO training loop (behavioral reference: plb/algorithms/ppo/run_ppo.py —
2500-step rollouts on the single env, VecNormalize-style obs/return
normalization, GAE(0.95) with proper time limits, linear lr decay)."""
from __future__ import annotations

import json
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


def train_ppo_vec(old_args, path, batch=8, horizon=50, venv=None,
                  rollout_len=256):
    """PPO on the batched on-device env (parallel/rollout.VecPlasticineEnv):
    B envs step in one jitted program; rollouts are (T, B) tensors and GAE
    runs vectorized over the batch. Episodes are fixed-horizon truncations
    (never true terminations), so bad_masks stay 1 and values bootstrap
    through episode ends — the reference's time-limit semantics
    (ikostrikov storage.py) on a real vector env instead of DummyVecEnv."""
    import time

    from ...parallel.rollout import VecPlasticineEnv

    num_env_steps = old_args.num_steps
    # rollout_len is per env; batch*rollout_len samples per update
    gamma, gae_lambda = 0.99, 0.95
    clip_obs, clip_rew = 10.0, 10.0

    os.makedirs(path, exist_ok=True)
    if venv is None:
        venv = VecPlasticineEnv(
            old_args.env_name, batch=batch, seed=old_args.seed,
            horizon=horizon,
            obs_mode=getattr(old_args, "obs_mode", "state"),
            image_obs_res=getattr(old_args, "image_obs_res", 64),
            image_obs_spp=getattr(old_args, "image_obs_spp", 2))
    batch, horizon = venv.batch, venv.horizon
    visual = venv.obs_mode == "rgb"
    obs_sh = tuple(venv.obs_shape) if visual else (venv.obs_dim,)
    agent = PPO(obs_sh if visual else venv.obs_dim, venv.action_dim,
                seed=old_args.seed)
    rng = np.random.default_rng(old_args.seed)

    # visual obs skip VecNormalize (parity with the single-env rgb path)
    ob_rms = None if visual else RunningMeanStd((venv.obs_dim,))
    ret_rms = RunningMeanStd(())
    ret_acc = np.zeros(batch)

    def norm_obs(o):
        if visual:
            return o.astype(np.float32) / 255.0
        return np.clip(
            (o - ob_rms.mean) / np.sqrt(ob_rms.var + 1e-8), -clip_obs,
            clip_obs).astype(np.float32)

    raw = np.asarray(venv.reset())
    if not visual:
        ob_rms.update(raw)
    obs = norm_obs(raw)
    ep_t = 0
    steps_per_update = batch * rollout_len
    num_updates = max(num_env_steps // steps_per_update, 1)
    t0 = time.perf_counter()

    # optional exploitation eval + JSONL log (same contract as the SAC/TD3
    # drives): every eval_every updates run one mean-action episode over the
    # B envs and log mean return + mean final-step incremental IoU — the
    # benchmark's headline metric (reference loss.py:293-294)
    ep_log = os.environ.get("PLB_PPO_EPLOG")
    eval_every = int(os.environ.get("PLB_PPO_EVAL_EVERY", "0"))
    evals = []
    # best-eval policy protection (same contract as the SAC/TD3 drives):
    # keep a reference to the peak-eval params, restore + re-verify at end
    best = {"iou": -1.0, "state": None, "steps": 0}

    def run_eval():
        eobs = norm_obs(np.asarray(venv.reset()))
        ret = np.zeros(batch)
        inc = None
        for _ in range(horizon):
            mean, _, _ = agent.net.apply(agent.state.params, eobs)
            nxt, r, _, info = venv.step(np.clip(np.asarray(mean), -1, 1))
            ret += np.asarray(r)
            inc = info["incremental_iou"]
            eobs = norm_obs(np.asarray(nxt))
        return float(ret.mean()), float(np.asarray(inc).mean())

    for update in range(num_updates):
        agent.set_lr(agent.base_lr * (1 - update / num_updates))
        T, B = rollout_len, batch
        b_obs = np.zeros((T, B) + obs_sh, np.float32)
        b_act = np.zeros((T, B, venv.action_dim), np.float32)
        b_logp = np.zeros((T, B), np.float32)
        b_val = np.zeros((T + 1, B), np.float64)
        b_rew = np.zeros((T, B), np.float64)
        b_mask = np.zeros((T, B), np.float64)
        for t in range(T):
            actions, logp, value = agent.act_batch(obs)
            raw_next, reward, done, _ = venv.step(np.clip(actions, -1, 1))
            raw_next, reward = np.asarray(raw_next), np.asarray(reward)
            ep_t += 1
            if not visual:
                ob_rms.update(raw_next)
            ret_acc[:] = ret_acc * gamma + reward
            ret_rms.update(ret_acc)
            norm_rew = np.clip(
                reward / np.sqrt(ret_rms.var + 1e-8), -clip_rew, clip_rew)

            b_obs[t], b_act[t], b_logp[t] = obs, actions, logp
            b_val[t], b_rew[t] = value, norm_rew
            b_mask[t] = 0.0 if ep_t >= horizon else 1.0
            if ep_t >= horizon:
                raw_next = np.asarray(venv.reset())
                if not visual:
                    ob_rms.update(raw_next)
                ep_t = 0
                ret_acc[:] = 0.0
            obs = norm_obs(raw_next)

        b_val[T] = agent.get_value_batch(obs)
        # GAE over (T, B); all episode ends are truncations -> bad_mask=1,
        # so no GAE reset beyond the mask itself
        returns = np.zeros((T, B))
        gae = np.zeros(B)
        for t in reversed(range(T)):
            delta = b_rew[t] + gamma * b_val[t + 1] * b_mask[t] - b_val[t]
            gae = delta + gamma * gae_lambda * b_mask[t] * gae
            returns[t] = gae + b_val[t]

        rollouts = {
            "obs": b_obs.reshape((T * B,) + obs_sh),
            "actions": b_act.reshape(T * B, -1),
            "logp": b_logp.reshape(T * B),
            "returns": returns.reshape(T * B).astype(np.float32),
            "values": b_val[:T].reshape(T * B).astype(np.float32),
        }
        loss = agent.update(rollouts, rng)
        done_steps = (update + 1) * steps_per_update
        dt = time.perf_counter() - t0
        print(f"[PPO vec] update {update + 1}/{num_updates} loss={loss:.4f} "
              f"({done_steps / dt:.1f} env steps/s, batch={batch})")
        if eval_every and (update + 1) % eval_every == 0:
            er, ei = run_eval()
            evals.append({"steps": done_steps, "eval_return": round(er, 3),
                          "eval_incremental_iou": round(ei, 5)})
            if ei > best["iou"]:
                best.update(iou=ei, state=agent.state, steps=done_steps)
            print(f"[PPO vec] eval return={er:.2f} "
                  f"incremental_iou={ei:.5f}")
            if ep_log:
                with open(ep_log, "a") as f:
                    f.write(json.dumps(evals[-1]) + "\n")
            # eval consumed the venv's in-flight episode: restart clean
            raw = np.asarray(venv.reset())
            if not visual:
                ob_rms.update(raw)
            obs = norm_obs(raw)
            ep_t = 0
            ret_acc[:] = 0.0

    import pickle

    import jax

    # restore + re-verify the best-eval policy; save it alongside the final
    best_restored = None
    if best["state"] is not None:
        final_state = agent.state
        agent.state = best["state"]
        er, ei = run_eval()
        best_restored = {"steps": best["steps"],
                         "best_eval_incremental_iou": round(best["iou"], 5),
                         "restored_eval_return": round(er, 3),
                         "restored_eval_incremental_iou": round(ei, 5)}
        with open(os.path.join(path, "ppo_model_best.pkl"), "wb") as f:
            pickle.dump({"params": jax.device_get(agent.state.params),
                         "ob_rms": ((ob_rms.mean, ob_rms.var)
                                    if ob_rms is not None else None)}, f)
        agent.state = final_state

    with open(os.path.join(path, "ppo_model.pkl"), "wb") as f:
        pickle.dump({"params": jax.device_get(agent.state.params),
                     "ob_rms": ((ob_rms.mean, ob_rms.var)
                                if ob_rms is not None else None)}, f)
    agent.evals = evals
    agent.best_eval = best_restored
    return agent


def train_ppo(env, path, logger, old_args, algo="ppo"):
    vec = int(getattr(old_args, "vec_envs", 0) or 0)
    if vec > 1 and algo == "ppo":
        return train_ppo_vec(
            old_args, path, batch=vec,
            rollout_len=int(getattr(old_args, "rollout_len", 256) or 256))
    num_env_steps = old_args.num_steps
    # ACKTR updates on short rollouts (reference a2c_acktr.py semantics);
    # PPO keeps the reference's 2500-step rollouts (run_ppo.py:45-46).
    rollout_len = int(getattr(old_args, "rollout_len",
                              2500 if algo == "ppo" else 200))
    gamma, gae_lambda = 0.99, 0.95
    clip_obs, clip_rew = 10.0, 10.0

    os.makedirs(path, exist_ok=True)
    obs_shape = env.observation_space.shape
    visual = len(obs_shape) == 3  # rgb obs_mode (BASELINE configs[3])
    obs_dim = obs_shape if visual else obs_shape[0]
    act_dim = env.action_space.shape[0]
    if algo == "acktr":
        assert not visual, "rgb obs_mode is wired for --algo ppo"
        from .kfac import A2C_ACKTR

        agent = A2C_ACKTR(obs_dim, act_dim, seed=old_args.seed)
    else:
        agent = PPO(obs_dim, act_dim, seed=old_args.seed)
    rng = np.random.default_rng(old_args.seed)

    # images use a fixed [0,1] scale instead of VecNormalize statistics
    ob_rms = None if visual else RunningMeanStd((obs_dim,))
    ret_rms = RunningMeanStd(())
    ret_acc = 0.0

    def norm_obs(o):
        if visual:
            return (o.astype(np.float32) / 255.0)
        return np.clip(
            (o - ob_rms.mean) / np.sqrt(ob_rms.var + 1e-8), -clip_obs, clip_obs
        ).astype(np.float32)

    raw_obs = _reset(env)
    if ob_rms is not None:
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

            if ob_rms is not None:
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
                if ob_rms is not None:
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
             "ob_rms": (None if ob_rms is None
                        else (ob_rms.mean, ob_rms.var))}, f,
        )
    return agent
