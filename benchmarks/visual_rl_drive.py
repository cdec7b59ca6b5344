"""Visual-observation RL drive: SAC on rendered 64x64 uint8 observations
(BASELINE configs[3]) — a short on-chip training run recording steps/s and
the reward trend. Prints one JSON line.

Usage: python benchmarks/visual_rl_drive.py [num_steps] [env_name]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(num_steps=1500, env_name="Move-v1"):
    from plasticinelab_tpu.envs import make
    from plasticinelab_tpu.algorithms.sac.sac import SAC

    env = make(env_name, obs_mode="rgb", image_obs_res=64, image_obs_spp=2)
    obs_shape = env.observation_space.shape
    assert len(obs_shape) == 3 and env.observation_space.dtype == np.uint8

    algo = SAC(state_dim=obs_shape, action_dim=env.action_space.shape[0],
               gamma=0.99, policy_lr=3e-4, q_lr=3e-4, entropy_lr=3e-4,
               target_update_coef=0.005, seed=0)
    from plasticinelab_tpu.algorithms.common import ImageReplayBuffer

    replay = ImageReplayBuffer(obs_shape, env.action_space.shape[0], 20_000)
    rng = np.random.default_rng(0)

    start_steps = max(num_steps // 5, 100)
    batch = 64
    horizon = env._max_episode_steps

    ep_rewards = []
    steps = 0
    t_start = time.perf_counter()
    t_steady = None
    ep_log = os.environ.get("PLB_VISRL_EPLOG")
    while steps < num_steps:
        obs, _ = env.reset()
        done = False
        t = 0
        ep_r = 0.0
        while not done and t < horizon and steps < num_steps:
            if steps < start_steps:
                action = env.action_space.sample()
            else:
                action = algo.explore(np.asarray(obs, np.float32))
            nobs, r, term, trunc, info = env.step(action)
            done = bool(term or trunc)
            t += 1
            steps += 1
            ep_r += float(r)
            replay.add(obs, action, nobs, r,
                       float(done) if t < horizon else 0.0)
            obs = nobs
            if steps >= start_steps:
                if t_steady is None:
                    t_steady = (time.perf_counter(), steps)
                algo.update(replay, batch, rng)
        ep_rewards.append(ep_r / max(t, 1))
        if ep_log:
            with open(ep_log, "a") as f:
                f.write(json.dumps({
                    "episode": len(ep_rewards), "steps": steps,
                    "mean_step_reward": round(ep_rewards[-1], 5),
                    "wall_s": round(time.perf_counter() - t_start, 1),
                }) + "\n")

    total = time.perf_counter() - t_start
    steady_sps = ((steps - t_steady[1]) / (time.perf_counter() - t_steady[0])
                  if t_steady else None)
    k = max(len(ep_rewards) // 4, 1)
    first_q = float(np.mean(ep_rewards[:k]))
    last_q = float(np.mean(ep_rewards[-k:]))
    print(json.dumps({
        "metric": "visual_sac_steps_per_sec",
        "value": round(steps / total, 3),
        "unit": f"env steps/s (SAC, rgb {obs_shape[0]}x{obs_shape[1]} obs, "
                f"{env_name}, explore+render+update)",
        "vs_baseline": None,
        "extra": {
            "num_steps": steps,
            "wallclock_s": round(total, 1),
            "steady_steps_per_sec": (round(steady_sps, 3)
                                     if steady_sps else None),
            "episodes": len(ep_rewards),
            "mean_reward_first_quarter": round(first_q, 4),
            "mean_reward_last_quarter": round(last_q, 4),
            # no pass/fail boolean: quarter means on a handful of episodes
            # are noise; the batched drive (visual_vec_drive.py) carries the
            # eval curve that actually supports a learning claim
            "batch": batch, "start_steps": start_steps,
        },
    }))


if __name__ == "__main__":
    main(*[(int(a) if a.isdigit() else a) for a in sys.argv[1:]])
