"""Learning probe: can the SAC/TD3 learners learn AT ALL, isolated from the
physics? A trivial 2D point-mass reacher (obs = [pos, goal], action moves the
point, reward = -distance) that a correct SAC must solve (eval return close
to optimal) within ~15k env steps. This is a unit test for *learning* — the
round-3 verdict's missing evidence — not merely for update-step mechanics.

Usage: python benchmarks/probe_learning.py [algo: sac|td3] [num_steps]
Prints one JSON line with first/last eval returns and a pass verdict.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class PointMass:
    """obs = [pos(2), goal(2)], action in [-1,1]^2 scaled by 0.1.
    reward = -||pos - goal||. Horizon 30. Goal fixed, start random."""

    obs_dim = 4
    action_dim = 2
    horizon = 30

    def __init__(self, seed=0):
        self.rng = np.random.default_rng(seed)
        self.goal = np.array([0.7, 0.3], np.float32)

    def reset(self):
        self.pos = self.rng.uniform(0.0, 1.0, 2).astype(np.float32)
        self.t = 0
        return np.concatenate([self.pos, self.goal])

    def step(self, action):
        self.pos = np.clip(self.pos + 0.1 * np.clip(action, -1, 1), 0, 1)
        self.t += 1
        r = -float(np.linalg.norm(self.pos - self.goal))
        return (np.concatenate([self.pos, self.goal]), r,
                self.t >= self.horizon, {})


def run_eval(env, algo, episodes=5):
    total = 0.0
    for _ in range(episodes):
        obs = env.reset()
        done = False
        while not done:
            obs, r, done, _ = env.step(algo.exploit(obs))
            total += r
    return total / episodes


def main(algo_name="sac", num_steps=15_000):
    from plasticinelab_tpu.algorithms.common import ReplayBuffer

    env = PointMass(seed=0)
    test_env = PointMass(seed=123)
    if algo_name == "td3":
        from plasticinelab_tpu.algorithms.td3.td3 import TD3

        algo = TD3(env.obs_dim, env.action_dim, max_action=1.0, seed=0)
    else:
        from plasticinelab_tpu.algorithms.sac.sac import SAC

        algo = SAC(state_dim=env.obs_dim, action_dim=env.action_dim, seed=0)
    replay = ReplayBuffer(env.obs_dim, env.action_dim, max_size=num_steps)
    rng = np.random.default_rng(0)

    start_steps = 1000
    evals = []
    steps = 0
    obs = env.reset()
    ep_t = 0
    while steps < num_steps:
        if steps < start_steps:
            action = rng.uniform(-1, 1, env.action_dim).astype(np.float32)
        elif algo_name == "td3":
            action = np.clip(
                algo.select_action(obs) + rng.normal(0, 0.1, env.action_dim),
                -1, 1).astype(np.float32)
        else:
            action = algo.explore(obs)
        nobs, r, done, _ = env.step(action)
        ep_t += 1
        # time-limit masking (reference agent.py:96-101)
        replay.add(obs, action, nobs, r, 0.0)
        obs = nobs
        steps += 1
        if steps >= start_steps:
            if algo_name == "td3":
                algo.train(replay, batch_size=256, rng=rng)
            else:
                algo.update(replay, batch_size=256, rng=rng)
        if done:
            obs = env.reset()
            ep_t = 0
        if steps % 2500 == 0:
            evals.append(round(run_eval(test_env, algo), 3))

    # Optimal return: mean start distance ~0.4, reachable in ~4 steps, so an
    # optimal policy earns roughly -2; random earns about -0.45*30 ~ -13.
    final = evals[-1]
    passed = final > -5.0
    print(json.dumps({
        "metric": f"probe_{algo_name}_pointmass",
        "value": final,
        "unit": "eval return (5 episodes, exploit)",
        "vs_baseline": None,
        "extra": {"evals": evals, "num_steps": steps, "passed": passed},
    }))
    return passed


if __name__ == "__main__":
    ok = main(*[(int(a) if a.isdigit() else a) for a in sys.argv[1:]])
    sys.exit(0 if ok else 1)
