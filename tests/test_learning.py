"""A unit test for *learning*, not just updating: SAC must solve a trivial
point-mass reacher. Guards against regressions in the update math that pass
shape/finiteness tests but silently stop the agent from improving (the
round-3 failure mode). Mirrors benchmarks/probe_learning.py, smaller budget.

Also covers the DeviceObsRMS running stats and the obs_stats in-graph
normalization path of update_many_device.
"""
import numpy as np
import pytest

from plasticinelab_tpu.algorithms.common import (
    DeviceObsRMS, DeviceReplayBuffer, ReplayBuffer, normalize_obs)


class PointMass:
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


def _eval(env, exploit, episodes=5):
    total = 0.0
    for _ in range(episodes):
        obs = env.reset()
        done = False
        while not done:
            obs, r, done, _ = env.step(exploit(obs))
            total += r
    return total / episodes


@pytest.mark.slow
def test_sac_learns_pointmass():
    from plasticinelab_tpu.algorithms.sac.sac import SAC

    env, test_env = PointMass(0), PointMass(123)
    algo = SAC(state_dim=env.obs_dim, action_dim=env.action_dim, seed=0)
    replay = ReplayBuffer(env.obs_dim, env.action_dim, max_size=10_000)
    rng = np.random.default_rng(0)

    random_score = _eval(test_env, lambda o: rng.uniform(-1, 1, 2))
    obs = env.reset()
    for step in range(8000):
        action = (rng.uniform(-1, 1, 2).astype(np.float32) if step < 1000
                  else algo.explore(obs))
        nobs, r, done, _ = env.step(action)
        replay.add(obs, action, nobs, r, 0.0)
        obs = nobs
        if step >= 1000:
            algo.update(replay, batch_size=256, rng=rng)
        if done:
            obs = env.reset()
    trained_score = _eval(test_env, algo.exploit)
    # random is ~-13; a learning agent must at least halve the regret
    assert trained_score > random_score / 2, (trained_score, random_score)
    assert trained_score > -7.0, trained_score


def test_device_obs_rms_matches_numpy():
    rms = DeviceObsRMS(3)
    rng = np.random.default_rng(0)
    xs = [rng.normal(5.0, 2.0, (16, 3)).astype(np.float32) for _ in range(8)]
    for x in xs:
        rms.update(x)
    allx = np.concatenate(xs)
    np.testing.assert_allclose(np.asarray(rms.mean), allx.mean(0), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rms.var), allx.var(0), rtol=1e-3)
    mean, inv_std = rms.stats()
    z = np.asarray(normalize_obs(allx, (mean, inv_std)))
    assert abs(z.mean()) < 0.05 and abs(z.std() - 1.0) < 0.05


def test_update_many_device_obs_stats_path():
    """obs_stats changes the minibatch the update consumes (raw stored obs,
    normalized in-graph) without breaking the scanned update."""
    import jax.numpy as jnp

    from plasticinelab_tpu.algorithms.sac.sac import SAC

    algo = SAC(state_dim=6, action_dim=2, seed=0)
    replay = DeviceReplayBuffer(6, 2, max_size=512)
    rng = np.random.default_rng(0)
    for _ in range(4):
        replay.add_batch(
            rng.normal(3.0, 2.0, (32, 6)).astype(np.float32),
            rng.uniform(-1, 1, (32, 2)).astype(np.float32),
            rng.normal(3.0, 2.0, (32, 6)).astype(np.float32),
            rng.normal(0, 1, (32,)).astype(np.float32),
            np.zeros((32,), np.float32))
    rms = DeviceObsRMS(6)
    rms.update(replay.state[:replay.size])
    loss = algo.update_many_device(replay, batch_size=64, n=3,
                                   obs_stats=rms.stats())
    assert np.isfinite(float(loss))
    # plain path still works after the normalized path traced
    loss2 = algo.update_many_device(replay, batch_size=64, n=3)
    assert np.isfinite(float(loss2))
