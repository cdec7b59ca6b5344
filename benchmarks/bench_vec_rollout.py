"""On-device vectorized RL rollout throughput: env-steps/s vs batch size.

The reference's RL data path steps ONE env from host Python; this measures
the batched jitted path (parallel/rollout.py) that feeds SAC/TD3/PPO.
Prints one JSON line per batch size.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(*batches):
    import jax

    from plasticinelab_tpu.parallel.rollout import VecPlasticineEnv

    batches = [int(b) for b in batches] or [1, 8, 32]
    for B in batches:
        env = VecPlasticineEnv("move-v1", batch=B)
        obs = env.reset()
        rng = np.random.default_rng(0)
        actions = rng.uniform(-0.1, 0.1, (B, env.action_dim)).astype(np.float32)
        obs, reward, done, _ = env.step(actions)  # compile + warm
        jax.block_until_ready(obs)
        assert np.isfinite(np.asarray(reward)).all()

        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            obs, reward, done, _ = env.step(actions)
        jax.block_until_ready(obs)
        dt = (time.perf_counter() - t0) / n
        print(json.dumps({
            "metric": "vec_env_steps_per_sec",
            "value": round(B / dt, 2),
            "unit": f"env-steps/s (batch={B}, fwd only, "
                    f"{len(jax.devices())} device(s))",
            "vs_baseline": None,
            "extra": {"batch": B, "ms_per_batched_step": round(dt * 1e3, 2)},
        }), flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
