"""Batched visual-observation RL drive: SAC on rendered 64x64 uint8
observations from B vectorized on-device envs (BASELINE configs[3] at batch
scale). Every env's frame renders INSIDE the batched stepping program
(vmapped voxelize + march); the learner updates once per collected
transition batch. Every `eval_every` episode batches it runs one
EXPLOITATION episode (mean-action policy) and logs mean return + mean
final-step incremental IoU — the benchmark's headline metric — so the
artifact carries an eval curve, not a noise-prone reward boolean.
Prints one JSON line.

Usage: python benchmarks/visual_vec_drive.py [num_steps] [env_name] [batch]
Env:   PLB_VISRL_EPLOG=path       append per-episode JSONL rows
       PLB_VISRL_UPDATES=n        gradient updates per collected batch
       PLB_VISRL_EVAL_EVERY=k     exploit-eval every k episode batches
       PLB_VISRL_SAVE=path        save final models under path
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(num_steps=4000, env_name="Move-v1", batch=16):
    from plasticinelab_tpu.algorithms.common import DeviceImageReplayBuffer
    from plasticinelab_tpu.algorithms.sac.sac import SAC
    from plasticinelab_tpu.parallel.rollout import VecPlasticineEnv

    res, spp = 64, 2
    venv = VecPlasticineEnv(env_name, batch=batch, seed=0, obs_mode="rgb",
                            image_obs_res=res, image_obs_spp=spp)
    algo = SAC(state_dim=venv.obs_shape, action_dim=venv.action_dim,
               gamma=0.99, policy_lr=3e-4, q_lr=3e-4, entropy_lr=3e-4,
               target_update_coef=0.005, seed=0)
    # device-resident uint8 frame ring; minibatches sampled in-graph
    replay = DeviceImageReplayBuffer(venv.obs_shape, venv.action_dim)
    rng = np.random.default_rng(0)

    start_steps = min(max(num_steps // 5, 2 * batch), 2500)
    horizon = venv.horizon
    sac_batch = 64
    # gradient updates per collected batch (the reference updates once per
    # env step; batch//4 keeps a 1:4 update:data ratio at B=16)
    n_updates = int(os.environ.get("PLB_VISRL_UPDATES", max(1, batch // 4)))
    eval_every = int(os.environ.get("PLB_VISRL_EVAL_EVERY", "5"))

    import jax.numpy as jnp

    def run_eval():
        """One exploitation episode over the B envs (mean-action policy).
        Returns (mean return, mean final incremental IoU)."""
        eobs = venv.reset()
        ret = np.zeros(batch)
        inc = None
        for _ in range(horizon):
            acts = np.asarray(algo._exploit(
                algo.state.policy,
                jnp.asarray(eobs, jnp.float32) / 255.0))
            eobs, r, _, info = venv.step(acts)
            ret += np.asarray(r)
            inc = info["incremental_iou"]
        return float(ret.mean()), float(np.asarray(inc).mean())

    ep_rewards = []  # per-episode mean step reward, averaged over the batch
    ep_ious = []     # per-episode mean final-step incremental IoU
    evals = []       # (steps, eval_return, eval_incremental_iou)
    steps = 0
    t_start = time.perf_counter()
    t_steady = None
    ep_log = os.environ.get("PLB_VISRL_EPLOG")
    obs = venv.reset()
    ep_t = 0
    ep_r = np.zeros(batch)
    last_inc = None
    while steps < num_steps:
        if steps < start_steps:
            actions = rng.uniform(
                -1, 1, (batch, venv.action_dim)).astype(np.float32)
        else:
            actions = algo.explore_batch(obs)
        nobs, reward, done, info = venv.step(actions)
        reward = np.asarray(reward)
        last_inc = info["incremental_iou"]
        ep_t += 1
        ep_r += reward
        replay.add_batch(obs, actions, nobs, reward, np.zeros(batch))
        obs = nobs
        steps += batch
        if steps >= start_steps:
            if t_steady is None:
                t_steady = (time.perf_counter(), steps)
            algo.update_many_device(replay, sac_batch, n_updates)
        if ep_t >= horizon:
            ep_rewards.append(float(np.mean(ep_r)) / ep_t)
            ep_ious.append(float(np.asarray(last_inc).mean()))
            row = {
                "episode_batch": len(ep_rewards), "steps": steps,
                "mean_step_reward": round(ep_rewards[-1], 5),
                "mean_final_incremental_iou": round(ep_ious[-1], 5),
                "wall_s": round(time.perf_counter() - t_start, 1),
            }
            if len(ep_rewards) % eval_every == 0 and steps >= start_steps:
                er, ei = run_eval()
                evals.append({"steps": steps, "eval_return": round(er, 3),
                              "eval_incremental_iou": round(ei, 5)})
                row.update(evals[-1])
            if ep_log:
                with open(ep_log, "a") as f:
                    f.write(json.dumps(row) + "\n")
            obs = venv.reset()
            ep_t = 0
            ep_r = np.zeros(batch)

    save_dir = os.environ.get("PLB_VISRL_SAVE")
    if save_dir:
        algo.save_models(save_dir)

    total = time.perf_counter() - t_start
    steady_sps = ((steps - t_steady[1]) / (time.perf_counter() - t_steady[0])
                  if t_steady and steps > t_steady[1] else None)
    k = max(len(ep_rewards) // 4, 1)
    ek = max(len(evals) // 4, 1)
    first_q = float(np.mean(ep_rewards[:k])) if ep_rewards else None
    last_q = float(np.mean(ep_rewards[-k:])) if ep_rewards else None
    print(json.dumps({
        "metric": "visual_sac_vec_steps_per_sec",
        "value": round(steps / total, 3),
        "unit": f"env steps/s (SAC, rgb {res}x{res} obs, {env_name}, "
                f"B={batch} vectorized explore+render+update)",
        "vs_baseline": None,
        "extra": {
            "num_steps": steps,
            "wallclock_s": round(total, 1),
            "steady_steps_per_sec": (round(steady_sps, 3)
                                     if steady_sps else None),
            "episode_batches": len(ep_rewards),
            "mean_reward_first_quarter": (round(first_q, 4)
                                          if first_q is not None else None),
            "mean_reward_last_quarter": (round(last_q, 4)
                                         if last_q is not None else None),
            "explore_incremental_iou_first_quarter": (round(float(
                np.mean(ep_ious[:k])), 5) if ep_ious else None),
            "explore_incremental_iou_last_quarter": (round(float(
                np.mean(ep_ious[-k:])), 5) if ep_ious else None),
            "evals": evals,
            "eval_iou_first_quarter": (round(float(np.mean(
                [e["eval_incremental_iou"] for e in evals[:ek]])), 5)
                if evals else None),
            "eval_iou_last_quarter": (round(float(np.mean(
                [e["eval_incremental_iou"] for e in evals[-ek:]])), 5)
                if evals else None),
            "batch": batch, "start_steps": start_steps,
            "sac_update_batch": sac_batch, "updates_per_batch": n_updates,
        },
    }))


if __name__ == "__main__":
    main(*[(int(a) if a.isdigit() else a) for a in sys.argv[1:]])
