"""Exploration-signal scan: how much benchmark signal does a RANDOM policy
see on each task? For every task family, step B vectorized envs through a
few uniform-random episodes (plus one no-op episode) and record the final
incremental-IoU / reward statistics.

Why: RL (reference budget 500k steps, plb/algorithms/solve.py:52) can only
learn tasks where exploration finds reward gradient — the reference paper
itself reports near-zero RL scores on several families. This scan picks the
tasks worth a full-budget SAC/TD3 drive and documents the exploration
landscape for the rest.

Usage: python benchmarks/random_iou_scan.py [episodes] [batch] [task ...]
Writes RANDOM_IOU_r05.json at the repo root; prints one JSON line per task.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TASKS = ["Move-v1", "Torus-v1", "Rope-v1", "Writer-v1", "Pinch-v1",
         "Rollingpin-v1", "Chopsticks-v1", "Table-v1", "TripleMove-v1",
         "Assembly-v1"]


def scan_one(task, episodes, batch):
    import jax.numpy as jnp

    from plasticinelab_tpu.parallel.rollout import VecPlasticineEnv

    venv = VecPlasticineEnv(task, batch=batch, seed=0)
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()

    def run_episode(policy):
        venv.reset()
        ret = jnp.zeros((batch,))
        inc = None
        for _ in range(venv.horizon):
            a = policy()
            _, r, _, info = venv.step(a)
            ret = ret + r
            inc = info["incremental_iou"]
        return np.asarray(ret), np.asarray(inc)

    rand_inc, rand_ret = [], []
    for _ in range(episodes):
        ret, inc = run_episode(
            lambda: rng.uniform(-1, 1, (batch, venv.action_dim))
            .astype(np.float32))
        rand_inc.append(inc)
        rand_ret.append(ret)
    noop_ret, noop_inc = run_episode(
        lambda: np.zeros((batch, venv.action_dim), np.float32))
    rand_inc = np.concatenate(rand_inc)
    rand_ret = np.concatenate(rand_ret)
    return {
        "task": task,
        "episodes": episodes, "batch": batch,
        "wall_s": round(time.perf_counter() - t0, 1),
        "random_final_iou_mean": round(float(rand_inc.mean()), 5),
        "random_final_iou_max": round(float(rand_inc.max()), 5),
        "random_return_mean": round(float(rand_ret.mean()), 2),
        "random_return_max": round(float(rand_ret.max()), 2),
        "noop_final_iou_mean": round(float(noop_inc.mean()), 5),
        "noop_return_mean": round(float(noop_ret.mean()), 2),
    }


def main(episodes=3, batch=32, tasks=None):
    subset = tasks is not None
    tasks = tasks or TASKS
    rows = []
    out_file = os.path.join(REPO, "RANDOM_IOU_r05.json")
    if subset and os.path.exists(out_file):
        # merge a partial re-scan into the existing artifact
        old = json.load(open(out_file))["extra"]["rows"]
        rows = [r for r in old if r["task"] not in tasks]
    for task in tasks:
        try:
            row = scan_one(task, episodes, batch)
        except Exception as e:
            row = {"task": task, "error": f"{type(e).__name__}: {e}"}
        rows.append(row)
        print(json.dumps(row), flush=True)
    rows.sort(key=lambda r: TASKS.index(r["task"])
              if r["task"] in TASKS else 99)
    out = {
        "metric": "random_policy_iou_scan",
        "value": max((r.get("random_final_iou_max", 0.0) for r in rows),
                     default=0.0),
        "unit": "max final incremental IoU reached by a random policy "
                "across tasks",
        "vs_baseline": None,
        "extra": {"rows": rows},
    }
    with open(out_file, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("metric", "value", "unit")}))


if __name__ == "__main__":
    args = sys.argv[1:]
    episodes = int(args[0]) if args else 3
    batch = int(args[1]) if len(args) > 1 else 32
    main(episodes, batch, args[2:] or None)
