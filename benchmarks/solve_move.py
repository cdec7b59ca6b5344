"""End-to-end Move-v1 action solve wallclock — the unmeasured half of
BASELINE.json's metric ("MPM substeps/sec fwd+bwd ...; Move-v1 solve
wallclock"). Runs the reference solver budget (200 Adam iterations x 50 env
steps, lr 0.1 — plb/optimizer/solver.py:21-61 + solve.py:50-51) on the
attached device and prints one JSON line: total seconds, per-iteration
seconds, final/best loss, final IoU.

The solve loop itself runs fully on device (Solver.solve_device: jitted
lax.scan chunks of value_and_grad + Adam + best-tracking); pass host=1 as the
second arg for the reference-style host loop (numpy Adam each iteration).

Usage: python benchmarks/solve_move.py [n_iters] [host]
"""
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n_iters=200, host=0):
    from plasticinelab_tpu.envs import make
    from plasticinelab_tpu.optimizer.solver import Solver

    env = make("Move-v1")
    env.reset()
    te = env.unwrapped.taichi_env
    T = env._max_episode_steps

    solver = Solver(
        te, None, None, n_iters=n_iters, softness=666.0, horizon=T,
        **{"optim.lr": 0.1, "optim.type": "Adam", "init_range": 0.0001},
    )

    iter_times = []

    def cb(slf, optim, loss, grad):
        iter_times.append(slf.last_iter_seconds)

    t0 = time.perf_counter()
    if host:
        best_action = solver.solve(callbacks=(cb,))
    else:
        chunk = 10
        best_action = solver.solve_device(chunk=chunk)
        # per-iteration cost = chunk wallclock / chunk (the host only sees
        # chunk boundaries); recover it from the total after the first chunk
    total = time.perf_counter() - t0

    # replay best actions for the final IoU (reference solver.py:98-101,
    # sans rendering)
    env.reset()
    last_iou = float("nan")
    for act in best_action:
        _, _, _, _, info = env.step(act)
        last_iou = info["incremental_iou"]

    if host:
        steady = float(np.median(iter_times[2:])) if len(iter_times) > 3 else None
        first = round(iter_times[0], 3) if iter_times else None
    else:
        cs = solver.chunk_seconds
        steady = float(np.median(cs[1:])) / chunk if len(cs) > 1 else None
        first = round(cs[0], 3) if cs else None
    print(json.dumps({
        "metric": "move_v1_solve_wallclock",
        "value": round(total, 2),
        "unit": f"s ({n_iters} Adam iters x {T} env steps)",
        "vs_baseline": None,
        "extra": {
            "n_iters": n_iters,
            "loop": "host" if host else "device",
            "first_iter_s" if host else "first_chunk_s": first,
            "steady_iter_s": round(steady, 4) if steady else None,
            "best_loss": round(float(solver.best_loss), 3),
            "final_incremental_iou": round(last_iou, 4),
        },
    }))


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
