"""In-graph-NN-policy solve on a benchmark task (reference
plb/optimizer/solver_nn.py:73-123 at reference budget: 10000 env steps =
200 iterations of the 50-step rollout, lr 0.1 scaled by 1e-3).

The MLP runs INSIDE the differentiable rollout; each iteration is one
value_and_grad of the whole 950-substep trajectory w.r.t. the policy
parameters, device-resident (SolverNN.solve_device).

Usage: python benchmarks/solve_nn_move.py [n_iters] [task]
Writes SOLVE_NN_r05.json at the repo root; prints one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(n_iters=200, task="Move-v1"):
    from plasticinelab_tpu.engine.nn import MLPPolicy
    from plasticinelab_tpu.envs import make
    from plasticinelab_tpu.optimizer.solver_nn import SolverNN

    env = make(task)
    env.reset()
    te = env.unwrapped.taichi_env
    T = env._max_episode_steps
    if te.nn is None:
        te.nn = MLPPolicy(te.scene)
    solver = SolverNN(
        te, None, None, n_iters=n_iters, softness=666.0, horizon=T,
        **{"optim.lr": 0.1, "optim.type": "Adam", "init_range": 0.0001},
    )
    t0 = time.perf_counter()
    params = solver.solve_device(chunk=10)
    wall = time.perf_counter() - t0

    # replay the best policy through the env for the final benchmark metric
    env.reset()
    ptree = te.nn.set_params(np.asarray(params, np.float64))
    last_iou = float("nan")
    ret = 0.0
    for _ in range(T):
        action = np.asarray(te.nn.act(ptree, te.state))
        _, r, _, _, info = env.step(action)
        ret += float(r)
        last_iou = info["incremental_iou"]

    losses = [round(float(v), 3) for v in solver.iter_losses]
    out = {
        "metric": "solve_nn_final_incremental_iou",
        "value": round(last_iou, 4),
        "unit": f"final incremental IoU ({task}, in-graph MLP policy, "
                f"{n_iters} device Adam iters)",
        "vs_baseline": None,
        "extra": {
            "task": task,
            "n_iters": n_iters,
            "wall_s": round(wall, 1),
            "initial_loss": losses[0],
            "final_loss": losses[-1],
            "best_loss": round(float(solver.best_loss), 3),
            "loss_decreased": bool(solver.best_loss < losses[0] * 0.999),
            "replay_return": round(ret, 2),
            "loss_curve_every_10": losses[::10],
        },
    }
    with open(os.path.join(REPO, "SOLVE_NN_r05.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    args = sys.argv[1:]
    n = int(args[0]) if args else 200
    main(n, args[1] if len(args) > 1 else "Move-v1")
