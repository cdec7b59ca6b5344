"""Round-4 verify drive: exercise the changed host paths on the real chip.

1. Gym surface on Move-v1: fused step+loss+obs (sim.py), finite obs/reward,
   incremental_iou present.
2. Host env.step steady-state timing (VERDICT item 2 target <= 0.05 s).
3. rollout_value_and_grad via the new per-horizon cache: two horizons.
4. Device solver loop: loss decreases, CSV-facing iter_ious is real.
5. VecPlasticineEnv small batch: info["incremental_iou"] matches headline
   metric semantics.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from plasticinelab_tpu.envs import make

env = make("Move-v1")
obs, _ = env.reset()
print("obs shape", obs.shape, "finite", np.isfinite(obs).all())

t0 = time.perf_counter()
obs, r, term, trunc, info = env.step(np.zeros(env.action_space.shape))
print(f"first step (compile) {time.perf_counter()-t0:.1f}s reward={r:.4f} "
      f"inc_iou={info['incremental_iou']:.5f} finite_obs={np.isfinite(obs).all()}")

ts = []
for i in range(20):
    a = np.random.uniform(-0.5, 0.5, env.action_space.shape)
    t0 = time.perf_counter()
    obs, r, term, trunc, info = env.step(a)
    ts.append(time.perf_counter() - t0)
assert np.isfinite(obs).all() and np.isfinite(r)
print(f"steady env.step: median {np.median(ts)*1e3:.1f} ms  "
      f"mean {np.mean(ts)*1e3:.1f} ms")

te = env.unwrapped.taichi_env
acts = np.random.uniform(-0.1, 0.1, (5, te.scene.action_dim)).astype(np.float32)
loss, grad, _ = te.rollout_value_and_grad(te.state, acts, 666.0)
g = np.asarray(grad)
print(f"rollout_vg h=5: loss={float(loss):.4f} grad finite={np.isfinite(g).all()} "
      f"norm={np.linalg.norm(g):.3e}")
acts8 = np.random.uniform(-0.1, 0.1, (8, te.scene.action_dim)).astype(np.float32)
loss8, grad8, _ = te.rollout_value_and_grad(te.state, acts8, 666.0)
print(f"rollout_vg h=8 (cache key 2): loss={float(loss8):.4f} "
      f"finite={np.isfinite(np.asarray(grad8)).all()}")

from plasticinelab_tpu.optimizer.solver import Solver

solver = Solver(te, None, None, n_iters=6, softness=666.0, horizon=5,
                **{"optim.lr": 0.05, "optim.type": "Adam",
                   "init_range": 0.0001})
best = solver.solve_device(chunk=3)
print(f"device solve: losses {solver.iter_losses[0]:.4f} -> "
      f"{solver.iter_losses[-1]:.4f} best={solver.best_loss:.4f} "
      f"ious={['%.4f' % i for i in solver.iter_ious[:3]]}")
assert solver.best_loss < solver.iter_losses[0], "no descent"
assert all(0.0 <= i <= 1.0 for i in solver.iter_ious)

from plasticinelab_tpu.parallel.rollout import VecPlasticineEnv

venv = VecPlasticineEnv("Move-v1", batch=2, seed=0)
vobs = venv.reset()
vo, vr, vd, vinfo = venv.step(np.zeros((2, venv.action_dim), np.float32))
inc = np.asarray(vinfo["incremental_iou"])
print(f"vec env: obs {np.asarray(vo).shape} inc_iou={inc} "
      f"finite={np.isfinite(np.asarray(vo)).all()}")
assert inc.shape == (2,) and np.isfinite(inc).all()
assert (inc >= 0).all() and (inc <= 1).all()

print("VERIFY_R04_DRIVE_OK")
