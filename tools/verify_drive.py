import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from plasticinelab_tpu.envs import make

env = make('Move-v1')
obs, _ = env.reset()
obs2, r, term, trunc, info = env.step(np.zeros(env.action_space.shape))
assert np.isfinite(obs2).all() and np.isfinite(r), "gym surface NaN"
print("gym surface ok: obs", obs2.shape, "reward", float(r), "iou", info.get("incremental_iou"))

te = env.unwrapped.taichi_env
actions = np.random.default_rng(0).uniform(-0.1, 0.1, (5, env.action_space.shape[0]))
loss, grad, _ = te.rollout_value_and_grad(te.state, actions, 666.0)
g = np.asarray(grad)
assert np.isfinite(float(loss)) and np.isfinite(g).all() and np.abs(g).max() > 0
print("diff-phys ok: loss", float(loss), "max|grad|", float(np.abs(g).max()))
