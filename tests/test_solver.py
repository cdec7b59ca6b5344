"""Device-resident solve loop vs the host-loop Solver (same update rule,
reference plb/optimizer/solver.py:31-44 + optim.py:49-78)."""
import os
import tempfile

import numpy as np
import pytest

from plasticinelab_tpu.config.spec import (
    EnvSpec, LossSpec, PrimitiveSpec, SceneSpec, ShapeSpec, SimulatorSpec,
)
from plasticinelab_tpu.engine.sim import PhysicsEnv
from plasticinelab_tpu.optimizer.solver import Solver


def _tiny_env():
    sim = SimulatorSpec(quality=0.25, n_particles=160, dtype="float32",
                        yield_stress=200.0)
    prim = PrimitiveSpec(
        shape="Sphere", radius=0.05, init_pos=(0.4, 0.5, 0.5), friction=0.9,
        action_dim=3, action_scale=(0.01, 0.01, 0.01),
    )
    shape = ShapeSpec(shape="sphere", init_pos=(0.5, 0.5, 0.5), radius=0.06,
                      n_particles=160)
    scene = SceneSpec(
        simulator=sim, primitives=(prim,), shapes=(shape,),
        env=EnvSpec(loss=LossSpec(target_path=""), n_observed_particles=20),
    )
    return PhysicsEnv(scene)


@pytest.fixture(scope="module")
def env():
    return _tiny_env()


def _init_actions(env, horizon=3):
    rng = np.random.default_rng(3)
    return rng.uniform(-1e-4, 1e-4, (horizon, env.scene.action_dim))


@pytest.mark.parametrize("optim_type", [
    "Adam", pytest.param("Momentum", marks=pytest.mark.slow)])
def test_device_solver_matches_host(env, optim_type):
    init = _init_actions(env)
    host = Solver(env, None, None, n_iters=4, horizon=3,
                  **{"optim.lr": 0.05, "optim.type": optim_type})
    host_losses = []
    host_best = host.solve(
        init_actions=init.copy(),
        callbacks=((lambda s, o, l, g: host_losses.append(l)),))

    dev = Solver(env, None, None, n_iters=4, horizon=3,
                 **{"optim.lr": 0.05, "optim.type": optim_type})
    dev_best = dev.solve_device(init_actions=init.copy(), chunk=3)

    # same rollout program; host Adam runs f64 over f32 grads, device f32 —
    # trajectories agree to f32 round-off over a few iterations
    np.testing.assert_allclose(dev.iter_losses, host_losses, rtol=2e-4)
    np.testing.assert_allclose(dev_best, host_best, atol=5e-5)
    np.testing.assert_allclose(dev.best_loss, host.best_loss, rtol=2e-4)


@pytest.mark.slow
def test_device_solver_checkpoint_resume(env):
    init = _init_actions(env)
    kw = {"optim.lr": 0.05, "optim.type": "Adam"}
    full = Solver(env, None, None, n_iters=6, horizon=3, **kw)
    full_best = full.solve_device(init_actions=init.copy(), chunk=3)
    full_losses = list(full.iter_losses)

    with tempfile.TemporaryDirectory() as d:
        first = Solver(env, None, None, n_iters=3, horizon=3, **kw)
        first.solve_device(init_actions=init.copy(), chunk=3,
                           checkpoint_dir=d)
        assert os.path.exists(os.path.join(d, "ckpt_3.pkl"))
        second = Solver(env, None, None, n_iters=6, horizon=3, **kw)
        best = second.solve_device(init_actions=init.copy(),
                                   chunk=3, checkpoint_dir=d)

    np.testing.assert_allclose(second.iter_losses, full_losses[3:],
                               rtol=1e-5)
    np.testing.assert_allclose(best, full_best, atol=1e-6)


@pytest.mark.slow
def test_device_solver_nn_matches_host(env):
    from plasticinelab_tpu.engine.nn import MLPPolicy
    from plasticinelab_tpu.optimizer.solver_nn import SolverNN

    env.nn = MLPPolicy(env.scene, hidden_dims=(16, 16),
                       n_observed_particles=20)
    env.nn_params = None
    host = SolverNN(env, None, None, n_iters=3, horizon=2,
                    **{"optim.lr": 50.0})  # x0.001 internally
    host_losses = []
    host.solve(callbacks=((lambda s, o, l, g: host_losses.append(l)),))

    env.nn_params = None
    dev = SolverNN(env, None, None, n_iters=3, horizon=2,
                   **{"optim.lr": 50.0})
    dev.solve_device(chunk=2)

    np.testing.assert_allclose(dev.iter_losses, host_losses, rtol=2e-4)
    np.testing.assert_allclose(dev.best_loss, host.best_loss, rtol=2e-4)
