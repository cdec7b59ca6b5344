"""PlasticineEnv integration on a tiny custom scene (CPU-friendly)."""
import numpy as np
import pytest

from plasticinelab_tpu.config.spec import (
    EnvSpec, LossSpec, PrimitiveSpec, SceneSpec, ShapeSpec, SimulatorSpec,
)
from plasticinelab_tpu.envs.env import PlasticineEnv


def _tiny_scene():
    sim = SimulatorSpec(quality=0.25, n_particles=200, dtype="float32",
                        yield_stress=200.0)
    prim = PrimitiveSpec(
        shape="Sphere", radius=0.05, init_pos=(0.38, 0.5, 0.5), friction=0.9,
        action_dim=3, action_scale=(0.01, 0.01, 0.01),
    )
    shape = ShapeSpec(shape="sphere", init_pos=(0.5, 0.5, 0.5), radius=0.06,
                      n_particles=200)
    return SceneSpec(
        simulator=sim, primitives=(prim,), shapes=(shape,),
        env=EnvSpec(loss=LossSpec(target_path=""), n_observed_particles=50),
    )


@pytest.fixture(scope="module")
def env():
    return PlasticineEnv("tiny.yml", 1, scene=_tiny_scene())


def test_obs_layout(env):
    obs, _ = env.reset()
    # 50 particles x (x,v) + one primitive's 7-dim pose
    assert obs.shape == (50 * 6 + 7,)
    assert np.isfinite(obs).all()
    # primitive pose is at the tail: position then unit quaternion
    np.testing.assert_allclose(obs[-7:-4], [0.38, 0.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(obs[-4:], [1, 0, 0, 0], atol=1e-6)


def test_step_and_reward(env):
    env.reset()
    obs, r, term, trunc, info = env.step(np.zeros(3))
    assert np.isfinite(r)
    assert not term and not trunc
    for k in ("loss", "reward", "incremental_iou", "sdf_loss", "density_loss",
              "contact_loss"):
        assert k in info, k
    # action moves the primitive by scale * action (clipped)
    obs2, *_ = env.step(np.asarray([1.0, 0.0, 0.0]))
    assert obs2[-7] > obs[-7] + 0.005  # moved +x by ~0.01


def test_reset_restores_initial_state(env):
    obs0, _ = env.reset()
    for _ in range(3):
        env.step(np.asarray([0.5, -0.5, 0.2]))
    obs1, _ = env.reset()
    np.testing.assert_allclose(obs0, obs1, atol=1e-6)


def test_get_set_state_roundtrip(env):
    te = env.unwrapped.taichi_env
    env.reset()
    env.step(np.asarray([0.3, 0.3, 0.3]))
    snap = te.get_state()
    x_before = np.asarray(te.state.x).copy()
    env.step(np.asarray([-1.0, 0.5, 0.0]))
    te.set_state(**snap)
    np.testing.assert_allclose(np.asarray(te.state.x), x_before, atol=0)
    assert snap["state"][0].shape == (200, 3)  # x, reference layout [x,v,F,C,prims]
    assert snap["state"][4].shape == (7,)      # sphere pose vector


def test_action_clipping(env):
    """Actions beyond [-1,1] are clipped (reference primitives.py:290)."""
    env.reset()
    obs_a, *_ = env.step(np.asarray([5.0, 0.0, 0.0]))
    env.reset()
    obs_b, *_ = env.step(np.asarray([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(obs_a, obs_b, atol=1e-7)


def test_fused_step_loss_matches_dense(env):
    """PhysicsEnv.step's fused crop loss (losses.loss_from_crop fed by
    mpm.env_step_with_grid_m) must agree with the standalone dense-transfer
    loss (losses.loss_and_components) recomputed at the same state."""
    te = env.unwrapped.taichi_env
    env.reset()
    te.step(np.asarray([0.4, -0.2, 0.1]))
    assert te._pending_loss is not None
    fused = {k: float(v) for k, v in te._pending_loss.items()}
    dense = {k: float(v) for k, v in te._loss_fn(te.state).items()}
    for k in ("loss", "density_loss", "sdf_loss", "contact_loss", "iou"):
        np.testing.assert_allclose(fused[k], dense[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)
    # compute_loss consumes the fused result exactly once
    te.compute_loss()
    assert te._pending_loss is None
