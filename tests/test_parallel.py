"""Multi-device batched execution on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plasticinelab_tpu.parallel.mesh import (
    batch_states, build_batched_rollout_grad, make_mesh,
)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8, (
        "conftest must provide an 8-device virtual CPU mesh"
    )


def test_batch_states_shapes_and_jitter():
    from plasticinelab_tpu.config.spec import SceneSpec, SimulatorSpec
    from plasticinelab_tpu.engine.state import initial_state

    scene = SceneSpec(simulator=SimulatorSpec(quality=0.25, n_particles=16,
                                              dtype="float32"))
    rng = np.random.default_rng(0)
    state = initial_state(scene, rng.random((16, 3)) * 0.2 + 0.4)
    batched = batch_states(state, 8, jitter=1e-3)
    assert batched.x.shape == (8, 16, 3)
    assert not np.allclose(np.asarray(batched.x[0]), np.asarray(batched.x[1]))


@pytest.mark.slow
def test_dryrun_multichip_8_devices(monkeypatch):
    import __graft_entry__

    # tiny scale keeps the default suite fast; the driver runs the default
    # "mini" scale (32^3, 1024 particles) and PLB_DRYRUN_SCALE=move exists
    # for the full-scale artifact run
    monkeypatch.setenv("PLB_DRYRUN_SCALE", "tiny")
    __graft_entry__.dryrun_multichip(8)


def test_batched_rollout_grad_sharded():
    """The full batched value_and_grad runs under an explicit mesh sharding
    and produces per-env gradients."""
    from plasticinelab_tpu.config.spec import (
        PrimitiveSpec, SceneSpec, SimulatorSpec,
    )
    from plasticinelab_tpu.engine import losses as L
    from plasticinelab_tpu.engine.state import default_materials, initial_state

    sim = SimulatorSpec(quality=0.25, n_particles=32, dtype="float32")
    prim = PrimitiveSpec(shape="Sphere", radius=0.08, init_pos=(0.45, 0.5, 0.5),
                         friction=0.9, action_dim=3, action_scale=(0.01,) * 3)
    scene = SceneSpec(simulator=sim, primitives=(prim,))
    rng = np.random.default_rng(0)
    state = initial_state(scene, rng.random((32, 3)) * 0.2 + 0.4)
    mats = default_materials(scene)
    G = sim.n_grid
    target = np.zeros((G, G, G))
    target[6:10, 3:7, 6:10] = sim.p_mass * 4
    ls = L.make_loss_state(scene, target)

    mesh = make_mesh(8)
    step = build_batched_rollout_grad(scene, mats, ls, mesh)
    B, T = 8, 2
    states = batch_states(state, B, jitter=1e-3)
    actions = jnp.zeros((B, T, 3), jnp.float32)
    loss, grad = step(states, actions, jnp.float32(666.0))
    assert np.isfinite(float(loss))
    g = np.asarray(grad)
    assert g.shape == (B, T, 3)
    assert np.all(np.isfinite(g))
    # envs were jittered -> gradients differ across the batch
    assert not np.allclose(g[0], g[1])
