"""Trajectory-gradient correctness and stability (the reference's implicit
oracle: checkpointed grad == full grad, long-horizon NaN-freedom —
SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np

from plasticinelab_tpu.config.spec import PrimitiveSpec, SceneSpec, SimulatorSpec
from plasticinelab_tpu.engine import losses as L
from plasticinelab_tpu.engine import mpm
from plasticinelab_tpu.engine.state import Materials, SimState, default_materials


def _scene(dtype="float64"):
    sim = SimulatorSpec(quality=0.25, n_particles=96, dtype=dtype,
                        yield_stress=50.0)
    prims = (
        PrimitiveSpec(shape="Sphere", radius=0.08, init_pos=(0.42, 0.52, 0.5),
                      friction=0.9, action_dim=3, action_scale=(0.01,) * 3),
    )
    return SceneSpec(simulator=sim, primitives=prims)


def _setup(dtype="float64", seed=0):
    scene = _scene(dtype)
    rng = np.random.default_rng(seed)
    particles = rng.random((scene.simulator.n_particles, 3)) * 0.15 + 0.42
    mats = default_materials(scene)
    from plasticinelab_tpu.engine.state import initial_state

    state = initial_state(scene, particles)
    G = scene.simulator.n_grid
    target = np.zeros((G, G, G))
    target[G // 2 - 2 : G // 2 + 2, 2 : 6, G // 2 - 2 : G // 2 + 2] = (
        scene.simulator.p_mass * 4
    )
    loss_state = L.make_loss_state(scene, target)
    return scene, mats, state, loss_state


def _rollout_fn(scene, mats, loss_state, checkpoint=True):
    def rollout(state0, actions, softness):
        def step(c, a):
            st = mpm.env_step(scene, mats, c, a, softness)
            return st, L.loss_and_components(scene, loss_state, st)["loss"]

        step_fn = jax.checkpoint(step) if checkpoint else step
        _, l = jax.lax.scan(step_fn, state0, actions)
        return jnp.sum(l)

    return rollout


def test_checkpointed_equals_uncheckpointed():
    """The reference notebook's oracle (long_term_gradient.ipynb cell 5)."""
    scene, mats, state, ls = _setup()
    actions = jnp.asarray(
        np.random.default_rng(1).uniform(-0.5, 0.5, (3, 3))
    )
    g1 = jax.jit(jax.grad(_rollout_fn(scene, mats, ls, True), argnums=1))(
        state, actions, 666.0
    )
    g2 = jax.jit(jax.grad(_rollout_fn(scene, mats, ls, False), argnums=1))(
        state, actions, 666.0
    )
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-10)


def test_trajectory_gradient_matches_fd():
    scene, mats, state, ls = _setup()
    rollout = jax.jit(_rollout_fn(scene, mats, ls))
    vg = jax.jit(jax.value_and_grad(_rollout_fn(scene, mats, ls), argnums=1))
    actions = jnp.asarray(
        np.random.default_rng(2).uniform(-0.3, 0.3, (2, 3))
    )
    val, grad = vg(state, actions, 666.0)
    g = np.asarray(grad)
    assert np.all(np.isfinite(g))
    eps = 1e-6
    for (t, i) in [(0, 0), (0, 2), (1, 1)]:
        ap = actions.at[t, i].add(eps)
        am = actions.at[t, i].add(-eps)
        fd = (float(rollout(state, ap, 666.0)) - float(rollout(state, am, 666.0))) / (
            2 * eps
        )
        np.testing.assert_allclose(g[t, i], fd, rtol=5e-4, atol=1e-7)


def test_long_horizon_gradient_stays_finite_f32():
    """f32 stability over a 20-step horizon (the reference needs f64 +
    its Tape; the damped SVD VJP keeps f32 rollouts finite)."""
    scene, mats, state, ls = _setup(dtype="float32")
    vg = jax.jit(jax.value_and_grad(_rollout_fn(scene, mats, ls), argnums=1))
    actions = jnp.asarray(
        np.random.default_rng(3).uniform(-1, 1, (20, 3)), jnp.float32
    )
    val, grad = vg(state, actions, jnp.float32(666.0))
    g = np.asarray(grad)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() < 1e6, f"gradient magnitude blew up: {np.abs(g).max()}"


def test_gradient_descent_reduces_loss():
    """A few Adam iterations on the action sequence reduce the rollout loss
    (the reference Solver's contract, plb/optimizer/solver.py:21-61)."""
    import optax

    scene, mats, state, ls = _setup()
    vg = jax.jit(jax.value_and_grad(_rollout_fn(scene, mats, ls), argnums=1))
    actions = jnp.zeros((3, 3))
    opt = optax.adam(0.1)
    opt_state = opt.init(actions)
    losses = []
    for _ in range(6):
        loss, grad = vg(state, actions, 666.0)
        losses.append(float(loss))
        upd, opt_state = opt.update(grad, opt_state)
        actions = jnp.clip(optax.apply_updates(actions, upd), -1, 1)
    assert min(losses[1:]) < losses[0], f"no improvement: {losses}"
