"""Trajectory-gradient correctness and stability.

The physics contains genuine jump discontinuities (the reference's collide
branch `influence > 0.1 or dist <= 0`, primive_base.py:95, and boundary
switches) — finite differences across them measure jumps, not derivatives.
Exact FD/equality checks therefore use a SMOOTH configuration (manipulator
away from the plasticine, free-ish fall, no yielding); contact-rich rollouts
are checked for finiteness and descent instead.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plasticinelab_tpu.config.spec import PrimitiveSpec, SceneSpec, SimulatorSpec
from plasticinelab_tpu.engine import losses as L
from plasticinelab_tpu.engine import mpm
from plasticinelab_tpu.engine.state import initial_state, default_materials


def _setup(dtype="float64", prim_pos=(0.42, 0.52, 0.5), seed=0):
    sim = SimulatorSpec(quality=0.25, n_particles=96, dtype=dtype,
                        yield_stress=50.0)
    prims = (
        PrimitiveSpec(shape="Sphere", radius=0.05, init_pos=prim_pos,
                      friction=0.9, action_dim=3, action_scale=(0.01,) * 3),
    )
    scene = SceneSpec(simulator=sim, primitives=prims)
    rng = np.random.default_rng(seed)
    particles = rng.random((scene.simulator.n_particles, 3)) * 0.15 + 0.42
    mats = default_materials(scene)
    state = initial_state(scene, particles)
    G = scene.simulator.n_grid
    target = np.zeros((G, G, G))
    target[G // 2 - 2 : G // 2 + 2, 2 : 6, G // 2 - 2 : G // 2 + 2] = (
        scene.simulator.p_mass * 4
    )
    loss_state = L.make_loss_state(scene, target)
    return scene, mats, state, loss_state


def _setup_smooth(dtype="float64"):
    """Manipulator far from the cloud: no contact branch activates, nothing
    yields over a short horizon — the rollout is C^1 in the actions (the
    contact-distance loss still couples them). F is perturbed off identity:
    at exactly-repeated singular values the SVD backward (reference formula,
    damped or clamped alike) drops the degenerate-pair coupling, so gradients
    there are only defined up to that convention."""
    scene, mats, state, ls = _setup(dtype, prim_pos=(0.85, 0.85, 0.85))
    rng = np.random.default_rng(7)
    n = state.F.shape[0]
    dt = state.F.dtype
    F = jnp.asarray(np.eye(3) + 0.02 * rng.standard_normal((n, 3, 3)), dt)
    v = jnp.asarray(0.05 * rng.standard_normal((n, 3)), dt)
    state = state._replace(F=F, v=v)
    return scene, mats, state, ls


def _rollout_fn(scene, mats, loss_state, checkpoint=True):
    def rollout(state0, actions, softness):
        def step(c, a):
            st = mpm.env_step(scene, mats, c, a, softness)
            return st, L.loss_and_components(scene, loss_state, st)["loss"]

        step_fn = jax.checkpoint(step) if checkpoint else step
        _, l = jax.lax.scan(step_fn, state0, actions)
        return jnp.sum(l)

    return rollout


@pytest.mark.slow
def test_checkpointed_equals_uncheckpointed_smooth():
    """The reference notebook's oracle (long_term_gradient.ipynb cell 5) in
    the smooth regime: remat must not change the gradient."""
    scene, mats, state, ls = _setup_smooth()
    actions = jnp.asarray(
        np.random.default_rng(1).uniform(-0.5, 0.5, (3, 3))
    )
    g1 = jax.jit(jax.grad(_rollout_fn(scene, mats, ls, True), argnums=1))(
        state, actions, 666.0
    )
    g2 = jax.jit(jax.grad(_rollout_fn(scene, mats, ls, False), argnums=1))(
        state, actions, 666.0
    )
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-9)


def test_trajectory_gradient_matches_fd_smooth():
    scene, mats, state, ls = _setup_smooth()
    rollout = jax.jit(_rollout_fn(scene, mats, ls))
    vg = jax.jit(jax.value_and_grad(_rollout_fn(scene, mats, ls), argnums=1))
    actions = jnp.asarray(
        np.random.default_rng(2).uniform(-0.3, 0.3, (2, 3))
    )
    val, grad = vg(state, actions, 666.0)
    g = np.asarray(grad)
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 0, "no gradient signal through contact distance"
    eps = 1e-6
    for (t, i) in [(0, 0), (0, 2), (1, 1)]:
        ap = actions.at[t, i].add(eps)
        am = actions.at[t, i].add(-eps)
        fd = (float(rollout(state, ap, 666.0)) - float(rollout(state, am, 666.0))) / (
            2 * eps
        )
        np.testing.assert_allclose(g[t, i], fd, rtol=5e-4, atol=1e-9)


@pytest.mark.slow
def test_contact_rich_gradients_finite():
    """Contact-rich rollout (manipulator inside the cloud, large random
    actions, 20 steps): gradients exist and are finite in f64 and f32.
    Magnitudes can be large — the dynamics are genuinely chaotic through
    contact branches — but must not overflow (the f32 overflow was the
    motivating failure for the damped SVD backward)."""
    for dtype in ("float64", "float32"):
        scene, mats, state, ls = _setup(dtype)
        vg = jax.jit(jax.value_and_grad(_rollout_fn(scene, mats, ls), argnums=1))
        actions = jnp.asarray(
            np.random.default_rng(3).uniform(-1, 1, (20, 3)),
            jnp.float32 if dtype == "float32" else jnp.float64,
        )
        val, grad = vg(state, actions, jnp.asarray(666.0, actions.dtype))
        g = np.asarray(grad)
        assert np.isfinite(float(val)), dtype
        assert np.all(np.isfinite(g)), f"non-finite gradient in {dtype}"


def test_gradient_descent_attracts_manipulator():
    """In the smooth regime the contact loss pulls the manipulator toward the
    plasticine: a few Adam steps must reduce the rollout loss."""
    import optax

    scene, mats, state, ls = _setup_smooth()
    vg = jax.jit(jax.value_and_grad(_rollout_fn(scene, mats, ls), argnums=1))
    actions = jnp.zeros((3, 3))
    opt = optax.adam(0.2)
    opt_state = opt.init(actions)
    losses = []
    for _ in range(10):
        loss, grad = vg(state, actions, 666.0)
        losses.append(float(loss))
        upd, opt_state = opt.update(grad, opt_state)
        actions = jnp.clip(optax.apply_updates(actions, upd), -1, 1)
    assert losses[-1] < losses[0], f"no improvement: {losses}"
