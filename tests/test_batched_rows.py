"""Batched (vmapped) rows/Pallas path vs per-env execution.

Round-2 forced every batched program onto the chunked-dense transfer because
the Pallas kernels "had no batch dimension". JAX's pallas_call batching rule
prepends a grid axis, so the rows path vmaps directly; these tests pin
(in interpret mode, numerically exact) that a vmapped env step — stress,
p2g, grid_op with a primitive, g2p, mass kernel — matches stepping each env
separately, forward and gradient.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy e2e equivalence tier

from plasticinelab_tpu.config.spec import (
    PrimitiveSpec, SceneSpec, ShapeSpec, SimulatorSpec,
)
from plasticinelab_tpu.engine import mpm
from plasticinelab_tpu.engine.shapes import build_particles
from plasticinelab_tpu.engine.state import default_materials, initial_state


@pytest.fixture()
def rows_interpret():
    old = mpm.ROWS_INTERPRET
    mpm.ROWS_INTERPRET = True
    yield
    mpm.ROWS_INTERPRET = old


def _scene():
    # Dense-enough cloud that each sorted 512-particle chunk spans only a
    # couple of x-cells — the regime the no-fallback batched path requires
    # (window check asserted below).
    sim = SimulatorSpec(quality=0.5, n_particles=0, dtype="float32")
    scene = SceneSpec(
        simulator=sim,
        shapes=(ShapeSpec(shape="box", init_pos=(0.5, 0.2, 0.5),
                          width=(0.15, 0.1, 0.15), n_particles=1500),),
        primitives=(PrimitiveSpec(
            shape="Sphere", radius=0.06, init_pos=(0.5, 0.35, 0.5),
            action_dim=3, action_scale=(0.01,) * 3),),
    )
    particles, _ = build_particles(scene.shapes)
    scene = scene.with_n_particles(len(particles))

    # the batched path assumes chunk windows hold — assert that here so the
    # test scene stays in the valid regime
    from plasticinelab_tpu.engine import local_transfer as lt
    from plasticinelab_tpu.engine.transfer import crop_offset, crop_size

    x = jnp.asarray(particles, jnp.float32)
    key = lt.sort_keys(scene, x)
    (xs,), _, _ = lt.sort_rows(key, (x,))
    D = crop_size(scene)
    plan = lt.plan_for(scene, D)
    off = crop_offset(scene, xs, D)
    ctx = lt.chunk_offsets(scene, plan, xs, off, D)
    assert bool(ctx.ok)
    return scene, particles


def _batch_states(scene, particles, B, seed=0):
    base = initial_state(scene, particles)
    rng = np.random.default_rng(seed)
    states = []
    for b in range(B):
        jit = rng.uniform(-2e-3, 2e-3, base.x.shape).astype(np.float32)
        states.append(base._replace(x=jnp.asarray(np.asarray(base.x) + jit)))
    return jax.tree.map(lambda *a: jnp.stack(a), *states)


def test_vmapped_env_step_matches_per_env(rows_interpret):
    scene, particles = _scene()
    assert mpm.use_rows_path(scene, jnp.float32)
    mats = default_materials(scene)
    B = 2
    states = _batch_states(scene, particles, B)
    actions = jnp.asarray(
        np.random.default_rng(1).uniform(-0.5, 0.5, (B, scene.action_dim)),
        jnp.float32)
    softness = jnp.asarray(666.0, jnp.float32)

    def one(s, a):
        st, gm, off = mpm.env_step_with_grid_m(
            scene, mats, s, a, softness, fallback=False)
        return st, gm, off

    bst, bgm, boff = jax.vmap(one)(states, actions)
    for b in range(B):
        st, gm, off = one(jax.tree.map(lambda x: x[b], states), actions[b])
        np.testing.assert_allclose(
            np.asarray(jax.tree.map(lambda x: x[b], bst).x),
            np.asarray(st.x), atol=1e-6, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(jax.tree.map(lambda x: x[b], bst).v),
            np.asarray(st.v), atol=1e-6, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(bgm[b]), np.asarray(gm),
                                   atol=1e-6, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(boff[b]), np.asarray(off))
    # envs were jittered differently -> results must differ across the batch
    assert not np.allclose(np.asarray(bst.x[0]), np.asarray(bst.x[1]))


def test_env_step_batched_matches_per_env(rows_interpret):
    """The explicit batched kernels (grid (B, NC)) — the path that lowers
    on real TPUs, where vmap's blocked-SMEM specs do not — must match
    per-env execution too, forward and gradient."""
    scene, particles = _scene()
    mats = default_materials(scene)
    B = 2
    states = _batch_states(scene, particles, B, seed=5)
    actions = jnp.asarray(
        np.random.default_rng(4).uniform(-0.5, 0.5, (B, scene.action_dim)),
        jnp.float32)
    softness = jnp.asarray(666.0, jnp.float32)

    bst, bgm, boff = mpm.env_step_batched(
        scene, mats, states, actions, softness, want_grid_m=True)
    # Tolerances: the batched step is a DIFFERENT XLA program than the
    # per-env one (same math, different fusions), so f32 fma/fusion noise
    # (~1 ulp) amplified by the APIC 4*inv_dx^2 feedback over the substep
    # scan shows up at ~1e-5 absolute on zero-mean noise components.
    for b in range(B):
        st, gm, off = mpm.env_step_with_grid_m(
            scene, mats, jax.tree.map(lambda x: x[b], states), actions[b],
            softness, fallback=False)
        np.testing.assert_allclose(np.asarray(bst.x[b]), np.asarray(st.x),
                                   atol=1e-6, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(bst.v[b]), np.asarray(st.v),
                                   atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(bst.F[b]), np.asarray(st.F),
                                   atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(bgm[b]), np.asarray(gm),
                                   atol=1e-5, rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(boff[b]), np.asarray(off))

    # gradient through the batched step
    def loss_b(acts):
        st = mpm.env_step_batched(scene, mats, states, acts, softness)
        return jnp.sum(st.x ** 2)

    def loss_one(b, a):
        st = mpm.env_step(scene, mats, jax.tree.map(lambda x: x[b], states),
                          a, softness, fallback=False)
        return jnp.sum(st.x ** 2)

    g = jax.grad(loss_b)(actions)
    for b in range(B):
        g1 = jax.grad(lambda a: loss_one(b, a))(actions[b])
        np.testing.assert_allclose(np.asarray(g[b]), np.asarray(g1),
                                   atol=1e-4, rtol=1e-3)


def test_vmapped_rollout_grad_matches_per_env(rows_interpret):
    scene, particles = _scene()
    mats = default_materials(scene)
    B = 2
    states = _batch_states(scene, particles, B, seed=3)
    actions = jnp.asarray(
        np.random.default_rng(2).uniform(-0.3, 0.3, (B, 2, scene.action_dim)),
        jnp.float32)
    softness = jnp.asarray(666.0, jnp.float32)

    def rollout(s, acts):
        def body(carry, a):
            st = mpm.env_step(scene, mats, carry, a, softness,
                              fallback=False)
            return st, None
        final, _ = jax.lax.scan(body, s, acts)
        return jnp.sum(final.x ** 2) + jnp.sum(final.v ** 2)

    gb = jax.vmap(jax.grad(rollout, argnums=1))(states, actions)
    for b in range(B):
        g = jax.grad(rollout, argnums=1)(
            jax.tree.map(lambda x: x[b], states), actions[b])
        np.testing.assert_allclose(np.asarray(gb[b]), np.asarray(g),
                                   atol=1e-5, rtol=1e-4)
    assert np.all(np.isfinite(np.asarray(gb)))
