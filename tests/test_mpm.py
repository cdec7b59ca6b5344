"""Golden tests: JAX MPM substep vs the float64 NumPy oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plasticinelab_tpu.config.spec import PrimitiveSpec, SceneSpec, SimulatorSpec
from plasticinelab_tpu.engine import mpm
from plasticinelab_tpu.engine.state import Controls, Materials, SimState

from oracle_mpm import OraclePrim, oracle_substep


def _make_scene(with_prim=True, ground_friction=1.5, gravity=(0.0, -1.0, 0.0)):
    prims = ()
    if with_prim:
        prims = (
            PrimitiveSpec(
                shape="Sphere", radius=0.08, init_pos=(0.38, 0.42, 0.5),
                friction=0.9, action_dim=3, action_scale=(0.01, 0.01, 0.01),
            ),
        )
    sim = SimulatorSpec(
        quality=0.5, n_particles=80, yield_stress=50.0, E=5e3, nu=0.2,
        ground_friction=ground_friction, gravity=gravity, dtype="float64",
    )
    return SceneSpec(simulator=sim, primitives=prims)


def _init(scene, seed=0):
    rng = np.random.default_rng(seed)
    n = scene.simulator.n_particles
    x = rng.random((n, 3)) * 0.2 + 0.4
    v = rng.standard_normal((n, 3)) * 0.3
    C = rng.standard_normal((n, 3, 3)) * 0.5
    F = np.eye(3) + rng.standard_normal((n, 3, 3)) * 0.05
    return x, v, C, F


def _oracle_cfg(scene, prims):
    sim = scene.simulator
    return {
        "n_grid": sim.n_grid, "dt": sim.dt, "p_vol": sim.p_vol,
        "p_mass": sim.p_mass, "mu": sim.mu_0, "lam": sim.lam_0,
        "yield_stress": sim.yield_stress, "gravity": sim.gravity,
        "ground_friction": sim.ground_friction, "prims": prims,
    }


def _jax_state(scene, x, v, C, F):
    k = len(scene.primitives)
    pos = np.array([p.init_pos for p in scene.primitives], float).reshape(k, 3)
    rot = np.array([p.init_rot for p in scene.primitives], float).reshape(k, 4)
    return SimState(
        x=jnp.asarray(x), v=jnp.asarray(v), C=jnp.asarray(C), F=jnp.asarray(F),
        prim_pos=jnp.asarray(pos), prim_rot=jnp.asarray(rot),
        prim_gap=jnp.zeros((k,)),
    )


@pytest.mark.parametrize("ground_friction", [0.0, 1.5, 20.0])
def test_substep_matches_oracle(ground_friction):
    scene = _make_scene(with_prim=True, ground_friction=ground_friction)
    sim = scene.simulator
    x, v, C, F = _init(scene)
    mats = Materials(
        mu=jnp.asarray(sim.mu_0), lam=jnp.asarray(sim.lam_0),
        yield_stress=jnp.asarray(sim.yield_stress),
    )
    state = _jax_state(scene, x, v, C, F)
    p = scene.primitives[0]
    opr = OraclePrim("Sphere", p.init_pos, p.init_rot, p.friction,
                     {"radius": p.radius})
    cfg = _oracle_cfg(scene, [opr])

    pv = np.array([0.002, -0.001, 0.0005])
    pw = np.zeros(3)
    ctrl = Controls(
        v=jnp.asarray(pv)[None], w=jnp.asarray(pw)[None],
        gap_vel=jnp.zeros((1,)),
    )
    softness = 666.0

    step = jax.jit(lambda s: mpm.substep(scene, mats, s, ctrl, softness))
    ostate = {"x": x, "v": v, "C": C, "F": F}
    for it in range(4):
        state = step(state)
        ostate = oracle_substep(cfg, ostate, [(pv, pw)], softness)
        for key in ("x", "v", "C", "F"):
            # atol 1e-7: the dense matmul transfer sums particle contributions
            # in a different order than the oracle's per-tap loop
            np.testing.assert_allclose(
                np.asarray(getattr(state, key)), ostate[key], atol=1e-7,
                err_msg=f"{key} mismatch at substep {it}",
            )
    np.testing.assert_allclose(np.asarray(state.prim_pos[0]), opr.pos, atol=1e-12)
    np.testing.assert_allclose(np.asarray(state.prim_rot[0]), opr.rot, atol=1e-12)


def test_substep_no_primitives_momentum():
    """Without gravity/primitives/boundaries, p2g conserves momentum."""
    from plasticinelab_tpu.engine.transfer import axis_weights, crop_size, p2g_dense

    scene = _make_scene(with_prim=False, gravity=(0.0, 0.0, 0.0),
                        ground_friction=0.0)
    sim = scene.simulator
    x, v, C, F = _init(scene, seed=3)
    mats = Materials(jnp.asarray(sim.mu_0), jnp.asarray(sim.lam_0),
                     jnp.asarray(sim.yield_stress))
    D = crop_size(scene)

    @jax.jit
    def transfer(x, v, C, F):
        _, affine = mpm.stress_affine(scene, mats, C, F)
        aw = axis_weights(scene, x, D)
        return p2g_dense(scene, aw, v, affine, D)

    gv, gm = transfer(jnp.asarray(x), jnp.asarray(v), jnp.asarray(C),
                      jnp.asarray(F))
    np.testing.assert_allclose(float(jnp.sum(gm)), sim.p_mass * len(x), rtol=1e-12)
    # affine contribution: sum_p affine_p @ sum_taps w*dpos = 0 for quadratic
    # B-splines, so grid momentum equals particle momentum exactly.
    mom_grid = np.asarray(jnp.sum(gv, axis=0))
    np.testing.assert_allclose(mom_grid, sim.p_mass * v.sum(0), atol=1e-12)


def test_env_step_runs_and_grads():
    scene = _make_scene(with_prim=True)
    sim = scene.simulator
    x, v, C, F = _init(scene, seed=5)
    mats = Materials(jnp.asarray(sim.mu_0), jnp.asarray(sim.lam_0),
                     jnp.asarray(sim.yield_stress))
    state = _jax_state(scene, x, v, C, F)

    def loss_fn(action):
        out = mpm.env_step(scene, mats, state, action, 666.0)
        return jnp.sum(out.x * out.x) + jnp.sum(out.prim_pos)

    action = jnp.asarray([0.5, -0.3, 0.2])
    val, grad = jax.jit(jax.value_and_grad(loss_fn))(action)
    assert np.isfinite(float(val))
    g = np.asarray(grad)
    assert np.all(np.isfinite(g))
    assert np.any(np.abs(g) > 0)

    # finite-difference check on one component
    eps = 1e-6
    f = jax.jit(loss_fn)
    for i in range(3):
        fd = (float(f(action.at[i].add(eps))) - float(f(action.at[i].add(-eps)))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=2e-4, atol=1e-8)
