"""Analytic SDF normals vs central finite differences — the reference's own
property test (plb/engine/primitive/test_primitives.py), for all shape types,
at random poses and near-surface points."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plasticinelab_tpu.config.spec import PrimitiveSpec
from plasticinelab_tpu.engine import primitives as P

SHAPES = [
    PrimitiveSpec(shape="Sphere", radius=0.1),
    PrimitiveSpec(shape="Capsule", h=0.06, r=0.03),
    PrimitiveSpec(shape="RollingPin", h=0.2, r=0.02),
    PrimitiveSpec(shape="Chopsticks", h=0.2, r=0.02, init_gap=0.06,
                  action_dim=7, action_scale=(0.01,) * 7),
    PrimitiveSpec(shape="Cylinder", h=0.2, r=0.1),
    PrimitiveSpec(shape="Torus", tx=0.2, ty=0.1),
    PrimitiveSpec(shape="Box", size=(0.1, 0.13, 0.08)),
]


def _rand_pose(rng):
    pos = rng.random(3) * 0.5 + 0.25
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    return jnp.asarray(pos), jnp.asarray(q), jnp.asarray(0.06)


def _fd_normal(spec, pos, rot, gap, p, d=1e-6):
    n = np.zeros(3)
    for i in range(3):
        e = np.zeros(3)
        e[i] = d
        n[i] = (
            float(P.sdf(spec, pos, rot, gap, jnp.asarray(p + e)))
            - float(P.sdf(spec, pos, rot, gap, jnp.asarray(p - e)))
        ) / (2 * d)
    return n / np.linalg.norm(n)


@pytest.mark.parametrize("spec", SHAPES, ids=[s.shape for s in SHAPES])
def test_normal_matches_finite_difference(spec):
    rng = np.random.default_rng(hash(spec.shape) % 2**31)
    checked = 0
    sdf_j = jax.jit(lambda pos, rot, gap, p: P.sdf(spec, pos, rot, gap, p))
    nrm_j = jax.jit(lambda pos, rot, gap, p: P.normal(spec, pos, rot, gap, p))
    for trial in range(40):
        pos, rot, gap = _rand_pose(rng)
        p = np.asarray(pos) + rng.standard_normal(3) * 0.15
        dist = float(sdf_j(pos, rot, gap, jnp.asarray(p)))
        # skip points too close to the surface/medial axis where FD is
        # ill-conditioned (the reference samples random points and eyeballs)
        if abs(dist) < 2e-3:
            continue
        ana = np.asarray(nrm_j(pos, rot, gap, jnp.asarray(p)))
        fd = _fd_normal(spec, pos, rot, gap, p)
        if np.linalg.norm(ana - fd) < 1e-4:
            checked += 1
    assert checked >= 20, f"only {checked} clean agreements for {spec.shape}"


def test_sphere_sdf_ignores_rotation():
    spec = SHAPES[0]
    p = jnp.asarray([0.5, 0.6, 0.5])
    pos = jnp.asarray([0.5, 0.5, 0.5])
    q1 = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    q2 = jnp.asarray([0.5, 0.5, 0.5, 0.5])
    d1 = float(P.sdf(spec, pos, q1, 0.0, p))
    d2 = float(P.sdf(spec, pos, q2, 0.0, p))
    assert abs(d1 - d2) < 1e-12
    np.testing.assert_allclose(d1, 0.1 - spec.radius, atol=1e-7)


def test_chopsticks_two_sticks():
    spec = SHAPES[3]
    pos = jnp.asarray([0.5, 0.5, 0.5])
    rot = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    gap = jnp.asarray(0.1)
    # the sticks occupy local y in [-h, 0] at x = +/- gap/2
    # (chopsticks sdf shifts by (0, -h/2, 0) then min of two capsules)
    inside_stick = jnp.asarray([0.5 + 0.05, 0.5 - spec.h / 2, 0.5])
    between = jnp.asarray([0.5, 0.5 - spec.h / 2, 0.5])
    assert float(P.sdf(spec, pos, rot, gap, inside_stick)) < 0
    assert float(P.sdf(spec, pos, rot, gap, between)) > 0


def test_collide_pushes_matter_out():
    """Grid velocity pointing into a sticky sphere gets redirected."""
    spec = PrimitiveSpec(shape="Sphere", radius=0.1, friction=0.9,
                         action_dim=3, action_scale=(0.01,) * 3)
    pos = jnp.asarray([0.5, 0.5, 0.5])
    rot = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    # within the softness influence shell: exp(-666*d) > 0.1 needs d < 3.5e-3
    gp = jnp.asarray([[0.5, 0.602, 0.5]])
    v_in = jnp.asarray([[0.0, -1.0, 0.0]])  # moving down into it
    v_out = P.collide(spec, pos, rot, 0.0, pos, rot,
                      jnp.asarray(0.9), jnp.asarray(666.0), gp, v_in, 1e-4)
    # normal component toward the sphere must be damped
    assert float(v_out[0, 1]) > float(v_in[0, 1]) + 0.05
    # far outside the influence shell: velocity untouched
    gp_far = jnp.asarray([[0.5, 0.7, 0.5]])
    v_far = P.collide(spec, pos, rot, 0.0, pos, rot,
                      jnp.asarray(0.9), jnp.asarray(666.0), gp_far, v_in, 1e-4)
    np.testing.assert_array_equal(np.asarray(v_far), np.asarray(v_in))


def test_forward_kinematics_clamps_and_normalizes():
    spec = PrimitiveSpec(shape="Capsule", lower_bound=(0.2, 0.2, 0.2),
                         upper_bound=(0.8, 0.8, 0.8), action_dim=6,
                         action_scale=(0.1,) * 6)
    pos = jnp.asarray([0.79, 0.5, 0.5])
    rot = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    v = jnp.asarray([0.05, 0.0, 0.0])
    w = jnp.asarray([0.0, 0.3, 0.0])
    np_, nr_, _ = P.forward_kinematics(spec, pos, rot, jnp.asarray(0.0), v, w,
                                       jnp.asarray(0.0))
    assert float(np_[0]) == pytest.approx(0.8)
    np.testing.assert_allclose(float(jnp.linalg.norm(nr_)), 1.0, atol=1e-12)


def test_rollingpin_rolls():
    spec = PrimitiveSpec(shape="RollingPin", h=0.2, r=0.02, action_dim=3,
                         action_scale=(1.0, 1.0, 1.0))
    pos = jnp.asarray([0.5, 0.5, 0.5])
    # lay the pin horizontally (axis along x): 90deg rotation about z
    s2 = np.sqrt(0.5)
    rot = jnp.asarray([s2, 0.0, 0.0, s2])
    v = jnp.asarray([0.3, 0.0, -0.01])  # dw (roll), dth, dy
    np_, nr_, _ = P.forward_kinematics(spec, pos, rot, jnp.asarray(0.0), v,
                                       jnp.zeros(3), jnp.asarray(0.0))
    # rolling moves it horizontally and descends by dy
    assert abs(float(np_[0] - pos[0])) + abs(float(np_[2] - pos[2])) > 1e-4
    assert float(np_[1]) == pytest.approx(0.49, abs=1e-6)
    assert float(jnp.max(jnp.abs(nr_ - rot))) > 1e-3  # rotated by dw
