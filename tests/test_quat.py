import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plasticinelab_tpu.engine import quat


def _rand_quat(rng, n):
    q = rng.standard_normal((n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def _quat_to_mat(q):
    """Independent oracle: rotation matrix from unit quaternion (w,x,y,z)."""
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def test_qrot_matches_rotation_matrix():
    rng = np.random.default_rng(0)
    qs = _rand_quat(rng, 32)
    vs = rng.standard_normal((32, 3))
    got = np.asarray(quat.qrot(jnp.asarray(qs), jnp.asarray(vs)))
    want = np.einsum("nij,nj->ni", np.stack([_quat_to_mat(q) for q in qs]), vs)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_qmul_composes_rotations():
    rng = np.random.default_rng(1)
    qa, qb = _rand_quat(rng, 16), _rand_quat(rng, 16)
    v = rng.standard_normal((16, 3))
    ab = quat.qmul(jnp.asarray(qa), jnp.asarray(qb))
    lhs = quat.qrot(ab, jnp.asarray(v))
    rhs = quat.qrot(jnp.asarray(qa), quat.qrot(jnp.asarray(qb), jnp.asarray(v)))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-10)
    # outputs stay unit-norm
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(ab), axis=-1), 1.0, atol=1e-12
    )


def test_w2quat_small_angle_is_identity_with_zero_grad():
    w = jnp.zeros((3,), jnp.float64)
    q = quat.w2quat(w)
    np.testing.assert_allclose(np.asarray(q), [1, 0, 0, 0], atol=0)
    g = jax.jacobian(quat.w2quat)(w)
    assert np.all(np.isfinite(np.asarray(g)))
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=0)


@pytest.mark.parametrize("angle", [1e-6, 0.3, 2.0])
def test_w2quat_axis_angle(angle):
    axis = np.array([1.0, 2.0, -0.5])
    axis = axis / np.linalg.norm(axis)
    q = np.asarray(quat.w2quat(jnp.asarray(axis * angle)))
    want = np.concatenate([[np.cos(angle / 2)], axis * np.sin(angle / 2)])
    np.testing.assert_allclose(q, want, atol=1e-12)


def test_inv_trans_roundtrip():
    rng = np.random.default_rng(2)
    q = jnp.asarray(_rand_quat(rng, 8))
    p = jnp.asarray(rng.standard_normal((8, 3)))
    x = jnp.asarray(rng.standard_normal((8, 3)))
    local = quat.inv_trans(x, p, q)
    back = quat.qrot(q, local) + p
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-12)
