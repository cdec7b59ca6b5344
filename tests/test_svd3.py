import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plasticinelab_tpu.engine.svd3 import svd3 as _svd3_impl

svd3 = jax.jit(_svd3_impl)


def _check_decomposition(F, U, sig, V, tol):
    n = F.shape[0]
    eye = np.broadcast_to(np.eye(3), (n, 3, 3))
    np.testing.assert_allclose(U @ np.transpose(U, (0, 2, 1)), eye, atol=tol)
    np.testing.assert_allclose(V @ np.transpose(V, (0, 2, 1)), eye, atol=tol)
    np.testing.assert_allclose(np.linalg.det(U), 1.0, atol=tol)
    np.testing.assert_allclose(np.linalg.det(V), 1.0, atol=tol)
    recon = np.einsum("nij,nj,nkj->nik", U, sig, V)
    np.testing.assert_allclose(recon, F, atol=tol)
    # descending by magnitude ordering of first two (both non-negative)
    assert np.all(sig[:, 0] >= sig[:, 1] - tol)
    assert np.all(sig[:, 1] >= np.abs(sig[:, 2]) - tol)


def test_svd3_random():
    rng = np.random.default_rng(0)
    F = rng.standard_normal((256, 3, 3))
    U, sig, V = map(np.asarray, svd3(jnp.asarray(F)))
    _check_decomposition(F, U, sig, V, 1e-9)
    s_ref = np.linalg.svd(F, compute_uv=False)
    np.testing.assert_allclose(np.abs(sig), s_ref, atol=1e-9)


def test_svd3_near_identity_and_degenerate():
    rng = np.random.default_rng(1)
    cases = [
        np.eye(3)[None] + 1e-4 * rng.standard_normal((64, 3, 3)),
        np.repeat(np.eye(3)[None], 4, axis=0),                  # exact identity
        np.repeat(np.diag([2.0, 2.0, 2.0])[None], 4, axis=0),   # equal sigmas
        np.repeat(np.diag([1.0, 1.0, 0.0])[None], 4, axis=0),   # rank 2
    ]
    for F in cases:
        U, sig, V = map(np.asarray, svd3(jnp.asarray(F)))
        _check_decomposition(F, U, sig, V, 1e-7)


def test_svd3_negative_determinant_sign_convention():
    F = np.diag([2.0, 1.0, -0.5])[None]
    U, sig, V = map(np.asarray, svd3(jnp.asarray(F)))
    assert sig[0, 2] < 0  # sign carried by the smallest singular value
    np.testing.assert_allclose(np.linalg.det(U), 1.0, atol=1e-10)
    np.testing.assert_allclose(np.linalg.det(V), 1.0, atol=1e-10)
    _check_decomposition(F, U, sig, V, 1e-9)


@jax.jit
def _loss_through_svd(F):
    """Scalar function exercising all three outputs like the MPM stress does."""
    U, sig, V = _svd3_impl(F)
    r = jnp.einsum("nij,nkj->nik", U, V)
    return jnp.sum(jnp.log(jnp.maximum(sig, 0.05)) ** 2) + jnp.sum(F * r)


def test_svd3_gradient_matches_finite_difference():
    rng = np.random.default_rng(2)
    F = rng.standard_normal((8, 3, 3)) * 0.5 + np.eye(3)
    g = np.asarray(jax.grad(_loss_through_svd)(jnp.asarray(F)))
    eps = 1e-6
    for n in [0, 3, 7]:
        for i in range(3):
            for j in range(3):
                Fp, Fm = F.copy(), F.copy()
                Fp[n, i, j] += eps
                Fm[n, i, j] -= eps
                fd = (
                    _loss_through_svd(jnp.asarray(Fp))
                    - _loss_through_svd(jnp.asarray(Fm))
                ) / (2 * eps)
                np.testing.assert_allclose(g[n, i, j], fd, rtol=1e-4, atol=1e-6)


def test_svd3_gradient_finite_at_repeated_singular_values():
    F = jnp.asarray(np.repeat(np.eye(3)[None], 4, axis=0))
    g = np.asarray(jax.grad(_loss_through_svd)(F))
    assert np.all(np.isfinite(g))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_svd3_dtypes(dtype):
    rng = np.random.default_rng(3)
    F = jnp.asarray(rng.standard_normal((32, 3, 3)), dtype=dtype)
    U, sig, V = svd3(F)
    assert U.dtype == sig.dtype == V.dtype == dtype
    # f32 accuracy is limited by the F^T F condition-squaring (~eps*kappa^2)
    tol = 1e-4 if dtype == jnp.float32 else 1e-9
    # reconstruct on the host: XLA-CPU's oneDNN matmul path is itself
    # reduced-precision under some flags and would dominate the error
    recon = np.einsum(
        "nij,nj,nkj->nik", np.asarray(U), np.asarray(sig), np.asarray(V)
    )
    np.testing.assert_allclose(recon, np.asarray(F), atol=tol)
