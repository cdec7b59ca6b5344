"""Pallas local-window transfer kernels (interpret mode) vs the jnp local
path: forwards and hand-derived backwards vs jax.vjp.

Tolerances allow the kernels' 3-pass bf16 dot decomposition (~16 mantissa
bits, the accuracy Precision.HIGH delivers on real TPU MXUs — the jnp local
path's own precision there). The CPU jnp reference computes exact f32, so
the comparison sees the full bf16x3 representation error (~2^-17 relative,
amplified ~4*inv_dx by the APIC C reconstruction's cancellation)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plasticinelab_tpu.config.spec import SceneSpec, ShapeSpec, SimulatorSpec
from plasticinelab_tpu.engine import local_transfer as lt
from plasticinelab_tpu.engine import pallas_local as pal
from plasticinelab_tpu.engine.local_transfer import LocalPlan
from plasticinelab_tpu.engine.transfer import crop_offset


D = 24
PLAN = LocalPlan(P=128, Lx=8, Ly=D)


def _setup(seed=0, n=300):
    sim = SimulatorSpec(quality=0.5, n_particles=n, dtype="float32")
    scene = SceneSpec(
        simulator=sim,
        shapes=(ShapeSpec(shape="box", init_pos=(0.5, 0.35, 0.5), width=0.1),),
    )
    rng = np.random.default_rng(seed)
    x = (rng.random((n, 3)) * 0.1 + 0.45).astype(np.float32)
    v = (rng.standard_normal((n, 3)) * 0.2).astype(np.float32)
    affine = (rng.standard_normal((n, 3, 3)) * 0.3).astype(np.float32)
    x, v, affine = jnp.asarray(x), jnp.asarray(v), jnp.asarray(affine)
    key = lt.sort_keys(scene, x)
    (x, v, affine), _, _ = lt.sort_rows(key, (x, v, affine))
    off = crop_offset(scene, x, D)
    ctx = lt.chunk_offsets(scene, PLAN, x, off, D)
    assert bool(ctx.ok)
    return scene, x, v, affine, ctx.offs, off


def _advect(scene, x, nv):
    sim = scene.simulator
    return jnp.maximum(jnp.minimum(x + sim.dt * nv, 1.0 - 3 * sim.dx), 0.0)


def test_p2g_forward_matches_jnp():
    scene, x, v, affine, offs, off = _setup()
    p2g_fn = pal.transfer_fns(scene, PLAN, D, interpret=True)[0]
    grid4 = p2g_fn(x, v, affine, offs, off)

    ctx = lt.ChunkCtx(offs=offs, ok=jnp.asarray(True))
    gv, gm = lt.p2g_local(scene, PLAN, x, v, affine, ctx, off, D)
    np.testing.assert_allclose(
        np.asarray(grid4[:3].T), np.asarray(gv), atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(grid4[3]), np.asarray(gm), atol=2e-7, rtol=1e-5)


def test_g2p_forward_matches_jnp():
    scene, x, v, affine, offs, off = _setup(seed=1)
    g2p_fn = pal.transfer_fns(scene, PLAN, D, interpret=True)[1]
    rng = np.random.default_rng(2)
    grid3 = jnp.asarray(
        rng.standard_normal((3, D ** 3)).astype(np.float32) * 0.1)
    nv, nC, nx = g2p_fn(x, grid3, offs, off)

    ctx = lt.ChunkCtx(offs=offs, ok=jnp.asarray(True))
    nv_j, nC_j = lt.g2p_local(scene, PLAN, x, grid3.T.reshape(-1, 3),
                              ctx, off, D)
    np.testing.assert_allclose(np.asarray(nv), np.asarray(nv_j),
                               atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(nC), np.asarray(nC_j),
                               atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(nx), np.asarray(_advect(scene, x, nv_j)), atol=1e-6)


def test_p2g_backward_matches_vjp():
    scene, x, v, affine, offs, off = _setup(seed=3)
    p2g_fn = pal.transfer_fns(scene, PLAN, D, interpret=True)[0]
    rng = np.random.default_rng(4)
    ct = jnp.asarray(rng.standard_normal((4, D ** 3)).astype(np.float32))

    _, vjp = jax.vjp(lambda a, b, c: p2g_fn(a, b, c, offs, off), x, v, affine)
    gx, gv, gaff = vjp(ct)

    ctx = lt.ChunkCtx(offs=offs, ok=jnp.asarray(True))

    def jnp_p2g(a, b, c):
        gvv, gmm = lt.p2g_local(scene, PLAN, a, b, c, ctx, off, D)
        return jnp.concatenate([gvv.T, gmm[None]], axis=0)

    _, vjp_j = jax.vjp(jnp_p2g, x, v, affine)
    gx_j, gv_j, gaff_j = vjp_j(ct)

    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_j),
                               atol=5e-6, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gaff), np.asarray(gaff_j),
                               atol=5e-6, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_j),
                               atol=2e-4, rtol=1e-3)


def test_g2p_backward_matches_vjp():
    scene, x, v, affine, offs, off = _setup(seed=5)
    g2p_fn = pal.transfer_fns(scene, PLAN, D, interpret=True)[1]
    rng = np.random.default_rng(6)
    grid3 = jnp.asarray(
        rng.standard_normal((3, D ** 3)).astype(np.float32) * 0.1)
    ct_v = jnp.asarray(rng.standard_normal((x.shape[0], 3)).astype(np.float32))
    ct_C = jnp.asarray(
        rng.standard_normal((x.shape[0], 3, 3)).astype(np.float32))
    ct_x = jnp.asarray(rng.standard_normal((x.shape[0], 3)).astype(np.float32))

    _, vjp = jax.vjp(lambda a, g: g2p_fn(a, g, offs, off), x, grid3)
    gx, ggrid = vjp((ct_v, ct_C, ct_x))

    ctx = lt.ChunkCtx(offs=offs, ok=jnp.asarray(True))

    def jnp_g2p(a, g):
        nv, nC = lt.g2p_local(scene, PLAN, a, g.T.reshape(-1, 3), ctx, off, D)
        return nv, nC, _advect(scene, a, nv)

    _, vjp_j = jax.vjp(jnp_g2p, x, grid3)
    gx_j, ggrid_j = vjp_j((ct_v, ct_C, ct_x))

    np.testing.assert_allclose(np.asarray(ggrid), np.asarray(ggrid_j),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_j),
                               atol=2e-3, rtol=1e-3)


def test_mass_kernel_matches_dense():
    from plasticinelab_tpu.engine.transfer import axis_weights, p2g_dense

    scene, x, v, affine, offs, off = _setup(seed=7)
    mass_rows = pal.mass_fns(scene, PLAN, D, interpret=True)
    n = x.shape[0]
    P = PLAN.P
    n_pad = ((n + P - 1) // P) * P
    rows4 = pal._pack4(x, n_pad)
    gm = mass_rows(rows4, offs, off)

    aw = axis_weights(scene, x, D, off=off)
    gm_ref = p2g_dense(scene, aw, jnp.zeros((n, 3), jnp.float32),
                       jnp.zeros((n, 3, 3), jnp.float32), D)[1]
    np.testing.assert_allclose(np.asarray(gm), np.asarray(gm_ref),
                               atol=2e-7, rtol=1e-4)


def test_mass_kernel_backward_matches_dense_vjp():
    from plasticinelab_tpu.engine.transfer import axis_weights, p2g_dense

    scene, x, v, affine, offs, off = _setup(seed=8)
    mass_rows = pal.mass_fns(scene, PLAN, D, interpret=True)
    n = x.shape[0]
    P = PLAN.P
    n_pad = ((n + P - 1) // P) * P
    rng = np.random.default_rng(9)
    ct = jnp.asarray(rng.standard_normal((D ** 3,)).astype(np.float32))

    def f(xx):
        return mass_rows(pal._pack4(xx, n_pad), offs, off)

    _, vjp = jax.vjp(f, x)
    (gx,) = vjp(ct)

    def f_ref(xx):
        aw = axis_weights(scene, xx, D, off=off)
        return p2g_dense(scene, aw, jnp.zeros((n, 3), jnp.float32),
                         jnp.zeros((n, 3, 3), jnp.float32), D)[1]

    _, vjp_r = jax.vjp(f_ref, x)
    (gx_r,) = vjp_r(ct)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r),
                               atol=2e-4, rtol=1e-3)
