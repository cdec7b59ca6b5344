"""Pallas grid_op kernels (interpret mode) vs mpm.grid_op_cm: forward and
the in-kernel-vjp backward (grid AND pose cotangents)."""
import jax
import jax.numpy as jnp
import numpy as np

from plasticinelab_tpu.config.spec import (PrimitiveSpec, SceneSpec,
                                           ShapeSpec, SimulatorSpec)
from plasticinelab_tpu.engine import mpm
from plasticinelab_tpu.engine import pallas_gridop as pgo

D = 24


def _scene():
    sim = SimulatorSpec(quality=0.5, n_particles=300, dtype="float32")
    prims = (
        PrimitiveSpec(shape="Sphere", radius=0.08, init_pos=(0.5, 0.4, 0.5),
                      friction=0.9, action_dim=3,
                      action_scale=(0.01,) * 3),
        PrimitiveSpec(shape="Capsule", h=0.06, r=0.03,
                      init_pos=(0.6, 0.45, 0.5), friction=0.5, action_dim=3,
                      action_scale=(0.01,) * 3),
    )
    return SceneSpec(
        simulator=sim, primitives=prims,
        shapes=(ShapeSpec(shape="box", init_pos=(0.5, 0.35, 0.5), width=0.1),),
    )


def _inputs(seed=0):
    scene = _scene()
    rng = np.random.default_rng(seed)
    g4 = jnp.asarray(rng.standard_normal((4, D ** 3)).astype(np.float32))
    # mass channel nonnegative with some empty cells
    g4 = g4.at[3].set(jnp.abs(g4[3]) * (g4[3] > -0.5))
    off = jnp.asarray([2, 1, 3], jnp.int32)
    k = len(scene.primitives)
    pos_f = jnp.asarray(rng.uniform(0.3, 0.7, (k, 3)).astype(np.float32))
    rot_raw = rng.standard_normal((k, 4)).astype(np.float32)
    rot_f = jnp.asarray(rot_raw / np.linalg.norm(rot_raw, axis=1,
                                                 keepdims=True))
    gap_f = jnp.asarray(rng.uniform(0.0, 0.1, (k,)).astype(np.float32))
    pos_f1 = pos_f + 0.001
    rot_f1 = rot_f
    gap_f1 = gap_f + 0.0005
    softness = jnp.float32(666.0)
    return scene, g4, off, (pos_f, rot_f, gap_f), (pos_f1, rot_f1, gap_f1), \
        softness


def _pack(pose_f, pose_f1):
    pf = jnp.concatenate([pose_f[0], pose_f[1], pose_f1[0], pose_f1[1]],
                         axis=1)
    gap2 = jnp.stack([pose_f[2], pose_f1[2]], axis=1)
    return pf, gap2


def test_gridop_forward_matches_cm():
    scene, g4, off, pose_f, pose_f1, softness = _inputs()
    fn = pgo.grid_op_fns(scene, D, interpret=True)
    pf, gap2 = _pack(pose_f, pose_f1)
    out = fn(g4, pf, gap2, softness, off)
    ref = mpm.grid_op_cm(scene, g4, pose_f, pose_f1, softness, D, off)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=2e-4)


def test_gridop_backward_matches_cm_vjp():
    scene, g4, off, pose_f, pose_f1, softness = _inputs(seed=1)
    fn = pgo.grid_op_fns(scene, D, interpret=True)
    pf, gap2 = _pack(pose_f, pose_f1)
    rng = np.random.default_rng(2)
    ct = jnp.asarray(rng.standard_normal((3, D ** 3)).astype(np.float32))

    _, vjp = jax.vjp(lambda a, b, c: fn(a, b, c, softness, off), g4, pf, gap2)
    dg4, dpf, dgap = vjp(ct)

    def ref(a, b, c):
        pose_f_ = (b[:, 0:3], b[:, 3:7], c[:, 0])
        pose_f1_ = (b[:, 7:10], b[:, 10:14], c[:, 1])
        return mpm.grid_op_cm(scene, a, pose_f_, pose_f1_, softness, D, off)

    _, vjp_r = jax.vjp(ref, g4, pf, gap2)
    dg4_r, dpf_r, dgap_r = vjp_r(ct)

    np.testing.assert_allclose(np.asarray(dg4), np.asarray(dg4_r),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dpf), np.asarray(dpf_r),
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dgap), np.asarray(dgap_r),
                               atol=1e-3, rtol=1e-4)
