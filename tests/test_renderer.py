"""Renderer smoke tests on a tiny configuration (CPU-friendly)."""
import dataclasses

import numpy as np
import pytest

from plasticinelab_tpu.config.spec import (
    PrimitiveSpec, RendererSpec, SceneSpec, SimulatorSpec,
)
from plasticinelab_tpu.engine.renderer import Renderer


def _tiny_scene():
    ren = RendererSpec(
        spp=2, image_res=(16, 16), voxel_res=(32, 32, 32),
        target_res=(16, 16, 16), use_directional_light=False,
    )
    prim = PrimitiveSpec(shape="Sphere", radius=0.06, init_pos=(0.5, 0.4, 0.5),
                         color=(0.7, 0.7, 0.7), action_dim=3,
                         action_scale=(0.01,) * 3)
    return SceneSpec(
        simulator=SimulatorSpec(quality=0.25, n_particles=200),
        primitives=(prim,), renderer=ren,
    )


@pytest.fixture(scope="module")
def rendered():
    scene = _tiny_scene()
    r = Renderer(scene)
    rng = np.random.default_rng(0)
    x = (rng.random((200, 3)) * 0.1 + 0.45).astype(np.float32)
    colors = np.full(200, (127 << 16) + 127, np.int32)
    prim_pos = np.array([[0.5, 0.4, 0.5]], np.float32)
    prim_rot = np.array([[1.0, 0, 0, 0]], np.float32)
    prim_gap = np.zeros(1, np.float32)

    G = 16
    target = np.zeros((G, G, G))
    target[6:10, 6:10, 6:10] = 8.0
    r.set_target_density(target)

    img = r.render_frame(x, colors, prim_pos, prim_rot, prim_gap, spp=2,
                         target=1)
    return img


def test_render_shape_and_range(rendered):
    assert rendered.shape == (16, 16, 3)
    assert np.all(np.isfinite(rendered))
    assert rendered.max() > 0.05, "image is all black"
    assert rendered.min() >= 0.0


def test_render_has_spatial_structure(rendered):
    # sky vs ground vs plasticine should differ somewhere
    flat = rendered.reshape(-1, 3)
    assert np.unique(flat.round(2), axis=0).shape[0] > 5


# ---------------------------------------------------------------------------
# pinned-structure probes: known hit distances / normals (reference next_hit,
# plb/engine/renderer/renderer.py:202-325)
# ---------------------------------------------------------------------------

def _probe_setup():
    scene = _tiny_scene()
    r = Renderer(scene)
    # dense plasticine cube away from the probe rays: a 7^3 grid spaced
    # about one voxel apart so the smoothed SDF dips well below threshold
    g = np.linspace(0.27, 0.33, 7)
    x = np.stack(np.meshgrid(g, g - 0.15, g, indexing="ij"),
                 axis=-1).reshape(-1, 3).astype(np.float32)
    colors = np.full(len(x), (127 << 16) + 127, np.int32)
    prim_pos = np.array([[0.5, 0.4, 0.5]], np.float32)
    prim_rot = np.array([[1.0, 0, 0, 0]], np.float32)
    prim_gap = np.zeros(1, np.float32)
    return r, x, colors, prim_pos, prim_rot, prim_gap


def test_probe_sphere_hit_distance_and_normal():
    r, x, colors, prim_pos, prim_rot, prim_gap = _probe_setup()
    o = np.array([[0.5, 0.4, 2.0]], np.float32)
    d = np.array([[0.0, 0.0, -1.0]], np.float32)
    closest, normal, color = r.probe_rays(
        x, colors, prim_pos, prim_rot, prim_gap, o, d, shape=0)
    # sphere at z=0.5 radius 0.06: first surface crossing at 2.0-0.56
    np.testing.assert_allclose(closest[0], 1.44, atol=2e-3)
    np.testing.assert_allclose(normal[0], [0, 0, 1], atol=1e-2)
    np.testing.assert_allclose(color[0], [0.7, 0.7, 0.7], atol=1e-6)


def test_probe_ground_plane():
    r, x, colors, prim_pos, prim_rot, prim_gap = _probe_setup()
    o = np.array([[0.9, 0.5, 0.9]], np.float32)
    d = np.array([[0.0, -1.0, 0.0]], np.float32)
    closest, normal, _ = r.probe_rays(
        x, colors, prim_pos, prim_rot, prim_gap, o, d, shape=0, primitive=0)
    # ground plane y = -0.002 (reference :220-228)
    np.testing.assert_allclose(closest[0], 0.502, atol=1e-5)
    np.testing.assert_allclose(normal[0], [0, 1, 0], atol=1e-6)


def test_probe_plasticine_march():
    r, x, colors, prim_pos, prim_rot, prim_gap = _probe_setup()
    cx = x.mean(0)
    o = np.array([[cx[0], cx[1], 2.0]], np.float32)
    d = np.array([[0.0, 0.0, -1.0]], np.float32)
    closest, normal, _ = r.probe_rays(
        x, colors, prim_pos, prim_rot, prim_gap, o, d, primitive=0)
    zmax = x[:, 2].max()
    # hit inside the smoothed shell around the blob's near face: between
    # one voxel before the frontmost particle and the blob's far side
    assert 2.0 - zmax - 3 * r.dx < closest[0] < 2.0 - x[:, 2].min() + 3 * r.dx
    assert normal[0, 2] > 0.3  # outward-ish toward the ray


@pytest.mark.slow
def test_compacted_march_equals_packed():
    """_march_compacted (chunked actives-first processing) must reproduce
    _march_packed exactly — same hits, same distances."""
    import jax.numpy as jnp

    from plasticinelab_tpu.engine.renderer import renderer as R

    scene = _tiny_scene()
    r = Renderer(scene)
    rng = np.random.default_rng(0)
    # dense 7^3 blob (as in _probe_setup) so the smoothed SDF reliably dips
    # below threshold
    g = np.linspace(0.27, 0.33, 7)
    x = np.stack(np.meshgrid(g, g - 0.15, g, indexing="ij"),
                 axis=-1).reshape(-1, 3).astype(np.float32)
    colors = np.full(len(x), (127 << 16) + 127, np.int32)
    tex = r._prepare_textures(x, colors,
                              np.array([[0.5, 0.4, 0.5]], np.float32),
                              np.array([[1.0, 0, 0, 0]], np.float32),
                              np.zeros(1, np.float32))
    sdf_pack, _, _, bbox, _, _, _ = tex

    n = 256
    o = jnp.asarray(np.stack([
        rng.random(n) * 0.1 + 0.25,
        rng.random(n) * 0.1 + 0.10,
        np.full(n, 2.0, np.float32)], -1), jnp.float32)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
    isect, tnear, tfar = R._ray_aabb(bbox[0], bbox[1], o, d)
    t0 = jnp.maximum(tnear, 0.0) + 1e-4
    active = isect & (jnp.arange(n) % 3 != 0)  # mix of inactive lanes

    res = r.voxel_res
    args = (sdf_pack, res, bbox, r.sdf_threshold, 0.01, r.dx,
            o, d, t0, tfar, active)
    hit_a, t_a = R._march_packed(*args)
    hit_b, t_b = R._march_compacted(*args, chunk=64)
    np.testing.assert_array_equal(np.asarray(hit_a), np.asarray(hit_b))
    np.testing.assert_allclose(np.asarray(t_a)[np.asarray(hit_a)],
                               np.asarray(t_b)[np.asarray(hit_b)], rtol=1e-6)
    assert int(np.sum(hit_a)) > 0  # some rays must actually hit

    # refine variant agrees with march + full-width refine
    t_ref = R._refine_packed(sdf_pack, res, bbox, r.sdf_threshold, 0.01,
                             o, d, hit_a, t_a)
    _, t_c = R._march_compacted(*args, chunk=64, refine=True)
    np.testing.assert_allclose(np.asarray(t_ref)[np.asarray(hit_a)],
                               np.asarray(t_c)[np.asarray(hit_a)], rtol=1e-6)
