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
