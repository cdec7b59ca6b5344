"""Config loader semantics, shape sampling reproducibility, loss math."""
import json
import os

import jax.numpy as jnp
import numpy as np

from plasticinelab_tpu.config.loader import (
    load_scene, load_scene_dict, resolve_variant, scene_from_dict,
)
from plasticinelab_tpu.config.spec import SceneSpec, SimulatorSpec
from plasticinelab_tpu.engine import losses as L
from plasticinelab_tpu.engine.shapes import build_particles

SPEC_DIR = os.path.join(
    os.path.dirname(__file__), "..", "plasticinelab_tpu", "envs", "specs"
)


def test_simulator_derived_quantities_match_reference():
    """mpm_simulator.py:15-34 formulas at quality=1, dim=3."""
    sim = SimulatorSpec()
    assert sim.n_grid == 64
    assert sim.dx == 1 / 64
    assert sim.dt == 1e-4
    assert sim.substeps == 19       # int(2e-3 // 1e-4) under float floor
    assert sim.p_vol == (sim.dx * 0.5) ** 2
    np.testing.assert_allclose(sim.mu_0, 5e3 / (2 * 1.2))
    np.testing.assert_allclose(sim.lam_0, 5e3 * 0.2 / (1.2 * 0.6))


def test_all_50_specs_load():
    names = sorted(os.listdir(SPEC_DIR))
    assert len(names) == 50
    for n in names:
        scene = load_scene(os.path.join(SPEC_DIR, n))
        assert isinstance(scene, SceneSpec)
        assert len(scene.shapes) >= 1
        assert scene.env.loss.target_path.endswith(".npy")


def test_variant_merge_semantics():
    cfg = {
        "SIMULATOR": {"n_particles": 1000},
        "PRIMITIVES": [
            {"shape": "Sphere", "radius": 0.03, "init_pos": "(0.1, 0.2, 0.3)",
             "action": {"dim": 3, "scale": "(0.01, 0.01, 0.01)"}},
        ],
        "SHAPES": [{"shape": "sphere", "radius": "0.2/2", "init_pos": "(0.5,0.5,0.5)"}],
        "ENV": {"loss": {"target_path": "envs/assets/Foo3D-v1.npy", "weight": {}}},
        "VARIANTS": [
            {},
            {"PRIMITIVES": [{"init_pos": "(0.9, 0.9, 0.9)"}]},
        ],
    }
    v2 = resolve_variant(cfg, 2)
    assert v2["ENV"]["loss"]["target_path"].endswith("Foo3D-v2.npy")
    scene = scene_from_dict(v2)
    assert scene.primitives[0].init_pos == (0.9, 0.9, 0.9)
    assert scene.primitives[0].radius == 0.03  # preserved from base
    assert scene.shapes[0].radius == 0.1       # eval of "0.2/2"
    v1 = resolve_variant(cfg, 1)
    assert scene_from_dict(v1).primitives[0].init_pos == (0.1, 0.2, 0.3)


def test_move_v1_matches_reference_numbers():
    scene = load_scene(os.path.join(SPEC_DIR, "move-v1.json"))
    assert scene.simulator.n_particles == 10000
    assert scene.simulator.yield_stress == 200.0
    assert [p.shape for p in scene.primitives] == ["Sphere", "Sphere"]
    assert scene.action_dim == 6
    np.testing.assert_allclose(scene.shapes[0].radius, 0.2049069760770578 / 2)
    assert scene.primitives[0].action_scale == (0.01, 0.01, 0.01)


def test_shape_sampling_seed0_reproducible_and_in_bounds():
    scene = load_scene(os.path.join(SPEC_DIR, "move-v1.json"))
    p1, c1 = build_particles(scene.shapes)
    p2, c2 = build_particles(scene.shapes)
    np.testing.assert_array_equal(p1, p2)
    assert len(p1) == 10000
    # inside the configured sphere
    center = np.asarray(scene.shapes[0].init_pos)
    r = scene.shapes[0].radius
    d = np.linalg.norm(p1 - center, axis=-1)
    assert d.max() <= r + 1e-12
    # reference sampling recipe reproduced exactly (shape_maker.py:60-72)
    state = np.random.get_state()
    np.random.seed(0)
    q = np.random.normal(size=(10000, 3))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    u = np.random.random(size=(10000, 1)) ** (1 / 3)
    expect = q * u * r + center
    np.random.set_state(state)
    np.testing.assert_allclose(p1, expect, atol=0)


def test_target_sdf_is_exact_edt():
    G = 8
    dx = 1.0 / G
    td = np.zeros((G, G, G))
    td[2, 3, 4] = 1.0  # single occupied cell
    sdf = L.precompute_target_sdf(td, dx)
    assert sdf[2, 3, 4] == 0.0
    # brute force distances
    for idx in [(0, 0, 0), (5, 3, 4), (2, 3, 7)]:
        want = np.linalg.norm((np.array(idx) - [2, 3, 4]) * dx)
        np.testing.assert_allclose(sdf[idx], want, rtol=1e-12)


def test_iou_self_is_one_for_binary():
    td = jnp.zeros((64,))
    td = td.at[10:20].set(1.0)
    np.testing.assert_allclose(float(L.iou(td, td)), 1.0, rtol=1e-6)


def test_loss_components_weighting():
    from plasticinelab_tpu.config.spec import LossSpec, EnvSpec, PrimitiveSpec
    import dataclasses

    sim = SimulatorSpec(quality=0.25, n_particles=32, dtype="float64")
    prim = PrimitiveSpec(shape="Sphere", radius=0.05, init_pos=(0.7, 0.5, 0.5),
                         action_dim=3, action_scale=(0.01,) * 3)
    loss_spec = LossSpec(weight_sdf=2.0, weight_density=3.0, weight_contact=5.0)
    scene = SceneSpec(simulator=sim, primitives=(prim,),
                      env=EnvSpec(loss=loss_spec))
    rng = np.random.default_rng(0)
    x = rng.random((32, 3)) * 0.2 + 0.4
    from plasticinelab_tpu.engine.state import initial_state

    state = initial_state(scene, x)
    G = sim.n_grid
    target = np.zeros((G, G, G))
    target[6:10, 6:10, 6:10] = sim.p_mass
    ls = L.make_loss_state(scene, target)
    info = L.loss_and_components(scene, ls, state)
    total = (
        2.0 * float(info["sdf_loss"])
        + 3.0 * float(info["density_loss"])
        + 5.0 * float(info["contact_loss"])
    )
    np.testing.assert_allclose(float(info["loss"]), total, rtol=1e-12)
    # hard contact = min distance from sphere surface to the cloud
    from plasticinelab_tpu.engine import primitives as P

    d = P.sdf(prim, state.prim_pos[0], state.prim_rot[0], state.prim_gap[0],
              state.x)
    np.testing.assert_allclose(
        float(info["contact_loss"]),
        float(jnp.min(jnp.maximum(d, 0.0))) ** 2, rtol=1e-12,
    )


def test_loss_from_crop_matches_global():
    """loss_from_crop's crop-decomposed L1/sdf/IoU equal the global-grid
    loss_and_components on the same state."""
    import jax.numpy as jnp
    import numpy as np

    from plasticinelab_tpu.config.loader import load_scene
    from plasticinelab_tpu.engine import losses as losses_mod
    from plasticinelab_tpu.engine import mpm
    from plasticinelab_tpu.engine.shapes import build_particles
    from plasticinelab_tpu.engine.state import default_materials, initial_state
    from plasticinelab_tpu.engine.transfer import axis_weights, crop_size, p2g_dense
    import os

    spec_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plasticinelab_tpu", "envs", "specs", "move-v1.json")
    scene = load_scene(spec_path)
    particles, _ = build_particles(scene.shapes)
    scene = scene.with_n_particles(len(particles))
    state = initial_state(scene, particles)
    asset = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plasticinelab_tpu", "envs", "assets", scene.env.loss.target_path)
    loss_state = losses_mod.make_loss_state(scene, np.load(asset))

    ref = losses_mod.loss_and_components(scene, loss_state, state)
    ref_iou = losses_mod.iou(ref["grid_m"], loss_state.target_density)

    D = crop_size(scene)
    n = state.x.shape[0]
    aw = axis_weights(scene, state.x, D)
    gm = p2g_dense(scene, aw, jnp.zeros((n, 3), state.x.dtype),
                   jnp.zeros((n, 3, 3), state.x.dtype), D)[1]
    out = losses_mod.loss_from_crop(scene, loss_state, gm, aw.off, state)

    for k in ("loss", "density_loss", "sdf_loss", "contact_loss"):
        np.testing.assert_allclose(float(out[k]), float(ref[k]), rtol=1e-5,
                                   atol=1e-6)
    np.testing.assert_allclose(float(out["iou"]), float(ref_iou), rtol=1e-5)
