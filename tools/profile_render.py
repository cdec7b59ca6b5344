"""Profile the renderer on the chip: (a) the raw XLA gather cost model
(fixed per-op cost vs per-index cost, row width sweep), (b) per-component
frame cost (next_hit depth sweep, occluded, ghost pass, voxelize/pack).

Usage: python tools/profile_render.py [gather|frame|march]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(fn, *args, n=5):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def profile_gather():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    table_rows = 168 ** 3
    print("rows = table row count gathered per op; width = row width (bf16)")
    for width in (1, 8, 16):
        tab = jnp.asarray(
            rng.standard_normal((table_rows, width)), jnp.bfloat16)
        for R in (2 ** 15, 2 ** 18, 2 ** 20):
            idx = jnp.asarray(rng.integers(0, table_rows, R), jnp.int32)

            @jax.jit
            def g(tab, idx):
                return tab[idx].astype(jnp.float32).sum()

            t = bench(g, tab, idx)
            print(f"width={width:3d} R={R:8d} t={t*1e3:8.3f} ms "
                  f"ns/idx={t/R*1e9:7.2f}")

    # K-burst shape: gather (R, K) indices in one op vs K ops of R
    tab = jnp.asarray(rng.standard_normal((table_rows, 8)), jnp.bfloat16)
    R = 2 ** 18
    for K in (1, 2, 4, 8):
        idx = jnp.asarray(rng.integers(0, table_rows, (R, K)), jnp.int32)

        @jax.jit
        def g(tab, idx):
            return tab[idx].astype(jnp.float32).sum()

        t = bench(g, tab, idx)
        print(f"burst K={K} R={R} t={t*1e3:8.3f} ms ns/idx={t/(R*K)*1e9:7.2f}")

    # sorted / coherent indices (rays in a tile hit nearby voxels)
    idx_sorted = jnp.sort(jnp.asarray(rng.integers(0, table_rows, R), jnp.int32))
    @jax.jit
    def g(tab, idx):
        return tab[idx].astype(jnp.float32).sum()
    t = bench(g, tab, idx_sorted)
    print(f"sorted  R={R} t={t*1e3:8.3f} ms ns/idx={t/R*1e9:7.2f}")

    # small table (the coarse skip field)
    small = jnp.asarray(rng.standard_normal((42 ** 3,)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 42 ** 3, R), jnp.int32)
    @jax.jit
    def g(tab, idx):
        return tab[idx].sum()
    t = bench(g, small, idx)
    print(f"skip-field gather R={R} t={t*1e3:8.3f} ms ns/idx={t/R*1e9:7.2f}")


def _scene_textures():
    from plasticinelab_tpu.config.loader import load_scene
    from plasticinelab_tpu.engine.renderer import Renderer
    from plasticinelab_tpu.engine.shapes import build_particles
    from plasticinelab_tpu.engine.state import initial_state

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene = load_scene(os.path.join(
        here, "plasticinelab_tpu", "envs", "specs", "move-v1.json"))
    particles, colors = build_particles(scene.shapes)
    scene = scene.with_n_particles(len(particles))
    state = initial_state(scene, particles)
    r = Renderer(scene)
    r.set_target_density(np.load(os.path.join(
        here, "plasticinelab_tpu", "envs", "assets",
        scene.env.loss.target_path)) / scene.simulator.p_mass)
    args = (np.asarray(state.x), colors, np.asarray(state.prim_pos),
            np.asarray(state.prim_rot), np.asarray(state.prim_gap))
    return r, args


def profile_frame():
    import jax
    import jax.numpy as jnp

    r, args = _scene_textures()
    t0 = time.perf_counter()
    textures = r._prepare_textures(*args)
    jax.block_until_ready(textures[:6])
    print(f"prepare_textures (cold): {time.perf_counter()-t0:.3f} s")
    t0 = time.perf_counter()
    textures = r._prepare_textures(*args)
    jax.block_until_ready(textures[:6])
    print(f"prepare_textures (warm): {time.perf_counter()-t0:.3f} s")

    W, H = r.image_res
    key = jax.random.PRNGKey(0)

    # full sample, plain and ghost
    for tflag in (False, True):
        fn = r._build_render_many(1, 1, tflag)
        t = bench(fn, textures, key, 1, 1, n=3)
        print(f"render 1 spp target={int(tflag)}: {t:.4f} s")

    # next_hit / occluded in isolation on primary rays
    next_hit, occluded = r._build_tracer(1, 1, 0)
    next_hit_t, occluded_t = r._build_tracer(1, 1, 1)

    uu = np.arange(W, dtype=np.float32)[:, None] + 0.5
    vv = np.arange(H, dtype=np.float32)[None, :] + 0.5
    FOV = 0.23
    dx_ = 2 * FOV * uu / H - FOV * r.aspect_ratio - 1e-5
    dy_ = 2 * FOV * vv / H - FOV - 1e-5
    d = np.stack([np.broadcast_to(dx_, (W, H)),
                  np.broadcast_to(dy_, (W, H)),
                  -np.ones((W, H), np.float32)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    r0, r1 = r.camera_rot
    rot_y = np.array([[np.cos(r1), 0, np.sin(r1)], [0, 1, 0],
                      [-np.sin(r1), 0, np.cos(r1)]])
    rot_x = np.array([[1, 0, 0], [0, np.cos(r0), np.sin(r0)],
                      [0, -np.sin(r0), np.cos(r0)]])
    d = (d.reshape(-1, 3) @ (rot_y @ rot_x).T).astype(np.float32)
    o = np.broadcast_to(r.camera_pos, (W * H, 3)).astype(np.float32)
    o, d = jnp.asarray(o), jnp.asarray(d)
    alive = jnp.ones((W * H,), bool)

    jh = jax.jit(lambda tx, o, d, a: next_hit(tx, o, d, a))
    t = bench(jh, textures, o, d, alive, n=3)
    print(f"next_hit primary (plain): {t:.4f} s")
    jh = jax.jit(lambda tx, o, d, a: next_hit_t(tx, o, d, a))
    t = bench(jh, textures, o, d, alive, n=3)
    print(f"next_hit primary (ghost): {t:.4f} s")

    light = np.asarray(r.light_direction, np.float32)
    light = light / np.linalg.norm(light)
    dl = jnp.broadcast_to(jnp.asarray(light), (W * H, 3))
    jo = jax.jit(lambda tx, o, d, a: occluded(tx, o, d, a))
    t = bench(jo, textures, o, dl, alive, n=3)
    print(f"occluded (plain, all-alive): {t:.4f} s")
    jo = jax.jit(lambda tx, o, d, a: occluded_t(tx, o, d, a))
    t = bench(jo, textures, o, dl, alive, n=3)
    print(f"occluded (ghost, all-alive): {t:.4f} s")

    # march only (no primitives, no planes)
    next_hit_m, _ = r._build_tracer(1, 0, 0)
    jm = jax.jit(lambda tx, o, d, a: next_hit_m(tx, o, d, a))
    t = bench(jm, textures, o, d, alive, n=3)
    print(f"next_hit march-only: {t:.4f} s")
    next_hit_p, _ = r._build_tracer(0, 1, 0)
    jp = jax.jit(lambda tx, o, d, a: next_hit_p(tx, o, d, a))
    t = bench(jp, textures, o, d, alive, n=3)
    print(f"next_hit prims+planes only: {t:.4f} s")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "frame"
    if which == "gather":
        profile_gather()
    else:
        profile_frame()
