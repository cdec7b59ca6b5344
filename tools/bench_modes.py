"""Compare trajectory-gradient wallclock across remat modes on the chip."""
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(remat, horizon):
    import jax
    import jax.numpy as jnp

    from plasticinelab_tpu.config.loader import load_scene
    from plasticinelab_tpu.engine import losses as losses_mod
    from plasticinelab_tpu.engine import mpm
    from plasticinelab_tpu.engine.shapes import build_particles
    from plasticinelab_tpu.engine.state import default_materials, initial_state

    spec_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plasticinelab_tpu", "envs", "specs", "move-v1.json",
    )
    scene = load_scene(spec_path)
    particles, _ = build_particles(scene.shapes)
    scene = scene.with_n_particles(len(particles))
    scene = scene.replace(
        simulator=dataclasses.replace(scene.simulator, remat=remat))
    mats = default_materials(scene)
    state = initial_state(scene, particles)
    asset = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plasticinelab_tpu", "envs", "assets", scene.env.loss.target_path)
    loss_state = losses_mod.make_loss_state(scene, np.load(asset))
    softness = jnp.float32(666.0)

    def rollout_loss(state0, actions):
        def step_fn(carry, action):
            st, gm, off = mpm.env_step_with_grid_m(
                scene, mats, carry, action, softness)
            info = losses_mod.loss_from_crop(scene, loss_state, gm, off, st)
            return st, info["loss"]

        if remat in ("env_step", "both"):
            step_fn = jax.checkpoint(step_fn)
        _, per_step = jax.lax.scan(step_fn, state0, actions)
        return jnp.sum(per_step)

    vg = jax.jit(jax.value_and_grad(rollout_loss, argnums=1))
    actions = jnp.asarray(
        np.random.default_rng(0).uniform(-1e-4, 1e-4,
                                         (horizon, scene.action_dim)),
        dtype=jnp.float32)
    t0 = time.perf_counter()
    loss, grad = vg(state, actions)
    jax.block_until_ready(grad)
    t_compile = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        loss, grad = vg(state, actions)
        jax.block_until_ready(grad)
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"remat={remat!r:10s} horizon={horizon:3d} compile={t_compile:7.1f}s"
          f" best={best:7.4f}s  -> {horizon * 19 / best:7.1f} substeps/s"
          f"  loss={float(loss):.4f}", flush=True)


if __name__ == "__main__":
    remat = sys.argv[1] if len(sys.argv) > 1 else "substep"
    horizon = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    run(remat, horizon)
