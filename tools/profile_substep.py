"""Per-piece timing of the Move-v1 substep on the real chip.

Times (steady-state, jitted):
  - forward-only env_step (19 substeps)
  - value_and_grad of one env_step
  - full 50-step trajectory fwd-only and fwd+bwd
  - isolated pieces: stress_affine_rows, p2g_rows, grid_op_cm, g2p_rows
Prints a table; use to target the next kernel-fusion round.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=20, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from plasticinelab_tpu.config.loader import load_scene
    from plasticinelab_tpu.engine import losses as losses_mod
    from plasticinelab_tpu.engine import local_transfer, mpm
    from plasticinelab_tpu.engine.shapes import build_particles
    from plasticinelab_tpu.engine.state import default_materials, initial_state
    from plasticinelab_tpu.engine.transfer import crop_size

    spec_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plasticinelab_tpu", "envs", "specs", "move-v1.json",
    )
    scene = load_scene(spec_path)
    particles, _ = build_particles(scene.shapes)
    scene = scene.with_n_particles(len(particles))
    mats = default_materials(scene)
    state = initial_state(scene, particles)
    D = crop_size(scene)
    plan = local_transfer.plan_for(scene, D)
    print(f"n={scene.simulator.n_particles} D={D} plan P={plan.P} Lx={plan.Lx} "
          f"Ly={plan.Ly}", file=sys.stderr)

    softness = jnp.float32(666.0)
    action = jnp.zeros((scene.action_dims[-1],), jnp.float32)

    # --- env step level ---
    step = jax.jit(lambda s, a: mpm.env_step(scene, mats, s, a, softness))
    t_fwd = timeit(step, state, action)

    def step_loss(s, a):
        st = mpm.env_step(scene, mats, s, a, softness)
        return jnp.sum(st.x) + jnp.sum(st.v)

    vg = jax.jit(jax.value_and_grad(step_loss, argnums=(0, 1)))
    t_vg = timeit(vg, state, action)

    # --- isolated pieces on rows layout ---
    n = scene.simulator.n_particles
    N = mpm.rows_pad(scene, n)
    rows = jnp.concatenate(
        [state.x.T, state.v.T, state.C.reshape(n, 9).T,
         state.F.reshape(n, 9).T], axis=0).astype(jnp.float32)
    key = local_transfer.sort_keys_cols(scene, rows[0:3], n)
    rows, order, rank = local_transfer.sort_cols(key, rows)
    rows = mpm._pad_rows_cols(rows, n, N)
    x3 = rows[0:3]
    off = local_transfer.crop_offset_cols(scene, x3, D)
    ctx = local_transfer.chunk_offsets_cols(scene, plan, x3, off, D, n)
    offs = ctx.offs
    maskr = (jnp.arange(N, dtype=jnp.int32)[None, :] < n).astype(jnp.float32)

    from plasticinelab_tpu.engine import pallas_local
    from plasticinelab_tpu.engine.pallas_stress import stress_affine_rows

    REP = 19  # scan each piece 19x inside one jit call: amortizes the
    # ~1.6 ms per-dispatch latency of the tunneled chip

    def scan19(f):
        """f: carry -> carry, same shape. Returns jitted 19x iterate."""
        def run(c0):
            return jax.lax.scan(lambda c, _: (f(c), None), c0, None,
                                length=REP)[0]
        return jax.jit(run)

    sa = stress_affine_rows(scene, mats)
    sa_j = scan19(lambda r: jnp.concatenate([r[0:9], sa(r)[0:9]], axis=0))
    t_sa = timeit(sa_j, rows[6:24]) / REP

    outCF = jax.jit(sa)(rows[6:24])
    aff9 = outCF[9:18]
    rows16 = jnp.concatenate([x3, rows[3:6], aff9, maskr], axis=0)
    _, _, p2g_rows, g2p_rows_fn = pallas_local.transfer_fns(scene, plan, D)

    def chain(f):
        """Time f: x -> y iterated 19x with a tiny serializing feedback."""
        def step(c, _):
            x0, out_prev = c
            out = f(x0 * (1.0 + 1e-30 * out_prev))
            return (x0, jnp.sum(out) * 0.0 + out_prev), None
        def run(x0):
            return jax.lax.scan(step, (x0, jnp.float32(0)), None,
                                length=REP)[0][1]
        return jax.jit(run)

    t_p2g = timeit(chain(lambda r: p2g_rows(r, offs, off)), rows16) / REP
    grid4 = jax.jit(lambda r: p2g_rows(r, offs, off))(rows16)

    poses = (state.prim_pos.astype(jnp.float32),
             state.prim_rot.astype(jnp.float32),
             state.prim_gap.astype(jnp.float32))
    ctrl = mpm.make_controls(scene, action, jnp.float32)
    poses1 = mpm._fk_step(scene, poses, ctrl)
    gop = lambda g: mpm.grid_op_cm(scene, g, poses, poses1, softness, D, off)
    t_gop = timeit(chain(gop), grid4) / REP
    gv3 = jax.jit(gop)(grid4)

    rows4 = jnp.concatenate([x3, maskr], axis=0)
    t_g2p = timeit(
        chain(lambda g: g2p_rows_fn(rows4, g, offs, off)),
        gv3.reshape(3, D ** 3)) / REP

    # piece backward costs (grad of sum, 19x chained)
    t_sa_vg = timeit(
        chain(jax.grad(lambda r18: jnp.sum(sa(r18)))), rows[6:24]) / REP
    t_p2g_vg = timeit(
        chain(jax.grad(lambda r16: jnp.sum(p2g_rows(r16, offs, off)))),
        rows16) / REP
    t_gop_vg = timeit(chain(jax.grad(lambda g: jnp.sum(gop(g)))), grid4) / REP
    t_g2p_vg = timeit(
        chain(jax.grad(
            lambda g: jnp.sum(g2p_rows_fn(rows4, g, offs, off)))),
        gv3.reshape(3, D ** 3)) / REP

    # sort/unsort overhead (once per env step, so NOT divided by 19)
    def sort_fn(r):
        k = local_transfer.sort_keys_cols(scene, r[0:3], n)
        rs, o_, rk = local_transfer.sort_cols(k, r)
        return local_transfer.unsort_cols(o_, rk, rs)
    t_sort = timeit(chain(sort_fn), rows[:, :n]) / REP

    pieces_fwd = t_sa + t_p2g + t_gop + t_g2p
    print(f"env_step fwd (19 substeps):        {t_fwd*1e3:8.3f} ms"
          f"  ({t_fwd/19*1e6:7.1f} us/substep)")
    print(f"env_step value_and_grad:           {t_vg*1e3:8.3f} ms"
          f"  ({t_vg/19*1e6:7.1f} us/substep)")
    print(f"  stress_affine_rows fwd:          {t_sa*1e6:8.1f} us")
    print(f"  p2g_rows fwd:                    {t_p2g*1e6:8.1f} us")
    print(f"  grid_op_cm fwd:                  {t_gop*1e6:8.1f} us")
    print(f"  g2p_rows fwd:                    {t_g2p*1e6:8.1f} us")
    print(f"  sum of pieces fwd:               {pieces_fwd*1e6:8.1f} us"
          f"  vs measured {t_fwd/19*1e6:.1f}")
    print(f"  stress_affine grad:              {t_sa_vg*1e6:8.1f} us")
    print(f"  p2g grad:                        {t_p2g_vg*1e6:8.1f} us")
    print(f"  grid_op_cm grad:                 {t_gop_vg*1e6:8.1f} us")
    print(f"  g2p grad:                        {t_g2p_vg*1e6:8.1f} us")
    print(f"  sort+unsort (per env step):      {t_sort*1e6:8.1f} us")


if __name__ == "__main__":
    main()
