"""Batched / multi-chip execution: vmapped envs sharded over a device mesh.

The reference has no distributed backend at all (SURVEY.md §2.9: single
ti.init, one env per process). Here batching is a first-class capability:
a SimState with a leading batch axis, vmapped physics, and a 1-D
jax.sharding.Mesh over the batch axis so XLA partitions the sweep over ICI.
Parameters / goal tensors are replicated; each env's 64^3 grid lives wholly
on one chip, so no halo exchange is needed — the only collective is the
mean-loss psum XLA inserts for the gradient.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config.spec import SceneSpec
from ..engine import losses as losses_mod
from ..engine import mpm
from ..engine.state import Materials, SimState

__all__ = ["make_mesh", "batch_states", "build_batched_rollout_grad"]


def _compiler_options():
    """Optional per-compile XLA:TPU knobs. PLB_SCOPED_VMEM_KIB raises the
    scoped-vmem stack limit (default 16 MiB) — large batched kernels'
    backward passes can exceed it when XLA stages a kernel output in
    vmem (observed at B=32, g2p backward)."""
    import os

    kib = os.environ.get("PLB_SCOPED_VMEM_KIB")
    if not kib:
        return {}
    return {"compiler_options": {"xla_tpu_scoped_vmem_limit_kib": int(kib)}}


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "env") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def batch_states(state: SimState, batch: int, jitter: float = 0.0,
                 seed: int = 0) -> SimState:
    """Tile one SimState into a leading batch axis (optionally jittering
    particle positions so envs decorrelate)."""
    tiled = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape).copy(), state
    )
    if jitter > 0:
        key = jax.random.PRNGKey(seed)
        noise = jax.random.uniform(
            key, tiled.x.shape, tiled.x.dtype, -jitter, jitter
        )
        tiled = tiled._replace(x=jnp.clip(tiled.x + noise, 0.0, 0.95))
    return tiled


def build_batched_rollout_grad(scene: SceneSpec, mats: Materials,
                               loss_state, mesh: Mesh, axis_name: str = "env",
                               out_mode: str = "force"):
    """Compile d(mean rollout loss)/d(actions) for a batch of envs sharded
    over `mesh`. actions: (B, T, action_dim); states: SimState with leading B.

    Per-env-step jax.checkpoint bounds HBM at ~one substep's activations per
    step regardless of horizon (SURVEY.md §5 long-horizon strategy).

    out_mode: "force" pins out_shardings to (replicated loss, batch-sharded
    grad); "auto" leaves them to XLA's propagation — used by the sharding
    test / dryrun to PROVE the compute partitioned (if the program silently
    replicated, propagation would not land P(axis) on the grad output).
    """

    import dataclasses

    # The rows/Pallas path batches directly (vmapped pallas_call grids,
    # fallback=False so no lax.cond runs both branches under vmap). Only
    # when it is unavailable (CPU tests, x64, tiny scenes) downgrade to the
    # vmappable chunked-dense transfer.
    if not mpm.use_rows_path(scene, jnp.float32):
        scene = dataclasses.replace(
            scene, simulator=dataclasses.replace(scene.simulator,
                                                 transfer="dense"))

    use_rows = mpm.use_rows_path(scene, jnp.float32)

    def rollout_loss(state0, actions, softness):
        @jax.checkpoint
        def step_fn(carry, action):
            st = mpm.env_step(scene, mats, carry, action, softness,
                              fallback=False)
            info = losses_mod.loss_and_components(scene, loss_state, st)
            return st, info["loss"]

        final, per_step = jax.lax.scan(step_fn, state0, actions)
        return jnp.sum(per_step)

    def rollout_losses_rows(states, actions_tb, softness):
        """All envs step together through the explicit batched kernels;
        actions_tb is time-major (T, B, A). Returns per-env loss sums."""
        # horizon and batch are static at trace time: resolve "auto" to
        # the cheapest policy whose stored state fits HBM (mpm.resolve_remat)
        rscene = mpm.resolve_remat(scene, int(actions_tb.shape[0]),
                                   int(states.x.shape[0]))

        def step_fn(carry, acts_t):
            st, gm, off = mpm.env_step_batched(
                rscene, mats, carry, acts_t, softness, want_grid_m=True)
            losses_t = jax.vmap(
                lambda g, o, s: losses_mod.loss_from_crop(
                    rscene, loss_state, g, o, s)["loss"])(gm, off, st)
            return st, losses_t

        # outer per-env-step checkpoint follows the resolved remat policy —
        # "both" bounds HBM for giant sweeps, "substep"-only skips the
        # third forward pass when per-step batched states fit (B x T x state)
        if rscene.simulator.remat in ("env_step", "both"):
            step_fn = jax.checkpoint(step_fn)

        _, per_step = jax.lax.scan(step_fn, states, actions_tb)
        return jnp.sum(per_step, axis=0)

    def batched_loss(states, actions, softness):
        if use_rows:
            losses_b = rollout_losses_rows(
                states, actions.transpose(1, 0, 2), softness)
        else:
            losses_b = jax.vmap(
                lambda s, a: rollout_loss(s, a, softness))(states, actions)
        return jnp.mean(losses_b)

    vg = jax.value_and_grad(batched_loss, argnums=1)

    if use_rows and len(mesh.devices.flat) > 1:
        # GSPMD cannot partition a pallas_call along the batch grid —
        # shard_map splits the batch explicitly so each device runs its own
        # kernels; the mean's psum is inserted by the grad of shard_map.
        from jax.experimental.shard_map import shard_map

        def sharded_loss(states, actions, softness):
            def per_shard(s, a):
                local = rollout_losses_rows(s, a.transpose(1, 0, 2),
                                            softness)
                return jax.lax.psum(jnp.sum(local), axis_name) / actions.shape[0]

            f = shard_map(per_shard, mesh=mesh,
                          in_specs=(P(axis_name), P(axis_name)),
                          out_specs=P(), check_rep=False)
            return f(states, actions)

        vg = jax.value_and_grad(sharded_loss, argnums=1)
        shard_b = NamedSharding(mesh, P(axis_name))
        replicated = NamedSharding(mesh, P())
        return jax.jit(vg, in_shardings=(shard_b, shard_b, replicated),
                       out_shardings=(replicated, shard_b))

    shard_b = NamedSharding(mesh, P(axis_name))      # shard leading batch axis
    replicated = NamedSharding(mesh, P())
    kw = ({"out_shardings": (replicated, shard_b)} if out_mode == "force"
          else {})
    return jax.jit(
        vg,
        in_shardings=(shard_b, shard_b, replicated),
        **kw,
        **_compiler_options(),
    )
