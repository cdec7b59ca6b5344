"""Simulation state as an immutable PyTree.

Replaces the reference's global time-indexed Taichi fields
(plb/engine/mpm_simulator.py:33-51, primive_base.py:31-44): one SimState per
instant; trajectories are lax.scan carries, autodiff is jax.grad through the
scan (no Tape, no 1024-frame buffers).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config.spec import SceneSpec


class SimState(NamedTuple):
    """Full differentiable state of one env at one instant."""

    x: jnp.ndarray         # (n, 3) particle positions
    v: jnp.ndarray         # (n, 3) particle velocities
    C: jnp.ndarray         # (n, 3, 3) APIC affine velocity field
    F: jnp.ndarray         # (n, 3, 3) deformation gradient
    prim_pos: jnp.ndarray  # (k, 3)
    prim_rot: jnp.ndarray  # (k, 4) unit quaternion (w, x, y, z)
    prim_gap: jnp.ndarray  # (k,) chopsticks opening (0 where unused)


class Controls(NamedTuple):
    """Per-substep rigid-manipulator velocities (constant within an env step,
    reference primive_base.py:184-192)."""

    v: jnp.ndarray        # (k, 3) linear velocity per substep
    w: jnp.ndarray        # (k, 3) angular velocity per substep
    gap_vel: jnp.ndarray  # (k,) gap closing rate per substep


class Materials(NamedTuple):
    """Per-scene material constants (reference fills per-particle fields
    uniformly, mpm_simulator.py:53-57; scalars broadcast identically)."""

    mu: jnp.ndarray            # () or (n,)
    lam: jnp.ndarray           # () or (n,)
    yield_stress: jnp.ndarray  # () or (n,)


def np_dtype(scene: SceneSpec):
    return np.float64 if scene.simulator.dtype == "float64" else np.float32


def default_materials(scene: SceneSpec) -> Materials:
    dt = np_dtype(scene)
    sim = scene.simulator
    return Materials(
        mu=jnp.asarray(sim.mu_0, dtype=dt),
        lam=jnp.asarray(sim.lam_0, dtype=dt),
        yield_stress=jnp.asarray(sim.yield_stress, dtype=dt),
    )


def initial_state(scene: SceneSpec, particles: np.ndarray) -> SimState:
    """Rest state: particles at rest with identity F (mpm_simulator.py:330-341),
    primitives at their configured init pose (primive_base.py:157-164)."""
    dt = np_dtype(scene)
    n = len(particles)
    k = len(scene.primitives)
    prim_pos = np.zeros((k, 3), dtype=dt)
    prim_rot = np.zeros((k, 4), dtype=dt)
    prim_gap = np.zeros((k,), dtype=dt)
    for i, p in enumerate(scene.primitives):
        prim_pos[i] = p.init_pos
        prim_rot[i] = p.init_rot
        if p.shape == "Chopsticks":
            prim_gap[i] = p.init_gap
    return SimState(
        x=jnp.asarray(particles, dtype=dt),
        v=jnp.zeros((n, 3), dtype=dt),
        C=jnp.zeros((n, 3, 3), dtype=dt),
        F=jnp.broadcast_to(jnp.eye(3, dtype=dt), (n, 3, 3)),
        prim_pos=jnp.asarray(prim_pos),
        prim_rot=jnp.asarray(prim_rot),
        prim_gap=jnp.asarray(prim_gap),
    )


def flat_primitive_states(scene: SceneSpec, state: SimState) -> jnp.ndarray:
    """Concatenated per-primitive observation vectors: pos+rot (+gap for
    Chopsticks), reference primive_base.py:143-146 / primitives.py:134-135."""
    outs = []
    for i, p in enumerate(scene.primitives):
        outs.append(state.prim_pos[i])
        outs.append(state.prim_rot[i])
        if p.shape == "Chopsticks":
            outs.append(state.prim_gap[i : i + 1])
    if not outs:
        return jnp.zeros((0,), dtype=state.x.dtype)
    return jnp.concatenate(outs, axis=0)
