"""Pallas grid_op: the crop-grid momentum update as a fused VPU kernel.

The XLA grid_op (mpm.grid_op_cm) is ~150 us/substep of unfused elementwise
passes over the 64k-cell crop; run twice per substep under remat plus its
backward, it is the largest non-transfer cost. These kernels run the exact
same math — mpm.grid_op_core, shared source — inside one pallas_call each:

- forward: one pass over x-tiles of the crop laid out (4, D, Ly*D) (y*z on
  1600 lanes: full VPU width, no padding).
- backward: jax.vjp of grid_op_core traced INSIDE the kernel, per x-tile.
  No hand-derived adjoint is needed — the core is pure elementwise jnp, so
  its linearization lowers to Mosaic like any other kernel body. Pose
  cotangents (the action-gradient path through collisions) are accumulated
  across tiles into a small VMEM output.

Scenes without primitives keep the XLA path (grid_op there is cheap).

Behavioral reference: plb/engine/mpm_simulator.py grid_op :189-221 and
primive_base.py collide :91-115 (via primitives_cm). Gradient reference:
jax.vjp of mpm.grid_op_cm — same math, same VJP.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Multi-primitive scenes push the backward kernel's scoped-vmem stack
# past XLA's 16 MiB default (Rope-v1 unbatched bwd: 24.17M) — same
# budget raise as pallas_local.cparams.
_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

_TX = 8  # x-cells per tile; crop sizes are multiples of 8


def _tile_coords(i, off, Tx, Ly, D):
    """Global (ci, cj, ck) int32 arrays for x-tile i, shape (Tx, Ly*D).
    off: 3 scalars (crop origin)."""
    ci = (jax.lax.broadcasted_iota(jnp.int32, (Tx, Ly * D), 0)
          + i * Tx + off[0])
    lane = jax.lax.broadcasted_iota(jnp.int32, (Tx, Ly * D), 1)
    cj = lane // D + off[1]
    ck = lane % D + off[2]
    return ci, cj, ck


def _grid_ids(off_ref, soft_ref, nb):
    """Tile index + crop origin + softness for the single-env grid (NT,)
    [nb=0] or the batched grid (B, NT) [nb=1] with off FLAT (B*3,) / soft
    (B,) full-array SMEM (multi-dim SMEM windows pad minor rows to large
    alignment — see pallas_local._grid_ids)."""
    if nb:
        b = pl.program_id(0)
        i = pl.program_id(1)
        return i, [off_ref[b * 3 + k] for k in range(3)], soft_ref[b]
    i = pl.program_id(0)
    return i, [off_ref[k] for k in range(3)], soft_ref[0]


def _unpack_poses(pf, gap, k):
    """pf (k, 14) rows = [pos_f(3), rot_f(4), pos_f1(3), rot_f1(4)];
    gap (k, 2) = [gap_f, gap_f1] -> (pose_f, pose_f1) with per-primitive
    scalar tuples, matching grid_op_core's indexing."""
    pose_f = (
        [tuple(pf[i, j] for j in range(3)) for i in range(k)],
        [tuple(pf[i, 3 + j] for j in range(4)) for i in range(k)],
        [gap[i, 0] for i in range(k)],
    )
    pose_f1 = (
        [tuple(pf[i, 7 + j] for j in range(3)) for i in range(k)],
        [tuple(pf[i, 10 + j] for j in range(4)) for i in range(k)],
        [gap[i, 1] for i in range(k)],
    )
    return pose_f, pose_f1


def _fwd_kernel(off_ref, soft_ref, pf_ref, gap_ref, g4_ref, out_ref, *,
                scene, Ly, D, nb=0):
    from . import mpm

    i, off, soft = _grid_ids(off_ref, soft_ref, nb)
    Tx = g4_ref.shape[1]
    k = len(scene.primitives)
    coords = _tile_coords(i, off, Tx, Ly, D)
    pose_f, pose_f1 = _unpack_poses(pf_ref[...], gap_ref[...], k)
    g4c = tuple(g4_ref[s] for s in range(4))
    v = mpm.grid_op_core(scene, g4c, coords, pose_f, pose_f1, soft)
    for s in range(3):
        out_ref[s] = v[s]


def _bwd_kernel(off_ref, soft_ref, pf_ref, gap_ref, g4_ref, ct_ref,
                dg4_ref, dpf_ref, dgap_ref, *, scene, Ly, D, nb=0):
    """jax.vjp of grid_op_core per x-tile; pose cotangents accumulate
    across tiles."""
    from . import mpm

    i, off, softness = _grid_ids(off_ref, soft_ref, nb)
    Tx = g4_ref.shape[1]
    k = len(scene.primitives)
    coords = _tile_coords(i, off, Tx, Ly, D)

    def f(g4c, pf, gap):
        pose_f, pose_f1 = _unpack_poses(pf, gap, k)
        return tuple(mpm.grid_op_core(scene, g4c, coords, pose_f, pose_f1,
                                      softness))

    g4c = tuple(g4_ref[s] for s in range(4))
    _, vjp = jax.vjp(f, g4c, pf_ref[...], gap_ref[...])
    dg4c, dpf, dgap = vjp(tuple(ct_ref[s] for s in range(3)))
    for s in range(4):
        dg4_ref[s] = dg4c[s]

    @pl.when(i == 0)
    def _init():
        dpf_ref[...] = jnp.zeros_like(dpf_ref)
        dgap_ref[...] = jnp.zeros_like(dgap_ref)

    dpf_ref[...] = dpf_ref[...] + dpf
    dgap_ref[...] = dgap_ref[...] + dgap


_CACHE = {}


def grid_op_fns(scene, D: int, interpret: bool = False):
    """Returns grid_op(grid4 (4, D^3), pf (k,14), gap (k,2), softness, off)
    -> (3, D^3) with a Pallas forward and an in-kernel-vjp Pallas backward.
    pf rows pack [pos_f, rot_f, pos_f1, rot_f1]; gap rows [gap_f, gap_f1].
    Requires at least one primitive and D % 8 == 0."""
    key = (scene.simulator, scene.primitives, D, interpret)
    if key in _CACHE:
        return _CACHE[key]

    Ly = D
    k = len(scene.primitives)
    assert k >= 1 and D % _TX == 0
    f32 = jnp.float32
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    NT = D // _TX

    g4_spec = pl.BlockSpec((4, _TX, Ly * D), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    g3_spec = pl.BlockSpec((3, _TX, Ly * D), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    pf_spec = pl.BlockSpec((k, 14), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    gap_spec = pl.BlockSpec((k, 2), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    def fwd_call(g4, pf, gap, softness, off):
        return pl.pallas_call(
            functools.partial(_fwd_kernel, scene=scene, Ly=Ly, D=D),
            grid=(NT,),
            in_specs=[smem, smem, pf_spec, gap_spec, g4_spec],
            out_specs=g3_spec,
            out_shape=jax.ShapeDtypeStruct((3, D, Ly * D), f32),
            interpret=interpret,
            compiler_params=_CPARAMS,
        )(off, jnp.reshape(softness, (1,)).astype(f32), pf, gap,
          g4.reshape(4, D, Ly * D))

    def bwd_call(g4, pf, gap, softness, off, ct):
        return pl.pallas_call(
            functools.partial(_bwd_kernel, scene=scene, Ly=Ly, D=D),
            grid=(NT,),
            in_specs=[smem, smem, pf_spec, gap_spec, g4_spec, g3_spec],
            out_specs=(g4_spec, pf_spec, gap_spec),
            out_shape=(
                jax.ShapeDtypeStruct((4, D, Ly * D), f32),
                jax.ShapeDtypeStruct((k, 14), f32),
                jax.ShapeDtypeStruct((k, 2), f32),
            ),
            interpret=interpret,
            compiler_params=_CPARAMS,
        )(off, jnp.reshape(softness, (1,)).astype(f32), pf, gap,
          g4.reshape(4, D, Ly * D), ct.reshape(3, D, Ly * D))

    @jax.custom_vjp
    def grid_op(g4, pf, gap, softness, off):
        return fwd_call(g4, pf, gap, softness, off).reshape(3, D ** 3)

    def grid_op_fwd(g4, pf, gap, softness, off):
        return grid_op(g4, pf, gap, softness, off), (g4, pf, gap, softness,
                                                     off)

    def grid_op_bwd(res, ct):
        g4, pf, gap, softness, off = res
        dg4, dpf, dgap = bwd_call(g4, pf, gap, softness, off,
                                  ct.astype(jnp.float32))
        return (dg4.reshape(4, D ** 3), dpf, dgap,
                jnp.zeros_like(softness),
                np.zeros(off.shape, jax.dtypes.float0))

    grid_op.defvjp(grid_op_fwd, grid_op_bwd)
    _CACHE[key] = grid_op
    return grid_op


def grid_op_fns_batched(scene, D: int, interpret: bool = False):
    """Batched grid_op: grid (B, NT), batch dim squeezed out of VMEM blocks,
    off (B, 3) / softness (B,) full-array SMEM. Same kernel bodies (nb=1).

      grid_op_b(g4 (B, 4, D^3), pf (B, k, 14), gap (B, k, 2),
                softness (B,), off (B, 3)) -> (B, 3, D^3)
    """
    key = ("batched", scene.simulator, scene.primitives, D, interpret)
    if key in _CACHE:
        return _CACHE[key]

    Ly = D
    k = len(scene.primitives)
    assert k >= 1 and D % _TX == 0
    f32 = jnp.float32
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    NT = D // _TX

    g4_spec = pl.BlockSpec((None, 4, _TX, Ly * D), lambda b, i: (b, 0, i, 0),
                           memory_space=pltpu.VMEM)
    g3_spec = pl.BlockSpec((None, 3, _TX, Ly * D), lambda b, i: (b, 0, i, 0),
                           memory_space=pltpu.VMEM)
    pf_spec = pl.BlockSpec((None, k, 14), lambda b, i: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    gap_spec = pl.BlockSpec((None, k, 2), lambda b, i: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    def fwd_call(g4, pf, gap, softness, off):
        B = g4.shape[0]
        return pl.pallas_call(
            functools.partial(_fwd_kernel, scene=scene, Ly=Ly, D=D, nb=1),
            grid=(B, NT),
            in_specs=[smem, smem, pf_spec, gap_spec, g4_spec],
            out_specs=g3_spec,
            out_shape=jax.ShapeDtypeStruct((B, 3, D, Ly * D), f32),
            interpret=interpret,
            compiler_params=_CPARAMS,
        )(off.reshape(-1), softness.reshape(B).astype(f32), pf, gap,
          g4.reshape(B, 4, D, Ly * D))

    def bwd_call(g4, pf, gap, softness, off, ct):
        B = g4.shape[0]
        return pl.pallas_call(
            functools.partial(_bwd_kernel, scene=scene, Ly=Ly, D=D, nb=1),
            grid=(B, NT),
            in_specs=[smem, smem, pf_spec, gap_spec, g4_spec, g3_spec],
            out_specs=(g4_spec, pf_spec, gap_spec),
            out_shape=(
                jax.ShapeDtypeStruct((B, 4, D, Ly * D), f32),
                jax.ShapeDtypeStruct((B, k, 14), f32),
                jax.ShapeDtypeStruct((B, k, 2), f32),
            ),
            interpret=interpret,
            compiler_params=_CPARAMS,
        )(off.reshape(-1), softness.reshape(B).astype(f32), pf, gap,
          g4.reshape(B, 4, D, Ly * D), ct.reshape(B, 3, D, Ly * D))

    @jax.custom_vjp
    def grid_op_b(g4, pf, gap, softness, off):
        B = g4.shape[0]
        return fwd_call(g4, pf, gap, softness, off).reshape(B, 3, D ** 3)

    def grid_op_b_fwd(g4, pf, gap, softness, off):
        return grid_op_b(g4, pf, gap, softness, off), (g4, pf, gap, softness,
                                                       off)

    def grid_op_b_bwd(res, ct):
        g4, pf, gap, softness, off = res
        B = g4.shape[0]
        dg4, dpf, dgap = bwd_call(g4, pf, gap, softness, off,
                                  ct.astype(jnp.float32))
        return (dg4.reshape(B, 4, D ** 3), dpf, dgap,
                jnp.zeros_like(softness),
                np.zeros(off.shape, jax.dtypes.float0))

    grid_op_b.defvjp(grid_op_b_fwd, grid_op_b_bwd)
    _CACHE[key] = grid_op_b
    return grid_op_b
