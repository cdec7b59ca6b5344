"""Fused Pallas particle<->grid transfer: Khatri-Rao factors in VMEM.

The jnp dense transfer (engine/transfer.py) materializes three (n, D^2)
Khatri-Rao factor matrices in HBM per substep (~100 MB each on Move-v1) —
the dominant bandwidth cost. These kernels build the factors tile-by-tile in
VMEM and contract them on the MXU without ever writing them out.

Layout: particles along LANES, cells along SUBLANES — W^T is (D, P), the KR
tile is (D^2, P), the p2g output accumulator (4*D, D^2) lives in VMEM across
the sequential particle-chunk grid (all programs map to the same output
block). Spline weights are computed in-kernel from raw positions, so the
kernel's HBM traffic is just particle state in, grid (or particle) state out.

Backward: custom VJP falling back to jax.vjp of the jnp implementation
(gradient structure identical; the forward — which the per-substep
jax.checkpoint also re-runs in the backward pass — is the hot path).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _chunk(D: int) -> int:
    """Particles per chunk: the KR tile (D^2, P) plus HIGHEST-precision dot
    temporaries must fit VMEM (~15 MB works at D=40/P=512; scale by D^-2)."""
    p = int(512 * (40.0 / D) ** 2)
    return max(128, (p // 128) * 128)


def _weights_T(px, base_rel, D, dtype):
    """Dense transposed spline weights W^T (D, P) from grid-unit positions
    px (1, P) and clipped relative base cells base_rel (1, P) int32."""
    fx = px - jnp.floor(px - 0.5)  # (1, P) in [0.5, 1.5)
    w0 = 0.5 * (1.5 - fx) ** 2
    w1 = 0.75 - (fx - 1.0) ** 2
    w2 = 0.5 * (fx - 0.5) ** 2
    rel = jax.lax.broadcasted_iota(jnp.int32, (D, px.shape[1]), 0) - base_rel
    zero = jnp.zeros((D, px.shape[1]), dtype)
    W = jnp.where(rel == 0, jnp.broadcast_to(w0, zero.shape), zero)
    W = W + jnp.where(rel == 1, jnp.broadcast_to(w1, zero.shape), zero)
    W = W + jnp.where(rel == 2, jnp.broadcast_to(w2, zero.shape), zero)
    return W


def _base_rel(px, off_scalar, D, G):
    base = jnp.floor(px - 0.5).astype(jnp.int32)
    return jnp.clip(base - off_scalar, 0, D - 3)


_DN = (((1,), (1,)), ((), ()))  # contract last dims: (M,P)x(Q,P) -> (M,Q)


def _p2g_kernel(off_ref, in_ref, out_ref, *, D, G, dx, inv_dx, p_mass):
    """in_ref: (16, P) rows = x0..x2, v0..v2, aff00..aff22, mask.
    out_ref: (4*D, D^2) accumulator — rows s*D + a, s in (mom0..2, mass)."""
    first = pl.program_id(0) == 0
    dtype = out_ref.dtype
    P = in_ref.shape[1]

    x = [in_ref[i : i + 1, :] for i in range(3)]
    v = [in_ref[3 + i : 4 + i, :] for i in range(3)]
    aff = [[in_ref[6 + 3 * i + j : 7 + 3 * i + j, :] for j in range(3)]
           for i in range(3)]
    mask = in_ref[15:16, :]

    px = [xi * inv_dx for xi in x]
    offs = [off_ref[k] for k in range(3)]
    br = [_base_rel(px[k], offs[k], D, G) for k in range(3)]
    Wx = _weights_T(px[0], br[0], D, dtype)
    Wy = _weights_T(px[1], br[1], D, dtype)
    Wz = _weights_T(px[2], br[2], D, dtype)
    a_idx = jax.lax.broadcasted_iota(jnp.int32, (D, P), 0).astype(dtype)
    WxA = Wx * a_idx

    # per-particle channel values
    rel0 = [offs[k].astype(dtype) - px[k] for k in range(3)]  # (1, P)
    A = [
        (p_mass * v[i]
         + dx * (aff[i][0] * rel0[0] + aff[i][1] * rel0[1] + aff[i][2] * rel0[2])
         ) * mask
        for i in range(3)
    ]
    m_row = jnp.broadcast_to(jnp.asarray(p_mass, dtype), mask.shape) * mask
    Ba = [dx * aff[i][0] * mask for i in range(3)]
    Bb = [dx * aff[i][1] * mask for i in range(3)]
    Bc = [dx * aff[i][2] * mask for i in range(3)]

    def stack_u(W, channels):
        return jnp.concatenate([W * c for c in channels], axis=0)  # (s*D, P)

    def kr(Wa, Wb):
        t = Wa.reshape(D, 1, P) * Wb.reshape(1, D, P)
        return t.reshape(D * D, P)

    KR = kr(Wy, Wz)
    U0 = stack_u(Wx, A + [m_row])          # (4D, P)
    U1 = stack_u(WxA, Ba)                  # (3D, P)
    acc0 = jax.lax.dot_general(U0, KR, _DN, preferred_element_type=dtype, precision=jax.lax.Precision.HIGHEST)
    acc1 = jax.lax.dot_general(U1, KR, _DN, preferred_element_type=dtype, precision=jax.lax.Precision.HIGHEST)

    KRb = kr(Wy * a_idx, Wz)
    U2 = stack_u(Wx, Bb)
    acc2 = jax.lax.dot_general(U2, KRb, _DN, preferred_element_type=dtype, precision=jax.lax.Precision.HIGHEST)

    KRc = kr(Wy, Wz * a_idx)
    U3 = stack_u(Wx, Bc)
    acc3 = jax.lax.dot_general(U3, KRc, _DN, preferred_element_type=dtype, precision=jax.lax.Precision.HIGHEST)

    mom = acc0[: 3 * D] + acc1 + acc2 + acc3
    total = jnp.concatenate([mom, acc0[3 * D :]], axis=0)

    @pl.when(first)
    def _():
        out_ref[:, :] = total

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:, :] = out_ref[:, :] + total


def _g2p_kernel(off_ref, in_ref, g_ref, out_ref, *, D, G, dx, inv_dx):
    """in_ref: (4, P) rows = x0..x2, mask. g_ref: (3*D, D^2) rows s*D + a.
    out_ref: (12, P) rows = v0..2, C00..C22."""
    dtype = out_ref.dtype
    P = in_ref.shape[1]
    x = [in_ref[i : i + 1, :] for i in range(3)]
    px = [xi * inv_dx for xi in x]
    offs = [off_ref[k] for k in range(3)]
    br = [_base_rel(px[k], offs[k], D, G) for k in range(3)]
    Wx = _weights_T(px[0], br[0], D, dtype)
    Wy = _weights_T(px[1], br[1], D, dtype)
    Wz = _weights_T(px[2], br[2], D, dtype)
    a_idx = jax.lax.broadcasted_iota(jnp.int32, (D, P), 0).astype(dtype)
    WxA = Wx * a_idx

    def kr(Wa, Wb):
        t = Wa.reshape(D, 1, P) * Wb.reshape(1, D, P)
        return t.reshape(D * D, P)

    g = g_ref[:, :]  # (3D, D^2)

    def contract(KRm):
        # J^T[(s*D + a), p] = sum_q g[(s*D + a), q] * KR[q, p]
        return jax.lax.dot_general(
            g, KRm, (((1,), (0,)), ((), ())), preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST
        )  # (3D, P)

    J = contract(kr(Wy, Wz))
    Jb = contract(kr(Wy * a_idx, Wz))
    Jc = contract(kr(Wy, Wz * a_idx))

    def axis_sum(W, Jm, s):
        return jnp.sum(W * Jm[s * D : (s + 1) * D], axis=0, keepdims=True)

    rel0 = [offs[k].astype(dtype) - px[k] for k in range(3)]
    for s in range(3):
        new_v = axis_sum(Wx, J, s)          # (1, P)
        Ma = axis_sum(WxA, J, s)
        Mb = axis_sum(Wx, Jb, s)
        Mc = axis_sum(Wx, Jc, s)
        out_ref[s : s + 1, :] = new_v
        # C[s, axis] = 4*inv_dx*(M_axis + new_v * rel0_axis)
        out_ref[3 + 3 * s : 4 + 3 * s, :] = 4.0 * inv_dx * (Ma + new_v * rel0[0])
        out_ref[4 + 3 * s : 5 + 3 * s, :] = 4.0 * inv_dx * (Mb + new_v * rel0[1])
        out_ref[5 + 3 * s : 6 + 3 * s, :] = 4.0 * inv_dx * (Mc + new_v * rel0[2])


def _pad_particles(arrs, n, n_pad, dtype):
    rows = jnp.concatenate(
        [a.reshape(1, n) if a.ndim == 1 else a for a in arrs], axis=0
    )
    if n_pad != n:
        rows = jnp.pad(rows, ((0, 0), (0, n_pad - n)))
    return rows.astype(dtype)


def p2g_pallas(scene, x, v, affine, off, D):
    """x (n,3), v (n,3), affine (n,3,3), off (3,) int32 ->
    (grid_v (D^3,3), grid_m (D^3,))."""
    sim = scene.simulator
    n = x.shape[0]
    dtype = x.dtype
    P = _chunk(D)
    n_pad = ((n + P - 1) // P) * P
    mask = jnp.ones((1, n), dtype)
    rows = _pad_particles(
        [x[:, 0], x[:, 1], x[:, 2], v[:, 0], v[:, 1], v[:, 2]]
        + [affine[:, i, j] for i in range(3) for j in range(3)]
        + [mask[0]], n, n_pad, dtype,
    )  # (16, n_pad)

    kern = functools.partial(
        _p2g_kernel, D=D, G=sim.n_grid, dx=float(sim.dx),
        inv_dx=float(sim.inv_dx), p_mass=float(sim.p_mass),
    )
    out = pl.pallas_call(
        kern,
        grid=(n_pad // P,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((16, P), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4 * D, D * D), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4 * D, D * D), dtype),
    )(off, rows)

    out = out.reshape(4, D, D, D).transpose(1, 2, 3, 0)  # (a,b,c,s)
    return out[..., :3].reshape(D**3, 3), out[..., 3].reshape(D**3)


def g2p_pallas(scene, x, grid_v, off, D):
    """x (n,3), grid_v (D^3,3), off (3,) -> (new_v (n,3), new_C (n,3,3))."""
    sim = scene.simulator
    n = x.shape[0]
    dtype = x.dtype
    P = _chunk(D)
    n_pad = ((n + P - 1) // P) * P
    rows = _pad_particles([x[:, 0], x[:, 1], x[:, 2]], n, n_pad, dtype)

    # g rows: s*D + a, columns q=(b,c)
    g = grid_v.reshape(D, D * D, 3).transpose(2, 0, 1).reshape(3 * D, D * D)

    kern = functools.partial(
        _g2p_kernel, D=D, G=sim.n_grid, dx=float(sim.dx),
        inv_dx=float(sim.inv_dx),
    )
    out = pl.pallas_call(
        kern,
        grid=(n_pad // P,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, P), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * D, D * D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((12, P), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((12, n_pad), dtype),
    )(off, rows, g)

    new_v = out[:3, :n].T  # (n, 3)
    new_C = out[3:12, :n].T.reshape(n, 3, 3)
    return new_v, new_C


# ---------------------------------------------------------------------------
# custom-VJP wrappers (jnp dense path supplies the backward)
# ---------------------------------------------------------------------------

_VJP_CACHE = {}


def transfer_fns(scene, D: int):
    """Returns (p2g_fn, g2p_fn) with Pallas forwards and jnp backwards.
    p2g_fn(x, v, affine, off_f) -> (grid_v, grid_m);
    g2p_fn(x, grid_v, off_f) -> (new_v, new_C). off_f is float32 (3,)."""
    key = (scene.simulator, tuple(scene.shapes), D)
    if key in _VJP_CACHE:
        return _VJP_CACHE[key]

    from . import transfer as T

    def jnp_p2g(x, v, affine, off_f):
        off = off_f.astype(jnp.int32)
        aw = T.axis_weights(scene, x, D, off=off)
        return T.p2g_dense(scene, aw, v, affine, D)

    def jnp_g2p(x, grid_v, off_f):
        off = off_f.astype(jnp.int32)
        aw = T.axis_weights(scene, x, D, off=off)
        return T.g2p_dense(scene, aw, grid_v, D)

    @jax.custom_vjp
    def p2g_fn(x, v, affine, off_f):
        return p2g_pallas(scene, x, v, affine, off_f.astype(jnp.int32), D)

    def p2g_fwd(x, v, affine, off_f):
        return p2g_fn(x, v, affine, off_f), (x, v, affine, off_f)

    def p2g_bwd(res, ct):
        x, v, affine, off_f = res
        _, vjp = jax.vjp(lambda a, b, c: jnp_p2g(a, b, c, off_f), x, v, affine)
        gx, gv, gaff = vjp(ct)
        return gx, gv, gaff, jnp.zeros_like(off_f)

    p2g_fn.defvjp(p2g_fwd, p2g_bwd)

    @jax.custom_vjp
    def g2p_fn(x, grid_v, off_f):
        return g2p_pallas(scene, x, grid_v, off_f.astype(jnp.int32), D)

    def g2p_fwd(x, grid_v, off_f):
        return g2p_fn(x, grid_v, off_f), (x, grid_v, off_f)

    def g2p_bwd(res, ct):
        x, grid_v, off_f = res
        _, vjp = jax.vjp(lambda a, b: jnp_g2p(a, b, off_f), x, grid_v)
        gx, gg = vjp(ct)
        return gx, gg, jnp.zeros_like(off_f)

    g2p_fn.defvjp(g2p_fwd, g2p_bwd)

    _VJP_CACHE[key] = (p2g_fn, g2p_fn)
    return p2g_fn, g2p_fn
