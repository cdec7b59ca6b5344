"""Fused Pallas transfer kernels on locality-chunk windows — fwd AND bwd.

The jnp local transfer (engine/local_transfer.py) is HBM-bound: its
Khatri-Rao factor tensors (~50 MB/substep) must round-trip HBM. These
kernels build all weight factors in VMEM and contract them on the MXU, so
per-substep HBM traffic is just particle rows in, window tiles out.

Contraction strategy (the part that makes the MXU happy): the natural dot
  tile[(s,a), (b,c)] = sum_p U[(s,a), p] * KR[(b,c), p]
has M = 4*Lx = 32 rows — a 4x pad-waste on the 128-wide MXU. Instead the
kernels stage the triple product:
  stage E (VPU):  E[(s,a,b), p] = U_s[a,p] * Wyvar[b,p]     (outer product)
  stage Z (MXU):  tile[(s,a,b), c] = sum_p E[(s,a,b), p] * Wzvar[c,p]
with M = s*Lx*Ly ~ 1024 and the z-variants concatenated into one RHS, so
every dot runs at full MXU occupancy. The backward kernels contract the
same stages in reverse (z first), then reduce y and x per-particle on the
VPU — 16 (xvar, yvar, zvar) weight-variant triples reproduce the exact
VJP of the forward (incl. dW/dx spline-derivative terms and the rel0 and
advection chain rules), verified against jax.vjp of the jnp local path.

Behavioral reference: plb/engine/mpm_simulator.py p2g :157-184 / g2p
:223-243; gradient reference: jax.vjp of local_transfer.{p2g,g2p}_local.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .local_transfer import LocalPlan

_HI = jax.lax.Precision.HIGHEST


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, dims, preferred_element_type=jnp.float32,
                               precision=_HI)


# contract last dim of LHS with last dim of RHS: (M, P) x (N, P) -> (M, N)
_DN_PP = (((1,), (1,)), ((), ()))
# contract last dim of LHS with first dim of RHS: (M, K) x (K, N) -> (M, N)
_DN_KN = (((1,), (0,)), ((), ()))


def _weight_rows(px, off_s, L, dtype, want_prime):
    """Spline weights on an L-cell window, particles on lanes.
    px (1, P) grid units; off_s scalar int32. Returns (W, dW) each (L, P);
    dW is d/dpx (per grid unit) or None."""
    P = px.shape[1]
    base = jnp.floor(px - 0.5)
    rel = jnp.clip(base.astype(jnp.int32) - off_s, 0, L - 3)
    fx = px - base  # in [0.5, 1.5)
    w0 = 0.5 * (1.5 - fx) ** 2
    w1 = 0.75 - (fx - 1.0) ** 2
    w2 = 0.5 * (fx - 0.5) ** 2
    r = jax.lax.broadcasted_iota(jnp.int32, (L, P), 0) - rel
    zero = jnp.zeros((L, P), dtype)

    def place(t0, t1, t2):
        return (
            jnp.where(r == 0, jnp.broadcast_to(t0, (L, P)), zero)
            + jnp.where(r == 1, jnp.broadcast_to(t1, (L, P)), zero)
            + jnp.where(r == 2, jnp.broadcast_to(t2, (L, P)), zero)
        )

    W = place(w0, w1, w2)
    if not want_prime:
        return W, None
    dW = place(fx - 1.5, -2.0 * (fx - 1.0), fx - 0.5)
    return W, dW


def _aidx(L, P, dtype):
    return jax.lax.broadcasted_iota(jnp.int32, (L, P), 0).astype(dtype)


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------

def _p2g_fwd_kernel(offs_ref, rows_ref, out_ref, *, Lx, Ly, D, G, dx, inv_dx,
                    p_mass):
    """rows (16, P): x0..2, v0..2, aff00..22 (row-major), mask.
    out (4*Lx*Ly, D): rows (s, a, b) s-major, s = mom x/y/z, mass."""
    i = pl.program_id(0)
    dtype = out_ref.dtype
    P = rows_ref.shape[1]

    x = [rows_ref[k : k + 1, :] for k in range(3)]
    v = [rows_ref[3 + k : 4 + k, :] for k in range(3)]
    aff = [[rows_ref[6 + 3 * s + j : 7 + 3 * s + j, :] for j in range(3)]
           for s in range(3)]
    mask = rows_ref[15:16, :]

    px = [xi * inv_dx for xi in x]
    offs = [offs_ref[i, k] for k in range(3)]
    Wx, _ = _weight_rows(px[0], offs[0], Lx, dtype, False)
    Wy, _ = _weight_rows(px[1], offs[1], Ly, dtype, False)
    Wz, _ = _weight_rows(px[2], offs[2], D, dtype, False)
    ax = _aidx(Lx, P, dtype)
    ay = _aidx(Ly, P, dtype)
    az = _aidx(D, P, dtype)

    rel0 = [offs[k].astype(dtype) - px[k] for k in range(3)]
    A = [
        (p_mass * v[s]
         + dx * (aff[s][0] * rel0[0] + aff[s][1] * rel0[1] + aff[s][2] * rel0[2])
         ) * mask
        for s in range(3)
    ]
    m_row = jnp.broadcast_to(jnp.asarray(p_mass, dtype), mask.shape) * mask
    Ba = [dx * aff[s][0] * mask for s in range(3)]
    Bb = [dx * aff[s][1] * mask for s in range(3)]
    Bc = [dx * aff[s][2] * mask for s in range(3)]

    WxA = Wx * ax
    WyA = Wy * ay

    def outer(u, wy):  # (Lx, P) x (Ly, P) -> (Lx*Ly, P)
        t = u.reshape(Lx, 1, P) * wy.reshape(1, Ly, P)
        return t.reshape(Lx * Ly, P)

    # K00 group (z = Wz): U00_s x Wy + (Wx*Bb_s) x (ay*Wy);  mass: (Wx*m) x Wy
    E0 = jnp.concatenate(
        [outer(Wx * A[s] + WxA * Ba[s], Wy) + outer(Wx * Bb[s], WyA)
         for s in range(3)]
        + [outer(Wx * m_row, Wy)],
        axis=0,
    )  # (4*Lx*Ly, P)
    # azWz group: (Wx*Bc_s) x Wy
    E1 = jnp.concatenate([outer(Wx * Bc[s], Wy) for s in range(3)], axis=0)

    E = jnp.concatenate([E0, E1], axis=0)           # (7*Lx*Ly, P)
    Wzcat = jnp.concatenate([Wz, Wz * az], axis=0)  # (2D, P)
    dotE = _dot(E, Wzcat, _DN_PP)                   # (7*Lx*Ly, 2D)

    n0 = 4 * Lx * Ly
    mom = dotE[: 3 * Lx * Ly, :D] + dotE[n0 : n0 + 3 * Lx * Ly, D:]
    out_ref[:, :] = jnp.concatenate([mom, dotE[3 * Lx * Ly : n0, :D]], axis=0)


def _g2p_fwd_kernel(offs_ref, rows_ref, g_ref, out_ref, *, Lx, Ly, D, G, dx,
                    inv_dx, dt):
    """rows (4, P): x0..2, mask. g (3*Lx*Ly, D): rows (s, a, b).
    out (15, P): v0..2, C00..C22 (row-major s*3+axis), nx0..2."""
    i = pl.program_id(0)
    dtype = out_ref.dtype
    P = rows_ref.shape[1]

    x = [rows_ref[k : k + 1, :] for k in range(3)]
    px = [xi * inv_dx for xi in x]
    offs = [offs_ref[i, k] for k in range(3)]
    Wx, _ = _weight_rows(px[0], offs[0], Lx, dtype, False)
    Wy, _ = _weight_rows(px[1], offs[1], Ly, dtype, False)
    Wz, _ = _weight_rows(px[2], offs[2], D, dtype, False)
    ax = _aidx(Lx, P, dtype)
    ay = _aidx(Ly, P, dtype)
    az = _aidx(D, P, dtype)
    rel0 = [offs[k].astype(dtype) - px[k] for k in range(3)]

    g = g_ref[:, :]  # (3*Lx*Ly, D)
    # Z[(s,a,b), p] = sum_c g[(s,a,b), c] * Wzvar[c, p]
    Z0 = _dot(g, Wz, _DN_KN)             # (3LxLy, P)
    Zc = _dot(g, Wz * az, _DN_KN)        # (3LxLy, P)

    def yred(Zm, wy):  # (3LxLy, P) x (Ly, P) -> (3, Lx, P)
        zr = Zm.reshape(3, Lx, Ly, P)
        return jnp.sum(zr * wy.reshape(1, 1, Ly, P), axis=2)

    Y00 = yred(Z0, Wy)
    Y10 = yred(Z0, Wy * ay)
    Y01 = yred(Zc, Wy)

    def xred(Ym, wx):  # (3, Lx, P) x (Lx, P) -> list of 3 (1, P)
        s = jnp.sum(Ym * wx.reshape(1, Lx, P), axis=1)  # (3, P)
        return s

    V = xred(Y00, Wx)        # (3, P)
    Ma = xred(Y00, Wx * ax)
    Mb = xred(Y10, Wx)
    Mc = xred(Y01, Wx)

    out_ref[0:3, :] = V
    lo = 0.0
    hi = 1.0 - 3.0 * dx
    for s in range(3):
        vs = V[s : s + 1, :]
        out_ref[3 + 3 * s : 4 + 3 * s, :] = 4.0 * inv_dx * (
            Ma[s : s + 1, :] + vs * rel0[0])
        out_ref[4 + 3 * s : 5 + 3 * s, :] = 4.0 * inv_dx * (
            Mb[s : s + 1, :] + vs * rel0[1])
        out_ref[5 + 3 * s : 6 + 3 * s, :] = 4.0 * inv_dx * (
            Mc[s : s + 1, :] + vs * rel0[2])
        out_ref[12 + s : 13 + s, :] = jnp.maximum(
            jnp.minimum(x[s] + dt * vs, hi), lo)


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------

def _p2g_bwd_kernel(offs_ref, rows_ref, ct_ref, out_ref, *, Lx, Ly, D, G, dx,
                    inv_dx, p_mass):
    """ct (4*Lx*Ly, D): cotangent window tiles, rows (s, a, b) s-major
    (mom x/y/z, mass). out (15, P): dx0..2, dv0..2, daff00..22."""
    i = pl.program_id(0)
    dtype = out_ref.dtype
    P = rows_ref.shape[1]

    x = [rows_ref[k : k + 1, :] for k in range(3)]
    v = [rows_ref[3 + k : 4 + k, :] for k in range(3)]
    aff = [[rows_ref[6 + 3 * s + j : 7 + 3 * s + j, :] for j in range(3)]
           for s in range(3)]
    mask = rows_ref[15:16, :]

    px = [xi * inv_dx for xi in x]
    offs = [offs_ref[i, k] for k in range(3)]
    Wx, dWx = _weight_rows(px[0], offs[0], Lx, dtype, True)
    Wy, dWy = _weight_rows(px[1], offs[1], Ly, dtype, True)
    Wz, dWz = _weight_rows(px[2], offs[2], D, dtype, True)
    ax = _aidx(Lx, P, dtype)
    ay = _aidx(Ly, P, dtype)
    az = _aidx(D, P, dtype)
    rel0 = [offs[k].astype(dtype) - px[k] for k in range(3)]

    ct = ct_ref[:, :]  # (4LxLy, D)

    def zred(wz):  # contract c: (4LxLy, D) x (D, P) -> (4, Lx, Ly, P)
        return _dot(ct, wz, _DN_KN).reshape(4, Lx, Ly, P)

    def yred(Zm, wy):  # (4, Lx, Ly, P) x (Ly, P) -> (4, Lx, P)
        return jnp.sum(Zm * wy.reshape(1, 1, Ly, P), axis=2)

    def xred(Rm, wx):  # (4, Lx, P) x (Lx, P) -> (4, P)
        return jnp.sum(Rm * wx.reshape(1, Lx, P), axis=1)

    WxA, dWxA = Wx * ax, dWx * ax
    WyA, dWyA = Wy * ay, dWy * ay

    Z0 = zred(Wz)
    R00 = yred(Z0, Wy)
    R10 = yred(Z0, WyA)
    Rd0 = yred(Z0, dWy)
    Rbd = yred(Z0, dWyA)
    Zc = zred(Wz * az)
    Rc00 = yred(Zc, Wy)
    Rcd = yred(Zc, dWy)
    Zd = zred(dWz)
    Rz00 = yred(Zd, Wy)
    Rz10 = yred(Zd, WyA)
    Zcd = zred(dWz * az)
    Rzc = yred(Zcd, Wy)

    T = xred(R00, Wx)      # (4, P): s=0..2 mom, 3 mass
    TA = xred(R00, WxA)
    TB = xred(R10, Wx)
    TC = xred(Rc00, Wx)
    Dx = xred(R00, dWx)
    DxA = xred(R00, dWxA)
    DxB = xred(R10, dWx)
    DxC = xred(Rc00, dWx)
    Dy = xred(Rd0, Wx)
    DyA = xred(Rd0, WxA)
    DyB = xred(Rbd, Wx)
    DyC = xred(Rcd, Wx)
    Dz = xred(Rz00, Wx)
    DzA = xred(Rz00, WxA)
    DzB = xred(Rz10, Wx)
    DzC = xred(Rzc, Wx)

    A = [
        p_mass * v[s]
        + dx * (aff[s][0] * rel0[0] + aff[s][1] * rel0[1] + aff[s][2] * rel0[2])
        for s in range(3)
    ]
    Ba = [dx * aff[s][0] for s in range(3)]
    Bb = [dx * aff[s][1] for s in range(3)]
    Bc = [dx * aff[s][2] for s in range(3)]

    # d/dx through the weight products (chain dfx/dx = inv_dx), the rel0
    # terms in A (d rel0/dx = -inv_dx -> -aff columns), all masked.
    def dsum(Dp, DpA, DpB, DpC):
        tot = p_mass * Dp[3:4]
        for s in range(3):
            tot = tot + (A[s] * Dp[s : s + 1] + Ba[s] * DpA[s : s + 1]
                         + Bb[s] * DpB[s : s + 1] + Bc[s] * DpC[s : s + 1])
        return tot

    gx = inv_dx * dsum(Dx, DxA, DxB, DxC)
    gy = inv_dx * dsum(Dy, DyA, DyB, DyC)
    gz = inv_dx * dsum(Dz, DzA, DzB, DzC)
    for s in range(3):
        gx = gx - aff[s][0] * T[s : s + 1]
        gy = gy - aff[s][1] * T[s : s + 1]
        gz = gz - aff[s][2] * T[s : s + 1]

    out_ref[0:1, :] = gx * mask
    out_ref[1:2, :] = gy * mask
    out_ref[2:3, :] = gz * mask
    for s in range(3):
        out_ref[3 + s : 4 + s, :] = p_mass * T[s : s + 1] * mask
        out_ref[6 + 3 * s : 7 + 3 * s, :] = dx * (
            rel0[0] * T[s : s + 1] + TA[s : s + 1]) * mask
        out_ref[7 + 3 * s : 8 + 3 * s, :] = dx * (
            rel0[1] * T[s : s + 1] + TB[s : s + 1]) * mask
        out_ref[8 + 3 * s : 9 + 3 * s, :] = dx * (
            rel0[2] * T[s : s + 1] + TC[s : s + 1]) * mask


def _g2p_bwd_kernel(offs_ref, rows_ref, g_ref, ct_ref, dg_ref, dx_ref, *,
                    Lx, Ly, D, G, dx, inv_dx, dt):
    """ct (15, P): ct_v0..2, ct_C00..22, ct_nx0..2 (zero on padded lanes).
    g (3*Lx*Ly, D): forward grid window (residual).
    dg (3*Lx*Ly, D): cotangent tiles for the grid; dx_ref (3, P)."""
    i = pl.program_id(0)
    dtype = dx_ref.dtype
    P = rows_ref.shape[1]

    x = [rows_ref[k : k + 1, :] for k in range(3)]
    px = [xi * inv_dx for xi in x]
    offs = [offs_ref[i, k] for k in range(3)]
    Wx, dWx = _weight_rows(px[0], offs[0], Lx, dtype, True)
    Wy, dWy = _weight_rows(px[1], offs[1], Ly, dtype, True)
    Wz, dWz = _weight_rows(px[2], offs[2], D, dtype, True)
    ax = _aidx(Lx, P, dtype)
    ay = _aidx(Ly, P, dtype)
    az = _aidx(D, P, dtype)
    rel0 = [offs[k].astype(dtype) - px[k] for k in range(3)]

    ct_v = [ct_ref[s : s + 1, :] for s in range(3)]
    ct_C = [[ct_ref[3 + 3 * s + j : 4 + 3 * s + j, :] for j in range(3)]
            for s in range(3)]
    ct_nx = [ct_ref[12 + s : 13 + s, :] for s in range(3)]

    g = g_ref[:, :]
    WxA, dWxA = Wx * ax, dWx * ax
    WyA, dWyA = Wy * ay, dWy * ay

    def zred(wz):
        return _dot(g, wz, _DN_KN).reshape(3, Lx, Ly, P)

    def yred(Zm, wy):
        return jnp.sum(Zm * wy.reshape(1, 1, Ly, P), axis=2)

    def xred(Rm, wx):
        return jnp.sum(Rm * wx.reshape(1, Lx, P), axis=1)  # (3, P)

    Z0 = zred(Wz)
    Y00 = yred(Z0, Wy)
    Y10 = yred(Z0, WyA)
    Yd0 = yred(Z0, dWy)
    Ybd = yred(Z0, dWyA)
    Zc = zred(Wz * az)
    Yc00 = yred(Zc, Wy)
    Ycd = yred(Zc, dWy)
    Zd = zred(dWz)
    Yz00 = yred(Zd, Wy)
    Yz10 = yred(Zd, WyA)
    Zcd = zred(dWz * az)
    Yzc = yred(Zcd, Wy)

    V = xred(Y00, Wx)  # forward velocities (3, P), recomputed

    # effective cotangents: advection clamp pass-through + C's rel0 term
    lo = 0.0
    hi = 1.0 - 3.0 * dx
    ctveff, ctMa, ctMb, ctMc = [], [], [], []
    for s in range(3):
        vs = V[s : s + 1, :]
        xa = x[s] + dt * vs
        adv = jnp.logical_and(xa > lo, xa < hi).astype(dtype)
        cma = 4.0 * inv_dx * ct_C[s][0]
        cmb = 4.0 * inv_dx * ct_C[s][1]
        cmc = 4.0 * inv_dx * ct_C[s][2]
        ctMa.append(cma)
        ctMb.append(cmb)
        ctMc.append(cmc)
        ctveff.append(ct_v[s] + dt * adv * ct_nx[s]
                      + cma * rel0[0] + cmb * rel0[1] + cmc * rel0[2])

    # d/dx through W (16 triples), rel0 chain, advection direct term
    def jsum(Ya, Yb, Yc_, Yd_, xva, xvb, xvc, xvd):
        tot = jnp.zeros((1, P), dtype)
        for s in range(3):
            tot = tot + (
                ctveff[s] * jnp.sum(Ya[s] * xva, axis=0, keepdims=True)
                + ctMa[s] * jnp.sum(Yb[s] * xvb, axis=0, keepdims=True)
                + ctMb[s] * jnp.sum(Yc_[s] * xvc, axis=0, keepdims=True)
                + ctMc[s] * jnp.sum(Yd_[s] * xvd, axis=0, keepdims=True)
            )
        return tot

    gx = inv_dx * jsum(Y00, Y00, Y10, Yc00, dWx, dWxA, dWx, dWx)
    gy = inv_dx * jsum(Yd0, Yd0, Ybd, Ycd, Wx, WxA, Wx, Wx)
    gz = inv_dx * jsum(Yz00, Yz00, Yz10, Yzc, Wx, WxA, Wx, Wx)
    for s in range(3):
        vs = V[s : s + 1, :]
        gx = gx - 4.0 * inv_dx * inv_dx * ct_C[s][0] * vs
        gy = gy - 4.0 * inv_dx * inv_dx * ct_C[s][1] * vs
        gz = gz - 4.0 * inv_dx * inv_dx * ct_C[s][2] * vs
    for k, gk in enumerate((gx, gy, gz)):
        xa = x[k] + dt * V[k : k + 1, :]
        adv = jnp.logical_and(xa > lo, xa < hi).astype(dtype)
        dx_ref[k : k + 1, :] = gk + adv * ct_nx[k]

    # d/dg: staged outer products, one MXU dot
    def outer(u, wy):
        t = u.reshape(Lx, 1, P) * wy.reshape(1, Ly, P)
        return t.reshape(Lx * Ly, P)

    E0 = jnp.concatenate(
        [outer(Wx * ctveff[s] + WxA * ctMa[s], Wy) + outer(Wx * ctMb[s], WyA)
         for s in range(3)],
        axis=0,
    )  # (3LxLy, P)
    E1 = jnp.concatenate([outer(Wx * ctMc[s], Wy) for s in range(3)], axis=0)
    E = jnp.concatenate([E0, E1], axis=0)           # (6LxLy, P)
    Wzcat = jnp.concatenate([Wz, Wz * az], axis=0)  # (2D, P)
    dotE = _dot(E, Wzcat, _DN_PP)                   # (6LxLy, 2D)
    n0 = 3 * Lx * Ly
    dg_ref[:, :] = dotE[:n0, :D] + dotE[n0:, D:]


# ---------------------------------------------------------------------------
# XLA-side glue: packing, tile combine/extract
# ---------------------------------------------------------------------------

def _pad_cols(rows, n, n_pad, zero_pad):
    if n_pad == n:
        return rows
    if zero_pad:
        return jnp.pad(rows, ((0, 0), (0, n_pad - n)))
    pad = jnp.broadcast_to(rows[:, n - 1 : n], (rows.shape[0], n_pad - n))
    return jnp.concatenate([rows, pad], axis=1)


def _mask_row(n, n_pad, dtype):
    return (jnp.arange(n_pad, dtype=jnp.int32)[None, :] < n).astype(dtype)


def _pack16(x, v, affine, n_pad):
    n = x.shape[0]
    rows = jnp.concatenate([x.T, v.T, affine.reshape(n, 9).T], axis=0)
    rows = _pad_cols(rows, n, n_pad, zero_pad=False)
    return jnp.concatenate(
        [rows, _mask_row(n, n_pad, rows.dtype)], axis=0).astype(jnp.float32)


def _pack4(x, n_pad):
    n = x.shape[0]
    rows = _pad_cols(x.T, n, n_pad, zero_pad=False)
    return jnp.concatenate(
        [rows, _mask_row(n, n_pad, rows.dtype)], axis=0).astype(jnp.float32)


def _onehot_x(rel_offs_x, Lx, D, dtype):
    """S[i, a, X] = 1 iff X == offs_x[i] + a: the chunk->crop placement
    matrix along x. The scatter/gather then runs on the MXU (exact for
    one-hot at HIGHEST) instead of a serialized dynamic-slice scan."""
    X = jax.lax.broadcasted_iota(jnp.int32, (1, 1, D), 2)
    tgt = (rel_offs_x[:, None, None]
           + jax.lax.broadcasted_iota(jnp.int32, (1, Lx, 1), 1))
    return (X == tgt).astype(dtype)


def _combine_tiles(tiles5, rel_offs, ch, Lx, D):
    """tiles5 (NC, ch, Lx, D, D) [(s, a, b, c) windows, y/z dense] summed
    into a (ch, D, D*D) crop via the one-hot placement matmul."""
    S = _onehot_x(rel_offs[:, 0], Lx, D, tiles5.dtype)
    crop = jnp.einsum("iax,icabz->cxbz", S, tiles5, precision=_HI)
    return crop.reshape(ch, D, D * D)


def _extract_tiles(crop, rel_offs, ch, Lx, D):
    """(ch, D, D*D) -> (NC, ch, Lx, D, D) windows (transpose of combine)."""
    S = _onehot_x(rel_offs[:, 0], Lx, D, crop.dtype)
    t = jnp.einsum("iax,cxq->icaq", S, crop, precision=_HI)
    NC = rel_offs.shape[0]
    return t.reshape(NC, ch, Lx, D, D)


# ---------------------------------------------------------------------------
# public API: custom-VJP transfer functions (cached per scene geometry)
# ---------------------------------------------------------------------------

class _Geom(NamedTuple):
    P: int
    Lx: int
    Ly: int
    D: int
    G: int
    dx: float
    inv_dx: float
    p_mass: float
    dt: float


_CACHE = {}


def transfer_fns(scene, plan: LocalPlan, D: int, interpret: bool = False):
    """Returns (p2g_fn, g2p_fn) with Pallas forwards and hand-derived Pallas
    backwards, both batched over locality chunks:

      p2g_fn(x, v, affine, offs, off) -> grid4 (4, D^3)   [mom xyz + mass]
      g2p_fn(x, grid3 (3, D^3), offs, off) -> (new_v, new_C, new_x)

    offs (NC, 3) int32 per-chunk window origins (data-dependent ints: zero
    cotangent, matching the jnp path's stop-gradient semantics)."""
    sim = scene.simulator
    geom = _Geom(P=plan.P, Lx=plan.Lx, Ly=plan.Ly, D=D, G=sim.n_grid,
                 dx=float(sim.dx), inv_dx=float(sim.inv_dx),
                 p_mass=float(sim.p_mass), dt=float(sim.dt))
    key = (geom, interpret)
    if key in _CACHE:
        return _CACHE[key]

    P, Lx, Ly = geom.P, geom.Lx, geom.Ly
    kw = dict(Lx=Lx, Ly=Ly, D=D, G=geom.G, dx=geom.dx, inv_dx=geom.inv_dx)
    f32 = jnp.float32

    def p2g_tiles(rows16, offs):
        NC = offs.shape[0]
        out = pl.pallas_call(
            functools.partial(_p2g_fwd_kernel, p_mass=geom.p_mass, **kw),
            grid=(NC,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((16, P), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((4 * Lx * Ly, D), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NC * 4 * Lx * Ly, D), f32),
            interpret=interpret,
        )(offs, rows16)
        return out.reshape(NC, 4, Lx, Ly, D)

    def p2g_bwd_rows(rows16, offs, ct_tiles):
        NC = offs.shape[0]
        return pl.pallas_call(
            functools.partial(_p2g_bwd_kernel, p_mass=geom.p_mass, **kw),
            grid=(NC,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((16, P), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4 * Lx * Ly, D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((15, P), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((15, NC * P), f32),
            interpret=interpret,
        )(offs, rows16, ct_tiles.reshape(NC * 4 * Lx * Ly, D))

    def g2p_rows(rows4, g_tiles, offs):
        NC = offs.shape[0]
        return pl.pallas_call(
            functools.partial(_g2p_fwd_kernel, dt=geom.dt, **kw),
            grid=(NC,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((4, P), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3 * Lx * Ly, D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((15, P), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((15, NC * P), f32),
            interpret=interpret,
        )(offs, rows4, g_tiles.reshape(NC * 3 * Lx * Ly, D))

    def g2p_bwd_call(rows4, g_tiles, ct_rows, offs):
        NC = offs.shape[0]
        dg, dxr = pl.pallas_call(
            functools.partial(_g2p_bwd_kernel, dt=geom.dt, **kw),
            grid=(NC,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((4, P), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3 * Lx * Ly, D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((15, P), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((3 * Lx * Ly, D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, P), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((NC * 3 * Lx * Ly, D), f32),
                jax.ShapeDtypeStruct((3, NC * P), f32),
            ),
            interpret=interpret,
        )(offs, rows4, g_tiles.reshape(NC * 3 * Lx * Ly, D), ct_rows)
        return dg.reshape(NC, 3, Lx, Ly, D), dxr

    assert Ly == D, "one-hot combine requires full-depth y windows (Ly == D)"

    def _zero_int(a):
        return np.zeros(a.shape, jax.dtypes.float0)

    def _kl(tiles5, ch):
        """(NC, ch, Lx, D, D) -> (NC*ch*Lx*D, D) kernel row layout."""
        return tiles5.reshape(-1, D)

    # ---- rows-level core (the hot path: everything channel-major) ----

    @jax.custom_vjp
    def p2g_rows(rows16, offs, off):
        """rows16 (16, N) f32 [x3, v3, aff9, mask] -> grid4 (4, D^3)."""
        tiles = p2g_tiles(rows16, offs)  # (NC, 4, Lx, Ly, D)
        crop = _combine_tiles(tiles, offs - off[None, :], 4, Lx, D)
        return crop.reshape(4, D ** 3)

    def p2g_rows_fwd(rows16, offs, off):
        return p2g_rows(rows16, offs, off), (rows16, offs, off)

    def p2g_rows_bwd(res, ct):
        rows16, offs, off = res
        ct_tiles = _extract_tiles(
            ct.reshape(4, D, D * D).astype(f32), offs - off[None, :],
            4, Lx, D,
        )
        drows = p2g_bwd_rows(rows16, offs, _kl(ct_tiles, 4))  # (15, N)
        d16 = jnp.concatenate([drows, jnp.zeros_like(drows[:1])], axis=0)
        return d16, _zero_int(offs), _zero_int(off)

    p2g_rows.defvjp(p2g_rows_fwd, p2g_rows_bwd)

    @jax.custom_vjp
    def g2p_rows_fn(rows4, grid3, offs, off):
        """rows4 (4, N) [x3, mask], grid3 (3, D^3) -> out15 (15, N)
        [v3, C9, nx3]."""
        g_tiles = _extract_tiles(
            grid3.reshape(3, D, D * D).astype(f32), offs - off[None, :],
            3, Lx, D,
        )
        return g2p_rows(rows4, _kl(g_tiles, 3), offs)

    def g2p_rows_fwd(rows4, grid3, offs, off):
        return g2p_rows_fn(rows4, grid3, offs, off), (rows4, grid3, offs, off)

    def g2p_rows_bwd(res, ct15):
        rows4, grid3, offs, off = res
        rel = offs - off[None, :]
        g_tiles = _extract_tiles(
            grid3.reshape(3, D, D * D).astype(f32), rel, 3, Lx, D)
        dg_tiles, dxr = g2p_bwd_call(
            rows4, _kl(g_tiles, 3), ct15.astype(f32), offs)
        dgrid = _combine_tiles(
            dg_tiles.reshape(-1, 3, Lx, Ly, D), rel, 3, Lx, D)
        d4 = jnp.concatenate([dxr, jnp.zeros_like(dxr[:1])], axis=0)
        return (d4, dgrid.reshape(3, D ** 3).astype(grid3.dtype),
                _zero_int(offs), _zero_int(off))

    g2p_rows_fn.defvjp(g2p_rows_fwd, g2p_rows_bwd)

    # ---- (n, 3) adapters (tests / non-rows callers); AD flows through the
    # packing transposes into the rows-level custom VJPs ----

    def p2g_fn(x, v, affine, offs, off):
        n = x.shape[0]
        n_pad = ((n + P - 1) // P) * P
        return p2g_rows(_pack16(x, v, affine, n_pad), offs, off).astype(x.dtype)

    def g2p_fn(x, grid3, offs, off):
        n = x.shape[0]
        n_pad = ((n + P - 1) // P) * P
        out = g2p_rows_fn(_pack4(x, n_pad), grid3.astype(f32), offs, off)
        out = out[:, :n].astype(x.dtype)
        return out[0:3].T, out[3:12].T.reshape(n, 3, 3), out[12:15].T

    fns = (p2g_fn, g2p_fn, p2g_rows, g2p_rows_fn)
    _CACHE[key] = fns
    return fns
