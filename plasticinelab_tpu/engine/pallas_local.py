"""Fused Pallas transfer kernels on locality-chunk windows — fwd AND bwd.

The jnp local transfer (engine/local_transfer.py) is HBM-bound: its
Khatri-Rao factor tensors (~50 MB/substep) must round-trip HBM. These
kernels build all weight factors in VMEM and contract them on the MXU, so
per-substep HBM traffic is just particle rows in, the crop grid out.

Three structural choices carry the performance:

1. Contraction staging (the part that makes the MXU happy): the natural dot
     tile[(s,a), (b,c)] = sum_p U[(s,a), p] * KR[(b,c), p]
   has M = 4*Lx = 32 rows — a 4x pad-waste on the 128-wide MXU. Instead the
   kernels stage the triple product:
     stage E (VPU):  E[(s,a,b), p] = U_s[a,p] * Wyvar[b,p]     (outer product)
     stage Z (MXU):  tile[(s,a,b), c] = sum_p E[(s,a,b), p] * Wzvar[c,p]
   with M ~ 1000+ rows and the z-variants concatenated into one RHS.
   Dots run as a manual 3-pass bf16 split (~Precision.HIGH, the jnp local
   path's precision) — the kernels are MXU-bound and HIGHEST's 6 passes
   would double their cost for accuracy below the f32 noise floor.

2. dpos-folded weight variants: every index/offset factor is folded into
   the per-axis weights BEFORE any bf16 split — WD = W * dpos (dpos = cell
   - particle, in grid units, O(1.5)) and its derivative dWD = dW * dpos -
   W. The naive staging (index-weighted W * a combined with a separate
   V * rel0 / affine * rel0 term, rel0 ~ window size ~ 20-40 cells) is an
   exact cancellation in f32 but amplifies 3-pass bf16 rounding by
   4 * inv_dx^2 in the APIC C reconstruction and its adjoints; the folded
   variants keep every contraction operand O(1)-conditioned so there is no
   cancellation to lose.

3. The D^3 crop stays VMEM-resident across the chunk grid in a
   (ch, D, Ly, D) layout (channel and x purely major, z on lanes — the
   dots' native lane axis, so no lane-dim reshapes exist anywhere): the
   kernels accumulate each chunk's window tile directly into the crop
   output (constant index map, dynamic-slice store on the major x axis)
   and slice windows straight out of a resident crop input. Per-chunk
   window tiles never touch HBM and no XLA-side combine/extract pass
   exists; the (ch, D^3) public view is a pure reshape.

The backward kernels contract the same stages in reverse (z first), then
reduce y and x per-particle on the VPU — the (xvar, yvar, zvar)
weight-variant triples reproduce the exact VJP of the forward (incl. dW/dx
spline-derivative terms and the advection chain rule), verified against
jax.vjp of the jnp local path.

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

# XLA's default scoped-vmem stack limit is 16 MiB; the pipelined crop
# blocks (up to 4*D^3 f32 per buffer, double-buffered, D=64 for
# roam-everywhere scenes) exceed it at B=32 for multi-primitive tasks
# (observed: 16.06M Rope/Chopsticks, 19.83M TripleMove/Assembly at the
# default limit). Raise the per-kernel budget on every crop-resident
# pallas_call; v5e has 128 MiB physical VMEM per core.
cparams = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _split_bf16(a):
    """f32 -> (hi, lo) bf16 pair with hi + lo ~ a to ~16 mantissa bits.
    The subtraction a - hi is exact in f32 (hi is a rounding of a)."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot(a, b, dims):
    """3-pass bf16 matmul ~ Precision.HIGH (ah*bh + al*bh + ah*bl).

    Mosaic supports only DEFAULT / HIGHEST dot precisions; HIGHEST (6 bf16
    passes) doubles every transfer's cost, DEFAULT (1 pass) loses ~8
    mantissa bits of the physics. The manual split runs the same 3 passes
    Precision.HIGH would, with f32 accumulators."""
    ah, al = _split_bf16(a)
    bh, bl = _split_bf16(b)

    def d(x, y):
        return jax.lax.dot_general(x, y, dims,
                                   preferred_element_type=jnp.float32)

    return d(ah, bh) + d(al, bh) + d(ah, bl)


def _grid_ids(offs_ref, off_ref, nb, NC=0):
    """Chunk index + per-chunk window origin + crop origin x, for both the
    single-env grid (NC,) [nb=0] and the batched grid (B, NC) [nb=1]. In
    the batched case offs/off are FLAT 1-D SMEM arrays (B*NC*3,) / (B*3,):
    multi-dim SMEM windows pad each minor row to large alignment (an
    s32[128,20,3] SMEM window allocates 1.5 MB against the 1 MB SMEM
    budget), and jax.vmap's pallas batching rule would BLOCK the SMEM
    operands along batch, which Mosaic rejects — these explicit flat
    layouts are why the batched path exists."""
    if nb:
        b = pl.program_id(0)
        i = pl.program_id(1)
        base = (b * NC + i) * 3
        return i, [offs_ref[base + k] for k in range(3)], off_ref[b * 3]
    i = pl.program_id(0)
    return i, [offs_ref[i, k] for k in range(3)], off_ref[0]


# contract last dim of LHS with last dim of RHS: (M, P) x (N, P) -> (M, N)
_DN_PP = (((1,), (1,)), ((), ()))
# contract last dim of LHS with first dim of RHS: (M, K) x (K, N) -> (M, N)
_DN_KN = (((1,), (0,)), ((), ()))


def _weights(px, off_s, L, dtype, want_prime):
    """Spline weight variants on an L-cell window, particles on lanes.
    px (1, P) grid units; off_s scalar int32 window origin. Returns
    (W, WD, dW, dWD), each (L, P):
      W   — quadratic B-spline weight of cell a for particle p
      WD  — W * dpos, dpos = (a + off_s) - px (grid units, O(1.5) on the
            3-cell support)
      dW  — dW/dpx (per grid unit)
      dWD — d(W * dpos)/dpx = dW * dpos - W
    dW/dWD are None unless want_prime."""
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
    a = jax.lax.broadcasted_iota(jnp.int32, (L, P), 0).astype(dtype)
    dpos = a + (off_s.astype(dtype) - px)  # (L, P), O(1.5) where W != 0
    WD = W * dpos
    if not want_prime:
        return W, WD, None, None
    dW = place(fx - 1.5, -2.0 * (fx - 1.0), fx - 0.5)
    dWD = dW * dpos - W
    return W, WD, dW, dWD


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------

def _p2g_fwd_kernel(offs_ref, off_ref, rows_ref, out_ref, *, Lx, Ly, D, G,
                    dx, inv_dx, p_mass, nb=0, NC=0):
    """rows (16, P): x0..2, v0..2, aff00..22 (row-major), mask.
    out (4, D, Ly, D): the whole crop (channels: mom x/y/z, mass), x on a
    major axis, accumulated across the chunk grid.

    mom_s(cell j) = sum_p W_j * (p_mass * v_s + dx * aff_s . dpos_j);
    the dpos factors live inside the WD weight variants."""
    i, offs, off0 = _grid_ids(offs_ref, off_ref, nb, NC)
    dtype = out_ref.dtype
    P = rows_ref.shape[1]

    @pl.when(i == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    x = [rows_ref[k : k + 1, :] for k in range(3)]
    v = [rows_ref[3 + k : 4 + k, :] for k in range(3)]
    aff = [[rows_ref[6 + 3 * s + j : 7 + 3 * s + j, :] for j in range(3)]
           for s in range(3)]
    mask = rows_ref[15:16, :]

    px = [xi * inv_dx for xi in x]
    Wx, WxD, _, _ = _weights(px[0], offs[0], Lx, dtype, False)
    Wy, WyD, _, _ = _weights(px[1], offs[1], Ly, dtype, False)
    Wz, WzD, _, _ = _weights(px[2], offs[2], D, dtype, False)

    A = [p_mass * v[s] * mask for s in range(3)]
    m_row = jnp.broadcast_to(jnp.asarray(p_mass, dtype), mask.shape) * mask
    Ba = [dx * aff[s][0] * mask for s in range(3)]
    Bb = [dx * aff[s][1] * mask for s in range(3)]
    Bc = [dx * aff[s][2] * mask for s in range(3)]

    def outer(u, wy):  # (Lx, P) x (Ly, P) -> (Lx*Ly, P)
        t = u.reshape(Lx, 1, P) * wy.reshape(1, Ly, P)
        return t.reshape(Lx * Ly, P)

    # z = Wz group: (Wx*A_s + WxD*Ba_s) x Wy + (Wx*Bb_s) x WyD; mass: Wx*m x Wy
    E0 = jnp.concatenate(
        [outer(Wx * A[s] + WxD * Ba[s], Wy) + outer(Wx * Bb[s], WyD)
         for s in range(3)]
        + [outer(Wx * m_row, Wy)],
        axis=0,
    )  # (4*Lx*Ly, P)
    # z = WzD group: (Wx*Bc_s) x Wy
    E1 = jnp.concatenate([outer(Wx * Bc[s], Wy) for s in range(3)], axis=0)

    # two dots (the N = D lane padding makes a 2D-wide concat cost the
    # same MACs while doubling peak VMEM)
    t0 = _dot(E0, Wz, _DN_PP).reshape(4, Lx * Ly, D)
    t1 = _dot(E1, WzD, _DN_PP).reshape(3, Lx * Ly, D)

    ox = offs[0] - off0
    for s in range(3):
        tile = (t0[s] + t1[s]).reshape(Lx, Ly, D)
        out_ref[s, pl.ds(ox, Lx)] = out_ref[s, pl.ds(ox, Lx)] + tile
    mtile = t0[3].reshape(Lx, Ly, D)
    out_ref[3, pl.ds(ox, Lx)] = out_ref[3, pl.ds(ox, Lx)] + mtile


def _g2p_fwd_kernel(offs_ref, off_ref, rows_ref, g_ref, out_ref, *, Lx, Ly,
                    D, G, dx, inv_dx, dt, nb=0, NC=0):
    """rows (4, P): x0..2, mask. g (3, D, Ly, D): the whole crop, resident.
    out (15, P): v0..2, C00..C22 (row-major s*3+axis), nx0..2.

    V_s = sum_j W_j g_sj;  C_s,axis = 4*inv_dx * sum_j W_j dpos_axis,j g_sj
    — the dpos factor lives inside the WD variants (no V*rel0 term)."""
    i, offs, off0 = _grid_ids(offs_ref, off_ref, nb, NC)
    dtype = out_ref.dtype
    P = rows_ref.shape[1]

    x = [rows_ref[k : k + 1, :] for k in range(3)]
    px = [xi * inv_dx for xi in x]
    Wx, WxD, _, _ = _weights(px[0], offs[0], Lx, dtype, False)
    Wy, WyD, _, _ = _weights(px[1], offs[1], Ly, dtype, False)
    Wz, WzD, _, _ = _weights(px[2], offs[2], D, dtype, False)

    ox = offs[0] - off0
    g = jnp.concatenate(
        [g_ref[s, pl.ds(ox, Lx)].reshape(Lx * Ly, D) for s in range(3)],
        axis=0,
    )  # (3*Lx*Ly, D), rows (s, a, b)

    # Z[(s,a,b), p] = sum_c g[(s,a,b), c] * Wzvar[c, p] — z-variants share
    # one dot when 2P <= 2048 lanes, so the short K = D contraction
    # amortizes its MXU pipeline fill without blowing VMEM at large P.
    if 2 * P <= 2048:
        Zall = _dot(g, jnp.concatenate([Wz, WzD], axis=1), _DN_KN)

        def zview(k):  # (3, Lx, Ly, P) slice of variant k
            return Zall[:, k * P : (k + 1) * P].reshape(3, Lx, Ly, P)
    else:
        def zview(k):
            return _dot(g, (Wz, WzD)[k], _DN_KN).reshape(3, Lx, Ly, P)

    def yred(Zm, wy):  # (3, Lx, Ly, P) x (Ly, P) -> (3, Lx, P)
        return jnp.sum(Zm * wy.reshape(1, 1, Ly, P), axis=2)

    def xred(Ym, wx):  # (3, Lx, P) x (Lx, P) -> (3, P)
        return jnp.sum(Ym * wx.reshape(1, Lx, P), axis=1)

    Z0 = zview(0)
    Y00 = yred(Z0, Wy)

    V = xred(Y00, Wx)             # (3, P)
    Ma = xred(Y00, WxD)
    Mb = xred(yred(Z0, WyD), Wx)
    Mc = xred(yred(zview(1), Wy), Wx)

    out_ref[0:3, :] = V
    lo = 0.0
    hi = 1.0 - 3.0 * dx
    for s in range(3):
        vs = V[s : s + 1, :]
        out_ref[3 + 3 * s : 4 + 3 * s, :] = 4.0 * inv_dx * Ma[s : s + 1, :]
        out_ref[4 + 3 * s : 5 + 3 * s, :] = 4.0 * inv_dx * Mb[s : s + 1, :]
        out_ref[5 + 3 * s : 6 + 3 * s, :] = 4.0 * inv_dx * Mc[s : s + 1, :]
        out_ref[12 + s : 13 + s, :] = jnp.maximum(
            jnp.minimum(x[s] + dt * vs, hi), lo)


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------

def _p2g_bwd_kernel(offs_ref, off_ref, rows_ref, ct_ref, out_ref, *, Lx, Ly,
                    D, G, dx, inv_dx, p_mass, nb=0, NC=0):
    """ct (4, D, Ly, D): cotangent crop, resident (channels: mom x/y/z,
    mass). out (15, P): dx0..2, dv0..2, daff00..22."""
    i, offs, off0 = _grid_ids(offs_ref, off_ref, nb, NC)
    dtype = out_ref.dtype
    P = rows_ref.shape[1]

    x = [rows_ref[k : k + 1, :] for k in range(3)]
    v = [rows_ref[3 + k : 4 + k, :] for k in range(3)]
    aff = [[rows_ref[6 + 3 * s + j : 7 + 3 * s + j, :] for j in range(3)]
           for s in range(3)]
    mask = rows_ref[15:16, :]

    px = [xi * inv_dx for xi in x]
    Wx, WxD, dWx, dWxD = _weights(px[0], offs[0], Lx, dtype, True)
    Wy, WyD, dWy, dWyD = _weights(px[1], offs[1], Ly, dtype, True)
    Wz, WzD, dWz, dWzD = _weights(px[2], offs[2], D, dtype, True)

    ox = offs[0] - off0
    ct = jnp.concatenate(
        [ct_ref[s, pl.ds(ox, Lx)].reshape(Lx * Ly, D) for s in range(4)],
        axis=0,
    )  # (4*Lx*Ly, D), rows (s, a, b)

    # z-variants grouped so each dot's N stays <= 2048 lanes: wide enough
    # to amortize the short K = D contraction's MXU pipeline fill without
    # blowing the VMEM budget (a 4P-wide dot at P = 512 already overflowed,
    # and 2P at P = 1024 does too)
    def zhalf(w1, w2):  # -> two (4, Lx, Ly, P) variant views
        if 2 * P <= 2048:
            Z = _dot(ct, jnp.concatenate([w1, w2], axis=1), _DN_KN)
            return (Z[:, :P].reshape(4, Lx, Ly, P),
                    Z[:, P:].reshape(4, Lx, Ly, P))
        return (_dot(ct, w1, _DN_KN).reshape(4, Lx, Ly, P),
                _dot(ct, w2, _DN_KN).reshape(4, Lx, Ly, P))

    def yred(Zm, wy):  # (4, Lx, Ly, P) x (Ly, P) -> (4, Lx, P)
        return jnp.sum(Zm * wy.reshape(1, 1, Ly, P), axis=2)

    def xred(Rm, wx):  # (4, Lx, P) x (Lx, P) -> (4, P)
        return jnp.sum(Rm * wx.reshape(1, Lx, P), axis=1)

    Z0, Zc = zhalf(Wz, WzD)
    R00 = yred(Z0, Wy)
    R0D = yred(Z0, WyD)
    Rd0 = yred(Z0, dWy)
    RdD = yred(Z0, dWyD)
    Rc00 = yred(Zc, Wy)
    Rcd = yred(Zc, dWy)
    Zd, Zcd = zhalf(dWz, dWzD)
    Rz00 = yred(Zd, Wy)
    RzD = yred(Zd, WyD)
    Rzc = yred(Zcd, Wy)

    T = xred(R00, Wx)      # (4, P): s=0..2 mom, 3 mass
    TA = xred(R00, WxD)
    TB = xred(R0D, Wx)
    TC = xred(Rc00, Wx)
    Dx = xred(R00, dWx)
    DxA = xred(R00, dWxD)
    DxB = xred(R0D, dWx)
    DxC = xred(Rc00, dWx)
    Dy = xred(Rd0, Wx)
    DyA = xred(Rd0, WxD)
    DyB = xred(RdD, Wx)
    DyC = xred(Rcd, Wx)
    Dz = xred(Rz00, Wx)
    DzA = xred(Rz00, WxD)
    DzB = xred(RzD, Wx)
    DzC = xred(Rzc, Wx)

    A = [p_mass * v[s] for s in range(3)]
    Ba = [dx * aff[s][0] for s in range(3)]
    Bb = [dx * aff[s][1] for s in range(3)]
    Bc = [dx * aff[s][2] for s in range(3)]

    # d/dx through the weight products (chain dfx/dx = inv_dx); the dpos
    # chain (d dpos/dx = -inv_dx) lives inside the dWD variants.
    def dsum(Dp, DpA, DpB, DpC):
        tot = p_mass * Dp[3:4]
        for s in range(3):
            tot = tot + (A[s] * Dp[s : s + 1] + Ba[s] * DpA[s : s + 1]
                         + Bb[s] * DpB[s : s + 1] + Bc[s] * DpC[s : s + 1])
        return tot

    gx = inv_dx * dsum(Dx, DxA, DxB, DxC)
    gy = inv_dx * dsum(Dy, DyA, DyB, DyC)
    gz = inv_dx * dsum(Dz, DzA, DzB, DzC)

    out_ref[0:1, :] = gx * mask
    out_ref[1:2, :] = gy * mask
    out_ref[2:3, :] = gz * mask
    for s in range(3):
        out_ref[3 + s : 4 + s, :] = p_mass * T[s : s + 1] * mask
        out_ref[6 + 3 * s : 7 + 3 * s, :] = dx * TA[s : s + 1] * mask
        out_ref[7 + 3 * s : 8 + 3 * s, :] = dx * TB[s : s + 1] * mask
        out_ref[8 + 3 * s : 9 + 3 * s, :] = dx * TC[s : s + 1] * mask


def _g2p_bwd_kernel(offs_ref, off_ref, rows_ref, g_ref, ct_ref, dg_ref,
                    dx_ref, *, Lx, Ly, D, G, dx, inv_dx, dt, nb=0, NC=0):
    """ct (15, P): ct_v0..2, ct_C00..22, ct_nx0..2 (zero on padded lanes).
    g (3, D, Ly, D): forward grid crop (residual), resident.
    dg (3, D, Ly, D): grid cotangent crop, accumulated; dx_ref (3, P)."""
    i, offs, off0 = _grid_ids(offs_ref, off_ref, nb, NC)
    dtype = dx_ref.dtype
    P = rows_ref.shape[1]

    @pl.when(i == 0)
    def _init():
        dg_ref[...] = jnp.zeros_like(dg_ref)

    x = [rows_ref[k : k + 1, :] for k in range(3)]
    px = [xi * inv_dx for xi in x]
    Wx, WxD, dWx, dWxD = _weights(px[0], offs[0], Lx, dtype, True)
    Wy, WyD, dWy, dWyD = _weights(px[1], offs[1], Ly, dtype, True)
    Wz, WzD, dWz, dWzD = _weights(px[2], offs[2], D, dtype, True)

    ct_v = [ct_ref[s : s + 1, :] for s in range(3)]
    ct_C = [[ct_ref[3 + 3 * s + j : 4 + 3 * s + j, :] for j in range(3)]
            for s in range(3)]
    ct_nx = [ct_ref[12 + s : 13 + s, :] for s in range(3)]

    ox = offs[0] - off0
    g = jnp.concatenate(
        [g_ref[s, pl.ds(ox, Lx)].reshape(Lx * Ly, D) for s in range(3)],
        axis=0,
    )  # (3*Lx*Ly, D), rows (s, a, b)

    def zhalf(w1, w2):  # -> two (3, Lx, Ly, P) variant views
        if 2 * P <= 2048:
            Z = _dot(g, jnp.concatenate([w1, w2], axis=1), _DN_KN)
            return (Z[:, :P].reshape(3, Lx, Ly, P),
                    Z[:, P:].reshape(3, Lx, Ly, P))
        return (_dot(g, w1, _DN_KN).reshape(3, Lx, Ly, P),
                _dot(g, w2, _DN_KN).reshape(3, Lx, Ly, P))

    def yred(Zm, wy):  # -> (3, Lx, P)
        return jnp.sum(Zm * wy.reshape(1, 1, Ly, P), axis=2)

    Z0, Zc = zhalf(Wz, WzD)
    Y00 = yred(Z0, Wy)
    YD0 = yred(Z0, WyD)
    Yd0 = yred(Z0, dWy)
    YdD = yred(Z0, dWyD)
    Yc00 = yred(Zc, Wy)
    Ycd = yred(Zc, dWy)
    Zd, Zcd = zhalf(dWz, dWzD)
    Yz00 = yred(Zd, Wy)
    YzD = yred(Zd, WyD)
    Yzc = yred(Zcd, Wy)

    V = jnp.sum(Y00 * Wx.reshape(1, Lx, P), axis=1)  # fwd velocities (3, P)

    # effective cotangents (the C cotangent's dpos factors live inside the
    # D-folded weight variants, so no rel0 terms appear here)
    lo = 0.0
    hi = 1.0 - 3.0 * dx
    ctveff, ctMa, ctMb, ctMc = [], [], [], []
    for s in range(3):
        vs = V[s : s + 1, :]
        xa = x[s] + dt * vs
        adv = jnp.logical_and(xa > lo, xa < hi).astype(dtype)
        ctMa.append(4.0 * inv_dx * ct_C[s][0])
        ctMb.append(4.0 * inv_dx * ct_C[s][1])
        ctMc.append(4.0 * inv_dx * ct_C[s][2])
        ctveff.append(ct_v[s] + dt * adv * ct_nx[s])

    # d/dx through the weight-variant triples; the advection direct term is
    # added at the end. Each jsum argument pairs a y-reduced moment with the
    # x-variant that completes the derivative triple.
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

    gx = inv_dx * jsum(Y00, Y00, YD0, Yc00, dWx, dWxD, dWx, dWx)
    gy = inv_dx * jsum(Yd0, Yd0, YdD, Ycd, Wx, WxD, Wx, Wx)
    gz = inv_dx * jsum(Yz00, Yz00, YzD, Yzc, Wx, WxD, Wx, Wx)
    for k, gk in enumerate((gx, gy, gz)):
        xa = x[k] + dt * V[k : k + 1, :]
        adv = jnp.logical_and(xa > lo, xa < hi).astype(dtype)
        dx_ref[k : k + 1, :] = gk + adv * ct_nx[k]

    # d/dg: staged outer products, one MXU dot, accumulated into the crop
    def outer(u, wy):
        t = u.reshape(Lx, 1, P) * wy.reshape(1, Ly, P)
        return t.reshape(Lx * Ly, P)

    E0 = jnp.concatenate(
        [outer(Wx * ctveff[s] + WxD * ctMa[s], Wy) + outer(Wx * ctMb[s], WyD)
         for s in range(3)],
        axis=0,
    )  # (3LxLy, P)
    E1 = jnp.concatenate([outer(Wx * ctMc[s], Wy) for s in range(3)], axis=0)
    t0 = _dot(E0, Wz, _DN_PP).reshape(3, Lx * Ly, D)
    t1 = _dot(E1, WzD, _DN_PP).reshape(3, Lx * Ly, D)
    for s in range(3):
        tile = (t0[s] + t1[s]).reshape(Lx, Ly, D)
        dg_ref[s, pl.ds(ox, Lx)] = dg_ref[s, pl.ds(ox, Lx)] + tile


# ---------------------------------------------------------------------------
# XLA-side glue: packing (the (ch, D, Ly, D) crop is a pure reshape of the
# public (ch, D^3) x-major channel-major grid — no transposes anywhere)
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
    """Returns (p2g_fn, g2p_fn, p2g_rows, g2p_rows_fn) with Pallas forwards
    and hand-derived Pallas backwards, batched over locality chunks. The
    D^3 crop grid stays VMEM-resident across the chunk grid in every kernel
    (accumulated output for p2g / dg, sliced input for g2p / ct):

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
    assert Ly == D, "crop-resident kernels require full-depth y (Ly == D)"
    kw = dict(Lx=Lx, Ly=Ly, D=D, G=geom.G, dx=geom.dx, inv_dx=geom.inv_dx)
    f32 = jnp.float32
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    crop4 = pl.BlockSpec((4, D, Ly, D), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    crop3 = pl.BlockSpec((3, D, Ly, D), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)

    def p2g_call(rows16, offs, off):
        NC = offs.shape[0]
        return pl.pallas_call(
            functools.partial(_p2g_fwd_kernel, p_mass=geom.p_mass, **kw),
            grid=(NC,),
            in_specs=[
                smem, smem,
                pl.BlockSpec((16, P), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=crop4,
            out_shape=jax.ShapeDtypeStruct((4, D, Ly, D), f32),
            interpret=interpret,
        )(offs, off, rows16)

    def p2g_bwd_call(rows16, offs, off, ct_crop):
        NC = offs.shape[0]
        return pl.pallas_call(
            functools.partial(_p2g_bwd_kernel, p_mass=geom.p_mass, **kw),
            grid=(NC,),
            in_specs=[
                smem, smem,
                pl.BlockSpec((16, P), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                crop4,
            ],
            out_specs=pl.BlockSpec((15, P), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((15, NC * P), f32),
            interpret=interpret,
        )(offs, off, rows16, ct_crop)

    def g2p_call(rows4, g_crop, offs, off):
        NC = offs.shape[0]
        return pl.pallas_call(
            functools.partial(_g2p_fwd_kernel, dt=geom.dt, **kw),
            grid=(NC,),
            in_specs=[
                smem, smem,
                pl.BlockSpec((4, P), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                crop3,
            ],
            out_specs=pl.BlockSpec((15, P), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((15, NC * P), f32),
            interpret=interpret,
        )(offs, off, rows4, g_crop)

    def g2p_bwd_call(rows4, g_crop, ct_rows, offs, off):
        NC = offs.shape[0]
        return pl.pallas_call(
            functools.partial(_g2p_bwd_kernel, dt=geom.dt, **kw),
            grid=(NC,),
            in_specs=[
                smem, smem,
                pl.BlockSpec((4, P), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                crop3,
                pl.BlockSpec((15, P), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                crop3,
                pl.BlockSpec((3, P), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((3, D, Ly, D), f32),
                jax.ShapeDtypeStruct((3, NC * P), f32),
            ),
            interpret=interpret,
        )(offs, off, rows4, g_crop, ct_rows)

    def _zero_int(a):
        return np.zeros(a.shape, jax.dtypes.float0)

    # ---- rows-level core (the hot path: everything channel-major) ----

    @jax.custom_vjp
    def p2g_rows(rows16, offs, off):
        """rows16 (16, N) f32 [x3, v3, aff9, mask] -> grid4 (4, D^3)."""
        crop = p2g_call(rows16, offs, off)
        return crop.reshape(4, D ** 3)

    def p2g_rows_fwd(rows16, offs, off):
        return p2g_rows(rows16, offs, off), (rows16, offs, off)

    def p2g_rows_bwd(res, ct):
        rows16, offs, off = res
        ct_crop = ct.astype(f32).reshape(4, D, Ly, D)
        drows = p2g_bwd_call(rows16, offs, off, ct_crop)  # (15, N)
        d16 = jnp.concatenate([drows, jnp.zeros_like(drows[:1])], axis=0)
        return d16, _zero_int(offs), _zero_int(off)

    p2g_rows.defvjp(p2g_rows_fwd, p2g_rows_bwd)

    @jax.custom_vjp
    def g2p_rows_fn(rows4, grid3, offs, off):
        """rows4 (4, N) [x3, mask], grid3 (3, D^3) -> out15 (15, N)
        [v3, C9, nx3]."""
        g_crop = grid3.astype(f32).reshape(3, D, Ly, D)
        return g2p_call(rows4, g_crop, offs, off)

    def g2p_rows_fwd(rows4, grid3, offs, off):
        return g2p_rows_fn(rows4, grid3, offs, off), (rows4, grid3, offs, off)

    def g2p_rows_bwd(res, ct15):
        rows4, grid3, offs, off = res
        g_crop = grid3.astype(f32).reshape(3, D, Ly, D)
        dg_crop, dxr = g2p_bwd_call(rows4, g_crop, ct15.astype(f32), offs,
                                    off)
        d4 = jnp.concatenate([dxr, jnp.zeros_like(dxr[:1])], axis=0)
        return (d4, dg_crop.reshape(3, D ** 3).astype(grid3.dtype),
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


# ---------------------------------------------------------------------------
# batched variants: grid (B, NC), batch dim squeezed out of every VMEM block
# (leading None in the block shape), SMEM operands full-array (B, NC, 3) /
# (B, 3). Same kernel bodies (nb=1). This is the explicit form of what
# jax.vmap's pallas batching rule would build, minus the blocked-SMEM specs
# Mosaic rejects — it unblocks BASELINE config 5 (256 envs x 25k particles).
# ---------------------------------------------------------------------------


def transfer_fns_batched(scene, plan: LocalPlan, D: int,
                         interpret: bool = False):
    """Returns (p2g_rows_b, g2p_rows_b) on the FLAT batched rows layout:
    particle state for all B envs concatenated on the column axis, env b
    owning columns [b*N, (b+1)*N). Rows blocks use index map
    (b, i) -> column block b*NC + i, so the arrays are the same 2-D
    channel-major layout the single-env path uses (one wide sort upstream —
    a vmapped multi-operand lax.sort never finishes compiling in XLA:TPU,
    measured >14 min for B=4 before this design).

      p2g_rows_b(rows16 (16, B*N), offs (B, NC, 3), off (B, 3))
          -> grid4 (B, 4, D^3)
      g2p_rows_b(rows4 (4, B*N), grid3 (B, 3, D^3), offs, off)
          -> out15 (15, B*N)

    custom-VJP'd like the single-env fns (same hand-derived backward
    kernels, batched grids)."""
    sim = scene.simulator
    geom = _Geom(P=plan.P, Lx=plan.Lx, Ly=plan.Ly, D=D, G=sim.n_grid,
                 dx=float(sim.dx), inv_dx=float(sim.inv_dx),
                 p_mass=float(sim.p_mass), dt=float(sim.dt))
    key = ("batched", geom, interpret)
    if key in _CACHE:
        return _CACHE[key]

    P, Lx, Ly = geom.P, geom.Lx, geom.Ly
    assert Ly == D, "crop-resident kernels require full-depth y (Ly == D)"
    kw = dict(Lx=Lx, Ly=Ly, D=D, G=geom.G, dx=geom.dx, inv_dx=geom.inv_dx,
              nb=1)
    f32 = jnp.float32
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    crop4 = pl.BlockSpec((None, 4, D, Ly, D), lambda b, i: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    crop3 = pl.BlockSpec((None, 3, D, Ly, D), lambda b, i: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM)

    def rspec(rows, NC):
        return pl.BlockSpec((rows, P), lambda b, i: (0, b * NC + i),
                            memory_space=pltpu.VMEM)

    def p2g_call(rows16, offs, off):
        B, NC = offs.shape[0], offs.shape[1]
        return pl.pallas_call(
            functools.partial(_p2g_fwd_kernel, p_mass=geom.p_mass, NC=NC,
                              **kw),
            grid=(B, NC),
            in_specs=[smem, smem, rspec(16, NC)],
            out_specs=crop4,
            out_shape=jax.ShapeDtypeStruct((B, 4, D, Ly, D), f32),
            interpret=interpret,
            compiler_params=cparams,
        )(offs.reshape(-1), off.reshape(-1), rows16)

    def p2g_bwd_call(rows16, offs, off, ct_crop):
        B, NC = offs.shape[0], offs.shape[1]
        return pl.pallas_call(
            functools.partial(_p2g_bwd_kernel, p_mass=geom.p_mass, NC=NC,
                              **kw),
            grid=(B, NC),
            in_specs=[smem, smem, rspec(16, NC), crop4],
            out_specs=rspec(15, NC),
            out_shape=jax.ShapeDtypeStruct((15, B * NC * P), f32),
            interpret=interpret,
            compiler_params=cparams,
        )(offs.reshape(-1), off.reshape(-1), rows16, ct_crop)

    def g2p_call(rows4, g_crop, offs, off):
        B, NC = offs.shape[0], offs.shape[1]
        return pl.pallas_call(
            functools.partial(_g2p_fwd_kernel, dt=geom.dt, NC=NC, **kw),
            grid=(B, NC),
            in_specs=[smem, smem, rspec(4, NC), crop3],
            out_specs=rspec(15, NC),
            out_shape=jax.ShapeDtypeStruct((15, B * NC * P), f32),
            interpret=interpret,
            compiler_params=cparams,
        )(offs.reshape(-1), off.reshape(-1), rows4, g_crop)

    def g2p_bwd_call(rows4, g_crop, ct_rows, offs, off):
        B, NC = offs.shape[0], offs.shape[1]
        return pl.pallas_call(
            functools.partial(_g2p_bwd_kernel, dt=geom.dt, NC=NC, **kw),
            grid=(B, NC),
            in_specs=[smem, smem, rspec(4, NC), crop3, rspec(15, NC)],
            out_specs=(crop3, rspec(3, NC)),
            out_shape=(
                jax.ShapeDtypeStruct((B, 3, D, Ly, D), f32),
                jax.ShapeDtypeStruct((3, B * NC * P), f32),
            ),
            interpret=interpret,
            compiler_params=cparams,
        )(offs.reshape(-1), off.reshape(-1), rows4, g_crop, ct_rows)

    def _zero_int(a):
        return np.zeros(a.shape, jax.dtypes.float0)

    @jax.custom_vjp
    def p2g_rows_b(rows16, offs, off):
        B = offs.shape[0]
        return p2g_call(rows16, offs, off).reshape(B, 4, D ** 3)

    def p2g_rows_b_fwd(rows16, offs, off):
        return p2g_rows_b(rows16, offs, off), (rows16, offs, off)

    def p2g_rows_b_bwd(res, ct):
        rows16, offs, off = res
        B = offs.shape[0]
        ct_crop = ct.astype(f32).reshape(B, 4, D, Ly, D)
        drows = p2g_bwd_call(rows16, offs, off, ct_crop)  # (15, B*N)
        d16 = jnp.concatenate([drows, jnp.zeros_like(drows[:1])], axis=0)
        return d16, _zero_int(offs), _zero_int(off)

    p2g_rows_b.defvjp(p2g_rows_b_fwd, p2g_rows_b_bwd)

    @jax.custom_vjp
    def g2p_rows_b(rows4, grid3, offs, off):
        B = offs.shape[0]
        g_crop = grid3.astype(f32).reshape(B, 3, D, Ly, D)
        return g2p_call(rows4, g_crop, offs, off)

    def g2p_rows_b_fwd(rows4, grid3, offs, off):
        return g2p_rows_b(rows4, grid3, offs, off), (rows4, grid3, offs, off)

    def g2p_rows_b_bwd(res, ct15):
        rows4, grid3, offs, off = res
        B = offs.shape[0]
        g_crop = grid3.astype(f32).reshape(B, 3, D, Ly, D)
        dg_crop, dxr = g2p_bwd_call(rows4, g_crop, ct15.astype(f32), offs,
                                    off)
        d4 = jnp.concatenate([dxr, jnp.zeros_like(dxr[:1])], axis=0)
        return (d4, dg_crop.reshape(B, 3, D ** 3).astype(grid3.dtype),
                _zero_int(offs), _zero_int(off))

    g2p_rows_b.defvjp(g2p_rows_b_fwd, g2p_rows_b_bwd)

    fns = (p2g_rows_b, g2p_rows_b)
    _CACHE[key] = fns
    return fns


def mass_fns_batched(scene, plan: LocalPlan, D: int, interpret: bool = False):
    """mass_rows_b(rows4 (4, B*N), offs (B, NC, 3), off (B, 3)) -> (B, D^3)
    — batched variant of mass_fns on the flat rows layout (same kernels,
    grid (B, NC))."""
    sim = scene.simulator
    geom = _Geom(P=plan.P, Lx=plan.Lx, Ly=plan.Ly, D=D, G=sim.n_grid,
                 dx=float(sim.dx), inv_dx=float(sim.inv_dx),
                 p_mass=float(sim.p_mass), dt=float(sim.dt))
    key = ("mass_batched", geom, interpret)
    if key in _CACHE:
        return _CACHE[key]

    P, Lx, Ly = geom.P, geom.Lx, geom.Ly
    assert Ly == D
    kw = dict(Lx=Lx, Ly=Ly, D=D, G=geom.G, dx=geom.dx, inv_dx=geom.inv_dx,
              p_mass=geom.p_mass, nb=1)
    f32 = jnp.float32
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    crop1 = pl.BlockSpec((None, D, Ly, D), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)

    def rspec(rows, NC):
        return pl.BlockSpec((rows, P), lambda b, i: (0, b * NC + i),
                            memory_space=pltpu.VMEM)

    def fwd_call(rows4, offs, off):
        B, NC = offs.shape[0], offs.shape[1]
        return pl.pallas_call(
            functools.partial(_mass_fwd_kernel, NC=NC, **kw),
            grid=(B, NC),
            in_specs=[smem, smem, rspec(4, NC)],
            out_specs=crop1,
            out_shape=jax.ShapeDtypeStruct((B, D, Ly, D), f32),
            interpret=interpret,
            compiler_params=cparams,
        )(offs.reshape(-1), off.reshape(-1), rows4)

    def bwd_call(rows4, offs, off, ct_crop):
        B, NC = offs.shape[0], offs.shape[1]
        return pl.pallas_call(
            functools.partial(_mass_bwd_kernel, NC=NC, **kw),
            grid=(B, NC),
            in_specs=[smem, smem, rspec(4, NC), crop1],
            out_specs=rspec(3, NC),
            out_shape=jax.ShapeDtypeStruct((3, B * NC * P), f32),
            interpret=interpret,
            compiler_params=cparams,
        )(offs.reshape(-1), off.reshape(-1), rows4, ct_crop)

    def _zero_int(a):
        return np.zeros(a.shape, jax.dtypes.float0)

    @jax.custom_vjp
    def mass_rows_b(rows4, offs, off):
        B = offs.shape[0]
        return fwd_call(rows4, offs, off).reshape(B, D ** 3)

    def mass_rows_b_fwd(rows4, offs, off):
        return mass_rows_b(rows4, offs, off), (rows4, offs, off)

    def mass_rows_b_bwd(res, ct):
        rows4, offs, off = res
        B = offs.shape[0]
        dxr = bwd_call(rows4, offs, off, ct.astype(f32).reshape(B, D, Ly, D))
        d4 = jnp.concatenate([dxr, jnp.zeros_like(dxr[:1])], axis=0)
        return d4, _zero_int(offs), _zero_int(off)

    mass_rows_b.defvjp(mass_rows_b_fwd, mass_rows_b_bwd)
    _CACHE[key] = mass_rows_b
    return mass_rows_b


# ---------------------------------------------------------------------------
# mass-only transfer (the per-env-step loss grid: reference
# compute_grid_m_kernel, mpm_simulator.py:382-392) — same window machinery,
# ~1/7 of the full p2g's work
# ---------------------------------------------------------------------------

def _mass_fwd_kernel(offs_ref, off_ref, rows_ref, out_ref, *, Lx, Ly, D, G,
                     dx, inv_dx, p_mass, nb=0, NC=0):
    """rows (4, P): x0..2, mask. out (D, Ly, D): mass crop, accumulated."""
    i, offs, off0 = _grid_ids(offs_ref, off_ref, nb, NC)
    dtype = out_ref.dtype
    P = rows_ref.shape[1]

    @pl.when(i == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    x = [rows_ref[k : k + 1, :] for k in range(3)]
    mask = rows_ref[3:4, :]
    px = [xi * inv_dx for xi in x]
    Wx, _, _, _ = _weights(px[0], offs[0], Lx, dtype, False)
    Wy, _, _, _ = _weights(px[1], offs[1], Ly, dtype, False)
    Wz, _, _, _ = _weights(px[2], offs[2], D, dtype, False)

    m_row = jnp.broadcast_to(jnp.asarray(p_mass, dtype), mask.shape) * mask
    u = Wx * m_row
    E = (u.reshape(Lx, 1, P) * Wy.reshape(1, Ly, P)).reshape(Lx * Ly, P)
    tile = _dot(E, Wz, _DN_PP).reshape(Lx, Ly, D)

    ox = offs[0] - off0
    out_ref[pl.ds(ox, Lx)] = out_ref[pl.ds(ox, Lx)] + tile


def _mass_bwd_kernel(offs_ref, off_ref, rows_ref, ct_ref, dx_ref, *, Lx, Ly,
                     D, G, dx, inv_dx, p_mass, nb=0, NC=0):
    """ct (D, Ly, D): mass-crop cotangent, resident. dx_ref (3, P)."""
    i, offs, off0 = _grid_ids(offs_ref, off_ref, nb, NC)
    dtype = dx_ref.dtype
    P = rows_ref.shape[1]

    x = [rows_ref[k : k + 1, :] for k in range(3)]
    mask = rows_ref[3:4, :]
    px = [xi * inv_dx for xi in x]
    Wx, _, dWx, _ = _weights(px[0], offs[0], Lx, dtype, True)
    Wy, _, dWy, _ = _weights(px[1], offs[1], Ly, dtype, True)
    Wz, _, dWz, _ = _weights(px[2], offs[2], D, dtype, True)

    ox = offs[0] - off0
    ct = ct_ref[pl.ds(ox, Lx)].reshape(Lx * Ly, D)  # rows (a, b)

    if 2 * P <= 2048:
        Z = _dot(ct, jnp.concatenate([Wz, dWz], axis=1), _DN_KN)
        Z0 = Z[:, :P].reshape(Lx, Ly, P)
        Zd = Z[:, P:].reshape(Lx, Ly, P)
    else:
        Z0 = _dot(ct, Wz, _DN_KN).reshape(Lx, Ly, P)
        Zd = _dot(ct, dWz, _DN_KN).reshape(Lx, Ly, P)

    def yred(Zm, wy):  # (Lx, Ly, P) x (Ly, P) -> (Lx, P)
        return jnp.sum(Zm * wy.reshape(1, Ly, P), axis=1)

    def xred(Ym, wx):  # -> (1, P)
        return jnp.sum(Ym * wx, axis=0, keepdims=True)

    scale = inv_dx * p_mass
    dx_ref[0:1, :] = scale * xred(yred(Z0, Wy), dWx) * mask
    dx_ref[1:2, :] = scale * xred(yred(Z0, dWy), Wx) * mask
    dx_ref[2:3, :] = scale * xred(yred(Zd, Wy), Wx) * mask


def mass_fns(scene, plan: LocalPlan, D: int, interpret: bool = False):
    """Returns mass_rows(rows4 (4, N) [x3, mask], offs, off) -> (D^3,) mass
    crop with a hand-derived Pallas backward (d/dx only)."""
    sim = scene.simulator
    geom = _Geom(P=plan.P, Lx=plan.Lx, Ly=plan.Ly, D=D, G=sim.n_grid,
                 dx=float(sim.dx), inv_dx=float(sim.inv_dx),
                 p_mass=float(sim.p_mass), dt=float(sim.dt))
    key = ("mass", geom, interpret)
    if key in _CACHE:
        return _CACHE[key]

    P, Lx, Ly = geom.P, geom.Lx, geom.Ly
    assert Ly == D
    kw = dict(Lx=Lx, Ly=Ly, D=D, G=geom.G, dx=geom.dx, inv_dx=geom.inv_dx,
              p_mass=geom.p_mass)
    f32 = jnp.float32
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    crop1 = pl.BlockSpec((D, Ly, D), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)

    def fwd_call(rows4, offs, off):
        NC = offs.shape[0]
        return pl.pallas_call(
            functools.partial(_mass_fwd_kernel, **kw),
            grid=(NC,),
            in_specs=[smem, smem,
                      pl.BlockSpec((4, P), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=crop1,
            out_shape=jax.ShapeDtypeStruct((D, Ly, D), f32),
            interpret=interpret,
            compiler_params=cparams,
        )(offs, off, rows4)

    def bwd_call(rows4, offs, off, ct_crop):
        NC = offs.shape[0]
        return pl.pallas_call(
            functools.partial(_mass_bwd_kernel, **kw),
            grid=(NC,),
            in_specs=[smem, smem,
                      pl.BlockSpec((4, P), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
                      crop1],
            out_specs=pl.BlockSpec((3, P), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3, NC * P), f32),
            interpret=interpret,
            compiler_params=cparams,
        )(offs, off, rows4, ct_crop)

    def _zero_int(a):
        return np.zeros(a.shape, jax.dtypes.float0)

    @jax.custom_vjp
    def mass_rows(rows4, offs, off):
        return fwd_call(rows4, offs, off).reshape(D ** 3)

    def mass_rows_fwd(rows4, offs, off):
        return mass_rows(rows4, offs, off), (rows4, offs, off)

    def mass_rows_bwd(res, ct):
        rows4, offs, off = res
        dxr = bwd_call(rows4, offs, off,
                       ct.astype(f32).reshape(D, Ly, D))
        d4 = jnp.concatenate([dxr, jnp.zeros_like(dxr[:1])], axis=0)
        return d4, _zero_int(offs), _zero_int(off)

    mass_rows.defvjp(mass_rows_fwd, mass_rows_bwd)
    _CACHE[key] = mass_rows
    return mass_rows
