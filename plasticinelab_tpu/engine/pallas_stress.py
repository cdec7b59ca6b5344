"""Fused Pallas TPU kernels: F-update + 3x3 SVD + von Mises + stress + affine,
forward AND hand-derived backward.

The particle-side physics (stress_affine in mpm.py) is ~1000 tiny elementwise
HLO ops; XLA's kernel overheads made it a dominant substep cost. These kernels
fuse the whole chain into one pallas_call per direction, everything in VMEM.

Layout: structure-of-arrays — each 3x3 component is its own (rows, 128) f32
tile (36 refs forward, 54 backward). Materials are baked in as scalar
constants (the reference fills per-particle fields uniformly,
mpm_simulator.py:53-57).

The backward implements the exact adjoint of the forward chain, using the
damped-eigengap SVD cotangent formula (see engine/svd3.py — the reference's
backward_svd with a Lorentzian gap inverse for f32 stability). Verified
against jax.vjp of the pure-jnp implementation in tests.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .svd3 import _GAP_EPS

_N_SWEEPS = 6


# ---------------------------------------------------------------------------
# small 3x3 helpers on component lists (each entry a (rows,128) array)
# ---------------------------------------------------------------------------

def _matmul(A, B):
    return [[sum(A[i][k] * B[k][j] for k in range(3)) for j in range(3)]
            for i in range(3)]


def _matmul_t(A, B):  # A @ B^T
    return [[sum(A[i][k] * B[j][k] for k in range(3)) for j in range(3)]
            for i in range(3)]


def _tmatmul(A, B):  # A^T @ B
    return [[sum(A[k][i] * B[k][j] for k in range(3)) for j in range(3)]
            for i in range(3)]


def _col(M, j):
    return [M[0][j], M[1][j], M[2][j]]


def _cross(x, y):
    return [
        x[1] * y[2] - x[2] * y[1],
        x[2] * y[0] - x[0] * y[2],
        x[0] * y[1] - x[1] * y[0],
    ]


def _dot3(x, y):
    return x[0] * y[0] + x[1] * y[1] + x[2] * y[2]


def _forward_core(C, F, *, dt, mu, ys):
    """Shared forward chain: returns dict of every intermediate the backward
    needs. C, F: 3x3 component lists."""
    one = jnp.ones_like(C[0][0])
    zero = jnp.zeros_like(C[0][0])

    IdtC = [[(one if i == j else zero) + dt * C[i][j] for j in range(3)]
            for i in range(3)]
    Ft = _matmul(IdtC, F)

    # Jacobi eigendecomposition of A = Ft^T Ft
    A = _tmatmul(Ft, Ft)
    a = {(i, j): A[i][j] for i in range(3) for j in range(3) if i <= j}
    v = {(i, j): (one if i == j else zero) for i in range(3) for j in range(3)}
    for _ in range(_N_SWEEPS):
        for (p, q) in ((0, 1), (0, 2), (1, 2)):
            r = 3 - p - q
            app, aqq, apq = a[(p, p)], a[(q, q)], a[(p, q)]
            y = 2.0 * apq
            z = aqq - app
            # scale-invariant hypot normalization (see svd3._jacobi_rotation)
            mm = jnp.maximum(jnp.abs(y), jnp.abs(z))
            ok = jnp.abs(y) > 0
            mm_safe = jnp.where(mm > 0, mm, one)
            ym = y / mm_safe
            zm = z / mm_safe
            rinv = jax.lax.rsqrt(jnp.maximum(ym * ym + zm * zm, 1e-30))
            cos2t = zm * rinv
            sin2t = ym * rinv
            # stable half-angles (see svd3._jacobi_rotation)
            c_raw = jnp.sqrt(jnp.maximum((1.0 + cos2t) * 0.5, 1e-30))
            s_raw = jnp.sqrt(jnp.maximum((1.0 - cos2t) * 0.5, 1e-30))
            pos_b = cos2t >= 0
            cth = jnp.where(pos_b, c_raw, jnp.abs(sin2t) * 0.5 / s_raw)
            sth = jnp.where(pos_b, sin2t * 0.5 / c_raw,
                            jnp.sign(sin2t) * s_raw)
            cth = jnp.where(ok, cth, one)
            sth = jnp.where(ok, sth, zero)
            cc, ss, cs = cth * cth, sth * sth, cth * sth
            apr = a[(min(p, r), max(p, r))]
            aqr = a[(min(q, r), max(q, r))]
            a[(p, p)] = cc * app - 2.0 * cs * apq + ss * aqq
            a[(q, q)] = ss * app + 2.0 * cs * apq + cc * aqq
            a[(p, q)] = cs * (app - aqq) + (cc - ss) * apq
            a[(min(p, r), max(p, r))] = cth * apr - sth * aqr
            a[(min(q, r), max(q, r))] = sth * apr + cth * aqr
            for i in range(3):
                vip, viq = v[(i, p)], v[(i, q)]
                v[(i, p)] = cth * vip - sth * viq
                v[(i, q)] = sth * vip + cth * viq

    w = [a[(0, 0)], a[(1, 1)], a[(2, 2)]]
    V = [[v[(i, j)] for j in range(3)] for i in range(3)]

    def cswap(w, V, i, j):
        swap = w[i] < w[j]
        wi = jnp.where(swap, w[j], w[i])
        wj = jnp.where(swap, w[i], w[j])
        w[i], w[j] = wi, wj
        for rr in range(3):
            vi = jnp.where(swap, V[rr][j], V[rr][i])
            vj = jnp.where(swap, V[rr][i], V[rr][j])
            V[rr][i], V[rr][j] = vi, vj

    cswap(w, V, 0, 1)
    cswap(w, V, 0, 2)
    cswap(w, V, 1, 2)

    detV = _dot3(_cross(_col(V, 0), _col(V, 1)), _col(V, 2))
    flip = jnp.where(detV < 0, -one, one)
    for rr in range(3):
        V[rr][2] = V[rr][2] * flip

    FV = _matmul(Ft, V)

    def safe_normalize(x, fallback):
        n2 = _dot3(x, x)
        okn = n2 > 1e-16
        inv = jax.lax.rsqrt(jnp.where(okn, n2, one))
        return [jnp.where(okn, x[i] * inv, fallback[i]) for i in range(3)]

    e0 = [one, zero, zero]
    e1 = [zero, one, zero]
    e2 = [zero, zero, one]
    u0 = safe_normalize(_col(FV, 0), e0)
    raw1 = _col(FV, 1)
    d01 = _dot3(raw1, u0)
    raw1 = [raw1[i] - d01 * u0[i] for i in range(3)]
    alt = [jnp.where(jnp.abs(u0[1]) < 0.9, e1[i], e2[i]) for i in range(3)]
    dalt = _dot3(alt, u0)
    alt = [alt[i] - dalt * u0[i] for i in range(3)]
    alt = safe_normalize(alt, e1)
    u1 = safe_normalize(raw1, alt)
    u2 = _cross(u0, u1)
    U = [[u0[i], u1[i], u2[i]] for i in range(3)]
    sig = [_dot3(_col(FV, j), _col(U, j)) for j in range(3)]

    # von Mises return mapping
    sc = [jnp.maximum(s, 0.05) for s in sig]
    eps = [jnp.log(s) for s in sc]
    m = (eps[0] + eps[1] + eps[2]) / 3.0
    eh = [e - m for e in eps]
    ehn = jnp.sqrt(eh[0] * eh[0] + eh[1] * eh[1] + eh[2] * eh[2] + 1e-8)
    cy = ys / (2.0 * mu)
    dg = ehn - cy
    yields = dg > 0
    fac = dg / ehn
    ep = [eps[i] - fac * eh[i] for i in range(3)]
    f = [jnp.exp(e) for e in ep]
    Fvm = [[sum(U[i][k] * f[k] * V[j][k] for k in range(3)) for j in range(3)]
           for i in range(3)]
    newF = [[jnp.where(yields, Fvm[i][j], Ft[i][j]) for j in range(3)]
            for i in range(3)]

    cr = _cross(newF[0], newF[1])
    J = _dot3(cr, newF[2])
    R = _matmul_t(U, V)  # U @ V^T
    FmR = [[newF[i][j] - R[i][j] for j in range(3)] for i in range(3)]
    S = _matmul_t(FmR, newF)

    return dict(
        one=one, zero=zero, IdtC=IdtC, Ft=Ft, U=U, V=V, sig=sig, sc=sc,
        eh=eh, ehn=ehn, cy=cy, yields=yields, f=f, newF=newF, J=J, R=R,
        FmR=FmR, S=S,
    )


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(*refs, dt, mu, lam, ys, coeff, p_mass):
    c_refs, f_refs = refs[0:9], refs[9:18]
    nf_refs, aff_refs = refs[18:27], refs[27:36]
    C = [[c_refs[i * 3 + j][:] for j in range(3)] for i in range(3)]
    F = [[f_refs[i * 3 + j][:] for j in range(3)] for i in range(3)]

    o = _forward_core(C, F, dt=dt, mu=mu, ys=ys)
    newF, S, J, zero = o["newF"], o["S"], o["J"], o["zero"]
    lamJ = lam * J * (J - 1.0)
    for i in range(3):
        for j in range(3):
            val = 2.0 * mu * S[i][j] + (lamJ if i == j else zero)
            val = coeff * val + p_mass * C[i][j]
            aff_refs[i * 3 + j][:] = val
            nf_refs[i * 3 + j][:] = newF[i][j]


# ---------------------------------------------------------------------------
# backward kernel: hand-derived adjoint of the whole chain
# ---------------------------------------------------------------------------

def _bwd_kernel(*refs, dt, mu, lam, ys, coeff, p_mass, gap_eps):
    c_refs, f_refs = refs[0:9], refs[9:18]
    gnf_refs, gaff_refs = refs[18:27], refs[27:36]
    gc_refs, gf_refs = refs[36:45], refs[45:54]

    C = [[c_refs[i * 3 + j][:] for j in range(3)] for i in range(3)]
    F = [[f_refs[i * 3 + j][:] for j in range(3)] for i in range(3)]
    gNF = [[gnf_refs[i * 3 + j][:] for j in range(3)] for i in range(3)]
    gAff = [[gaff_refs[i * 3 + j][:] for j in range(3)] for i in range(3)]

    o = _forward_core(C, F, dt=dt, mu=mu, ys=ys)
    one, zero = o["one"], o["zero"]
    Ft, U, V, sig, sc = o["Ft"], o["U"], o["V"], o["sig"], o["sc"]
    eh, ehn, cy, yields, f = o["eh"], o["ehn"], o["cy"], o["yields"], o["f"]
    newF, J, R, FmR = o["newF"], o["J"], o["R"], o["FmR"]

    # ---- stress/affine adjoint ----
    gStress = [[coeff * gAff[i][j] for j in range(3)] for i in range(3)]
    gS = [[2.0 * mu * gStress[i][j] for j in range(3)] for i in range(3)]
    trg = gStress[0][0] + gStress[1][1] + gStress[2][2]
    gJ = lam * (2.0 * J - 1.0) * trg

    # S = (newF - R) @ newF^T
    gS_nF = _matmul(gS, newF)                 # gS @ newF
    gSt_FmR = _tmatmul(gS, FmR)               # gS^T @ (newF - R)
    # cofactor(newF): rows are cross products of the other two rows (cyclic)
    cof = [
        _cross(newF[1], newF[2]),
        _cross(newF[2], newF[0]),
        _cross(newF[0], newF[1]),
    ]
    gNewF = [[gNF[i][j] + gS_nF[i][j] + gSt_FmR[i][j] + gJ * cof[i][j]
              for j in range(3)] for i in range(3)]
    gR = [[-gS_nF[i][j] for j in range(3)] for i in range(3)]

    # ---- von Mises adjoint (yield lanes) ----
    # gU_vm = gNewF @ V @ diag(f); gV_vm = gNewF^T @ U @ diag(f)
    gNFV = _matmul(gNewF, V)
    gU_vm = [[gNFV[i][k] * f[k] for k in range(3)] for i in range(3)]
    gNFtU = _tmatmul(gNewF, U)
    gV_vm = [[gNFtU[i][k] * f[k] for k in range(3)] for i in range(3)]
    # gf_k = sum_ij U_ik gNewF_ij V_jk = (U^T gNewF V)_kk
    UtgNF = _tmatmul(U, gNewF)
    UtgNFV = _matmul(UtgNF, V)
    gf = [UtgNFV[k][k] for k in range(3)]
    gep = [gf[k] * f[k] for k in range(3)]

    # eps_p = m + (cy/ehn) * eh  (identical to eps - fac*eh)
    sum_gep = gep[0] + gep[1] + gep[2]
    # gm part: dm = mean(d_eps); and the eh-channel map transpose:
    ehn2 = ehn * ehn
    dot_eh_gep = eh[0] * gep[0] + eh[1] * gep[1] + eh[2] * gep[2]
    geh = [cy * (gep[k] / ehn - eh[k] * dot_eh_gep / (ehn2 * ehn))
           for k in range(3)]
    # eh = eps - mean(eps):  g_eps += geh - mean(geh); plus the m-channel
    mean_geh = (geh[0] + geh[1] + geh[2]) / 3.0
    geps = [geh[k] - mean_geh + sum_gep / 3.0 for k in range(3)]
    # eps = log(max(sig, 0.05))
    gsig_vm = [jnp.where(sig[k] > 0.05, geps[k] / sc[k], zero)
               for k in range(3)]

    # select: yield lanes route gNewF through (U,f,V); others directly to Ft
    ym = yields
    gsig = [jnp.where(ym, gsig_vm[k], zero) for k in range(3)]
    # R-path cotangents flow in ALL lanes: gU_r = gR @ V; gV_r = gR^T @ U
    gR_V = _matmul(gR, V)
    gRt_U = _tmatmul(gR, U)
    gU = [[jnp.where(ym, gU_vm[i][j], zero) + gR_V[i][j] for j in range(3)]
          for i in range(3)]
    gV = [[jnp.where(ym, gV_vm[i][j], zero) + gRt_U[i][j] for j in range(3)]
          for i in range(3)]
    gFt_direct = [[jnp.where(ym, zero, gNewF[i][j]) for j in range(3)]
                  for i in range(3)]

    # ---- SVD adjoint (damped eigengap, svd3.py formula) ----
    s2 = [sig[k] * sig[k] for k in range(3)]
    Fm = [[zero for _ in range(3)] for _ in range(3)]
    for i in range(3):
        for j in range(3):
            if i != j:
                gap = s2[j] - s2[i]
                Fm[i][j] = gap / (gap * gap + gap_eps * gap_eps)

    UtgU = _tmatmul(U, gU)
    inner_u = [[Fm[i][j] * (UtgU[i][j] - UtgU[j][i]) for j in range(3)]
               for i in range(3)]
    VtgV = _tmatmul(V, gV)
    inner_v = [[Fm[i][j] * (VtgV[i][j] - VtgV[j][i]) for j in range(3)]
               for i in range(3)]

    # u_term = U @ (inner_u * diag(sig)) @ V^T ; v_term = U @ (diag(sig) * inner_v) @ V^T
    mid = [[inner_u[i][j] * sig[j] + sig[i] * inner_v[i][j]
            + (gsig[i] if i == j else zero) for j in range(3)]
           for i in range(3)]
    U_mid = _matmul(U, mid)
    gFt_svd = _matmul_t(U_mid, V)  # (U @ mid) @ V^T

    gFt = [[gFt_direct[i][j] + gFt_svd[i][j] for j in range(3)]
           for i in range(3)]

    # ---- Ft = (I + dt C) F adjoint ----
    gC_from_Ft = _matmul_t(gFt, F)  # gFt @ F^T
    IdtC = o["IdtC"]
    gF = _tmatmul(IdtC, gFt)        # (I + dtC)^T @ gFt

    for i in range(3):
        for j in range(3):
            gc_refs[i * 3 + j][:] = p_mass * gAff[i][j] + dt * gC_from_Ft[i][j]
            gf_refs[i * 3 + j][:] = gF[i][j]


# ---------------------------------------------------------------------------
# host wrappers
# ---------------------------------------------------------------------------

def _to_comps(M, n, n_pad, dtype, pad_identity=False):
    m9 = jnp.moveaxis(M.reshape(n, 9), 0, 1)
    if n_pad != n:
        if pad_identity:
            extra = jnp.tile(
                jnp.asarray([1, 0, 0, 0, 1, 0, 0, 0, 1], dtype)[:, None],
                (1, n_pad - n),
            )
        else:
            extra = jnp.zeros((9, n_pad - n), dtype)
        m9 = jnp.concatenate([m9, extra], axis=1)
    return [m9[i].reshape(n_pad // 128, 128) for i in range(9)]


def _from_comps(comps, n):
    n_pad = comps[0].size
    m9 = jnp.stack([c.reshape(n_pad) for c in comps])
    return jnp.moveaxis(m9[:, :n], 0, 1).reshape(n, 3, 3)


def _consts(scene, mats):
    sim = scene.simulator
    return dict(
        dt=float(sim.dt), mu=float(mats.mu), lam=float(mats.lam),
        ys=float(mats.yield_stress),
        coeff=float(-sim.dt * sim.p_vol * 4 * sim.inv_dx * sim.inv_dx),
        p_mass=float(sim.p_mass),
    )


_ROWS = 16
_BLOCK = _ROWS * 128


def _pad_n(n):
    return ((n + _BLOCK - 1) // _BLOCK) * _BLOCK


def stress_affine_pallas(scene, mats, C, F):
    """Pallas forward; same outputs as mpm.stress_affine_jnp."""
    n = C.shape[0]
    dtype = C.dtype
    n_pad = _pad_n(n)
    comps = _to_comps(C, n, n_pad, dtype) + _to_comps(F, n, n_pad, dtype, True)

    kern = functools.partial(_fwd_kernel, **_consts(scene, mats))
    spec = pl.BlockSpec((_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(n_pad // _BLOCK,),
        in_specs=[spec] * 18,
        out_specs=[spec] * 18,
        out_shape=[jax.ShapeDtypeStruct((n_pad // 128, 128), dtype)] * 18,
    )(*comps)
    return _from_comps(out[0:9], n), _from_comps(out[9:18], n)


def stress_affine_pallas_bwd(scene, mats, C, F, gNewF, gAffine):
    """Pallas backward: returns (gC, gF)."""
    n = C.shape[0]
    dtype = C.dtype
    n_pad = _pad_n(n)
    comps = (
        _to_comps(C, n, n_pad, dtype)
        + _to_comps(F, n, n_pad, dtype, True)
        + _to_comps(gNewF, n, n_pad, dtype)
        + _to_comps(gAffine, n, n_pad, dtype)
    )
    kern = functools.partial(
        _bwd_kernel, **_consts(scene, mats), gap_eps=float(_GAP_EPS)
    )
    spec = pl.BlockSpec((_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(n_pad // _BLOCK,),
        in_specs=[spec] * 36,
        out_specs=[spec] * 18,
        out_shape=[jax.ShapeDtypeStruct((n_pad // 128, 128), dtype)] * 18,
    )(*comps)
    return _from_comps(out[0:9], n), _from_comps(out[9:18], n)


# ---------------------------------------------------------------------------
# rows-layout wrapper (the TPU fast path): state as (18, N) channel rows
# ---------------------------------------------------------------------------

_ROWS_CACHE = {}


def stress_affine_rows(scene, mats, interpret: bool = False):
    """Returns fn(rowsCF (18, N) or (B, 18, N) f32) -> same shape: channel
    rows 0-8 new_F, 9-17 affine. N must be a multiple of 2048 (= the
    kernel's 16x128 block). Channel rows ARE the kernel's component tiles
    (reshape only — no (n, 3, 3) transposes), so this wrapper adds no
    layout traffic; a leading batch dim just folds into the grid (the
    kernels are block-local elementwise). Same forward/backward kernels as
    stress_affine_pallas."""
    key = (scene.simulator, float(mats.mu), float(mats.lam),
           float(mats.yield_stress), interpret)
    if key in _ROWS_CACHE:
        return _ROWS_CACHE[key]

    consts = _consts(scene, mats)
    spec = pl.BlockSpec((_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def _comp(rowsCF, i):
        # (..., 18, N) channel i -> (total/128, 128); a leading batch dim
        # flattens contiguously
        c = rowsCF[..., i, :] if rowsCF.ndim == 3 else rowsCF[i]
        return c.reshape(-1, 128)

    def _run_fwd(rowsCF):
        N = rowsCF.shape[-1]
        assert N % _BLOCK == 0, N
        comps = [_comp(rowsCF, i) for i in range(18)]
        total = comps[0].shape[0] * 128
        out = pl.pallas_call(
            functools.partial(_fwd_kernel, **consts),
            grid=(total // _BLOCK,),
            in_specs=[spec] * 18,
            out_specs=[spec] * 18,
            out_shape=[jax.ShapeDtypeStruct(comps[0].shape, rowsCF.dtype)] * 18,
            interpret=interpret,
        )(*comps)
        lead = rowsCF.shape[:-2]
        return jnp.stack([o.reshape(lead + (N,)) for o in out], axis=-2)

    def _run_bwd(rowsCF, ct18):
        N = rowsCF.shape[-1]
        comps = ([_comp(rowsCF, i) for i in range(18)]
                 + [_comp(ct18, i) for i in range(18)])
        total = comps[0].shape[0] * 128
        out = pl.pallas_call(
            functools.partial(_bwd_kernel, **consts, gap_eps=float(_GAP_EPS)),
            grid=(total // _BLOCK,),
            in_specs=[spec] * 36,
            out_specs=[spec] * 18,
            out_shape=[jax.ShapeDtypeStruct(comps[0].shape, rowsCF.dtype)] * 18,
            interpret=interpret,
        )(*comps)
        lead = rowsCF.shape[:-2]
        return jnp.stack([o.reshape(lead + (N,)) for o in out], axis=-2)

    @jax.custom_vjp
    def fn(rowsCF):
        return _run_fwd(rowsCF)

    def fwd(rowsCF):
        return _run_fwd(rowsCF), rowsCF

    def bwd(rowsCF, ct):
        return (_run_bwd(rowsCF, ct),)

    fn.defvjp(fwd, bwd)
    _ROWS_CACHE[key] = fn
    return fn
