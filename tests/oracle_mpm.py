"""Plain-NumPy float64 oracle of the reference MLS-MPM physics.

Independently implements the formulas documented in SURVEY.md §2.1-2.2
(quadratic B-spline MLS-MPM with von Mises plasticity, SDF primitive
collisions, wall/ground boundaries) to golden-test the JAX engine. Loops are
vectorized numpy; scatter uses np.add.at.
"""
from __future__ import annotations

import numpy as np


def quat_rot(q, v):
    qv = q[..., 1:]
    uv = np.cross(qv, v)
    uuv = np.cross(qv, uv)
    return v + 2 * (q[..., :1] * uv + uuv)


def quat_mul(q, r):
    w = q[..., 0] * r[..., 0] - np.sum(q[..., 1:] * r[..., 1:], axis=-1)
    xyz = (
        q[..., :1] * r[..., 1:]
        + r[..., :1] * q[..., 1:]
        + np.cross(q[..., 1:], r[..., 1:])
    )
    out = np.concatenate([w[..., None], xyz], axis=-1)
    return out / np.linalg.norm(out, axis=-1, keepdims=True)


def axis_angle_quat(w):
    theta = np.linalg.norm(w, axis=-1)
    if theta <= 1e-9:
        return np.array([1.0, 0, 0, 0])
    axis = w / theta
    return np.concatenate([[np.cos(theta / 2)], axis * np.sin(theta / 2)])


def svd_proper(F):
    """SVD with det(U)=det(V)=+1, sign on smallest singular value."""
    U, s, Vt = np.linalg.svd(F)
    V = Vt.T
    if np.linalg.det(U) < 0:
        U[:, 2] *= -1
        s[2] *= -1
    if np.linalg.det(V) < 0:
        V[:, 2] *= -1
        s[2] *= -1
    return U, s, V


def _o_capsule_sdf(q, h, r):
    y = q[..., 1] + h / 2
    y = y - np.clip(y, 0, h)
    q2 = np.stack([q[..., 0], y, q[..., 2]], axis=-1)
    return np.sqrt(np.sum(q2 * q2, axis=-1) + 1e-14) - r


def _o_capsule_normal(q, h, r):
    y = q[..., 1] + h / 2
    y = y - np.clip(y, 0, h)
    q2 = np.stack([q[..., 0], y, q[..., 2]], axis=-1)
    return q2 / np.sqrt(np.sum(q2 * q2, axis=-1, keepdims=True) + 1e-14)


class OraclePrim:
    """All 7 reference primitive shapes for the oracle: Sphere, Capsule,
    RollingPin (capsule geometry), Chopsticks (capsule pair + gap),
    Cylinder, Torus, Box."""

    def __init__(self, shape, pos, rot, friction, params):
        self.shape = shape
        self.pos = np.asarray(pos, float)
        self.rot = np.asarray(rot, float)
        self.friction = friction
        self.params = params
        self.gap = (float(params.get("init_gap", 0.06))
                    if shape == "Chopsticks" else 0.0)
        self.minimal_gap = float(params.get("minimal_gap", 0.06))
        self.lower = np.zeros(3)
        self.upper = np.ones(3)

    def local(self, p):
        conj = self.rot * np.array([1.0, -1, -1, -1])
        conj = conj / np.linalg.norm(conj)
        return quat_rot(conj, p - self.pos)

    def _chop_parts(self, q):
        pp = q - np.array([0.0, -self.params["h"] / 2, 0.0])
        delta = np.array([self.gap / 2, 0.0, 0.0])
        return pp - delta, pp + delta

    def sdf(self, p):
        if self.shape == "Sphere":
            return np.sqrt(np.sum((p - self.pos) ** 2, axis=-1) + 1e-14) - self.params["radius"]
        q = self.local(p)
        h, r = self.params.get("h"), self.params.get("r")
        if self.shape in ("Capsule", "RollingPin"):
            return _o_capsule_sdf(q, h, r)
        if self.shape == "Chopsticks":
            a, b = self._chop_parts(q)
            return np.minimum(_o_capsule_sdf(a, h, r), _o_capsule_sdf(b, h, r))
        if self.shape == "Cylinder":
            # reference role swap: h radial, r half-height
            d0 = np.abs(np.sqrt(q[..., 0] ** 2 + q[..., 2] ** 2 + 1e-14)) - h
            d1 = np.abs(q[..., 1]) - r
            return np.minimum(np.maximum(d0, d1), 0.0) + np.sqrt(
                np.maximum(d0, 0.0) ** 2 + np.maximum(d1, 0.0) ** 2 + 1e-14)
        if self.shape == "Torus":
            q0 = np.sqrt(q[..., 0] ** 2 + q[..., 2] ** 2 + 1e-14) - self.params["tx"]
            return np.sqrt(q0 ** 2 + q[..., 1] ** 2 + 1e-14) - self.params["ty"]
        if self.shape == "Box":
            return self._box_sdf(q)
        raise NotImplementedError(self.shape)

    def normal(self, p):
        if self.shape == "Sphere":
            d = p - self.pos
            return d / np.sqrt(np.sum(d * d, axis=-1, keepdims=True) + 1e-14)
        q = self.local(p)
        h, r = self.params.get("h"), self.params.get("r")
        if self.shape in ("Capsule", "RollingPin"):
            n = _o_capsule_normal(q, h, r)
        elif self.shape == "Chopsticks":
            a, b = self._chop_parts(q)
            m = (_o_capsule_sdf(a, h, r) <= _o_capsule_sdf(b, h, r))
            n = np.where(m[..., None], _o_capsule_normal(a, h, r),
                         _o_capsule_normal(b, h, r))
        elif self.shape == "Cylinder":
            l = np.sqrt(q[..., 0] ** 2 + q[..., 2] ** 2 + 1e-14)
            d0 = l - h
            d1 = np.abs(q[..., 1]) - r
            f = (d0 > d1).astype(float)
            inside = (np.maximum(d0, d1) <= 0.0).astype(float)
            n20 = np.maximum(d0, 0.0) + inside * f
            n21 = np.maximum(d1, 0.0) + inside * (1.0 - f)
            nl = np.sqrt(n20 ** 2 + n21 ** 2 + 1e-14)
            n20, n21 = n20 / nl, n21 / nl
            ysign = (q[..., 1] >= 0).astype(float) * 2.0 - 1.0
            n = np.stack([q[..., 0] / l * n20, n21 * ysign,
                          q[..., 2] / l * n20], axis=-1)
            n = n / np.sqrt(np.sum(n * n, axis=-1, keepdims=True) + 1e-14)
        elif self.shape == "Torus":
            l = np.sqrt(q[..., 0] ** 2 + q[..., 2] ** 2 + 1e-14)
            q0 = l - self.params["tx"]
            ql = np.sqrt(q0 ** 2 + q[..., 1] ** 2 + 1e-14)
            n = np.stack([q[..., 0] / l * (q0 / ql), q[..., 1] / ql,
                          q[..., 2] / l * (q0 / ql)], axis=-1)
            n = n / np.sqrt(np.sum(n * n, axis=-1, keepdims=True) + 1e-14)
        elif self.shape == "Box":
            d = 1e-4
            n = np.zeros_like(q)
            for i in range(3):
                e = np.zeros(3)
                e[i] = d
                # local-frame finite difference of the local sdf
                n[..., i] = (self._box_sdf(q + e) - self._box_sdf(q - e)) * 0.5 / d
            n = n / np.sqrt(np.sum(n * n, axis=-1, keepdims=True) + 1e-14)
        else:
            raise NotImplementedError(self.shape)
        return quat_rot(self.rot, n)

    def _box_sdf(self, q):
        d = np.abs(q) - np.asarray(self.params["size"])
        dc = np.maximum(d, 0.0)
        return np.sqrt(np.sum(dc * dc, axis=-1) + 1e-14) + np.minimum(d.max(axis=-1), 0.0)


def oracle_fk(pr: OraclePrim, pv, pw, gap_vel=0.0):
    """Shape-specific forward kinematics (reference primive_base.py:117-121,
    RollingPin primitives.py:66-80, Chopsticks primitives.py:94-99)."""
    pv = np.asarray(pv, float)
    pw = np.asarray(pw, float)
    if pr.shape == "RollingPin":
        dw, dth, dy = pv
        y_dir = quat_rot(pr.rot, np.array([0.0, -1.0, 0.0]))
        x_dir = np.cross(np.array([0.0, 1.0, 0.0]), y_dir) * dw * 0.03
        x_dir[1] = dy
        pr.rot = quat_mul(
            axis_angle_quat(np.array([0.0, -dth, 0.0])),
            quat_mul(pr.rot, axis_angle_quat(np.array([0.0, dw, 0.0]))),
        )
        pr.pos = np.clip(pr.pos + x_dir, pr.lower, pr.upper)
        return
    pr.pos = np.clip(pr.pos + pv, pr.lower, pr.upper)
    if pr.shape == "Chopsticks":
        pr.gap = max(pr.gap - gap_vel, pr.minimal_gap)
        pr.rot = quat_mul(pr.rot, axis_angle_quat(pw))
        return
    pr.rot = quat_mul(axis_angle_quat(pw), pr.rot)


def oracle_substep(cfg, state, prim_vels, softness):
    """One reference substep. cfg: dict(n_grid, dt, p_vol, p_mass, mu, lam,
    yield_stress, gravity, ground_friction, prims=[OraclePrim]).
    state: dict(x, v, C, F) + prims carry their own pose.
    prim_vels: list of (v, w) per-substep velocities.
    Mutates primitive poses; returns new state dict.
    """
    x, v, C, F = state["x"], state["v"], state["C"], state["F"]
    n = len(x)
    G = cfg["n_grid"]
    dx, inv_dx = 1.0 / G, float(G)
    dt = cfg["dt"]
    mu, lam, ys = cfg["mu"], cfg["lam"], cfg["yield_stress"]
    p_vol, p_mass = cfg["p_vol"], cfg["p_mass"]

    # --- F update + plasticity + stress
    F_tmp = np.einsum("nij,njk->nik", np.eye(3) + dt * C, F)
    new_F = np.empty_like(F_tmp)
    Us, Vs = np.empty_like(F_tmp), np.empty_like(F_tmp)
    for p in range(n):
        U, sig, V = svd_proper(F_tmp[p])
        Us[p], Vs[p] = U, V
        sig_c = np.maximum(sig, 0.05)
        eps = np.log(sig_c)
        eps_hat = eps - eps.mean()
        ehn = np.sqrt(eps_hat @ eps_hat + 1e-8)
        dg = ehn - ys / (2 * mu)
        if dg > 0:
            eps2 = eps - dg / ehn * eps_hat
            new_F[p] = U @ np.diag(np.exp(eps2)) @ V.T
        else:
            new_F[p] = F_tmp[p]

    J = np.linalg.det(new_F)
    R = np.einsum("nij,nkj->nik", Us, Vs)
    stress = 2 * mu * np.einsum("nij,nkj->nik", new_F - R, new_F) + np.eye(3) * (
        lam * J * (J - 1)
    )[:, None, None]
    stress = (-dt * p_vol * 4 * inv_dx * inv_dx) * stress
    affine = stress + p_mass * C

    # --- p2g
    base = np.floor(x * inv_dx - 0.5).astype(int)
    fx = x * inv_dx - base
    wts = np.stack(
        [0.5 * (1.5 - fx) ** 2, 0.75 - (fx - 1) ** 2, 0.5 * (fx - 0.5) ** 2], axis=1
    )  # (n,3,3)
    grid_v = np.zeros((G, G, G, 3))
    grid_m = np.zeros((G, G, G))
    for i in range(3):
        for j in range(3):
            for k in range(3):
                weight = wts[:, i, 0] * wts[:, j, 1] * wts[:, k, 2]
                dpos = (np.array([i, j, k]) - fx) * dx
                mom = weight[:, None] * (
                    p_mass * v + np.einsum("nab,nb->na", affine, dpos)
                )
                idx = base + np.array([i, j, k])
                np.add.at(grid_v, (idx[:, 0], idx[:, 1], idx[:, 2]), mom)
                np.add.at(grid_m, (idx[:, 0], idx[:, 1], idx[:, 2]), weight * p_mass)

    # --- primitive FK (pose f -> f+1), keep both poses; shape-specific
    poses_f = [(pr.pos.copy(), pr.rot.copy(), pr.gap) for pr in cfg["prims"]]
    for pr, vel in zip(cfg["prims"], prim_vels):
        pv, pw = vel[0], vel[1]
        gapv = vel[2] if len(vel) > 2 else 0.0
        oracle_fk(pr, pv, pw, gapv)
    poses_f1 = [(pr.pos.copy(), pr.rot.copy(), pr.gap) for pr in cfg["prims"]]

    # --- grid op
    I, Jc, K = np.meshgrid(np.arange(G), np.arange(G), np.arange(G), indexing="ij")
    coords = np.stack([I, Jc, K], axis=-1).reshape(-1, 3)
    gm = grid_m.reshape(-1)
    gv = grid_v.reshape(-1, 3)
    out = np.zeros_like(gv)
    mask = gm > 1e-12
    vv = np.zeros_like(gv)
    vv[mask] = gv[mask] / gm[mask, None]
    vv[mask] += dt * np.asarray(cfg["gravity"]) * 30

    gp = coords * dx
    for pi, pr in enumerate(cfg["prims"]):
        (pf, rf, gapf), (pf1, rf1, _) = poses_f[pi], poses_f1[pi]
        hold_pos, hold_rot, hold_gap = pr.pos, pr.rot, pr.gap
        pr.pos, pr.rot, pr.gap = pf, rf, gapf
        dist = pr.sdf(gp)
        influence = np.minimum(np.exp(-dist * softness), 1.0)
        cond = ((softness > 0) & (influence > 0.1)) | (dist <= 0)
        D = pr.normal(gp)
        conj = rf * np.array([1.0, -1, -1, -1])
        conj /= np.linalg.norm(conj)
        rel = quat_rot(conj, gp - pf)
        newp = quat_rot(rf1, rel) + pf1
        cv = (newp - gp) / dt
        inp = vv - cv
        nc = np.sum(inp * D, axis=-1)
        gvt = inp - np.minimum(nc, 0)[:, None] * D
        gvtn = np.sqrt(np.sum(gvt * gvt, axis=-1) + 1e-8)
        fric = gvt / gvtn[:, None] * np.maximum(0, gvtn + nc * pr.friction)[:, None]
        flag = ((nc < 0) & (np.sqrt(np.sum(gvt * gvt, axis=-1)) > 1e-30)).astype(float)
        gvt = fric * flag[:, None] + gvt * (1 - flag[:, None])
        newv = cv + inp * (1 - influence[:, None]) + gvt * influence[:, None]
        sel = mask & cond
        vv[sel] = newv[sel]
        pr.pos, pr.rot, pr.gap = hold_pos, hold_rot, hold_gap

    bound = 3
    gf = cfg["ground_friction"]
    for d in range(3):
        low = mask & (coords[:, d] < bound) & (vv[:, d] < 0)
        if d != 1 or gf == 0:
            vv[low, d] = 0
        elif gf < 10:
            lin = vv[:, 1] + 1e-30
            vit = vv - lin[:, None] * np.array([0.0, 1, 0]) - coords * 1e-30
            lit = np.sqrt(np.sum(vit * vit, axis=-1) + 1e-8)
            sc = np.maximum(1 + gf * lin / lit, 0)
            fv = sc[:, None] * (vit + coords * 1e-30)
            fv[:, 1] = 0
            vv[low] = fv[low]
        else:
            vv[low] = 0
        high = mask & (coords[:, d] > G - bound) & (vv[:, d] > 0)
        vv[high, d] = 0

    # CFL clamp (spec.grid_v_clamp semantics; inactive at oracle velocities)
    clamp = cfg.get("grid_v_clamp", 0.5)
    if clamp > 0:
        vmax = clamp * cfg["dx"] / cfg["dt"] if "dx" in cfg else clamp / (cfg["n_grid"] * cfg["dt"])
        vv = np.clip(vv, -vmax, vmax)

    out[mask] = vv[mask]
    grid_v_out = out.reshape(G, G, G, 3)

    # --- g2p
    new_v = np.zeros_like(v)
    new_C = np.zeros_like(C)
    for i in range(3):
        for j in range(3):
            for k in range(3):
                weight = wts[:, i, 0] * wts[:, j, 1] * wts[:, k, 2]
                dpos = np.array([i, j, k]) - fx
                idx = base + np.array([i, j, k])
                g_v = grid_v_out[idx[:, 0], idx[:, 1], idx[:, 2]]
                new_v += weight[:, None] * g_v
                new_C += 4 * inv_dx * weight[:, None, None] * np.einsum(
                    "na,nb->nab", g_v, dpos
                )
    new_x = np.clip(x + dt * new_v, 0.0, 1.0 - 3 * dx)
    return {"x": new_x, "v": new_v, "C": new_C, "F": new_F}
