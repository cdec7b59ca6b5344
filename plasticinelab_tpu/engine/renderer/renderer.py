"""Forward-only path-tracing renderer, pure jnp (f32), batched over rays.

Behavioral reference: plb/engine/renderer/renderer.py + renderer_utils.py —
particle voxelization with bit-packed distance|color min-scatter, 27-tap
smoothing, trilinear texture sampling, background/ground planes, primitive
sphere-tracing, plasticine SDF march with bisection refinement, goal-density
ghost (blinking at 50% via even samples), <=2 diffuse bounces with optional
directional light, vignette+exposure tone map.

TPU design: rays are traced in pixel tiles (lax.map over tile batches) so
each tile's march while_loops stop at the tile's own slowest lane — sky and
off-object tiles exit after a handful of iterations instead of riding the
whole image's worst ray. Shadow rays use an occlusion-only march (no
bisection / normal / color). The full spp accumulation runs on-device in one
jitted fori_loop; randomness is jax.random.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...config.spec import SceneSpec
from .. import primitives as prim_mod

DIFFUSE, SPECULAR = 0, 1
FOV = 0.23
DIST_LIMIT = 100.0
INF = 1e10
EXPOSURE = 1.5
LIGHT_DIRECTION_NOISE = 0.03
LIGHT_COLOR = (1.0, 1.0, 1.0)


# ---------------------------------------------------------------------------
# texture sampling (reference sample_tex :137-155 — deliberately replicates
# its uncentered trilinear indexing)
# ---------------------------------------------------------------------------

def _sample_tex(tex_flat, res, pos, channels: int):
    a, b, c = res
    p = pos * jnp.asarray([a, b, c], jnp.float32)
    base = jnp.minimum(p.astype(jnp.int32), jnp.asarray([a, b, c], jnp.int32) - 1)
    base = jnp.maximum(base, 0)
    fx = p - base.astype(jnp.float32)

    def at(x, y, z):
        idx = (x * b + y) * c + z
        return tex_flat[idx]

    x, y, z = base[..., 0], base[..., 1], base[..., 2]
    x1 = jnp.minimum(x + 1, a - 1)
    y1 = jnp.minimum(y + 1, b - 1)
    z1 = jnp.minimum(z + 1, c - 1)
    f0 = fx[..., 0:1] if channels > 1 else fx[..., 0]
    f1 = fx[..., 1:2] if channels > 1 else fx[..., 1]
    f2 = fx[..., 2:3] if channels > 1 else fx[..., 2]
    c00 = at(x, y, z) * (1 - f0) + at(x1, y, z) * f0
    c01 = at(x, y, z1) * (1 - f0) + at(x1, y, z1) * f0
    c10 = at(x, y1, z) * (1 - f0) + at(x1, y1, z) * f0
    c11 = at(x, y1, z1) * (1 - f0) + at(x1, y1, z1) * f0
    c0 = c00 * (1 - f1) + c10 * f1
    c1 = c01 * (1 - f1) + c11 * f1
    return c0 * (1 - f2) + c1 * f2


def _ray_aabb(box_min, box_max, o, d):
    """renderer_utils.ray_aabb_intersection — slab method; d==0 handled via
    +/-inf division semantics."""
    safe_d = jnp.where(d == 0, 1e-30, d)
    i1 = (box_min - o) / safe_d
    i2 = (box_max - o) / safe_d
    near = jnp.max(jnp.minimum(i1, i2), axis=-1)
    far = jnp.min(jnp.maximum(i1, i2), axis=-1)
    inside0 = jnp.all((d != 0) | ((o >= box_min) & (o <= box_max)), axis=-1)
    return (near <= far) & inside0, near, far


def _smooth27(vol):
    """27-tap box filter; border cells forced to 1 (reference smooth :88-98)."""
    summed = jax.lax.reduce_window(
        vol, 0.0, jax.lax.add, (3, 3, 3), (1, 1, 1), "SAME"
    )
    out = summed / 27.0
    border = jnp.zeros_like(vol, dtype=bool)
    border = border.at[0, :, :].set(True).at[-1, :, :].set(True)
    border = border.at[:, 0, :].set(True).at[:, -1, :].set(True)
    border = border.at[:, :, 0].set(True).at[:, :, -1].set(True)
    return jnp.where(border, jnp.ones_like(out), out)


class Renderer:
    def __init__(self, scene: SceneSpec, **kwargs):
        cfg = scene.renderer
        self.scene = scene
        self.cfg = cfg
        self.dx = cfg.dx
        self.inv_dx = 1.0 / cfg.dx
        self.spp = cfg.spp
        self.voxel_res = tuple(int(v) for v in cfg.voxel_res)
        self.target_res = tuple(int(v) for v in cfg.target_res)
        self.bake_size = int(cfg.bake_size)
        self.max_ray_depth = int(cfg.max_ray_depth)
        self.sdf_threshold = float(cfg.sdf_threshold)
        self.use_directional_light = bool(cfg.use_directional_light)
        self.light_direction = tuple(cfg.light_direction)
        self.image_res = tuple(int(v) for v in cfg.image_res)
        self.aspect_ratio = self.image_res[0] / self.image_res[1]
        self.camera_pos = np.asarray(cfg.camera_pos, np.float32)
        self.camera_rot = tuple(cfg.camera_rot)
        self.vignette_strength = 0.9
        self.vignette_radius = 0.0
        self.vignette_center = (0.5, 0.5)
        self.target_density_color = (0.1, 0.3, 0.9)

        self.target_density = jnp.zeros(self.target_res, jnp.float32)
        self._voxelize = jax.jit(self._voxelize_impl)
        self._render_many = {}  # keyed by (shape, primitive, target) flags
        self._key = jax.random.PRNGKey(0)

    # ------------------------------------------------------------------
    # voxelization (reference build_sdf_from_particles :100-131)
    # ------------------------------------------------------------------
    def _voxelize_impl(self, x, color, bbox0):
        n = x.shape[0]
        res = self.voxel_res
        size = self.bake_size
        total = res[0] * res[1] * res[2]
        volume = jnp.full((total,), jnp.uint32(0xFFFFFFFF))

        p = (x - bbox0) * self.inv_dx  # voxel coords
        coord = p.astype(jnp.int32)
        offs = np.array(
            [(i, j, k)
             for i in range(-size - 1, size + 1)
             for j in range(-size - 1, size + 1)
             for k in range(-size - 1, size + 1)], np.int32,
        )  # (M, 3) — matches the reference's ndrange(-size-1, size+1)
        CH = 98  # offsets per scan step
        M = offs.shape[0]
        pad = (-M) % CH
        offs = np.pad(offs, ((0, pad), (0, 0)))
        offs_chunks = jnp.asarray(offs.reshape(-1, CH, 3))
        valid_chunks = jnp.asarray(
            np.pad(np.ones(M, bool), (0, pad)).reshape(-1, CH)
        )
        rbound = jnp.asarray(res, jnp.int32)

        def body(vol, inp):
            off, valid = inp  # (CH,3), (CH,)
            idx = coord[:, None, :] + off[None, :, :]  # (n,CH,3)
            ok = valid[None, :] & jnp.all(
                (idx >= 0) & (idx < rbound[None, None, :]), axis=-1
            )
            dist = jnp.linalg.norm(
                idx.astype(jnp.float32) - p[:, None, :], axis=-1
            )
            dist = jnp.clip(255.0 * 0.2 * dist, 0.0, 255.0)
            packed = (
                (dist.astype(jnp.uint32) << 24) + color[:, None].astype(jnp.uint32)
            )
            packed = jnp.where(ok, packed, jnp.uint32(0xFFFFFFFF))
            flat = (idx[..., 0] * res[1] + idx[..., 1]) * res[2] + idx[..., 2]
            flat = jnp.clip(flat, 0, total - 1)
            return vol.at[flat.reshape(-1)].min(packed.reshape(-1)), None

        volume, _ = jax.lax.scan(body, volume, (offs_chunks, valid_chunks))

        sdf = ((volume >> 24) & 255).astype(jnp.float32) / 255.0
        col = jnp.stack(
            [((volume >> 16) & 255), ((volume >> 8) & 255), (volume & 255)],
            axis=-1,
        ).astype(jnp.float32) / 255.0
        sdf = sdf.reshape(res)
        sdf = _smooth27(_smooth27(sdf))
        return sdf.reshape(-1), col.reshape(-1, 3)

    # ------------------------------------------------------------------
    def set_target_density(self, target_density: Optional[np.ndarray]):
        """reference set_target_density :519-524: texture = boxfilter(3 - raw)."""
        if target_density is None:
            self.target_density = jnp.zeros(self.target_res, jnp.float32)
        else:
            raw = jnp.asarray(target_density, jnp.float32).reshape(self.target_res)
            self.target_density = _smooth27(3.0 - raw)

    # ------------------------------------------------------------------
    # per-sample render
    # ------------------------------------------------------------------
    def _build_tracer(self, shape_flag, prim_flag, target_flag):
        """next_hit + occluded for one (shape, primitive, target) variant.
        Split from _build_render_many so tests can probe hit distances and
        normals directly (probe_rays)."""
        scene = self.scene
        res = self.voxel_res

        def sample_sdf(sdf_flat, bbox, pos):
            rel = (pos - bbox[0]) / (bbox[1] - bbox[0])
            ok = (jnp.min(rel, -1) >= 0) & (jnp.max(rel, -1) <= 1)
            val = _sample_tex(sdf_flat, res, rel, 1) - self.sdf_threshold
            return jnp.where(ok, val, 0.0)

        def sample_color(col_flat, bbox, pos):
            rel = (pos - bbox[0]) / (bbox[1] - bbox[0])
            ok = (jnp.min(rel, -1) >= 0) & (jnp.max(rel, -1) <= 1)
            val = _sample_tex(col_flat, res, rel, 3)
            return jnp.where(ok[..., None], val, 0.0)

        def sample_target(tgt_flat, pos):
            return _sample_tex(tgt_flat, self.target_res, pos, 1)

        def sample_normal(f, pos):
            d = 1e-3
            comps = []
            for i in range(3):
                e = jnp.zeros((3,), jnp.float32).at[i].set(d)
                comps.append((f(pos + e) - f(pos - e)) * (0.5 / d))
            n = jnp.stack(comps, axis=-1)
            return n / jnp.linalg.norm(n, axis=-1, keepdims=True)

        def ground_color(p):
            base = jnp.asarray([0.3, 0.5, 0.7], jnp.float32)
            inbox = (p[..., 0] <= 1) & (p[..., 0] >= 0) & (p[..., 2] <= 1) & (p[..., 2] >= 0)
            checker = (
                ((p[..., 0] / 0.25).astype(jnp.int32)
                 + (p[..., 2] / 0.25).astype(jnp.int32)) % 2
            ).astype(jnp.float32) * 0.2 + 0.35
            k = jnp.where(inbox, checker, 0.4)
            return base * k[..., None]

        def prim_sdf_all(poses, pp):
            """min over primitives + argmin id (pose index 0 = current)."""
            pos, rot, gap = poses
            vals = []
            for i, p in enumerate(scene.primitives):
                vals.append(prim_mod.sdf(p, pos[i], rot[i], gap[i], pp))
            v = jnp.stack(vals, axis=-1)  # (R, k)
            return jnp.min(v, -1).astype(jnp.float32), jnp.argmin(v, -1).astype(jnp.int32)

        def prim_normal_color(poses, sdf_id, pp):
            pos, rot, gap = poses
            normal = jnp.zeros(pp.shape, jnp.float32)
            color = jnp.zeros(pp.shape, jnp.float32)
            for i, p in enumerate(scene.primitives):
                sel = (sdf_id == i)[..., None]
                normal = jnp.where(
                    sel, prim_mod.normal(p, pos[i], rot[i], gap[i], pp), normal
                )
                color = jnp.where(
                    sel, jnp.asarray(p.color, jnp.float32), color
                )
            return normal, color

        def next_hit(textures, o, d, alive):
            sdf_flat, col_flat, bbox, tgt_flat, poses = textures
            R = o.shape[0]
            closest = jnp.full((R,), INF, jnp.float32)
            normal = jnp.zeros((R, 3), jnp.float32)
            color = jnp.zeros((R, 3), jnp.float32)
            roughness = jnp.full((R,), 0.05, jnp.float32)

            # background plane z = -5.5 (reference :211-218)
            rc = -(o[:, 2] + 5.5) / jnp.where(d[:, 2] == 0, 1e-30, d[:, 2])
            hit = (d[:, 2] != 0) & (rc > 0) & (rc < closest)
            closest = jnp.where(hit, rc, closest)
            normal = jnp.where(hit[:, None], jnp.asarray([0.0, 0.0, 1.0], jnp.float32), normal)
            color = jnp.where(hit[:, None], jnp.asarray([0.6, 0.7, 0.7], jnp.float32), color)
            roughness = jnp.where(hit, 0.0, roughness)

            # ground plane y = -0.002 (reference :220-228)
            gd = (o[:, 1] + 0.002) / jnp.where(d[:, 1] == 0, 1e-30, -d[:, 1])
            hit = (d[:, 1] < 0) & (gd < DIST_LIMIT) & (gd < closest)
            gc = ground_color(o + d * gd[:, None])
            closest = jnp.where(hit, gd, closest)
            normal = jnp.where(hit[:, None], jnp.asarray([0.0, 1.0, 0.0], jnp.float32), normal)
            color = jnp.where(hit[:, None], gc, color)
            roughness = jnp.where(hit, 0.0, roughness)

            # primitives: sphere trace <=200 steps (reference :231-259)
            if prim_flag and len(scene.primitives) > 0:
                def cond(c):
                    j, dist, sdf_val, sdf_id, active = c
                    return (j < 200) & jnp.any(active)

                def body(c):
                    j, dist, sdf_val, sdf_id, active = c
                    pp = o + dist[:, None] * d
                    sv, sid = prim_sdf_all(poses, pp)
                    sdf_val = jnp.where(active, sv, sdf_val)
                    sdf_id = jnp.where(active, sid, sdf_id)
                    dist = jnp.where(active, dist + sv, dist)
                    active = active & (dist < DIST_LIMIT) & (sdf_val > 1e-8)
                    return j + 1, dist, sdf_val, sdf_id, active

                j0 = jnp.zeros((), jnp.int32)
                dist = jnp.zeros((R,), jnp.float32)
                sdf_val = jnp.full((R,), INF, jnp.float32)
                sdf_id = jnp.zeros((R,), jnp.int32)
                _, dist, sdf_val, sdf_id, _ = jax.lax.while_loop(
                    cond, body, (j0, dist, sdf_val, sdf_id, alive)
                )
                hit = alive & (dist < closest) & (dist < DIST_LIMIT)
                pn, pc = prim_normal_color(poses, sdf_id, o + dist[:, None] * d)
                closest = jnp.where(hit, dist, closest)
                normal = jnp.where(hit[:, None], pn, normal)
                color = jnp.where(hit[:, None], pc, color)
                roughness = jnp.where(hit, 0.0, roughness)

            # plasticine SDF march (reference :263-289)
            if shape_flag:
                f = partial(sample_sdf, sdf_flat, bbox)
                isect, tnear, tfar = _ray_aabb(bbox[0], bbox[1], o, d)
                isect = isect & alive
                tnear = jnp.maximum(tnear, 0.0)
                pos0 = o + d * (tnear + 1e-4)[:, None]

                def cond(c):
                    j, pos, step, hit, active = c
                    return (j < 500) & jnp.any(active)

                def body(c):
                    j, pos, step, hit, active = c
                    s = f(pos)
                    hit_now = active & (s < 0)
                    newstep = d * jnp.maximum(s * 0.05, 0.01)[:, None]
                    pos = jnp.where((active & ~hit_now)[:, None], pos + newstep, pos)
                    step = jnp.where((active & ~hit_now)[:, None], newstep, step)
                    hit = hit | hit_now
                    # leaving the bbox can never hit (sdf = 0 outside)
                    t_along = jnp.sum((pos - o) * d, axis=-1)
                    active = active & ~hit_now & (t_along < tfar + 1.0)
                    return j + 1, pos, step, hit, active

                j0 = jnp.zeros((), jnp.int32)
                step0 = jnp.zeros((R, 3), jnp.float32)
                hit0 = jnp.zeros((R,), bool)
                _, pos, step, hitm, _ = jax.lax.while_loop(
                    cond, body, (j0, pos0, step0, hit0, isect)
                )

                # 20-step bisection refinement (reference :274-279)
                def refine(k, carry):
                    pos, back = carry
                    back = back * 0.5
                    inside = f(pos - back) < 0
                    pos = jnp.where((hitm & inside)[:, None], pos - back, pos)
                    return pos, back

                pos, _ = jax.lax.fori_loop(0, 20, refine, (pos, step))
                dist = jnp.linalg.norm(o - pos, axis=-1)
                hit = hitm & (dist < closest)
                closest = jnp.where(hit, dist, closest)
                normal = jnp.where(hit[:, None], sample_normal(f, pos), normal)
                color = jnp.where(hit[:, None], sample_color(col_flat, bbox, pos), color)

            # goal-density ghost (reference :292-323)
            if target_flag:
                ft = partial(sample_target, tgt_flat)
                isect, tnear, tfar = _ray_aabb(
                    jnp.zeros(3, jnp.float32), jnp.ones(3, jnp.float32), o, d
                )
                isect = isect & alive
                tnear = jnp.maximum(tnear, 0.0)
                pos0 = o + d * (tnear + 1e-4)[:, None]
                step_len = 1.0 / self.target_res[0]

                def cond(c):
                    j, pos, fwd, hit, active = c
                    return (j < 500) & jnp.any(active)

                def body(c):
                    j, pos, fwd, hit, active = c
                    s = ft(pos)
                    hit_now = active & (s < 0)
                    pos = jnp.where(
                        (active & ~hit_now)[:, None], pos + d * step_len, pos
                    )
                    fwd = jnp.where(active & ~hit_now, fwd + step_len, fwd)
                    hit = hit | hit_now
                    active = active & ~hit_now & (fwd + tnear <= tfar)
                    return j + 1, pos, fwd, hit, active

                j0 = jnp.zeros((), jnp.int32)
                fwd0 = jnp.zeros((R,), jnp.float32)
                hit0 = jnp.zeros((R,), bool)
                _, pos, _, hitt, _ = jax.lax.while_loop(
                    cond, body, (j0, pos0, fwd0, hit0, isect)
                )

                back0 = jnp.broadcast_to(d * step_len, (R, 3))

                def refine_t(k, carry):
                    pos, back = carry
                    back = back * 0.5
                    inside = ft(pos - back) < 0
                    pos = jnp.where((hitt & inside)[:, None], pos - back, pos)
                    return pos, back

                pos, _ = jax.lax.fori_loop(0, 20, refine_t, (pos, back0))
                dist = jnp.linalg.norm(o - pos, axis=-1)
                hit = hitt & (dist < closest)
                closest = jnp.where(hit, dist, closest)
                normal = jnp.where(hit[:, None], sample_normal(ft, pos), normal)
                color = jnp.where(
                    hit[:, None], jnp.asarray(self.target_density_color, jnp.float32), color
                )

            return closest, normal, color, roughness

        def occluded(textures, o, d, alive):
            """Anything (same geometry as next_hit) within DIST_LIMIT along
            d? Occlusion-only march: no bisection, no normals, no colors —
            the shadow test (reference :398-400) needs just the boolean."""
            sdf_flat, col_flat, bbox, tgt_flat, poses = textures
            R = o.shape[0]
            occ = jnp.zeros((R,), bool)

            rc = -(o[:, 2] + 5.5) / jnp.where(d[:, 2] == 0, 1e-30, d[:, 2])
            occ = occ | ((d[:, 2] != 0) & (rc > 0) & (rc < DIST_LIMIT))
            gd = (o[:, 1] + 0.002) / jnp.where(d[:, 1] == 0, 1e-30, -d[:, 1])
            occ = occ | ((d[:, 1] < 0) & (gd < DIST_LIMIT))

            if prim_flag and len(scene.primitives) > 0:
                def cond(c):
                    j, dist, active = c
                    return (j < 200) & jnp.any(active)

                def body(c):
                    j, dist, active = c
                    sv, _ = prim_sdf_all(poses, o + dist[:, None] * d)
                    dist = jnp.where(active, dist + sv, dist)
                    active = active & (dist < DIST_LIMIT) & (sv > 1e-8)
                    return j + 1, dist, active

                j0 = jnp.zeros((), jnp.int32)
                dist = jnp.zeros((R,), jnp.float32)
                _, dist, _ = jax.lax.while_loop(
                    cond, body, (j0, dist, alive & ~occ))
                occ = occ | (alive & (dist < DIST_LIMIT))

            if shape_flag:
                f = partial(sample_sdf, sdf_flat, bbox)
                isect, tnear, tfar = _ray_aabb(bbox[0], bbox[1], o, d)
                tnear = jnp.maximum(tnear, 0.0)
                pos0 = o + d * (tnear + 1e-4)[:, None]

                def cond(c):
                    j, pos, hit, active = c
                    return (j < 500) & jnp.any(active)

                def body(c):
                    j, pos, hit, active = c
                    s = f(pos)
                    hit_now = active & (s < 0)
                    pos = jnp.where(
                        (active & ~hit_now)[:, None],
                        pos + d * jnp.maximum(s * 0.05, 0.01)[:, None], pos)
                    hit = hit | hit_now
                    t_along = jnp.sum((pos - o) * d, axis=-1)
                    active = active & ~hit_now & (t_along < tfar + 1.0)
                    return j + 1, pos, hit, active

                j0 = jnp.zeros((), jnp.int32)
                hit0 = jnp.zeros((R,), bool)
                _, _, hitm, _ = jax.lax.while_loop(
                    cond, body, (j0, pos0, hit0, isect & alive & ~occ))
                occ = occ | hitm

            if target_flag:
                ft = partial(sample_target, tgt_flat)
                isect, tnear, tfar = _ray_aabb(
                    jnp.zeros(3, jnp.float32), jnp.ones(3, jnp.float32), o, d)
                tnear = jnp.maximum(tnear, 0.0)
                pos0 = o + d * (tnear + 1e-4)[:, None]
                step_len = 1.0 / self.target_res[0]

                def cond(c):
                    j, pos, fwd, hit, active = c
                    return (j < 500) & jnp.any(active)

                def body(c):
                    j, pos, fwd, hit, active = c
                    s = ft(pos)
                    hit_now = active & (s < 0)
                    pos = jnp.where(
                        (active & ~hit_now)[:, None], pos + d * step_len, pos)
                    fwd = jnp.where(active & ~hit_now, fwd + step_len, fwd)
                    hit = hit | hit_now
                    active = active & ~hit_now & (fwd + tnear <= tfar)
                    return j + 1, pos, fwd, hit, active

                j0 = jnp.zeros((), jnp.int32)
                fwd0 = jnp.zeros((R,), jnp.float32)
                hit0 = jnp.zeros((R,), bool)
                _, _, _, hitt, _ = jax.lax.while_loop(
                    cond, body, (j0, pos0, fwd0, hit0, isect & alive & ~occ))
                occ = occ | hitt

            return occ

        return next_hit, occluded

    def _build_render_many(self, shape_flag, prim_flag, target_flag):
        W, H = self.image_res
        next_hit, occluded = self._build_tracer(shape_flag, prim_flag,
                                                target_flag)

        def tile_of(n, cap=64):  # largest divisor of n that is <= cap
            t = min(cap, n)
            while n % t:
                t -= 1
            return t

        Tx, Ty = tile_of(W), tile_of(H)
        NT = (W // Tx) * (H // Ty)

        def out_dir(n, key):
            """cosine-weighted hemisphere (renderer_utils.out_dir)."""
            u = jnp.where(
                (jnp.abs(n[:, 1]) < 1 - 1e-3)[:, None],
                jnp.cross(n, jnp.asarray([0.0, 1.0, 0.0], jnp.float32)),
                jnp.asarray([1.0, 0.0, 0.0], jnp.float32),
            )
            u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
            v = jnp.cross(n, u)
            k1, k2 = jax.random.split(key)
            phi = 2 * np.pi * jax.random.uniform(k1, (n.shape[0],), jnp.float32)
            r = jax.random.uniform(k2, (n.shape[0],), jnp.float32)
            ay = jnp.sqrt(r)
            ax = jnp.sqrt(1 - r)
            return (
                ax[:, None] * (jnp.cos(phi)[:, None] * u + jnp.sin(phi)[:, None] * v)
                + ay[:, None] * n
            )

        def sample_sphere(key, R):
            k1, k2 = jax.random.split(key)
            u = jax.random.uniform(k1, (R,), jnp.float32)
            v = jax.random.uniform(k2, (R,), jnp.float32)
            x = u * 2 - 1
            phi = v * 2 * np.pi
            yz = jnp.sqrt(1 - x * x)
            return jnp.stack([x, yz * jnp.cos(phi), yz * jnp.sin(phi)], -1)

        def sky_color(d):
            coeff = jnp.clip(
                jnp.sum(d * jnp.asarray([0.8, 0.65, 0.15], jnp.float32), -1) * 0.5 + 0.5, 0, 1
            )[:, None]
            light = coeff * jnp.asarray([0.9, 0.9, 0.9], jnp.float32) + (1 - coeff) * jnp.asarray([0.7, 0.7, 0.8], jnp.float32)
            return light * 1.5

        def trace(textures, pos, d, key):
            R = pos.shape[0]
            contrib = jnp.zeros((R, 3), jnp.float32)
            throughput = jnp.ones((R, 3), jnp.float32)
            alive = jnp.ones((R,), bool)  # still bouncing (hasn't hit sky)

            for depth in range(self.max_ray_depth):
                key, k1, k2, k3 = jax.random.split(key, 4)
                closest, normal, c, roughness = next_hit(textures, pos, d, alive)
                hit_pos = pos + closest[:, None] * d
                hit_surface = jnp.linalg.norm(normal, axis=-1) != 0
                step_alive = alive & hit_surface

                out_direction = out_dir(normal, k1)
                glossy = sample_sphere(k2, R) * roughness[:, None]
                nd = out_direction + glossy
                nd = nd / jnp.linalg.norm(nd, axis=-1, keepdims=True)

                d = jnp.where(step_alive[:, None], nd, d)
                pos = jnp.where(step_alive[:, None], hit_pos + 1e-4 * nd, pos)
                throughput = jnp.where(step_alive[:, None], throughput * c, throughput)

                if self.use_directional_light:
                    noise = (jax.random.uniform(k3, (R, 3), jnp.float32) - 0.5) * LIGHT_DIRECTION_NOISE
                    direct = jnp.asarray(self.light_direction, jnp.float32) + noise
                    direct = direct / jnp.linalg.norm(direct, axis=-1, keepdims=True)
                    dot = jnp.sum(direct * normal, -1)
                    occ = occluded(textures, pos, direct, step_alive & (dot > 0))
                    lit = step_alive & (dot > 0) & ~occ
                    contrib = contrib + jnp.where(
                        lit[:, None],
                        throughput * jnp.asarray(LIGHT_COLOR, jnp.float32) * dot[:, None],
                        0.0,
                    )
                alive = step_alive

            out = contrib
            if not self.use_directional_light:
                out = throughput * sky_color(d)
            return out

        def render_sample(textures, key):
            k1, k2, k3 = jax.random.split(key, 3)
            uu = jax.lax.broadcasted_iota(jnp.int32, (W, H), 0)
            vv = jax.lax.broadcasted_iota(jnp.int32, (W, H), 1)
            ux = uu.astype(jnp.float32) + jax.random.uniform(k1, (W, H), jnp.float32)
            vx = vv.astype(jnp.float32) + jax.random.uniform(k2, (W, H), jnp.float32)
            dx_ = 2 * FOV * ux / H - FOV * self.aspect_ratio - 1e-5
            dy_ = 2 * FOV * vx / H - FOV - 1e-5
            d = jnp.stack([dx_, dy_, -jnp.ones((W, H), jnp.float32)], axis=-1)
            d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            r0, r1 = self.camera_rot
            rot_y = np.array(
                [[np.cos(r1), 0, np.sin(r1)], [0, 1, 0], [-np.sin(r1), 0, np.cos(r1)]]
            )
            rot_x = np.array(
                [[1, 0, 0], [0, np.cos(r0), np.sin(r0)], [0, -np.sin(r0), np.cos(r0)]]
            )
            mat = jnp.asarray(rot_y @ rot_x, jnp.float32)
            d = d @ mat.T
            # pixel tiles: each tile marches only as long as its own worst
            # ray (sky tiles exit in a few steps) instead of the image's
            d_t = (d.reshape(W // Tx, Tx, H // Ty, Ty, 3)
                   .transpose(0, 2, 1, 3, 4).reshape(NT, Tx * Ty, 3))
            o = jnp.broadcast_to(jnp.asarray(self.camera_pos), (Tx * Ty, 3))
            tkeys = jax.vmap(lambda i: jax.random.fold_in(k3, i))(
                jnp.arange(NT, dtype=jnp.uint32))

            def per_tile(args):
                dt, tk = args
                return trace(textures, o, dt, tk)

            cols = jax.lax.map(per_tile, (d_t, tkeys))
            return (cols.reshape(W // Tx, H // Ty, Tx, Ty, 3)
                    .transpose(0, 2, 1, 3, 4).reshape(W, H, 3))

        def render_many(textures, key, n):
            def body(i, acc):
                return acc + render_sample(textures, jax.random.fold_in(key, i))
            return jax.lax.fori_loop(
                0, n, body, jnp.zeros((W, H, 3), jnp.float32))

        return jax.jit(render_many, static_argnums=(2,))

    # ------------------------------------------------------------------
    def _prepare_textures(self, x, colors, prim_pos, prim_rot, prim_gap):
        """Voxelize particles and assemble the per-frame texture tuple."""
        x = np.asarray(x, np.float32)
        # bbox (reference initialize_particles_kernel + set_particles)
        lower = (np.floor(x.min(0) * self.inv_dx) - 6.0) * self.dx
        desired = (np.floor(x.max(0) * self.inv_dx) - 6.0) * self.dx - lower
        for a, b in zip(desired / self.dx, self.voxel_res):
            assert a < b, f"the sdf should be smaller {a} < {b}"
        upper = lower + np.asarray(self.voxel_res) * self.dx
        bbox = jnp.asarray(np.stack([lower, upper]), jnp.float32)

        sdf_flat, col_flat = self._voxelize(
            jnp.asarray(x), jnp.asarray(colors, jnp.int32),
            jnp.asarray(lower, jnp.float32)
        )
        poses = (
            jnp.asarray(prim_pos, jnp.float32),
            jnp.asarray(prim_rot, jnp.float32),
            jnp.asarray(prim_gap, jnp.float32),
        )
        tgt = self.target_density.reshape(-1)
        return (sdf_flat, col_flat, bbox, tgt, poses)

    def probe_rays(self, x, colors, prim_pos, prim_rot, prim_gap, o, d,
                   **kwargs):
        """March the given rays against the scene; returns (closest, normal,
        color) arrays. Test/debug hook for pinning hit structure."""
        shape_flag = bool(kwargs.get("shape", 1))
        prim_flag = bool(kwargs.get("primitive", 1))
        target_flag = bool(kwargs.get("target", 0))
        textures = self._prepare_textures(x, colors, prim_pos, prim_rot,
                                          prim_gap)
        next_hit, _ = self._build_tracer(shape_flag, prim_flag, target_flag)
        o = jnp.asarray(o, jnp.float32)
        d = jnp.asarray(d, jnp.float32)
        alive = jnp.ones((o.shape[0],), bool)
        closest, normal, color, _ = jax.jit(next_hit)(textures, o, d, alive)
        return np.asarray(closest), np.asarray(normal), np.asarray(color)

    # ------------------------------------------------------------------
    def render_frame(self, x, colors, prim_pos, prim_rot, prim_gap, spp=None,
                     **kwargs):
        """Full multi-sample frame (reference render_frame :482-505).
        Returns (H, W, 3) float image in [0, ~1] (pre-clip)."""
        if spp is None:
            spp = self.spp
        shape_flag = bool(kwargs.get("shape", 1))
        prim_flag = bool(kwargs.get("primitive", 1))
        visualize_target = int(kwargs.get("target", 0))

        textures = self._prepare_textures(x, colors, prim_pos, prim_rot,
                                          prim_gap)
        W, H = self.image_res
        # blink semantics (reference render_frame :482-505): even sample
        # indices show the goal ghost when target is on
        n_ghost = (spp // 2) if visualize_target else 0
        n_plain = spp - n_ghost
        buf = np.zeros((W, H, 3), np.float32)
        for tflag, n in ((False, n_plain), (True, n_ghost)):
            if n == 0:
                continue
            fkey = (shape_flag, prim_flag, tflag)
            if fkey not in self._render_many:
                self._render_many[fkey] = self._build_render_many(*fkey)
            self._key, sub = jax.random.split(self._key)
            buf += np.asarray(self._render_many[fkey](textures, sub, n))

        # tone map (reference copy :414-426)
        u = (np.arange(W, dtype=np.float32)[:, None] / W) - self.vignette_center[0]
        v = (np.arange(H, dtype=np.float32)[None, :] / H) - self.vignette_center[1]
        darken = 1.0 - self.vignette_strength * np.maximum(
            np.sqrt(u**2 + v**2) - self.vignette_radius, 0
        )
        img = np.sqrt(buf * darken[..., None] * EXPOSURE / spp)
        return img[:, ::-1].transpose(1, 0, 2)  # opencv orientation
