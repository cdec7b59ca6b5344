"""Gather-side Pallas voxelizer: per-voxel min over nearby particles of the
bit-packed (quantized distance << 24 | color) value.

Replaces the scatter-min formulation (reference build_sdf_from_particles,
plb/engine/renderer/renderer.py:100-131: each particle atomically min-writes
a (2*bake_size+2)^3 neighborhood) with a TPU-native gather: particles are
sorted by 8x8 voxel xy-block-column, padded into fixed-size chunks, and a
kernel with grid (z_blocks, chunks) reduces each chunk's particles over a
dynamically positioned (Lx, Ly, full-z) window of the VMEM-resident packed
volume.  min is associative, so chunks accumulate across sequential grid
steps exactly like the p2g sum in pallas_local.py.  XLA's TPU scatter-min
lowers to ~20M updates/s; this kernel is pure VPU math on dense windows.

Ordering trick: u32 packed values are compared as int32 after XORing the
sign bit (monotone u32 -> i32 map), so the whole kernel runs in int32.

Semantics vs the scatter path: identical sdf (quantized distances saturate
at 1/dist_scale voxels; every unsaturated contributor lies inside the
window by construction).  Cells whose ONLY contributors are saturated keep
the empty-cell color here (the scatter path tints them with an arbitrary
far particle's color); such cells have sdf == 1.0 and are never shaded by
the march (docs/PARITY.md deviation 8).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SIGN = np.int32(-2**31)
_INIT = np.int32(0x7FFFFFFF)  # biased 0xFFFFFFFF (empty cell)
_BLK = 8          # xy block edge (voxels)
_LANES = 128      # z tile


def _plan(cells, n, NBx, NBy, P, NC, Cx, Cy, Lx, Ly, margin):
    """Chunk table over occupied 8x8 xy-block-columns.

    Returns (order (n,), start/cnt/ox/oy per chunk (NC,)).  A block-column
    with more than P particles spills into consecutive chunk slots; slots
    beyond the last block's chunks get cnt 0 (kernel skips them)."""
    NB = NBx * NBy
    bid = (cells[:, 0] // _BLK) * NBy + cells[:, 1] // _BLK  # (n,)
    order = jnp.argsort(bid)
    bid_s = bid[order]
    starts = jnp.searchsorted(bid_s, jnp.arange(NB, dtype=bid.dtype))
    counts = jnp.append(starts[1:], n) - starts
    nch = (counts + P - 1) // P
    cum = jnp.cumsum(nch)
    cbid = jnp.searchsorted(cum, jnp.arange(NC, dtype=cum.dtype),
                            side="right")
    live = cbid < NB
    cb = jnp.clip(cbid, 0, NB - 1)
    prev = jnp.where(cb > 0, cum[jnp.maximum(cb - 1, 0)], 0)
    k = jnp.arange(NC) - prev
    start = starts[cb] + k * P
    cnt = jnp.where(live, jnp.clip(counts[cb] - k * P, 0, P), 0)
    bx, by = cb // NBy, cb % NBy
    ox = jnp.clip(bx * _BLK - margin, 0, Cx - Lx)
    oy = jnp.clip(by * _BLK - margin, 0, Cy - Ly)
    return order, start.astype(jnp.int32), cnt.astype(jnp.int32), \
        ox.astype(jnp.int32), oy.astype(jnp.int32)


def _kernel(offs_ref, rows_ref, col_ref, out_ref, *, Lx, Ly, scale):
    yb, zb, i = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    BY, Czb = out_ref.shape[1], out_ref.shape[2]
    P = rows_ref.shape[1]
    f32 = jnp.float32

    @pl.when(i == 0)
    def _init():
        out_ref[...] = jnp.full_like(out_ref, _INIT)

    oy_true = offs_ref[i, 1]
    y0 = yb * BY
    hit_y = jnp.logical_and(oy_true + Ly > y0, oy_true < y0 + BY)

    @pl.when(jnp.logical_and(offs_ref[i, 2] > 0, hit_y))
    def _work():
        ox = offs_ref[i, 0]
        # Clamp the y window inside this y-block. A window straddling the
        # block edge is covered by its clamped copies in BOTH blocks (BY >=
        # 2*Ly); the extra rows a clamped window picks up receive their true
        # packed values, and min-accumulation makes redundancy harmless.
        oy = jnp.clip(oy_true, y0, y0 + BY - Ly)
        px = rows_ref[0:1, :]
        py = rows_ref[1:2, :]
        pz = rows_ref[2:3, :]
        col = col_ref[0:1, :]

        # Mosaic iota must be integer-typed (f32 iota fails verification on
        # the real chip); build int32 lanes then cast.
        z0 = (zb * Czb).astype(f32)
        vz = z0 + jax.lax.broadcasted_iota(
            jnp.int32, (Czb, P), 0).astype(f32)
        az2 = (vz - pz) ** 2                       # (Czb, P)
        vy = oy.astype(f32) + jax.lax.broadcasted_iota(
            jnp.int32, (Ly, P), 0).astype(f32)
        ay2 = (vy - py) ** 2                       # (Ly, P)
        qcol = col | jnp.int32(0)                  # (1, P) int32
        oy_l = oy - y0                             # block-local window row

        def row(ix, _):
            vx = (ox + ix).astype(f32)
            ax2 = (vx - px) ** 2                   # (1, P)
            t = ay2[:, None, :] + (az2 + ax2)[None, :, :]  # (Ly, Czb, P)
            d = jnp.sqrt(t)
            q = jnp.minimum(d * (255.0 * scale), 255.0).astype(jnp.int32)
            packed = ((q << 24) | qcol[None, :, :]) ^ _SIGN
            red = jnp.min(packed, axis=-1)         # (Ly, Czb)
            cur = out_ref[pl.ds(ox + ix, 1), pl.ds(oy_l, Ly), :]
            out_ref[pl.ds(ox + ix, 1), pl.ds(oy_l, Ly), :] = jnp.minimum(
                cur, red[None])
            return 0

        jax.lax.fori_loop(0, Lx, row, 0, unroll=False)


def voxelize_packed(x_vox, colors, res, dist_scale, P=256,
                    interpret: bool = False):
    """Packed min-volume over a full `res` grid.

    x_vox: (n, 3) f32 particle positions in VOXEL units (pre-shifted by the
    frame bbox).  colors: (n,) int32 0..0xFFFFFF.  Returns (res[0]*res[1]*
    res[2],) uint32 (0xFFFFFFFF where empty), identical to the scatter-min
    packed volume for every cell with an unsaturated contributor."""
    Cx, Cy, Cz = (int(r) for r in res)
    Czp = -(-Cz // _LANES) * _LANES
    ZB = Czp // _LANES
    n = x_vox.shape[0]
    margin = int(np.floor(1.0 / dist_scale + np.sqrt(3.0))) + 1
    Lx = Ly = -(-(_BLK + 2 * margin) // 8) * 8
    # y-block the resident volume under ~6 MB of VMEM (~16 MB/core); BY >=
    # 2*Ly guarantees a straddling window is covered by its clamped copies
    if Cx * Cy * _LANES * 4 <= 6 * 2**20:
        BY = -(-Cy // 8) * 8
    else:
        BY = max(64, 2 * Ly)
    Cyp = -(-Cy // BY) * BY
    YB = Cyp // BY
    NBx, NBy = -(-Cx // _BLK), -(-Cy // _BLK)
    NC = NBx * NBy + -(-n // P)

    cells = jnp.clip(jnp.floor(x_vox).astype(jnp.int32), 0,
                     jnp.asarray([Cx - 1, Cy - 1, Cz - 1], jnp.int32))
    order, start, cnt, ox, oy = _plan(
        cells, n, NBx, NBy, P, NC, Cx, Cy, Lx, Ly, margin)
    xs = x_vox[order].astype(jnp.float32)
    cs = colors[order].astype(jnp.int32)

    idx = jnp.clip(start[:, None] + jnp.arange(P)[None, :], 0, n - 1)
    valid = (jnp.arange(P)[None, :] < cnt[:, None])
    rows = jnp.where(valid[:, :, None], xs[idx], 1e9)   # pads -> saturated
    rows = rows.transpose(2, 0, 1).reshape(3, NC * P)
    cols = jnp.where(valid, cs[idx], 0xFFFFFF).reshape(1, NC * P)
    offs = jnp.stack([ox, oy, cnt], axis=1)             # (NC, 3) SMEM

    vol = pl.pallas_call(
        functools.partial(_kernel, Lx=Lx, Ly=Ly, scale=float(dist_scale)),
        grid=(YB, ZB, NC),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, P), lambda yb, zb, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P), lambda yb, zb, i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Cx, BY, _LANES), lambda yb, zb, i: (0, yb, zb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Cx, Cyp, Czp), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=14 * 1024 * 1024),
        interpret=interpret,
    )(offs, rows, cols)

    vol = jax.lax.bitcast_convert_type(vol ^ _SIGN, jnp.uint32)
    return vol[:, :Cy, :Cz].reshape(-1)
