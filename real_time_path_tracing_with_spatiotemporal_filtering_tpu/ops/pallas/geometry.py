"""Fused geometry kernel: G-buffer + temporal gradient + backprojection.

In the reference these are two separate passes (visibility raster +
temporalGradient.comp.glsl) plus per-pixel LUT fetches inside the filter's
backprojection (temporalFiltering.comp.glsl:213-239). On TPU, per-pixel
table gathers (``lut[prim]``) cost ~25 ms/frame at 1080p in XLA; this kernel
eliminates every one of them by computing all triangle-keyed quantities
while the committed triangle's scalars are still at hand:

    outputs (all (H, W) planes):
      vis          primID+1 (0 = background)     [visibility.frag.glsl:23]
      depth        clip.z/clip.w raster depth    [D32 attachment]
      nx, ny, nz   filter normal, background sentinel (0,0,1)
                                      [temporalFiltering.comp.glsl:80-91]
      lam          temporal gradient  [temporalGradient.comp.glsl:104-171]
      prev_y/x     backprojected previous-frame pixel (int32, clamped)
                                      [temporalFiltering.comp.glsl:213-239]
      wx, wy, wz   world position (for API parity / tests)

The temporal accumulate then only needs an image gather + blend, and the
a-trous filter reads the normal planes directly.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas.pathtrace import (
    TILE_H,
    TILE_W,
    _nearest_hit_unrolled,
    pack_triangles,
)


class GeometryBuffers(NamedTuple):
    visibility: jnp.ndarray   # (H, W) primID+1
    depth: jnp.ndarray        # (H, W)
    normal: jnp.ndarray       # (H, W, 3) filter normals
    lam: jnp.ndarray          # (H, W) temporal gradient
    prev_y: jnp.ndarray       # (H, W) int32 backprojected row
    prev_x: jnp.ndarray       # (H, W) int32 backprojected col
    world_pos: jnp.ndarray    # (H, W, 3)
    # primary-hit albedo, 1.0 at misses; only emitted when the pass is
    # asked for it (cfg.demodulate_albedo), None otherwise
    albedo: jnp.ndarray | None = None


def _cross(ax, ay, az, bx, by, bz):
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _area(ax, ay, az, bx, by, bz, cx, cy, cz):
    """0.5 |cross(b - a, c - a)| (temporalGradient.comp.glsl:50-55)."""
    ux, uy, uz = bx - ax, by - ay, bz - az
    vx, vy, vz = cx - ax, cy - ay, cz - az
    kx, ky, kz = _cross(ux, uy, uz, vx, vy, vz)
    return jnp.float32(0.5) * jnp.sqrt(kx * kx + ky * ky + kz * kz)


def _phong(px_, py_, pz_, nx, ny, nz, cx, cy, cz, lx, ly, lz, lr, lg, lb):
    """phongShading (temporalGradient.comp.glsl:71-101), componentwise."""
    ldx, ldy, ldz = lx - px_, ly - py_, lz - pz_
    inv = jax.lax.rsqrt(ldx * ldx + ldy * ldy + ldz * ldz)
    ldx, ldy, ldz = ldx * inv, ldy * inv, ldz * inv
    diff = jnp.maximum(nx * ldx + ny * ldy + nz * ldz, 0.0)
    vdx, vdy, vdz = cx - px_, cy - py_, cz - pz_
    inv = jax.lax.rsqrt(vdx * vdx + vdy * vdy + vdz * vdz)
    vdx, vdy, vdz = vdx * inv, vdy * inv, vdz * inv
    # reflect(-l, n) = -l + 2*dot(n, l)*n  (GLSL reflect(I,N)=I-2 dot(N,I) N)
    dln = nx * ldx + ny * ldy + nz * ldz
    rx = -ldx + 2.0 * dln * nx
    ry = -ldy + 2.0 * dln * ny
    rz = -ldz + 2.0 * dln * nz
    spec_base = jnp.maximum(vdx * rx + vdy * ry + vdz * rz, 0.0)
    # pow(x, 128) as 7 squarings
    s = spec_base
    for _ in range(7):
        s = s * s
    amb = jnp.float32(0.1)
    obj = jnp.float32(0.7)
    out_r = (amb * lr + diff * lr + jnp.float32(0.5) * s * lr) * obj
    out_g = (amb * lg + diff * lg + jnp.float32(0.5) * s * lg) * obj
    out_b = (amb * lb + diff * lb + jnp.float32(0.5) * s * lb) * obj
    return out_r, out_g, out_b


def _primary_rays(fparams_ref, cfg, gx, gy, rot_base):
    """Center primary ray per pixel (unified tracer camera, SURVEY.md
    section 7); rotation matrix scalars start at ``rot_base``."""
    slope = jnp.float32(math.tan(cfg.fov))
    wf = jnp.float32(cfg.width)
    hf = jnp.float32(cfg.height)
    inv_h = jnp.float32(1.0) / hf
    fx = gx.astype(jnp.float32) + jnp.float32(0.5)
    fy = gy.astype(jnp.float32) + jnp.float32(0.5)
    su = (jnp.float32(2.0) * fx - wf) * inv_h
    sv = -(jnp.float32(2.0) * fy - hf) * inv_h
    cx_ = slope * su
    cy_ = slope * sv
    r = [fparams_ref[rot_base + m] for m in range(9)]
    dx = r[0] * cx_ + r[1] * cy_ - r[2]
    dy = r[3] * cx_ + r[4] * cy_ - r[5]
    dz = r[6] * cx_ + r[7] * cy_ - r[8]
    inv_n = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
    return dx * inv_n, dy * inv_n, dz * inv_n


def _geometry_kernel(
    fparams_ref, iparams_ref, tri_ref, vprev_ref,
    out_vis, out_depth, out_nx, out_ny, out_nz,
    out_lam, out_py, out_px, out_wx, out_wy, out_wz,
    *out_albedo, cfg, num_tris,
):
    cam_x, cam_y, cam_z = fparams_ref[0], fparams_ref[1], fparams_ref[2]
    row_offset = iparams_ref[0]

    i = pl.program_id(0)
    j = pl.program_id(1)
    gy = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
        + i * TILE_H
        + row_offset
    )
    gx = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1) + j * TILE_W

    wf = jnp.float32(cfg.width)
    hf = jnp.float32(cfg.height)
    dx, dy, dz = _primary_rays(fparams_ref, cfg, gx, gy, rot_base=35)
    ox = jnp.full_like(dx, cam_x)
    oy = jnp.full_like(dx, cam_y)
    oz = jnp.full_like(dx, cam_z)

    best_t, hit, (n_ux, n_uy, n_uz), alb, vis = _nearest_hit_unrolled(
        tri_ref, num_tris, ox, oy, oz, dx, dy, dz, cfg, track_prim=True
    )
    wx = jnp.where(hit, ox + best_t * dx, 0.0)
    wy = jnp.where(hit, oy + best_t * dy, 0.0)
    wz = jnp.where(hit, oz + best_t * dz, 0.0)
    if out_albedo:  # demodulation mode: emit primary-hit albedo (1 at miss)
        for ref, a in zip(out_albedo, alb):
            ref[:] = jnp.where(hit, a, jnp.float32(1.0))

    # --- committed-triangle vertex select (replaces lut[prim] gathers) ---
    def sel_body(t, s):
        acc = list(s)
        m = vis == (t + 1).astype(jnp.float32)
        for c in range(9):
            # current verts live in cols 21:30 of the merged table
            acc[c] = jnp.where(m, tri_ref[t, 21 + c], acc[c])
        for c in range(9):
            acc[9 + c] = jnp.where(m, vprev_ref[t, c], acc[9 + c])
        return tuple(acc)

    zero = jnp.zeros_like(wx)
    verts = jax.lax.fori_loop(0, num_tris, sel_body, (zero,) * 18)
    (v1x, v1y, v1z, v2x, v2y, v2z, v3x, v3y, v3z,
     p1x, p1y, p1z, p2x, p2y, p2z, p3x, p3y, p3z) = verts

    _geometry_epilogue(
        fparams_ref, cfg, gx, gy, hit, vis, (n_ux, n_uy, n_uz),
        (wx, wy, wz), verts,
        out_vis, out_depth, out_nx, out_ny, out_nz,
        out_lam, out_py, out_px, out_wx, out_wy, out_wz,
    )


def _geometry_epilogue(
    fparams_ref, cfg, gx, gy, hit, vis, unit_n, world, verts,
    out_vis, out_depth, out_nx, out_ny, out_nz,
    out_lam, out_py, out_px, out_wx, out_wy, out_wz,
):
    """Depth / gradient / backprojection epilogue shared by the dense and
    clustered geometry kernels. ``unit_n`` is the committed unit normal
    (pre-sentinel), ``world`` the hit world position (zeros at misses),
    ``verts`` the 18 selected current+previous vertex planes."""
    cam_x, cam_y, cam_z = fparams_ref[0], fparams_ref[1], fparams_ref[2]
    wf = jnp.float32(cfg.width)
    hf = jnp.float32(cfg.height)
    n_ux, n_uy, n_uz = unit_n
    wx, wy, wz = world
    (v1x, v1y, v1z, v2x, v2y, v2z, v3x, v3y, v3z,
     p1x, p1y, p1z, p2x, p2y, p2z, p3x, p3y, p3z) = verts

    # --- raster-equivalent depth (proj @ view rows 2,3 at fparams[3:11]) ---
    m20, m21, m22, m23 = fparams_ref[3], fparams_ref[4], fparams_ref[5], fparams_ref[6]
    m30, m31, m32, m33 = fparams_ref[7], fparams_ref[8], fparams_ref[9], fparams_ref[10]
    cz = m20 * wx + m21 * wy + m22 * wz + m23
    cw = m30 * wx + m31 * wy + m32 * wz + m33
    depth = jnp.where(hit, cz / cw, jnp.float32(1.0))

    # --- filter normal with background sentinel (0,0,1) ---
    nx = jnp.where(hit, n_ux, 0.0)
    ny = jnp.where(hit, n_uy, 0.0)
    nz = jnp.where(hit, n_uz, 1.0)

    # --- barycentrics of wp in CURRENT triangle (temporalGradient:134-143) --
    total = _area(v1x, v1y, v1z, v2x, v2y, v2z, v3x, v3y, v3z)
    total = jnp.maximum(total, jnp.float32(1e-20))
    b1 = _area(wx, wy, wz, v2x, v2y, v2z, v3x, v3y, v3z) / total
    b2 = _area(v1x, v1y, v1z, wx, wy, wz, v3x, v3y, v3z) / total
    b3 = _area(v1x, v1y, v1z, v2x, v2y, v2z, wx, wy, wz) / total

    # previous-frame world position via PREVIOUS verts (temporalGradient:146-153)
    qx = b1 * p1x + b2 * p2x + b3 * p3x
    qy = b1 * p1y + b2 * p2y + b3 * p3y
    qz = b1 * p1z + b2 * p2z + b3 * p3z

    # --- temporal gradient lambda (current normal both times, quirk kept) --
    lx, ly, lz = fparams_ref[11], fparams_ref[12], fparams_ref[13]
    plx, ply, plz = fparams_ref[14], fparams_ref[15], fparams_ref[16]
    lcr, lcg, lcb = fparams_ref[17], fparams_ref[18], fparams_ref[19]
    pcr, pcg, pcb = fparams_ref[20], fparams_ref[21], fparams_ref[22]
    cr_, cg_, cb_ = _phong(wx, wy, wz, nx, ny, nz, cam_x, cam_y, cam_z,
                           lx, ly, lz, lcr, lcg, lcb)
    pr_, pg_, pb_ = _phong(qx, qy, qz, nx, ny, nz, cam_x, cam_y, cam_z,
                           plx, ply, plz, pcr, pcg, pcb)
    gr, gg, gb_d = cr_ - pr_, cg_ - pg_, cb_ - pb_
    diff_len = jnp.sqrt(gr * gr + gg * gg + gb_d * gb_d)
    len_c = jnp.sqrt(cr_ * cr_ + cg_ * cg_ + cb_ * cb_)
    len_p = jnp.sqrt(pr_ * pr_ + pg_ * pg_ + pb_ * pb_)
    delta = jnp.maximum(jnp.maximum(len_c, len_p), jnp.float32(1e-20))
    lam = jnp.minimum(jnp.float32(1.0), diff_len / delta)
    lam = jnp.where(vis > 0.0, lam, 0.0)

    # --- backprojection quirk: barycentrics against PREVIOUS verts
    #     (temporalFiltering.comp.glsl:221-229), then worldToPixel ---
    ptot = _area(p1x, p1y, p1z, p2x, p2y, p2z, p3x, p3y, p3z)
    ptot = jnp.maximum(ptot, jnp.float32(1e-20))
    c1 = _area(wx, wy, wz, p2x, p2y, p2z, p3x, p3y, p3z) / ptot
    c2 = _area(p1x, p1y, p1z, wx, wy, wz, p3x, p3y, p3z) / ptot
    c3 = _area(p1x, p1y, p1z, p2x, p2y, p2z, wx, wy, wz) / ptot
    bx_ = c1 * p1x + c2 * p2x + c3 * p3x
    by_ = c1 * p1y + c2 * p2y + c3 * p3y
    bz_ = c1 * p1z + c2 * p2z + c3 * p3z
    # prev proj@view rows 0, 1, 3 (12 scalars at fparams[23:35])
    a00, a01, a02, a03 = fparams_ref[23], fparams_ref[24], fparams_ref[25], fparams_ref[26]
    a10, a11, a12, a13 = fparams_ref[27], fparams_ref[28], fparams_ref[29], fparams_ref[30]
    a30, a31, a32, a33 = fparams_ref[31], fparams_ref[32], fparams_ref[33], fparams_ref[34]
    ccx = a00 * bx_ + a01 * by_ + a02 * bz_ + a03
    ccy = a10 * bx_ + a11 * by_ + a12 * bz_ + a13
    ccw = a30 * bx_ + a31 * by_ + a32 * bz_ + a33
    sx = (ccx / ccw * jnp.float32(0.5) + jnp.float32(0.5)) * wf
    sy = (ccy / ccw * jnp.float32(0.5) + jnp.float32(0.5)) * hf
    ppx = sx.astype(jnp.int32)  # GLSL ivec2 truncation
    ppy = sy.astype(jnp.int32)
    background = vis < 1.0
    ppx = jnp.where(background, gx, ppx)
    ppy = jnp.where(background, gy, ppy)
    ppx = jnp.clip(ppx, 0, cfg.width - 1)
    ppy = jnp.clip(ppy, 0, cfg.height - 1)

    out_vis[:] = vis
    out_depth[:] = depth
    out_nx[:] = nx
    out_ny[:] = ny
    out_nz[:] = nz
    out_lam[:] = lam
    out_py[:] = ppy
    out_px[:] = ppx
    out_wx[:] = wx
    out_wy[:] = wy
    out_wz[:] = wz


# --- clustered + streamed geometry path (Sponza-class scenes) -------------
#
# The dense kernel above is O(T) twice per tile (intersection + committed-
# vertex select). For large scenes this kernel keeps the whole per-triangle
# table (intersection constants + current verts + primID + previous verts)
# in HBM, Morton-orders triangles into csize-row clusters, and DMAs only the
# clusters whose AABB a tile's primary rays can improve on -- primary rays
# are coherent, so per-tile cluster visits stay near the frustum footprint
# (docs/DESIGN_ROUND2.md section 1b). The vertex select is fused into the
# intersection's `closer` update, so primitive identity survives without a
# second O(T) pass.

GEO_CLUSTER_MIN_TRIS = 2048  # below this the dense kernel is cheaper
GEO_STREAM_COLS = 128        # HBM row width (Mosaic lane-dim DMA alignment)
# Default sub-block header walk for the streamed geometry kernel (see
# pathtrace._ordered_stream_loop): flipped by the hardware A/B.
GEO_DEFAULT_HDR_LANES = False
# row layout: [0:21 pack_triangles | 21:30 current verts | 30 primID+1 |
#              31:40 previous verts | 40:128 zero pad]
_GEO_STATIC_COLS = 31


def pack_geometry_clusters(tri_data):
    """Host-side static tables for the clustered geometry kernel.

    Returns (static_table (Tpad, 31) f32, perm (T,) int32 Morton order,
    cluster_aabbs (C, 6), super_aabbs (S, 6) | None,
    sub_aabbs (C*nsub_for(csize), 6)), or None when the scene is below
    GEO_CLUSTER_MIN_TRIS. Pad rows are zero (their plane test yields nan
    t, which self-rejects).
    """
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas.pathtrace import (
        DEGENERATE_BOX,
        _group_aabbs,
        hierarchy_sizes,
        nsub_for,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene.lbvh import (
        morton_codes_np,
    )
    import numpy as np

    tris = np.asarray(tri_data.lut)[1:]  # (T, 3, 3)
    num_tris = tris.shape[0]
    csize, num_clusters, ssize, num_supers = hierarchy_sizes(
        num_tris, min_rows=GEO_CLUSTER_MIN_TRIS
    )
    if csize == 0:
        return None
    cents = (tris[:, 0] + tris[:, 1] + tris[:, 2]) / np.float32(3.0)
    perm = np.argsort(morton_codes_np(cents), kind="stable").astype(np.int32)
    # numpy twin of pack_triangles (same column layout): building the table
    # with jnp would bounce 21 columns through the accelerator. ONE
    # contiguous concatenate of all 31 columns (the primID+1 of the
    # UNPERMUTED row i is i+1, so it can ride the pre-perm table), then one
    # row gather straight into the pre-zeroed padded output -- the former
    # chain gathered twice and concatenated three times (bit-identical;
    # fastest of the measured variants at 248k tris). Avoid
    # np.take(..., out=): its mode='raise' path is element-wise (~5x).
    p = tri_data.planes
    tmp = np.concatenate(
        [
            np.asarray(p.v0), np.asarray(p.n),
            np.asarray(p.d0)[:, None],
            np.asarray(p.n1), np.asarray(p.d1)[:, None],
            np.asarray(p.n2), np.asarray(p.d2)[:, None],
            np.asarray(tri_data.albedo), np.asarray(tri_data.normals),
            tris.reshape(num_tris, 9),
            np.arange(1, num_tris + 1, dtype=np.float32)[:, None],
        ],
        axis=1,
    ).astype(np.float32, copy=False)

    padded_rows = num_clusters * csize
    # empty + pad-only zeroing (a full np.zeros page-faults all 31 MB at
    # 250k tris); pad rows must stay zero -- their plane test yields nan t
    static = np.empty((padded_rows, _GEO_STATIC_COLS), np.float32)
    static[num_tris:] = 0.0
    static[:num_tris] = tmp[perm]
    tris_perm = static[:num_tris, 21:30].reshape(num_tris, 3, 3)  # view
    # pairwise ufuncs instead of the generic axis-1 reduce (~5x at 250k)
    lo = np.minimum(
        np.minimum(tris_perm[:, 0], tris_perm[:, 1]), tris_perm[:, 2]
    )
    hi = np.maximum(
        np.maximum(tris_perm[:, 0], tris_perm[:, 1]), tris_perm[:, 2]
    )
    caabb = _group_aabbs(lo, hi, csize)
    nsub = nsub_for(csize)
    sub = _group_aabbs(lo, hi, max(csize // nsub, 1))
    sub_needed = num_clusters * nsub
    if sub.shape[0] < sub_needed:
        sub = np.concatenate(
            [
                sub,
                np.full(
                    (sub_needed - sub.shape[0], 6), DEGENERATE_BOX, np.float32
                ),
            ]
        )
    pad = num_clusters - caabb.shape[0]
    if pad:
        degenerate = np.tile(np.full((6,), DEGENERATE_BOX, np.float32), (pad, 1))
        caabb = np.concatenate([caabb, degenerate], axis=0)
    saabb = None
    if num_supers:
        grouped = caabb.reshape(num_supers, ssize, 6)
        real = grouped[:, :, 0] < 1e29
        glo = np.where(real[:, :, None], grouped[:, :, :3], np.inf).min(axis=1)
        ghi = np.where(real[:, :, None], grouped[:, :, 3:], -np.inf).max(axis=1)
        saabb = np.concatenate([glo, ghi], axis=1).astype(np.float32)
        saabb[~real.any(axis=1)] = np.float32(3e37)
    return static.astype(np.float32, copy=False), perm, caabb, saabb, sub


def _geometry_clustered_kernel(
    fparams_ref, iparams_ref, table_ref, caabb_ref, saabb_ref,
    out_vis, out_depth, out_nx, out_ny, out_nz,
    out_lam, out_py, out_px, out_wx, out_wy, out_wz,
    *rest, cfg, num_clusters, csize, num_supers, ssize, emit_albedo=False,
    hdr_lanes=False,
):
    if emit_albedo:
        out_ar, out_ag, out_ab = rest[:3]
        rest = rest[3:]
    bins_ref, ids_ref, cnt_ref, buf0, buf1, sem0, sem1 = rest[:7]
    hdr = tuple(rest[7:11]) if hdr_lanes else None
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas.pathtrace import (
        _ordered_stream_loop,
    )

    cam_x, cam_y, cam_z = fparams_ref[0], fparams_ref[1], fparams_ref[2]
    row_offset = iparams_ref[0]

    i = pl.program_id(0)
    j = pl.program_id(1)
    gy = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
        + i * TILE_H
        + row_offset
    )
    gx = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1) + j * TILE_W

    dx, dy, dz = _primary_rays(fparams_ref, cfg, gx, gy, rot_base=35)
    ox = jnp.full_like(dx, cam_x)
    oy = jnp.full_like(dx, cam_y)
    oz = jnp.full_like(dx, cam_z)

    t_max = jnp.float32(cfg.t_max)
    big = t_max * jnp.float32(2.0)

    def tri_body(buf, r, s):
        best_t, hit_i, vis = s[0], s[1], s[2]
        nx_, ny_, nz_ = buf[r, 3], buf[r, 4], buf[r, 5]
        d0 = buf[r, 6]
        n1x, n1y, n1z, d1 = (
            buf[r, 7], buf[r, 8], buf[r, 9], buf[r, 10],
        )
        n2x, n2y, n2z, d2 = (
            buf[r, 11], buf[r, 12], buf[r, 13], buf[r, 14],
        )
        nd = dx * nx_ + dy * ny_ + dz * nz_
        no = ox * nx_ + oy * ny_ + oz * nz_
        t_hit = (d0 - no) / nd  # nan/inf self-rejects (pad rows too)
        u = (n1x * ox + n1y * oy + n1z * oz) + t_hit * (
            n1x * dx + n1y * dy + n1z * dz
        ) + d1
        v = (n2x * ox + n2y * oy + n2z * oz) + t_hit * (
            n2x * dx + n2y * dy + n2z * dz
        ) + d2
        valid = (
            (jnp.minimum(u, v) >= 0.0)
            & (u + v <= 1.0)
            & (t_hit > 0.0)
            & (t_hit <= t_max)
        )
        closer = valid & (t_hit < best_t)
        out = [
            jnp.where(closer, t_hit, best_t),
            hit_i | closer.astype(jnp.int32),
            jnp.where(closer, buf[r, 30], vis),
        ]
        # committed normal + current/previous verts, fused into the update
        for c in range(3):
            out.append(jnp.where(closer, buf[r, 18 + c], s[3 + c]))
        for c in range(9):
            out.append(jnp.where(closer, buf[r, 21 + c], s[6 + c]))
        for c in range(9):
            out.append(jnp.where(closer, buf[r, 31 + c], s[15 + c]))
        if emit_albedo:  # committed albedo (table cols 15:18)
            for c in range(3):
                out.append(jnp.where(closer, buf[r, 15 + c], s[24 + c]))
        return tuple(out)

    zero = jnp.zeros_like(ox)
    n_carry = 25 if emit_albedo else 22
    init = (
        jnp.full_like(ox, big), jnp.zeros_like(ox, jnp.int32)
    ) + (zero,) * n_carry

    out = _ordered_stream_loop(
        table_ref, caabb_ref, saabb_ref,
        num_clusters, csize, num_supers, ssize,
        ox, oy, oz, dx, dy, dz,
        jnp.ones_like(ox, dtype=jnp.int32) != 0,  # all primary rays live
        fparams_ref[44],
        tri_body, init,
        bins_ref, ids_ref, cnt_ref, buf0, buf1, sem0, sem1,
        hdr=hdr,
    )

    best_t, hit_i, vis = out[0], out[1], out[2]
    unit_n = out[3:6]
    verts = out[6:24]
    hit = hit_i != 0
    wx = jnp.where(hit, ox + best_t * dx, 0.0)
    wy = jnp.where(hit, oy + best_t * dy, 0.0)
    wz = jnp.where(hit, oz + best_t * dz, 0.0)
    if emit_albedo:
        for ref, a in zip((out_ar, out_ag, out_ab), out[24:27]):
            ref[:] = jnp.where(hit, a, jnp.float32(1.0))

    _geometry_epilogue(
        fparams_ref, cfg, gx, gy, hit, vis, unit_n, (wx, wy, wz), verts,
        out_vis, out_depth, out_nx, out_ny, out_nz,
        out_lam, out_py, out_px, out_wx, out_wy, out_wz,
    )


def pack_lut_verts(lut: jnp.ndarray) -> jnp.ndarray:
    """(T+1, 3, 3) visibility LUT -> (T, 9) SMEM vertex table (slot 0
    dropped; the kernel handles background explicitly)."""
    return lut[1:].reshape(-1, 9).astype(jnp.float32)


def geometry_pass_pallas(
    tri_data, lut_prev, camera_pos, light_pos, light_pos_prev,
    light_color, light_color_prev, view, proj, view_prev, proj_prev, cfg,
    row_offset=0, rows=None, interpret=False, planar=False, rotation=None,
    emit_albedo=False, hdr_lanes=None,
) -> GeometryBuffers:
    """Fused G-buffer + gradient + backprojection pass.

    ``planar``: keep normal/world_pos as channel-plane tuples instead of
    stacked (H, W, 3) arrays (saves two 25 MB copies at 1080p in the frame
    hot path).

    ``emit_albedo``: also output the primary-hit albedo planes (1.0 at
    misses) for SVGF albedo demodulation (cfg.demodulate_albedo) -- the
    committed albedo already rides the intersection's ``closer`` update,
    so this is three extra predicated selects, not a per-pixel gather."""
    h = cfg.height if rows is None else rows
    w = cfg.width

    if rotation is None:
        rotation = jnp.eye(3, dtype=jnp.float32)
    # HIGHEST precision: default TPU matmul is bf16 and corrupts the
    # projection matrix enough to shift reprojected pixels.
    mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    mat = mm(proj, view)
    mat_prev = mm(proj_prev, view_prev)
    fparams = jnp.concatenate(
        [
            jnp.asarray(camera_pos, jnp.float32).reshape(3),
            mat[2].reshape(4),
            mat[3].reshape(4),
            jnp.asarray(light_pos, jnp.float32).reshape(3),
            jnp.asarray(light_pos_prev, jnp.float32).reshape(3),
            jnp.asarray(light_color, jnp.float32).reshape(3),
            jnp.asarray(light_color_prev, jnp.float32).reshape(3),
            mat_prev[0].reshape(4),
            mat_prev[1].reshape(4),
            mat_prev[3].reshape(4),
            jnp.asarray(rotation, jnp.float32).reshape(9),
        ]
    )
    iparams = jnp.asarray(row_offset, jnp.int32).reshape(1)

    grid = (pl.cdiv(h, TILE_H), pl.cdiv(w, TILE_W))
    f32 = jnp.float32
    out_shape = [
        jax.ShapeDtypeStruct((h, w), f32),        # vis
        jax.ShapeDtypeStruct((h, w), f32),        # depth
        jax.ShapeDtypeStruct((h, w), f32),        # nx
        jax.ShapeDtypeStruct((h, w), f32),        # ny
        jax.ShapeDtypeStruct((h, w), f32),        # nz
        jax.ShapeDtypeStruct((h, w), f32),        # lam
        jax.ShapeDtypeStruct((h, w), jnp.int32),  # prev_y
        jax.ShapeDtypeStruct((h, w), jnp.int32),  # prev_x
        jax.ShapeDtypeStruct((h, w), f32),        # wx
        jax.ShapeDtypeStruct((h, w), f32),        # wy
        jax.ShapeDtypeStruct((h, w), f32),        # wz
    ]
    if emit_albedo:
        out_shape += [jax.ShapeDtypeStruct((h, w), f32)] * 3  # ar, ag, ab
    n_out = len(out_shape)
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas.pathtrace import (
        NBINS as pt_NBINS,
        _table_space,
        hierarchy_sizes,
    )

    geo_static = getattr(tri_data, "geo_static", None)
    if geo_static is not None:
        # clustered + streamed path: HBM-resident per-triangle table, DMA
        # per visited cluster; previous verts gathered into Morton order
        # in-graph (the only per-frame-varying columns).
        perm = tri_data.geo_perm
        num_tris = int(perm.shape[0])
        padded_rows = int(geo_static.shape[0])
        csize, num_clusters, ssize, num_supers = hierarchy_sizes(
            num_tris, min_rows=GEO_CLUSTER_MIN_TRIS
        )
        assert num_clusters * csize == padded_rows
        prev9 = lut_prev[1:].reshape(num_tris, 9).astype(f32)[perm]
        prev9 = jnp.pad(prev9, ((0, padded_rows - num_tris), (0, 0)))
        from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas.pathtrace import (
            assemble_stream_table,
            nsub_for,
        )

        # The full 128-col table is re-assembled in-graph every frame even
        # though only prev9 varies: ~2 passes over ~128 MB at 250k tris
        # ~= 0.5 ms of HBM traffic, <0.2% of the geometry pass -- not worth
        # a static/dynamic split (lut_prev is traced history state, so XLA
        # cannot fold the static columns either way).
        table = jnp.concatenate(
            [
                geo_static,
                prev9,
                jnp.zeros(
                    (padded_rows, GEO_STREAM_COLS - _GEO_STATIC_COLS - 9), f32
                ),
            ],
            axis=1,
        )
        if hdr_lanes is None:
            hdr_lanes = GEO_DEFAULT_HDR_LANES
        table = assemble_stream_table(
            table, getattr(tri_data, "geo_sub_aabbs", None),
            num_clusters, csize, hdr_lanes=hdr_lanes,
        )
        caabb = tri_data.geo_cluster_aabbs
        saabb = tri_data.geo_super_aabbs
        if saabb is None:
            saabb = jnp.zeros((1, 6), f32)
        from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas.pathtrace import (
            scene_bounds_from_clusters,
        )

        inv_diam, _, _ = scene_bounds_from_clusters(caabb)
        fparams = jnp.concatenate(
            [fparams, jnp.asarray(inv_diam, f32).reshape(1)]
        )
        kernel = functools.partial(
            _geometry_clustered_kernel, cfg=cfg,
            num_clusters=num_clusters, csize=csize,
            num_supers=num_supers, ssize=ssize, emit_albedo=emit_albedo,
            hdr_lanes=hdr_lanes,
        )
        smem_rows = csize if hdr_lanes else csize + nsub_for(csize)
        scratch = [
            # SMEM: the triangle loop is scalar-read bound and SMEM
            # reads are ~2x cheaper than VMEM (v5e measurement). Two
            # DMA buffers keep one cluster copy in flight behind the
            # active cluster's triangle loop (_ordered_stream_loop).
            pltpu.SMEM((num_clusters,), jnp.int32),
            pltpu.SMEM((num_clusters,), jnp.int32),
            pltpu.SMEM((pt_NBINS,), jnp.int32),
            pltpu.SMEM((smem_rows, GEO_STREAM_COLS), f32),
            pltpu.SMEM((smem_rows, GEO_STREAM_COLS), f32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ]
        if hdr_lanes:
            from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas.pathtrace import (
                HDR_ROWS,
            )

            scratch += [
                pltpu.VMEM((HDR_ROWS, GEO_STREAM_COLS), f32),
                pltpu.VMEM((HDR_ROWS, GEO_STREAM_COLS), f32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ]
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
            + [
                pl.BlockSpec(memory_space=pl.ANY),
                # flat 1D SMEM: 2D (C, 6) would lane-pad to (C, 128) and
                # exceed the ~1 MB SMEM budget at Sponza-scale C
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j))] * n_out,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
        )(fparams, iparams, table, caabb.reshape(-1), saabb.reshape(-1))
    else:
        tri_table = pack_triangles(tri_data)
        # current verts merged into the packed table; separate prev table
        # keeps the intersection loop's column layout stable.
        cur_verts = pack_lut_verts(tri_data.lut)
        prev_verts = pack_lut_verts(lut_prev)
        num_tris = int(tri_table.shape[0])
        kernel = functools.partial(
            _geometry_kernel, cfg=cfg, num_tris=num_tris
        )
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
            + [
                pl.BlockSpec(memory_space=_table_space(num_tris, 30)),
                pl.BlockSpec(memory_space=_table_space(num_tris, 9)),
            ],
            out_specs=[pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j))] * n_out,
            out_shape=out_shape,
            interpret=interpret,
        )(fparams, iparams, _merge_tables(tri_table, cur_verts), prev_verts)
    vis, depth, nx, ny, nz, lam, prev_y, prev_x, wx, wy, wz = outs[:11]
    alb = tuple(outs[11:14]) if emit_albedo else None
    if planar:
        return GeometryBuffers(
            visibility=vis,
            depth=depth,
            normal=(nx, ny, nz),
            lam=lam,
            prev_y=prev_y,
            prev_x=prev_x,
            world_pos=(wx, wy, wz),
            albedo=alb,
        )
    return GeometryBuffers(
        visibility=vis,
        depth=depth,
        normal=jnp.stack([nx, ny, nz], axis=-1),
        lam=lam,
        prev_y=prev_y,
        prev_x=prev_x,
        world_pos=jnp.stack([wx, wy, wz], axis=-1),
        albedo=jnp.stack(list(alb), axis=-1) if alb is not None else None,
    )


def _merge_tables(tri_table, cur_verts):
    """Packed 21-col intersection table + 9-col vertex table -> 30 cols."""
    return jnp.concatenate([tri_table, cur_verts], axis=1)
