"""Wavefront path tracer: per-segment kernels + global ray sorting.

The megakernel (ops/pallas/pathtrace.py) runs the whole bounce loop inside
one kernel, so a tile's rays stay in their launch order forever: after the
first diffuse bounce the 4096 rays of a tile point every which way, the
per-tile union of ray frusta covers most of the scene, and AABB culling
degrades to 30-50% (measured, docs/DESIGN_ROUND2.md section 1c). GPUs hide
this with per-ray hardware BVH traversal (VK_KHR_ray_query,
raytrace.comp.glsl:208-222); a TPU lane cannot follow its own traversal
path, so the fix must come from *reordering the rays themselves*.

This module restructures the trace into a wavefront: one Pallas kernel per
bounce segment over flat ray arrays, with the rays periodically re-sorted
by (origin Morton cell, direction octant). Sorted tiles are spatially and
directionally coherent, so the ordered streamed traversal
(_ordered_stream_loop) skips most clusters per tile. XLA's multi-operand
``lax.sort`` moves the whole ray state along with the keys in one
vectorized sorting network -- crucially NOT a gather (XLA TPU gathers cost
~25 ns/row, measured; the sort moves 15 planes in ~25 ms at 2M rays).
Termination compacts for free: dead rays sort to the tail, and their tiles
exit after one whole-tile check.

Numerics are bit-identical to the megakernel: ray generation replays the
same PCG draws (the XLA twin of the in-kernel _pcg, same bitcast
semantics), each ray carries its RNG state through the sort, and the
per-segment shading is the shared _shade_segment. Only the order in which
clusters get *tested* differs, which cannot change a committed nearest hit
(see _ordered_stream_loop).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas.pathtrace import (
    HDR_ROWS,
    NBINS,
    PAIR_COLS,
    TILE_H,
    TILE_W,
    _ordered_stream_loop,
    _pair_test,
    _shade_segment,
    assemble_stream_table,
    hierarchy_sizes,
    nsub_for,
    scene_bounds_from_clusters,
)

# Sub-block header walk for the wavefront tracer. False = row-major
# per-sub-block whole-tile slab tests. The lane-parallel variant
# (hdr_lanes=True) was MEASURED AND REJECTED on hardware
# (benchmarks/hdr_lanes_ab.py, v5e, 1080p 1spp): 2289 vs 1732 ms at 32k
# tris, 9596 vs 4908 ms at 248k — the transposed header DMA + cross-lane
# reductions cost more than the 10x fewer header vector ops save. Kept
# flag-gated for re-testing on future hardware (bit-identical output,
# parity tests in tests/test_pallas.py).
DEFAULT_HDR_LANES = False

# Two further sub-tile walk variants -- group_split (per-128-ray-packet
# interval headers + per-column-group rows) and vmem_prune (resident-VMEM
# conservative header pre-gate) -- were MEASURED AND REJECTED on v5e in
# round 4 (group_split 3327/15741 ms vs baseline 1813/4948 at 32k/248k
# tris 1080p; vmem_prune 3761/16448 ms) and deleted per the variant-
# pruning policy (docs/DESIGN_ROUND4.md; implementations in git history:
# commits ca82dad, 6260322). hdr_lanes above stays as the single gated
# future-hardware re-test candidate.

_U = jnp.uint32
_LANES = TILE_H * TILE_W  # rays per kernel program


def _pcg_xla(state):
    """XLA twin of pathtrace._pcg: identical ops (lax.bitcast for the
    Mosaic-safe signed-view uint->float conversion), identical streams."""
    state = state * _U(747796405) + _U(1)
    word = ((state >> ((state >> _U(28)) + _U(4))) ^ state) * _U(277803737)
    word = (word >> _U(22)) ^ word
    signed = jax.lax.bitcast_convert_type(word, jnp.int32)
    f = signed.astype(jnp.float32)
    f = jnp.where(signed < 0, f + np.float32(4294967296.0), f)
    return state, f * np.float32(1.0 / 4294967295.0)


def _spread4(x):
    """Spread the low 4 bits of x to every 3rd bit (Morton interleave)."""
    return (
        (x & 1)
        | ((x & 2) << 2)
        | ((x & 4) << 4)
        | ((x & 8) << 6)
    )


def _spread6(x):
    """Spread the low 6 bits of x to every 3rd bit (Morton interleave)."""
    return (
        (x & 1)
        | ((x & 2) << 2)
        | ((x & 4) << 4)
        | ((x & 8) << 6)
        | ((x & 16) << 8)
        | ((x & 32) << 10)
    )


def _dir_bin(dx, dy, dz):
    """7-bit cube-map direction bin: dominant-axis face (0..5) x 4x4
    quantized face coordinates -> 96 direction cones of ~1/96 of the
    sphere each (half-angle ~14 degrees)."""
    ax, ay, az = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
    m = jnp.maximum(ax, jnp.maximum(ay, az))
    is_x = ax >= jnp.maximum(ay, az)
    is_y = (~is_x) & (ay >= az)
    face = jnp.where(
        is_x,
        jnp.where(dx > 0.0, 0, 1),
        jnp.where(
            is_y,
            jnp.where(dy > 0.0, 2, 3),
            jnp.where(dz > 0.0, 4, 5),
        ),
    )
    inv_m = 1.0 / jnp.maximum(m, jnp.float32(1e-12))
    u = jnp.where(is_x, dy, dx) * inv_m
    v = jnp.where(is_x | is_y, dz, dy) * inv_m
    qu = jnp.clip(((u + 1.0) * 2.0).astype(jnp.int32), 0, 3)
    qv = jnp.clip(((v + 1.0) * 2.0).astype(jnp.int32), 0, 3)
    return face * 16 + qu * 4 + qv


# Ray-coherence sort key layouts (A/B'd on hardware with
# benchmarks/traversal_stats; see docs/DESIGN_ROUND3.md section 1).
# Round-2 default was "cell_oct": 12-bit origin Morton major, 3-bit
# octant minor. Its flaw, measured: a 4096-ray tile spans ~65
# consecutive key buckets, i.e. ALL 8 octants of ~8 cells -- tiles get
# tight origins but near-isotropic directions, and post-bounce tiles
# visit ~94% of all clusters (32k probe). Hardware A/B at 1080p 1spp,
# trace ms/frame (32k tris / 248k tris):
#   cell_oct 3101 / 11001   oct_cell 2334 / 8168   (1.33-1.35x)
#   dir_cell 3352 / -       mix 2505 / -
# "oct_cell" (direction octant major, then full origin Morton) wins at
# both scales and is the default: one octant per tile recovers culling
# (visited/tile drops ~6x at 32k) and is worth far more than the 8x
# origin-cell spread it costs. Fine direction bins (dir_cell's 96
# cones) overshoot -- origins scatter and culling collapses again.
#
# "super" / "oct_super" are traversal-GUIDED keys: every geometric key
# above is a proxy for "rays that need the same clusters"; these compute
# the need directly. A cheap unrolled XLA broad phase slab-tests each ray
# against the <=~64 supercluster AABBs (_nearest_super) and the key leads
# with the id of the first super the ray will traverse, then Morton-cells
# the ray's ENTRY POINT into it (= the origin for rays starting inside a
# super, but the point where traversal work actually happens for rays
# crossing empty space). Tiles then hold rays that agree on their first
# super, so phase A's whole-tile union stops mixing unrelated scene
# regions -- the failure mode behind the measured ~2% run-cluster
# occupancy at 248k tris (docs/DESIGN_ROUND3.md section 1).
SORT_MODES = (
    "cell_oct", "oct_cell", "oct_fine", "dir_cell", "mix",
    "super", "oct_super",
)
DEFAULT_SORT_MODE = "oct_cell"


def _nearest_super(ox, oy, oz, dx, dy, dz, saabb, num_supers):
    """Per-ray id of the nearest pierced supercluster (sentinel
    ``num_supers`` for rays that miss all of them) and its entry distance
    (0 for misses). Unrolled over the supers -- O(rays) memory, ~25
    vector ops per super; degenerate pad boxes (+3e37 point boxes,
    build_hierarchy) self-reject in the slab test."""
    tiny = jnp.float32(1e-12)
    inv = tuple(
        1.0 / jnp.where(jnp.abs(d) < tiny, tiny, d) for d in (dx, dy, dz)
    )
    big = jnp.float32(3e37)
    best_t = jnp.full_like(ox, big)
    best_id = jnp.full(ox.shape, num_supers, jnp.int32)
    for k in range(num_supers):
        tn = jnp.zeros_like(ox)  # max(entry, 0): behind-ray boxes miss
        tf = jnp.full_like(ox, big)
        for axis, o in enumerate((ox, oy, oz)):
            t0 = (saabb[k, axis] - o) * inv[axis]
            t1 = (saabb[k, axis + 3] - o) * inv[axis]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        enter = jnp.where(tf >= tn, tn, big)
        closer = enter < best_t
        best_t = jnp.where(closer, enter, best_t)
        best_id = jnp.where(closer, k, best_id)
    return best_id, jnp.where(best_t < big, best_t, jnp.float32(0.0))


def _sort_key(
    ox, oy, oz, dx, dy, dz, alive, lo, inv_size, mode="cell_oct",
    saabb=None, num_supers=0,
):
    """Coherence key; dead rays sort to the tail (sentinel 1<<30).

    ``saabb``/``num_supers`` feed the traversal-guided "super"/"oct_super"
    modes; scenes with no super level fall back to oct_cell."""
    if mode in ("super", "oct_super") and num_supers == 0:
        mode = "oct_cell"

    def cell(o, axis):
        q = ((o - lo[axis]) * inv_size[axis] * jnp.float32(16.0)).astype(
            jnp.int32
        )
        return jnp.clip(q, 0, 15)

    m = (
        _spread4(cell(ox, 0))
        | (_spread4(cell(oy, 1)) << 1)
        | (_spread4(cell(oz, 2)) << 2)
    )
    if mode == "cell_oct":
        oct3 = (
            (dx > 0.0).astype(jnp.int32) * 4
            + (dy > 0.0).astype(jnp.int32) * 2
            + (dz > 0.0).astype(jnp.int32)
        )
        key = (m << 3) | oct3
    elif mode == "oct_cell":
        oct3 = (
            (dx > 0.0).astype(jnp.int32) * 4
            + (dy > 0.0).astype(jnp.int32) * 2
            + (dz > 0.0).astype(jnp.int32)
        )
        key = (oct3 << 12) | m
    elif mode == "oct_fine":
        # oct_cell with 6 origin bits/axis (64^3 cells vs 16^3): a 4096-ray
        # tile spans ~67 consecutive key buckets, so finer cells directly
        # tighten the tile's origin bounding box
        def cell6(o, axis):
            q = ((o - lo[axis]) * inv_size[axis] * jnp.float32(64.0)).astype(
                jnp.int32
            )
            return jnp.clip(q, 0, 63)

        m18 = (
            _spread6(cell6(ox, 0))
            | (_spread6(cell6(oy, 1)) << 1)
            | (_spread6(cell6(oz, 2)) << 2)
        )
        oct3 = (
            (dx > 0.0).astype(jnp.int32) * 4
            + (dy > 0.0).astype(jnp.int32) * 2
            + (dz > 0.0).astype(jnp.int32)
        )
        key = (oct3 << 18) | m18
    elif mode == "dir_cell":
        key = (_dir_bin(dx, dy, dz) << 12) | m
    elif mode == "mix":
        # balanced split: coarse origin (top 5 Morton bits), full
        # direction bin, fine origin -- a tile lands in one coarse
        # region with a narrow direction spread
        d = _dir_bin(dx, dy, dz)
        key = ((m >> 7) << 14) | (d << 7) | (m & 0x7F)
    elif mode in ("super", "oct_super"):
        sid, t_in = _nearest_super(ox, oy, oz, dx, dy, dz, saabb, num_supers)
        ex = ox + dx * t_in
        ey = oy + dy * t_in
        ez = oz + dz * t_in
        m_e = (
            _spread4(cell(ex, 0))
            | (_spread4(cell(ey, 1)) << 1)
            | (_spread4(cell(ez, 2)) << 2)
        )
        oct3 = (
            (dx > 0.0).astype(jnp.int32) * 4
            + (dy > 0.0).astype(jnp.int32) * 2
            + (dz > 0.0).astype(jnp.int32)
        )
        if mode == "super":
            key = (sid << 15) | (oct3 << 12) | m_e
        else:
            sbits = max(1, int(num_supers).bit_length())
            key = (oct3 << (12 + sbits)) | (sid << 12) | m_e
    else:
        raise ValueError(f"unknown sort mode {mode!r}")
    return jnp.where(alive != 0, key, jnp.int32(1 << 30))


def _scene_bounds(cluster_aabbs):
    """(lo (3,), inv_size (3,), inv_diam (), hi (3,)) for the sort key,
    distance bins and exit clamp, from the shared masked reduction
    (pathtrace)."""
    inv_diam, lo, hi = scene_bounds_from_clusters(cluster_aabbs)
    size = jnp.maximum(hi - lo, 1e-6)
    return lo, 1.0 / size, inv_diam, hi


def _wavefront_kernel(
    fparams_ref, iparams_ref, table_ref, caabb_ref, saabb_ref,
    *refs, cfg, num_clusters, csize, num_supers, ssize, collect_stats=False,
    hdr_lanes=False, probe_which=None,
):
    """One bounce segment over a (TILE_H, TILE_W) block of sorted rays.

    ``refs`` is 14 input planes, 14 output planes, an optional (1, 128)
    int32 stats output (when ``collect_stats``), then the traversal
    scratch refs (bins, ids, cnt, two DMA buffers + semaphores, the two
    VMEM header buffers + semaphores when ``hdr_lanes``, and the (8,)
    counters ref when ``collect_stats``)."""
    (ox_r, oy_r, oz_r, dx_r, dy_r, dz_r,
     tpr_r, tpg_r, tpb_r, rsr_r, rsg_r, rsb_r, st_r, al_r) = refs[:14]
    (o_ox, o_oy, o_oz, o_dx, o_dy, o_dz,
     o_tpr, o_tpg, o_tpb, o_rsr, o_rsg, o_rsb, o_st, o_al) = refs[14:28]
    if collect_stats:
        o_stats = refs[28]
        rest = refs[29:]
    else:
        rest = refs[28:]
    bins_ref, ids_ref, cnt_ref, buf0, buf1, sem0, sem1 = rest[:7]
    rest = rest[7:]
    if hdr_lanes:
        hdr = tuple(rest[:4])
        rest = rest[4:]
    else:
        hdr = None
    counters = rest[0] if collect_stats else None
    lx, ly, lz = fparams_ref[0], fparams_ref[1], fparams_ref[2]
    hdr_r, hdr_g, hdr_b = fparams_ref[3], fparams_ref[4], fparams_ref[5]
    radius = fparams_ref[6]
    inv_diam = fparams_ref[7]
    scene_lo = (fparams_ref[8], fparams_ref[9], fparams_ref[10])
    scene_hi = (fparams_ref[11], fparams_ref[12], fparams_ref[13])
    seg = iparams_ref[0]
    inv_first_dim = jnp.float32(1.0 / cfg.first_hit_light_dim)
    eps_off = jnp.float32(cfg.ray_offset_eps)

    ox, oy, oz = ox_r[:], oy_r[:], oz_r[:]
    dx, dy, dz = dx_r[:], dy_r[:], dz_r[:]
    tp_r, tp_g, tp_b = tpr_r[:], tpg_r[:], tpb_r[:]
    res_r, res_g, res_b = rsr_r[:], rsg_r[:], rsb_r[:]
    st = st_r[:]
    alive_i = al_r[:]
    alive = alive_i != 0

    def live(args):
        (ox, oy, oz, dx, dy, dz, tp_r, tp_g, tp_b,
         res_r, res_g, res_b, st, alive_i) = args
        alive = alive_i != 0
        big = jnp.float32(cfg.t_max) * jnp.float32(2.0)
        # Clamp each lane's initial best to its exit distance from the
        # scene AABB (DESIGN_ROUND3 section 2): a committed triangle hit
        # lies inside the AABB, so t_hit <= t_exit exactly (with margin
        # for float evaluation) -- the clamp can never reject a real hit,
        # but rays that MISS everything now carry a bounded best, so the
        # traversal's max_best distance-bin pruning fires for them too
        # (soup / open scenes; a closed box is unchanged).
        tiny = jnp.float32(1e-12)
        t_exit = big
        for o, d, slo, shi in (
            (ox, dx, scene_lo[0], scene_hi[0]),
            (oy, dy, scene_lo[1], scene_hi[1]),
            (oz, dz, scene_lo[2], scene_hi[2]),
        ):
            inv = 1.0 / jnp.where(jnp.abs(d) < tiny, tiny, d)
            t0 = (slo - o) * inv
            t1 = (shi - o) * inv
            t_exit = jnp.minimum(t_exit, jnp.maximum(t0, t1))
        t_exit = jnp.maximum(t_exit, 0.0) * jnp.float32(1.0001) + jnp.float32(
            1e-3
        )
        zero = jnp.zeros_like(ox)
        init = (
            jnp.minimum(jnp.full_like(ox, big), t_exit),
            jnp.zeros_like(ox, dtype=jnp.int32),
            zero, zero, zero, zero, zero, zero,
        )

        def row(buf, j, s2):
            return _pair_test(buf, j, ox, oy, oz, dx, dy, dz, s2, cfg)

        o_s = _ordered_stream_loop(
            table_ref, caabb_ref, saabb_ref,
            num_clusters, csize, num_supers, ssize,
            ox, oy, oz, dx, dy, dz, alive, inv_diam,
            row, init,
            bins_ref, ids_ref, cnt_ref, buf0, buf1, sem0, sem1,
            counters=counters, hdr=hdr,
            probe=(
                (fparams_ref[14], probe_which)
                if probe_which and probe_which != "shade" else None
            ),
        )
        best_t, hit = o_s[0], o_s[1] != 0
        shaded = _shade_segment(
            seg, ox, oy, oz, dx, dy, dz, tp_r, tp_g, tp_b,
            res_r, res_g, res_b, alive, st,
            best_t, hit, o_s[2], o_s[3], o_s[4], o_s[5], o_s[6], o_s[7],
            lx, ly, lz, hdr_r, hdr_g, hdr_b, radius,
            inv_first_dim, eps_off, cfg,
        )
        if probe_which == "shade":
            # doubling probe: re-run the whole shading phase with the
            # runtime-1.0 perturbed origins (bit-identical values, never
            # CSE'd) and park a reduction in a dead SMEM slot (bins_ref is
            # dead storage after the walk) so it is never DCE'd. The
            # committed state comes from the unperturbed call above.
            p = fparams_ref[14]
            shaded2 = _shade_segment(
                seg, ox * p, oy * p, oz * p, dx, dy, dz,
                tp_r, tp_g, tp_b, res_r, res_g, res_b, alive, st,
                best_t, hit, o_s[2], o_s[3], o_s[4], o_s[5], o_s[6], o_s[7],
                lx, ly, lz, hdr_r, hdr_g, hdr_b, radius,
                inv_first_dim, eps_off, cfg,
            )
            bins_ref[0] = jnp.sum(shaded2[6]).astype(jnp.int32) + jnp.sum(
                shaded2[9]
            ).astype(jnp.int32)
        (ox, oy, oz, dx, dy, dz, tp_r, tp_g, tp_b,
         res_r, res_g, res_b, tri_hit, st) = shaded[:14]
        if cfg.nee:
            # NEE shadow traversal: a second streamed walk along the light
            # sample, with the per-lane best capped at the sphere entry so
            # the distance bins prune everything beyond it; any commit
            # means occluded. Reuses the same scratch refs sequentially.
            wlx, wly, wlz, s_t, bk_r, bk_g, bk_b, nmask = shaded[14]
            zero_s = jnp.zeros_like(ox)
            sinit = (
                s_t, jnp.zeros_like(ox, dtype=jnp.int32),
                zero_s, zero_s, zero_s, zero_s, zero_s, zero_s,
            )

            def srow(buf, j, s2):
                return _pair_test(buf, j, ox, oy, oz, wlx, wly, wlz, s2, cfg)

            s_o = _ordered_stream_loop(
                table_ref, caabb_ref, saabb_ref,
                num_clusters, csize, num_supers, ssize,
                ox, oy, oz, wlx, wly, wlz, nmask, inv_diam,
                srow, sinit,
                bins_ref, ids_ref, cnt_ref, buf0, buf1, sem0, sem1,
                hdr=hdr,
            )
            lit = nmask & (s_o[1] == 0)
            res_r = res_r + jnp.where(lit, bk_r, jnp.float32(0.0))
            res_g = res_g + jnp.where(lit, bk_g, jnp.float32(0.0))
            res_b = res_b + jnp.where(lit, bk_b, jnp.float32(0.0))
        return (ox, oy, oz, dx, dy, dz, tp_r, tp_g, tp_b,
                res_r, res_g, res_b, st, tri_hit.astype(jnp.int32))

    args = (ox, oy, oz, dx, dy, dz, tp_r, tp_g, tp_b,
            res_r, res_g, res_b, st, alive_i)
    if collect_stats:
        def zero(k, acc):
            counters[k] = 0
            return acc

        jax.lax.fori_loop(0, 8, zero, 0)
    # whole-tile skip: sorted dead rays cluster into fully-dead tiles
    out = jax.lax.cond(jnp.any(alive), live, lambda a: a, args)
    (ox, oy, oz, dx, dy, dz, tp_r, tp_g, tp_b,
     res_r, res_g, res_b, st, alive_i) = out
    if collect_stats:
        col = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        row = jnp.zeros((8, 128), jnp.int32)
        for k in range(8):
            row = jnp.where(col == k, counters[k], row)
        o_stats[0] = row

    o_ox[:] = ox
    o_oy[:] = oy
    o_oz[:] = oz
    o_dx[:] = dx
    o_dy[:] = dy
    o_dz[:] = dz
    o_tpr[:] = tp_r
    o_tpg[:] = tp_g
    o_tpb[:] = tp_b
    o_rsr[:] = res_r
    o_rsg[:] = res_g
    o_rsb[:] = res_b
    o_st[:] = st
    o_al[:] = alive_i


def _shadow_kernel(
    fparams_ref, table_ref, caabb_ref, saabb_ref, *refs,
    cfg, num_clusters, csize, num_supers, ssize, hdr_lanes=False,
):
    """Occlusion-only segment: the bounce-0 NEE shadow walk for
    cfg.nee + cfg.gbuffer_primary.

    The G-buffer seed deletes the full-res bounce-0 traversal segment, but
    the bounce-0 vertex's NEE shadow ray still needs the scene; its
    geometry is maximally coherent (every origin is a primary hit, every
    direction points into the light's cone), so a dedicated streamed walk
    is far cheaper than the bounce-0 segment the seed removed. Per lane:
    origin, light-sample direction, best capped at the sphere-entry
    distance (``cap``; 0 for lanes that sampled nothing) -- ANY commit
    means occluded. One int32 occlusion plane out; no shading."""
    (ox_r, oy_r, oz_r, wx_r, wy_r, wz_r, cap_r, mk_r) = refs[:8]
    o_occ = refs[8]
    bins_ref, ids_ref, cnt_ref, buf0, buf1, sem0, sem1 = refs[9:16]
    hdr = tuple(refs[16:20]) if hdr_lanes else None
    inv_diam = fparams_ref[0]
    ox, oy, oz = ox_r[:], oy_r[:], oz_r[:]
    wx, wy, wz = wx_r[:], wy_r[:], wz_r[:]
    mask = mk_r[:] != 0

    def live(occ0):
        zero = jnp.zeros_like(ox)
        init = (
            cap_r[:], jnp.zeros_like(occ0),
            zero, zero, zero, zero, zero, zero,
        )

        def row(buf, j, s2):
            return _pair_test(buf, j, ox, oy, oz, wx, wy, wz, s2, cfg)

        o_s = _ordered_stream_loop(
            table_ref, caabb_ref, saabb_ref,
            num_clusters, csize, num_supers, ssize,
            ox, oy, oz, wx, wy, wz, mask, inv_diam,
            row, init,
            bins_ref, ids_ref, cnt_ref, buf0, buf1, sem0, sem1,
            hdr=hdr,
        )
        return o_s[1]

    # whole-tile skip: tiles with no sampling lane exit immediately
    o_occ[:] = jax.lax.cond(
        jnp.any(mask), live, lambda a: a, jnp.zeros_like(mk_r[:])
    )


# Segments after which the surviving rays are re-sorted by coherence key.
# Segment 1 is where directions first scatter (primary rays are generated
# coherent); later re-sorts re-compact as terminations accumulate.
SORT_SEGMENTS = (1, 2, 4, 8, 16)

# At this cluster count and above, re-sort EVERY segment instead: the
# per-sort cost (~25 ms at 2M rays, 15-plane lax.sort) is flat in scene
# size while the culling payoff grows with cluster count. Measured at
# 1080p v5e: 32k tris 3.86 -> 3.11 s, 248k tris 15.8 -> 11.1 s; at 8k
# tris (64 clusters) every-segment sorting is a net loss.
SORT_EVERY_MIN_CLUSTERS = 128


def _sort_segments_for(num_clusters: int, max_bounces: int):
    if num_clusters >= SORT_EVERY_MIN_CLUSTERS:
        return tuple(range(1, max_bounces))
    return SORT_SEGMENTS


# A (key, iota) sort + ONE packed row gather re-sort variant (sort_perm)
# was MEASURED on v5e and REJECTED (3425 vs 1818 ms at 32k tris, 6558 vs
# 4951 at 248k -- XLA TPU gathers run near-scalar, so the single gather
# costs ~3x what the 15-plane sorting network saves; see
# docs/DESIGN_ROUND3.md). Deleted in round 4 per the variant-pruning
# policy (git history holds the implementation: commit 4b72172).


def path_trace_wavefront(
    tri_data, camera_pos, light, frame_idx, cfg,
    row_offset=0, rows=None, interpret=False, planar=False, rotation=None,
    collect_stats=False, sort_mode=DEFAULT_SORT_MODE, tile_w=None,
    hdr_lanes=None, probe_double=None, emit_throughput=False,
    primary_from=None,
):
    """Wavefront drop-in for path_trace_pass_pallas on clustered scenes.

    Requires a pair table + cluster hierarchy (pack_shading_pairs /
    build_hierarchy); the table streams from HBM regardless of size.
    Returns (rows, W, 3) radiance (or three planes when ``planar``),
    bit-identical to the megakernel.

    ``hdr_lanes`` selects the lane-parallel sub-block header walk (one
    interval slab test over all nsub headers vs nsub sequential whole-tile
    tests; see _ordered_stream_loop). Output is bit-identical either way;
    None takes the module default (DEFAULT_HDR_LANES).

    ``collect_stats`` (probe mode, 1 spp only): additionally returns a
    list with one (num_tiles, 8) int32 array per executed bounce segment
    holding the traversal counters documented on _ordered_stream_loop;
    the segment loop runs host-side, so this path is for measurement,
    not production."""
    h = cfg.height if rows is None else rows
    w = cfg.width
    pix = jnp.arange(h * w, dtype=jnp.int32)
    out = _wavefront_core(
        tri_data, camera_pos, light, frame_idx, cfg,
        pix % w, pix // w + row_offset,
        interpret=interpret, rotation=rotation,
        collect_stats=collect_stats, sort_mode=sort_mode, tile_w=tile_w,
        hdr_lanes=hdr_lanes, probe_double=probe_double,
        emit_throughput=emit_throughput, primary_from=primary_from,
    )
    if collect_stats:
        planes_out, stats = out
    else:
        planes_out = out

    def as_img(r, g, b):
        if planar:
            return (r.reshape(h, w), g.reshape(h, w), b.reshape(h, w))
        return jnp.stack(
            [r.reshape(h, w), g.reshape(h, w), b.reshape(h, w)], axis=-1
        )

    img = as_img(*planes_out[:3])
    if emit_throughput:
        img = (img, as_img(*planes_out[3:6]))
    if collect_stats:
        return img, stats
    return img


def trace_pixels_wavefront(
    tri_data, camera_pos, light, frame_idx, px, py, cfg,
    rotation=None, interpret=False, sort_mode=DEFAULT_SORT_MODE,
    tile_w=None, hdr_lanes=None, primary_from=None,
):
    """Wavefront twin of ops.pathtrace.trace_pixels: trace EXPLICIT global
    pixel coordinate arrays through the HBM-streamed wavefront tracer.

    Seeds and rays are pure functions of the global coordinates
    (raytrace.comp.glsl:273-344 semantics, same PCG streams), so tracing
    any subset of pixels is bitwise identical to the same pixels of a
    full-frame trace. This is the streamed-scene backend for the A-SVGF
    path-space gradient re-trace (ops/pathgrad.py), whose stratum samples
    are exactly such a sparse pixel subset. Returns ``px.shape + (3,)``
    radiance."""
    shape = px.shape
    r, g, b = _wavefront_core(
        tri_data, camera_pos, light, frame_idx, cfg,
        jnp.asarray(px, jnp.int32).reshape(-1),
        jnp.asarray(py, jnp.int32).reshape(-1),
        interpret=interpret, rotation=rotation,
        sort_mode=sort_mode, tile_w=tile_w, hdr_lanes=hdr_lanes,
        primary_from=primary_from,
    )
    return jnp.stack(
        [r.reshape(shape), g.reshape(shape), b.reshape(shape)], axis=-1
    )


def _wavefront_core(
    tri_data, camera_pos, light, frame_idx, cfg, px_flat, py_flat,
    *, interpret=False, rotation=None, collect_stats=False,
    sort_mode=DEFAULT_SORT_MODE, tile_w=None, hdr_lanes=None,
    probe_double=None, emit_throughput=False, primary_from=None,
):
    """Shared wavefront trace over a flat list of global pixel coords.

    Returns the normalized (n_pix,) radiance planes (r, g, b) in input
    order (plus the stats list when ``collect_stats``). Rays beyond
    ``n_pix`` (tile padding) start dead and contribute nothing.

    ``probe_double``: doubling-probe phase name for the time breakdown
    ('sort' doubles the XLA ray re-sort; the rest go to the traversal
    kernel -- see _ordered_stream_loop). Output stays bit-identical.

    ``primary_from``: flat (n_pix,) G-buffer attribute planes
    (vis, wx, wy, wz, nx, ny, nz, ar, ag, ab) aligned with
    ``px_flat``/``py_flat`` (cfg.gbuffer_primary): bounce 0 is replayed
    off them in XLA (ops.pathtrace.primary_carry) and the segment loop
    starts at 1, deleting the full-res bounce-0 traversal kernel; primary
    AA jitter is disabled (bit-identical to a full trace at aa_sigma=0)."""
    if hdr_lanes is None:
        hdr_lanes = DEFAULT_HDR_LANES
    pair_table = tri_data.pair_table
    cluster_aabbs = tri_data.cluster_aabbs
    super_aabbs = tri_data.super_aabbs
    if pair_table is None or cluster_aabbs is None:
        raise ValueError("wavefront tracer requires a clustered pair table")
    csize, num_clusters, ssize, num_supers = hierarchy_sizes(
        int(pair_table.shape[0])
    )
    table = pair_table
    padded_rows = num_clusters * csize
    if int(table.shape[0]) < padded_rows:
        table = jnp.concatenate(
            [
                table,
                jnp.zeros(
                    (padded_rows - int(table.shape[0]), PAIR_COLS), jnp.float32
                ),
            ]
        )
    # HBM rows padded to 128 columns (DMA lane alignment), then interleave
    # the per-cluster sub-AABB headers (assemble_stream_table)
    table = jnp.concatenate(
        [table, jnp.zeros((int(table.shape[0]), 128 - PAIR_COLS), jnp.float32)],
        axis=1,
    )
    sub_aabbs = getattr(tri_data, "sub_aabbs", None)
    table = assemble_stream_table(
        table, sub_aabbs, num_clusters, csize, hdr_lanes=hdr_lanes,
    )
    if super_aabbs is None:
        super_aabbs = jnp.zeros((1, 6), jnp.float32)
    caabb_flat = cluster_aabbs.reshape(-1)
    saabb_flat = super_aabbs.reshape(-1)

    if rotation is None:
        rotation = jnp.eye(3, dtype=jnp.float32)
    rot = jnp.asarray(rotation, jnp.float32)
    cam = jnp.asarray(camera_pos, jnp.float32)
    lo, inv_size, inv_diam, hi = _scene_bounds(cluster_aabbs)

    n_pix = int(px_flat.shape[0])
    # Rays per kernel program: (TILE_H, tw). The vector unit's register is
    # (8, 128); at tw=512 every whole-tile traversal op costs 4 vregs. A
    # narrower tile never increases total row-phase vector work (the four
    # quarter-tiles' visited sets union to at most 4x the big tile's set,
    # each at 1/4 the vector cost) and at the measured ~1% run-cluster
    # occupancy cuts most of it, for more per-tile scalar/DMA overhead.
    tw = TILE_W if tile_w is None else int(tile_w)
    assert tw % 128 == 0 and tw > 0, "tile width must be a multiple of 128"
    lanes = TILE_H * tw
    n = -(-n_pix // lanes) * lanes
    n_rows = n // tw

    # --- ray generation (XLA; same PCG stream as the megakernel) ---
    # Pad rays start dead (in_image=0): their seeds/dirs are computed from
    # pixel (0, 0) but never traced, and the final [:n_pix] drops them.
    pix = jnp.arange(n, dtype=jnp.int32)
    pad = n - n_pix
    if pad:
        zeros_pad = jnp.zeros((pad,), jnp.int32)
        px = jnp.concatenate([px_flat, zeros_pad])
        py = jnp.concatenate([py_flat, zeros_pad])
    else:
        px, py = px_flat, py_flat
    in_image = pix < n_pix
    if primary_from is not None:
        # pad lanes get vis=0 (miss); harmless -- they are masked dead by
        # in_image below and sliced off at the end
        prim = tuple(
            jnp.asarray(p, jnp.float32).reshape(-1) for p in primary_from
        )
        if pad:
            zf = jnp.zeros((pad,), jnp.float32)
            prim = tuple(jnp.concatenate([p, zf]) for p in prim)
    frame_term = (
        jnp.asarray(frame_idx, jnp.int32).astype(jnp.uint32)
        * _U(374761393)
    )
    slope = jnp.float32(math.tan(cfg.fov))
    wf = jnp.float32(cfg.width)
    hf = jnp.float32(cfg.height)
    inv_h = jnp.float32(1.0) / hf

    hdr = jnp.asarray(light.color, jnp.float32) * cfg.light_intensity
    fparams = jnp.concatenate(
        [
            jnp.asarray(light.position, jnp.float32).reshape(3),
            hdr.reshape(3),
            jnp.array([cfg.light_radius], jnp.float32),
            jnp.asarray(inv_diam, jnp.float32).reshape(1),
            jnp.asarray(lo, jnp.float32).reshape(3),
            jnp.asarray(hi, jnp.float32).reshape(3),
            # [14]: the doubling probes' runtime-1.0 (compile-time-opaque)
            jnp.ones((1,), jnp.float32),
        ]
    )

    grid = (n_rows // TILE_H,)
    n_tiles = n_rows // TILE_H
    plane_shape = (n_rows, tw)
    f32 = jnp.float32
    plane_spec = pl.BlockSpec((TILE_H, tw), lambda i: (i, 0))

    def run_segment(seg, planes, stats=False):
        kernel = functools.partial(
            _wavefront_kernel, cfg=cfg,
            num_clusters=num_clusters, csize=csize,
            num_supers=num_supers, ssize=ssize, collect_stats=stats,
            hdr_lanes=hdr_lanes,
            # kernel-side probes only; sort/raygen/descramble double their
            # XLA phases outside the kernel
            probe_which=(
                probe_double
                if probe_double
                in ("visits", "issue", "skeleton", "headers", "rows", "shade")
                else None
            ),
        )
        out_shape = (
            [jax.ShapeDtypeStruct(plane_shape, f32)] * 12
            + [
                jax.ShapeDtypeStruct(plane_shape, jnp.uint32),
                jax.ShapeDtypeStruct(plane_shape, jnp.int32),
            ]
        )
        out_specs = [plane_spec] * 14
        # the transposed-header mode (hdr_lanes) splits each cluster
        # DMA: rows -> SMEM, header block -> VMEM (vector-readable)
        smem_rows = csize if hdr_lanes else csize + nsub_for(csize)
        scratch = [
            pltpu.SMEM((num_clusters,), jnp.int32),
            pltpu.SMEM((num_clusters,), jnp.int32),
            pltpu.SMEM((NBINS,), jnp.int32),
            pltpu.SMEM((smem_rows, 128), f32),
            pltpu.SMEM((smem_rows, 128), f32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ]
        if hdr_lanes:
            scratch += [
                pltpu.VMEM((HDR_ROWS, 128), f32),
                pltpu.VMEM((HDR_ROWS, 128), f32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ]
        if stats:
            out_shape.append(
                jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.int32)
            )
            out_specs.append(
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0))
            )
            scratch.append(pltpu.SMEM((8,), jnp.int32))
        iparams = jnp.asarray(seg, jnp.int32).reshape(1)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2 + [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        args = [fparams, iparams, table, caabb_flat, saabb_flat]
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs + [plane_spec] * 14,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
            # AABB tables flat 1D (2D SMEM lane-pads to 128 cols)
        )(*args, *planes)
        return tuple(outs)

    def run_shadow(planes8):
        """The bounce-0 NEE shadow segment (_shadow_kernel) over 8 planes
        (o.xyz, w.xyz, cap, mask); returns the int32 occlusion plane."""
        kernel = functools.partial(
            _shadow_kernel, cfg=cfg,
            num_clusters=num_clusters, csize=csize,
            num_supers=num_supers, ssize=ssize, hdr_lanes=hdr_lanes,
        )
        smem_rows = csize if hdr_lanes else csize + nsub_for(csize)
        scratch = [
            pltpu.SMEM((num_clusters,), jnp.int32),
            pltpu.SMEM((num_clusters,), jnp.int32),
            pltpu.SMEM((NBINS,), jnp.int32),
            pltpu.SMEM((smem_rows, 128), f32),
            pltpu.SMEM((smem_rows, 128), f32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ]
        if hdr_lanes:
            scratch += [
                pltpu.VMEM((HDR_ROWS, 128), f32),
                pltpu.VMEM((HDR_ROWS, 128), f32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ]
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        fparams_s = jnp.asarray(inv_diam, jnp.float32).reshape(1)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs + [plane_spec] * 8,
            out_specs=plane_spec,
            out_shape=jax.ShapeDtypeStruct(plane_shape, jnp.int32),
            scratch_shapes=scratch,
            interpret=interpret,
        )(fparams_s, table, caabb_flat, saabb_flat, *planes8)

    def _plane_key(ops):
        return _sort_key(
            ops[0], ops[1], ops[2], ops[3], ops[4], ops[5], ops[13],
            lo, inv_size, mode=sort_mode,
            saabb=super_aabbs, num_supers=num_supers,
        )

    def sort_planes(planes, pix_plane):
        ops = tuple(p.reshape(n) for p in planes) + (pix_plane.reshape(n),)
        key = _plane_key(ops)
        sorted_ops = jax.lax.sort((key,) + ops, num_keys=1)
        if probe_double == "sort":
            # doubling probe: re-sort the sorted planes (lax.sort is
            # stable and the network is data-oblivious -- identical
            # result, representative cost; sort(sort(x)) is not CSE-able)
            sorted_ops = jax.lax.sort(sorted_ops, num_keys=1)
        planes = tuple(p.reshape(plane_shape) for p in sorted_ops[1:15])
        return planes, sorted_ops[15].reshape(plane_shape)

    acc_r = jnp.zeros(n, f32)
    acc_g = jnp.zeros(n, f32)
    acc_b = jnp.zeros(n, f32)
    if emit_throughput:
        acc_tr = jnp.zeros(n, f32)
        acc_tg = jnp.zeros(n, f32)
        acc_tb = jnp.zeros(n, f32)

    for batch in range(cfg.sample_batches):
        seed = (
            px.astype(jnp.uint32) * _U(3266489917)
            + py.astype(jnp.uint32) * _U(668265263)
        ) ^ frame_term ^ (_U(batch) * _U(2654435761))
        state = seed
        for _sample in range(cfg.spp):
            # AA jitter (raytrace.comp.glsl:84-92, 314); state advances by
            # exactly two draws per sample as in the megakernel
            def gen_rays(st_in, one=None):
                st, u1 = _pcg_xla(st_in)
                st, u2 = _pcg_xla(st)
                u1 = jnp.maximum(jnp.float32(1e-38), u1)
                r_g = jnp.sqrt(jnp.float32(-2.0) * jnp.log(u1))
                theta_g = np.float32(2.0 * 3.14159265) * u2
                jx = jnp.float32(cfg.aa_sigma) * r_g * jnp.cos(theta_g)
                jy = jnp.float32(cfg.aa_sigma) * r_g * jnp.sin(theta_g)
                if primary_from is not None:
                    # G-buffer-seeded primaries: center rays (the draws
                    # above still advance the stream -- bit-identical to
                    # aa_sigma=0)
                    jx = jx * jnp.float32(0.0)
                    jy = jy * jnp.float32(0.0)
                if one is not None:  # doubling-probe perturbation
                    jx, jy = jx * one, jy * one
                fx = px.astype(f32) + jnp.float32(0.5) + jx
                fy = py.astype(f32) + jnp.float32(0.5) + jy
                su = (jnp.float32(2.0) * fx - wf) * inv_h
                sv = -(jnp.float32(2.0) * fy - hf) * inv_h
                cx_ = slope * su
                cy_ = slope * sv
                ddx = rot[0, 0] * cx_ + rot[0, 1] * cy_ - rot[0, 2]
                ddy = rot[1, 0] * cx_ + rot[1, 1] * cy_ - rot[1, 2]
                ddz = rot[2, 0] * cx_ + rot[2, 1] * cy_ - rot[2, 2]
                inv_n = jax.lax.rsqrt(ddx * ddx + ddy * ddy + ddz * ddz)
                return st, ddx * inv_n, ddy * inv_n, ddz * inv_n

            raygen_sink = None
            if probe_double == "raygen":
                # doubling probe: run the whole ray-gen block a second
                # time from a runtime-identically-equal seed (frame_idx is
                # traced, so the comparison cannot constant-fold; the
                # select picks 0.0 at runtime, keeping bits identical)
                rt = jnp.asarray(frame_idx, jnp.float32)
                far = rt < jnp.float32(-1e30)
                one2 = jnp.where(far, jnp.float32(2.0), jnp.float32(1.0))
                zero_u = jnp.where(far, _U(1), _U(0))
                _, dx2, dy2, dz2 = gen_rays(state ^ zero_u, one2)
                raygen_sink = jnp.where(
                    far, dx2 + dy2 + dz2, jnp.float32(0.0)
                )
            state, ddx, ddy, ddz = gen_rays(state)

            if primary_from is not None:
                # bounce 0 replayed off the G-buffer in XLA (the same
                # shared shading step the dense oracle uses); the kernel
                # loop then starts at segment 1
                from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops import (
                    pathtrace as pt_xla,
                )

                o0 = jnp.broadcast_to(cam, (n, 3))
                d0 = jnp.stack([ddx, ddy, ddz], axis=-1)
                carry0 = pt_xla.primary_carry(
                    o0, d0, state, prim[0], jnp.stack(prim[1:4], axis=-1),
                    jnp.stack(prim[4:7], axis=-1),
                    jnp.stack(prim[7:10], axis=-1),
                    jnp.asarray(light.position, f32), hdr, cfg,
                    defer_nee_shadow=cfg.nee,
                )
                o1, d1, acc1, res1, alive1, state1 = carry0[:6]
                if cfg.nee:
                    # bounce-0 NEE occlusion: the deferred shadow rays
                    # (origins = primary hits, directions into the light
                    # cone -- maximally coherent) walk the streamed scene
                    # in a dedicated occlusion-only segment; banked
                    # contributions land where the walk commits nothing.
                    w_l, s_cap, bank, nmask = carry0[6]
                    nmask = nmask & in_image
                    s_cap = jnp.where(nmask, s_cap, jnp.float32(0.0))
                    shadow_planes = tuple(
                        p.reshape(plane_shape)
                        for p in (
                            o1[:, 0], o1[:, 1], o1[:, 2],
                            w_l[:, 0], w_l[:, 1], w_l[:, 2],
                            s_cap, nmask.astype(jnp.int32),
                        )
                    )
                    occ = run_shadow(shadow_planes).reshape(n)
                    lit = nmask & (occ == 0)
                    res1 = res1 + jnp.where(lit[..., None], bank, 0.0)
                planes = tuple(
                    p.reshape(plane_shape)
                    for p in (
                        o1[:, 0], o1[:, 1], o1[:, 2],
                        d1[:, 0], d1[:, 1], d1[:, 2],
                        acc1[:, 0], acc1[:, 1], acc1[:, 2],
                        res1[:, 0], res1[:, 1], res1[:, 2],
                        state1,
                        (alive1 & in_image).astype(jnp.int32),
                    )
                )
            else:
                planes = tuple(
                    p.reshape(plane_shape)
                    for p in (
                        jnp.full(n, cam[0], f32),
                        jnp.full(n, cam[1], f32),
                        jnp.full(n, cam[2], f32),
                        ddx, ddy, ddz,
                        jnp.ones(n, f32), jnp.ones(n, f32), jnp.ones(n, f32),
                        jnp.zeros(n, f32), jnp.zeros(n, f32), jnp.zeros(n, f32),
                        state,
                        in_image.astype(jnp.int32),
                    )
                )
            pix_plane = pix.reshape(plane_shape)
            start_seg = 1 if primary_from is not None else 0

            if collect_stats:
                assert cfg.spp == 1 and cfg.sample_batches == 1, (
                    "collect_stats probe supports 1 spp only"
                )
                stats_out = []
                sort_at = _sort_segments_for(num_clusters, cfg.max_bounces)
                for seg in range(start_seg, cfg.max_bounces):
                    if not np.asarray(jnp.max(planes[13])) > 0:
                        break
                    if seg in sort_at:
                        planes, pix_plane = sort_planes(planes, pix_plane)
                    outs = run_segment(seg, planes, stats=True)
                    planes = outs[:14]
                    stats_out.append(np.asarray(outs[14][:, 0, :8]))
            elif start_seg < cfg.max_bounces:
                def cond(c):
                    seg, planes, _ = c
                    return (seg < cfg.max_bounces) & (jnp.max(planes[13]) > 0)

                def body(c):
                    seg, planes, pix_plane = c
                    do_sort = jnp.zeros((), jnp.bool_)
                    for s in _sort_segments_for(num_clusters, cfg.max_bounces):
                        do_sort = do_sort | (seg == s)
                    planes, pix_plane = jax.lax.cond(
                        do_sort,
                        lambda p, q: sort_planes(p, q),
                        lambda p, q: (p, q),
                        planes, pix_plane,
                    )
                    planes = run_segment(seg, planes)
                    return seg + 1, planes, pix_plane

                _, planes, pix_plane = jax.lax.while_loop(
                    cond, body, (jnp.int32(start_seg), planes, pix_plane)
                )
            alive_f = planes[13].reshape(n) != 0
            if cfg.nee or cfg.truncate_radiance:
                # with NEE the result accumulates along the path; the
                # fall-through quirk is dropped (see ops/pathtrace.py).
                # truncate_radiance drops it too: survivors return only
                # their banked radiance (the multi-res truncated trace,
                # config.py).
                res_r = planes[9].reshape(n)
                res_g = planes[10].reshape(n)
                res_b = planes[11].reshape(n)
            else:
                # fall-through: surviving paths keep bare throughput
                # (raytrace.comp.glsl:270)
                res_r = jnp.where(alive_f, planes[6].reshape(n), planes[9].reshape(n))
                res_g = jnp.where(alive_f, planes[7].reshape(n), planes[10].reshape(n))
                res_b = jnp.where(alive_f, planes[8].reshape(n), planes[11].reshape(n))
            if primary_from is not None and start_seg >= cfg.max_bounces:
                # no segment kernel ran (gbuffer_primary + max_bounces=1,
                # e.g. the indirect_split=1 truncated full-res trace): the
                # planes were never sorted, so the descramble sort is a
                # static no-op -- skip it
                acc_r = acc_r + res_r
                acc_g = acc_g + res_g
                acc_b = acc_b + res_b
                if emit_throughput:
                    acc_tr = acc_tr + jnp.where(
                        alive_f, planes[6].reshape(n), jnp.float32(0.0)
                    )
                    acc_tg = acc_tg + jnp.where(
                        alive_f, planes[7].reshape(n), jnp.float32(0.0)
                    )
                    acc_tb = acc_tb + jnp.where(
                        alive_f, planes[8].reshape(n), jnp.float32(0.0)
                    )
                if raygen_sink is not None:
                    # keep the raygen doubling-probe's sink alive in the
                    # skip-sort branch too (probe timing only)
                    acc_r = acc_r + raygen_sink
                continue
            sort_ops = (pix_plane.reshape(n), res_r, res_g, res_b)
            if emit_throughput:
                # truncation-point path throughput (multi-res residual
                # demodulator): rides the descramble sort as three extra
                # operands instead of paying a second sort.
                sort_ops = sort_ops + tuple(
                    jnp.where(alive_f, planes[6 + i].reshape(n), jnp.float32(0.0))
                    for i in range(3)
                )
            # descramble: one multi-operand sort by pixel id (unique keys)
            sorted_ops = jax.lax.sort(sort_ops, num_keys=1)
            if probe_double == "descramble":
                # doubling probe: re-sort the sorted planes (stable and
                # data-oblivious -- identity result, representative cost,
                # not CSE-able; same device as the 'sort' probe)
                sorted_ops = jax.lax.sort(sorted_ops, num_keys=1)
            acc_r = acc_r + sorted_ops[1]
            acc_g = acc_g + sorted_ops[2]
            acc_b = acc_b + sorted_ops[3]
            if emit_throughput:
                acc_tr = acc_tr + sorted_ops[4]
                acc_tg = acc_tg + sorted_ops[5]
                acc_tb = acc_tb + sorted_ops[6]
            if raygen_sink is not None:
                acc_r = acc_r + raygen_sink  # runtime zeros (see probe)

    norm = jnp.float32(1.0 / (cfg.spp * cfg.sample_batches))
    out = tuple((acc * norm)[:n_pix] for acc in (acc_r, acc_g, acc_b))
    if emit_throughput:
        out = out + tuple(
            (acc * norm)[:n_pix] for acc in (acc_tr, acc_tg, acc_tb)
        )
    if collect_stats:
        return out, stats_out
    return out
