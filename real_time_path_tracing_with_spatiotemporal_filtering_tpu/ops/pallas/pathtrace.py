"""Pallas path-trace megakernel.

The TPU answer to the reference's VK_KHR_ray_query megakernel
(raytrace.comp.glsl:200-344): one fused kernel per pixel tile that runs the
whole <=32-segment bounce loop with stream state (origins, directions,
throughput, PCG RNG) held in vector registers and the scene tables on-chip
(SMEM for small scenes, VMEM beyond the SMEM compile cap). HBM traffic is
exactly one radiance write per pixel; everything the XLA formulation
spilled as (N, T) tables stays on-chip.

Pixels map to vector lanes: a tile of (TILE_H, TILE_W) pixels is a stack of
(8, 128) vregs; per-primitive constants are scalar reads, so every VPU op
advances the whole tile at once. Three mechanisms fight the costs that
dominate a SIMD path tracer:

  * coplanar fan pairs merge into one shading primitive (shared plane
    test, two inside-tests) -- pack_shading_pairs;
  * a two-level Morton AABB hierarchy skips whole primitive groups per
    tile-segment via in-kernel lax.cond -- _nearest_hit_clustered;
  * in-register survivor compaction packs live rays into narrower tile
    slices as paths terminate -- _run_with_compaction.

Numerics match the XLA path op-for-op (same PCG streams, same termination
rules, same reference quirks) except the committed hit position, computed
as o + t*d instead of the barycentric recombination
(raytrace.comp.glsl:137) -- a ~1e-6 difference bounded by the ray-offset
epsilon.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile shape: lanes are pixels. Empirically tuned at 1080p on v5e:
# 8x512 beat 8x128/8x256/16x256/16x512 (per-program overhead vs the
# early-exit granularity of the bounce while_loop -- sky tiles leave after
# one segment).
TILE_H = 8
TILE_W = 512

import numpy as np

_U = jnp.uint32
# numpy scalars (NOT jnp arrays): concrete jax Arrays at module scope would
# be closure-captured by the kernel, which pallas_call rejects.
_INV_U32_MAX = np.float32(1.0 / 4294967295.0)
_TWO_PI = np.float32(2.0 * 3.14159265)

# tri table columns: v0(0:3) n(3:6) d0(6) n1(7:10) d1(10) n2(11:14) d2(14)
# albedo(15:18) unit normal(18:21)
TRI_COLS = 21

# shading-primitive (coplanar pair) table columns:
# n(0:3) d0(3) | sub-tri A: n1,d1,n2,d2 (4:12) | sub-tri B: (12:20)
# albedo(20:23) unit normal(23:26)
PAIR_COLS = 26


def pack_triangles(tri_data) -> jnp.ndarray:
    """Flatten TriangleData into the (T, 21) SMEM scalar table."""
    p = tri_data.planes
    return jnp.concatenate(
        [
            p.v0,
            p.n,
            p.d0[:, None],
            p.n1,
            p.d1[:, None],
            p.n2,
            p.d2[:, None],
            tri_data.albedo,
            tri_data.normals,
        ],
        axis=1,
    ).astype(jnp.float32)


def _greedy_adjacent_pairs(can_pair: "np.ndarray") -> "np.ndarray":
    """Vectorized left-to-right greedy matching on a path graph.

    ``can_pair[i]`` says triangles (i, i+1) may merge. The sequential greedy
    scan pairs the first eligible index of every run of consecutive True
    values, then every second index after it -- i.e. within a True-run
    starting at s, pair starts are s, s+2, s+4, ... Expressed with a
    cumulative max over run starts (no Python loop; 250k tris in ~ms).

    Returns (P, 2) int64 [a, b] rows in ascending order; singletons have
    a == b. Matches the round-1 per-triangle scan exactly (golden-tested).
    """
    num = can_pair.shape[0] + 1  # triangles
    if num == 1:
        return np.array([[0, 0]], np.int64)
    m = np.asarray(can_pair, bool)
    idx = np.arange(num - 1)
    # last index <= i where m is False (-1 when none): marks the run start
    last_false = np.maximum.accumulate(np.where(~m, idx, -1))
    offset = idx - last_false - 1  # position within the current True-run
    pair_start = m & (offset % 2 == 0)
    is_a_of_pair = np.concatenate([pair_start, [False]])  # per-triangle
    is_b_of_pair = np.concatenate([[False], pair_start])
    single = ~is_a_of_pair & ~is_b_of_pair
    a = np.where(is_a_of_pair | single)[0]
    b = np.where(is_a_of_pair[a], a + 1, a)
    return np.stack([a, b], axis=1)


def pack_shading_pairs(tri_data) -> "np.ndarray":
    """Merge coplanar fan pairs into (P, 26) shading primitives.

    The bounce loop only consumes the hit's t, geometric normal and albedo
    -- all identical for the two triangles of a planar quad after fan
    triangulation ((0,1,2), (0,2,3), scene/obj.py). Consecutive triangle
    pairs sharing plane, normal AND albedo merge into one primitive with a
    shared plane test and two barycentric inside-tests; unmergeable
    triangles become a pair of two identical sub-triangles (same cost, same
    result). Cornell: 32 tris -> 16 primitives, ~25% fewer bounce-loop ops.

    Host-side (numpy), fully vectorized: <1 s at 250k triangles (the round-1
    per-pair Python scan took minutes there).
    """
    p = tri_data.planes
    n = np.asarray(p.n)
    d0 = np.asarray(p.d0)
    n1, d1 = np.asarray(p.n1), np.asarray(p.d1)
    n2, d2 = np.asarray(p.n2), np.asarray(p.d2)
    albedo = np.asarray(tri_data.albedo)
    normals = np.asarray(tri_data.normals)
    num = n.shape[0]
    if num == 0:
        # empty scene: sky-only render, zero-iteration pair loop
        return (
            np.zeros((0, PAIR_COLS), np.float32),
            np.zeros((0, 2), np.int64),
        )

    # same oriented plane (normalized) and same material, for (i, i+1);
    # tolerances replicate np.allclose's |a-b| <= atol + rtol*|b| form used
    # by the round-1 scalar scan (rtol defaults to 1e-5).
    if num > 1:
        scale = np.linalg.norm(n, axis=1)
        safe = np.maximum(scale, 1e-30)[:, None]
        nh = n / safe
        dh = d0 / np.maximum(scale, 1e-30)
        ai, bi = nh[:-1], nh[1:]

        def close(a, b, atol, rtol=1e-5):
            return np.abs(a - b) <= atol + rtol * np.abs(b)

        can_pair = (
            (scale[:-1] >= 1e-12)
            & (scale[1:] >= 1e-12)
            & close(ai, bi, 1e-5).all(axis=1)
            & (np.abs(dh[:-1] - dh[1:]) < 1e-5)
            & close(albedo[:-1], albedo[1:], 1e-6).all(axis=1)
        )
        pairs = _greedy_adjacent_pairs(can_pair)
    else:
        pairs = _greedy_adjacent_pairs(np.zeros((0,), bool))

    # Morton-order pairs (by centroid) so consecutive pairs are spatially
    # tight -- the cluster AABBs built over them stay small. Order does not
    # affect results beyond exact-t ties (no primitive identity here).
    if pairs.shape[0] >= CLUSTER_MIN_PAIRS:
        from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene.lbvh import (
            morton_codes_np,
        )

        tris = np.asarray(tri_data.lut)[1:]
        # per-triangle centroids ONCE, then gather (3 floats/pair instead
        # of gathering 9 and reducing; same pairwise sum order as
        # np.mean's (v0+v1)+v2, so bit-identical)
        tc = ((tris[:, 0] + tris[:, 1] + tris[:, 2]) / np.float32(3.0)).astype(
            np.float32, copy=False
        )
        cents = (tc[pairs[:, 0]] + tc[pairs[:, 1]]).astype(
            np.float32
        ) * np.float32(0.5)
        codes = morton_codes_np(cents)
        pairs = pairs[np.argsort(codes, kind="stable")]

    a, b = pairs[:, 0], pairs[:, 1]
    table = np.concatenate(
        [
            n[a], d0[a, None],
            n1[a], d1[a, None], n2[a], d2[a, None],
            n1[b], d1[b, None], n2[b], d2[b, None],
            albedo[a], normals[a],
        ],
        axis=1,
    ).astype(np.float32)
    return table, pairs  # pairs: (P, 2) [a, b] triangle indices


CLUSTER_MIN_PAIRS = 32   # below this, flat iteration is cheaper
SUPER_MIN_CLUSTERS = 16  # second hierarchy level kicks in here

# Scene tables live in SMEM up to this size (observed: 113 KB compiles,
# 433 KB rejected on v5e); bigger tables are placed in VMEM instead, where
# dynamic scalar reads cost a few extra ops per access. A VMEM table row is
# lane-padded to 128 floats (512 B) regardless of its column count, and
# Mosaic rejects dynamic-lane reads, so denser packings are not available;
# the practical cap is therefore ~24k table rows (measured: 17.4k-row
# tables compile and run, 32.8k hit the 16 MB scoped-vmem limit). Beyond
# the budget the frame falls back to the XLA formulation.
MAX_SMEM_TABLE_BYTES = 100 * 1024
MAX_VMEM_TABLE_BYTES = 12 * 1024 * 1024
_VMEM_ROW_BYTES = 128 * 4  # lane padding


def _table_space(rows: int, cols: int):
    if rows * cols * 4 <= MAX_SMEM_TABLE_BYTES:
        return pltpu.SMEM
    return pltpu.VMEM


def _resident_table_rows(tri_data) -> int:
    """Rows the frame's Pallas kernels would keep on-chip: the pair table
    for the trace loop (falls back to the triangle table without pairing),
    and the triangle table for the dense geometry kernel unless the
    clustered geometry path (HBM-streamed) is packed."""
    pair_table = getattr(tri_data, "pair_table", None)
    rows = (
        int(pair_table.shape[0])
        if pair_table is not None
        else int(tri_data.normals.shape[0])
    )
    if getattr(tri_data, "geo_static", None) is None:
        rows = max(rows, int(tri_data.normals.shape[0]))
    return rows


def trace_needs_streaming(tri_data) -> bool:
    """True when the bounce loop should stream its pair table from HBM.

    Measured on v5e: dynamic scalar reads cost ~72 cycles/row from SMEM,
    ~180 from VMEM, and HBM->SMEM streamed blocks read at ~84 -- so the
    moment the table outgrows the SMEM-resident budget, streaming beats a
    VMEM-resident table (which survives only as the fallback for scenes
    that carry no cluster hierarchy, e.g. traced geometry)."""
    pair_table = getattr(tri_data, "pair_table", None)
    if pair_table is None or getattr(tri_data, "cluster_aabbs", None) is None:
        return False
    rows = int(pair_table.shape[0])
    return rows * PAIR_COLS * 4 > MAX_SMEM_TABLE_BYTES


def pallas_scene_supported(tri_data) -> bool:
    """True when the scene can run the Pallas fast path: each kernel's
    table either fits on-chip or carries the cluster hierarchy needed for
    HBM streaming."""
    if not trace_needs_streaming(tri_data):
        # no hierarchy (or small): must fit the resident budget
        pair_table = getattr(tri_data, "pair_table", None)
        rows = (
            int(pair_table.shape[0])
            if pair_table is not None
            else int(tri_data.normals.shape[0])
        )
        if rows * _VMEM_ROW_BYTES > MAX_VMEM_TABLE_BYTES:
            return False
    if getattr(tri_data, "geo_static", None) is None:
        # dense geometry kernel: per-triangle table must fit on-chip
        if int(tri_data.normals.shape[0]) * _VMEM_ROW_BYTES > MAX_VMEM_TABLE_BYTES:
            return False
    return True


def hierarchy_sizes(
    num_pairs: int, min_rows: int = CLUSTER_MIN_PAIRS
) -> tuple[int, int, int, int]:
    """(csize, num_clusters, ssize, num_supers); zeros when a level is
    absent. Must be the single source of truth for packing AND kernel
    wiring (padding depends on it)."""
    if num_pairs < min_rows:
        return 0, 0, 0, 0
    cs = cluster_size_for(num_pairs)
    c = -(-num_pairs // cs)
    if c >= SUPER_MIN_CLUSTERS:
        ss = cluster_size_for(c, allow_override=False)
        s = -(-c // ss)
        return cs, s * ss, ss, s  # cluster count padded to the super grid
    return cs, c, 0, 0


def build_hierarchy(tri_data, pair_order):
    """(cluster_aabbs, super_aabbs | None, sub_aabbs | None) for
    Morton-ordered pairs. ``sub_aabbs`` is (C*nsub_for(csize), 6):
    per-cluster sub-block boxes of ``csize/nsub`` consecutive pairs,
    streamed as an nsub-row header before the rows so the in-kernel loop
    can skip whole sub-blocks (assemble_stream_table).

    Rows beyond the real count are degenerate point boxes at +3e37 (see
    DEGENERATE_BOX): the min/max slab test never passes them. (Flipped
    lo>hi "empty" boxes do NOT work: per-axis min/max sorting turns them
    into a universe-spanning box that lands in distance bin 0 and runs
    its whole row loop -- measured as always-visited pad clusters before
    round 2.)"""
    cs, c_padded, ss, s = hierarchy_sizes(len(pair_order))
    if cs == 0:
        return None, None, None
    tris = np.asarray(tri_data.lut)[1:]  # (T, 3, 3)
    pairs = np.asarray(pair_order, np.int64).reshape(-1, 2)
    a, b = pairs[:, 0], pairs[:, 1]
    # per-triangle extents ONCE with pairwise ufuncs (numpy's generic
    # axis-1 reduce on the gathered (P, 3, 3) measured ~5x slower at 250k)
    tlo = np.minimum(np.minimum(tris[:, 0], tris[:, 1]), tris[:, 2])
    thi = np.maximum(np.maximum(tris[:, 0], tris[:, 1]), tris[:, 2])
    lo = np.minimum(tlo[a], tlo[b])  # (P, 3)
    hi = np.maximum(thi[a], thi[b])
    caabb = _group_aabbs(lo, hi, cs)
    nsub = nsub_for(cs)
    sub = _group_aabbs(lo, hi, max(cs // nsub, 1))
    sub_needed = c_padded * nsub
    if sub.shape[0] < sub_needed:
        sub = np.concatenate(
            [
                sub,
                np.full(
                    (sub_needed - sub.shape[0], 6), DEGENERATE_BOX, np.float32
                ),
            ]
        )
    if s == 0:
        return caabb, None, sub
    pad = c_padded - caabb.shape[0]
    if pad:
        degenerate = np.tile(np.full((6,), DEGENERATE_BOX, np.float32), (pad, 1))
        caabb = np.concatenate([caabb, degenerate], axis=0)
    grouped = caabb.reshape(s, ss, 6)
    # supers reduce over REAL clusters only (point-box pads at +3e37 would
    # drag every mixed super's hi corner to +3e37)
    real = grouped[:, :, 0] < 1e29
    glo = np.where(real[:, :, None], grouped[:, :, :3], np.inf).min(axis=1)
    ghi = np.where(real[:, :, None], grouped[:, :, 3:], -np.inf).max(axis=1)
    saabb = np.concatenate([glo, ghi], axis=1)
    fake = ~real.any(axis=1)
    saabb[fake] = DEGENERATE_BOX
    return caabb, saabb.astype(np.float32), sub


_CSIZE_OVERRIDE = None  # benchmarks-only knob, see set_cluster_size_override


def set_cluster_size_override(csize):
    """Force the pairs-per-cluster granularity (None restores the policy).

    Benchmark/probe knob: hierarchy_sizes must agree between scene pack
    time and kernel wiring, so set it BEFORE precompute_triangle_data and
    keep it until the traced arrays are dropped."""
    global _CSIZE_OVERRIDE
    assert csize is None or (csize & (csize - 1) == 0 and 8 <= csize <= 128)
    _CSIZE_OVERRIDE = csize


def cluster_size_for(num_pairs: int, allow_override: bool = True) -> int:
    """Pairs per cluster: ~2*sqrt(P) rounded to a power of two, clamped to
    [8, 64]. Empirically (subdivided Cornell, 272 pairs at 1080p): 32 beat
    8/16/64; the per-cluster skip check has fixed cost, so granularity
    should grow with scene size."""
    if _CSIZE_OVERRIDE is not None and allow_override:
        return min(_CSIZE_OVERRIDE, 128)
    target = 2.0 * (num_pairs ** 0.5)
    cs = 8
    while cs * 2 <= target and cs < 64:
        cs *= 2
    return cs


def scene_bounds_from_clusters(cluster_aabbs):
    """(inv_diam scalar) from a cluster AABB table, masking DEGENERATE_BOX
    pad rows (point boxes at +3e37). In-graph: tables may be traced. The
    single source for the streamed traversal's distance-bin scale (used by
    the megakernel, the wavefront tracer and the geometry kernel)."""
    finite = cluster_aabbs[:, 0] < 1e29
    lo = jnp.min(
        jnp.where(finite[:, None], cluster_aabbs[:, :3], jnp.inf), axis=0
    )
    hi = jnp.max(
        jnp.where(finite[:, None], cluster_aabbs[:, 3:], -jnp.inf), axis=0
    )
    return 1.0 / jnp.maximum(jnp.linalg.norm(hi - lo), 1e-6), lo, hi


# Degenerate pad boxes are POINT boxes far outside any scene: per-axis
# entry times differ, so the whole-tile slab test's tmax < tmin for every
# ray not aimed exactly at the point, and the ordered walk's
# ``tmin < 1e30`` guard rejects even that measure-zero case. (+inf/-inf
# flipped boxes fail here: min/max slab sorting makes them universal.)
DEGENERATE_BOX = np.float32(3e37)


def _group_aabbs(lo: "np.ndarray", hi: "np.ndarray", csize: int):
    """Reduce (P, 3) box min/max arrays into per-cluster AABBs of ``csize``
    consecutive boxes: (ceil(P/csize), 6) [min3 | max3], vectorized.
    Fully-padded groups come out as DEGENERATE_BOX points."""
    p = lo.shape[0]
    pad = (-p) % csize
    if pad:
        lo = np.concatenate([lo, np.full((pad, 3), np.inf, lo.dtype)])
        hi = np.concatenate([hi, np.full((pad, 3), -np.inf, hi.dtype)])
    # pairwise-halving reduction (csize is a power of two): touches ~2x
    # the data total vs numpy's generic strided axis reduce at ~5x the
    # throughput; min/max are exactly associative so this is bit-identical
    lo_g = lo.reshape(-1, 3)
    hi_g = hi.reshape(-1, 3)
    groups = csize
    while groups > 1:
        half = lo_g.reshape(-1, 2, 3)
        lo_g = np.minimum(half[:, 0], half[:, 1])
        half = hi_g.reshape(-1, 2, 3)
        hi_g = np.maximum(half[:, 0], half[:, 1])
        groups //= 2
    out = np.concatenate([lo_g, hi_g], axis=1).astype(np.float32)
    out[~np.isfinite(out[:, 0])] = DEGENERATE_BOX
    return out


def _u2f(word):
    """uint32 -> float32 value conversion, Mosaic-safe.

    Mosaic has no unsigned->float cast; go through the signed view and add
    2^32 back for the wrapped half. At most 1 ulp from the direct
    conversion (the XLA path), immaterial for sampling."""
    signed = pltpu.bitcast(word, jnp.int32)
    f = signed.astype(jnp.float32)
    return jnp.where(signed < 0, f + np.float32(4294967296.0), f)


def _pcg(state):
    state = state * _U(747796405) + _U(1)
    word = ((state >> ((state >> _U(28)) + _U(4))) ^ state) * _U(277803737)
    word = (word >> _U(22)) ^ word
    return state, _u2f(word) * _INV_U32_MAX


def _nearest_hit_unrolled(
    tri_ref, num_tris, ox, oy, oz, dx, dy, dz, cfg, track_prim=False
):
    """Closest-hit over all triangles via a fori_loop with dynamic SMEM
    scalar reads per triangle; tests are whole-tile VPU ops. (A fully
    unrolled triangle loop produced minute-scale Mosaic compiles; the rolled
    loop body is ~T times smaller with identical numerics -- first-minimal
    tie-breaking preserved.) ``track_prim`` also returns the committed
    primID+1 as float (0 = miss), for the G-buffer."""
    t_max = jnp.float32(cfg.t_max)
    big = t_max * jnp.float32(2.0)

    def tri_body(t, s):
        # hit carried as int32: Mosaic cannot legalize i1 vectors in
        # scf.for/scf.while carries.
        best_t, hit_i, bnx, bny, bnz, bar, bag, bab, vis = s
        nx, ny, nz = tri_ref[t, 3], tri_ref[t, 4], tri_ref[t, 5]
        d0 = tri_ref[t, 6]
        n1x, n1y, n1z, d1 = tri_ref[t, 7], tri_ref[t, 8], tri_ref[t, 9], tri_ref[t, 10]
        n2x, n2y, n2z, d2 = tri_ref[t, 11], tri_ref[t, 12], tri_ref[t, 13], tri_ref[t, 14]

        nd = dx * nx + dy * ny + dz * nz
        no = ox * nx + oy * ny + oz * nz
        # No epsilon guard: nd == 0 gives inf/nan t, and every comparison
        # with nan below is false, so parallel rays reject themselves
        # (IEEE semantics replace the XLA path's explicit eps test).
        t_hit = (d0 - no) / nd
        u = (n1x * ox + n1y * oy + n1z * oz) + t_hit * (
            n1x * dx + n1y * dy + n1z * dz
        ) + d1
        v = (n2x * ox + n2y * oy + n2z * oz) + t_hit * (
            n2x * dx + n2y * dy + n2z * dz
        ) + d2
        # t_max always enforced: best_t inits to 2*t_max, so skipping the
        # test would commit hits in (t_max, 2*t_max] that the XLA oracle and
        # the reference ray query (tMax, raytrace.comp.glsl:216) reject.
        valid = (
            (jnp.minimum(u, v) >= 0.0)
            & (u + v <= 1.0)
            & (t_hit > 0.0)
            & (t_hit <= t_max)
        )
        # t < best_t is nan-safe (nan compares false)
        closer = valid & (t_hit < best_t)
        best_t = jnp.where(closer, t_hit, best_t)
        hit_i = hit_i | closer.astype(jnp.int32)
        if track_prim:
            vis = jnp.where(closer, (t + 1).astype(jnp.float32), vis)
        bnx = jnp.where(closer, tri_ref[t, 18], bnx)
        bny = jnp.where(closer, tri_ref[t, 19], bny)
        bnz = jnp.where(closer, tri_ref[t, 20], bnz)
        bar = jnp.where(closer, tri_ref[t, 15], bar)
        bag = jnp.where(closer, tri_ref[t, 16], bag)
        bab = jnp.where(closer, tri_ref[t, 17], bab)
        return best_t, hit_i, bnx, bny, bnz, bar, bag, bab, vis

    zero = jnp.zeros_like(ox)
    init = (
        jnp.full_like(ox, big),
        jnp.zeros_like(ox, dtype=jnp.int32),
        zero, zero, zero, zero, zero, zero, zero,
    )
    best_t, hit_i, bnx, bny, bnz, bar, bag, bab, vis = jax.lax.fori_loop(
        0, num_tris, tri_body, init
    )
    hit = hit_i != 0
    if track_prim:
        return best_t, hit, (bnx, bny, bnz), (bar, bag, bab), vis
    return best_t, hit, (bnx, bny, bnz), (bar, bag, bab)


def _nearest_hit_pairs(pair_ref, num_pairs, ox, oy, oz, dx, dy, dz, cfg):
    """Closest-hit over merged coplanar pairs (PAIR_COLS layout): one plane
    test + two barycentric inside-tests per primitive (_pair_test). Returns
    (best_t, hit, normal3, albedo3) -- no primitive identity (the bounce
    loop does not need one)."""
    big = jnp.float32(cfg.t_max) * jnp.float32(2.0)

    def body(t, s):
        return _pair_test(pair_ref, t, ox, oy, oz, dx, dy, dz, s, cfg)

    zero = jnp.zeros_like(ox)
    init = (
        jnp.full_like(ox, big),
        jnp.zeros_like(ox, dtype=jnp.int32),
        zero, zero, zero, zero, zero, zero,
    )
    best_t, hit_i, bnx, bny, bnz, bar, bag, bab = jax.lax.fori_loop(
        0, num_pairs, body, init
    )
    return best_t, hit_i != 0, (bnx, bny, bnz), (bar, bag, bab)


_NARROW_W = 128  # compacted tail-phase tile width (one vreg of lanes)


def _roll_l(x, s):
    """roll left by s along lanes: out[i] = x[i + s] (row-wrapping)."""
    return pltpu.roll(x, (x.shape[1] - s) % x.shape[1], 1)


def _roll_r(x, s):
    """roll right by s along lanes: out[i] = x[i - s] (row-wrapping)."""
    return pltpu.roll(x, s, 1)


def _pack_stage(carry, nw, nee=False):
    """Left-pack alive lanes into the first ``nw`` columns of each row.

    Uses collision-free binary routing: a lane preceded by k dead lanes
    moves left by k, decomposed bit-by-bit (LSB->MSB); validated against a
    numpy oracle over random masks. Returns the narrowed carry plus the
    info needed to inverse-route results back out.
    """
    (seg, ox, oy, oz, dx, dy, dz,
     tp_r, tp_g, tp_b, res_r, res_g, res_b, alive_i, st) = carry
    w = ox.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, ox.shape, 1)
    alive_w = alive_i != 0
    if not nee:
        # Preemptive fall-through (raytrace.comp.glsl:270): correct if the
        # loop already exhausted max_bounces; otherwise overwritten by
        # routed results. With NEE the result accumulates along the path
        # (narrow stages bank into zeroed planes that are ADDED back on
        # unpack), so res must be left untouched here.
        res_r = jnp.where(alive_w, tp_r, res_r)
        res_g = jnp.where(alive_w, tp_g, res_g)
        res_b = jnp.where(alive_w, tp_b, res_b)

    # per-row exclusive prefix sums -> pack distances
    incl = alive_i
    s = 1
    while s < w:
        incl = incl + jnp.where(lane >= s, _roll_r(incl, s), 0)
        s *= 2
    rank = incl - alive_i
    move = jnp.where(alive_w, lane - rank, 0)  # dead lanes before me

    st_i = pltpu.bitcast(st, jnp.int32)
    payload = [ox, oy, oz, dx, dy, dz, tp_r, tp_g, tp_b, st_i,
               lane]  # + this-space lane id for the inverse distances
    active = alive_i
    b = 1
    while b < w:
        src_move = _roll_l(move, b)
        src_active = _roll_l(active, b)
        recv = (lane + b < w) & (src_active != 0) & ((src_move & b) != 0)
        moved_out = (active != 0) & ((move & b) != 0)
        vacated = moved_out & ~recv
        payload = [jnp.where(recv, _roll_l(p, b), p) for p in payload]
        move = jnp.where(recv, src_move, move)
        active = jnp.where(vacated, 0, jnp.where(recv, 1, active))
        b *= 2

    row_cnt = jnp.sum(alive_i, axis=1, keepdims=True)  # pre-pack counts
    n_alive = (lane[:, :nw] < row_cnt).astype(jnp.int32)
    n = [p[:, :nw] for p in payload[:10]]
    zero_n = jnp.zeros_like(n[0])
    narrow_carry = (
        seg, n[0], n[1], n[2], n[3], n[4], n[5], n[6], n[7], n[8],
        zero_n, zero_n, zero_n, n_alive,
        pltpu.bitcast(n[9], jnp.uint32),
    )
    info = (alive_w, res_r, res_g, res_b, row_cnt, payload[10], lane, w)
    return narrow_carry, info


def _unpack_stage(nres, info, nee=False):
    """Inverse routing (bits MSB->LSB): packed results back to their
    original lanes of this stage's space, merged over the pre-pack
    results (``nee``: ADDED to them -- narrow stages accumulate into
    zeroed result planes)."""
    nres_r, nres_g, nres_b = nres
    alive_w, res_r, res_g, res_b, row_cnt, ids, lane, w = info
    nw = nres_r.shape[1]
    pad = jnp.zeros((nres_r.shape[0], w - nw), jnp.float32)
    r_r = jnp.concatenate([nres_r, pad], axis=1)
    r_g = jnp.concatenate([nres_g, pad], axis=1)
    r_b = jnp.concatenate([nres_b, pad], axis=1)
    b_active = (lane < row_cnt).astype(jnp.int32)
    dist = jnp.where(b_active != 0, ids - lane, 0)
    b = w // 2
    while b >= 1:
        src_dist = _roll_r(dist, b)
        src_active = _roll_r(b_active, b)
        recv = (lane >= b) & (src_active != 0) & ((src_dist & b) != 0)
        moved_out = (b_active != 0) & ((dist & b) != 0)
        vacated = moved_out & ~recv
        r_r = jnp.where(recv, _roll_r(r_r, b), r_r)
        r_g = jnp.where(recv, _roll_r(r_g, b), r_g)
        r_b = jnp.where(recv, _roll_r(r_b, b), r_b)
        dist = jnp.where(recv, src_dist - b, dist)
        b_active = jnp.where(vacated, 0, jnp.where(recv, 1, b_active))
        b //= 2
    if nee:
        return (
            jnp.where(alive_w, res_r + r_r, res_r),
            jnp.where(alive_w, res_g + r_g, res_g),
            jnp.where(alive_w, res_b + r_b, res_b),
        )
    return (
        jnp.where(alive_w, r_r, res_r),
        jnp.where(alive_w, r_g, res_g),
        jnp.where(alive_w, r_b, res_b),
    )


def _run_with_compaction(cond, body, init, nee=False):
    """Bounce loop with a cascade of in-register survivor compactions.

    The SIMD tail problem: survivors spread uniformly over the tile, so a
    (8, W) tile keeps paying full-width segment cost until its *last* lane
    dies (~max_bounces segments) although the mean path length is ~4.
    Per-tile early exit, finer tiles and XLA-side compaction all fail this
    statistically or cost more than they save.

    Fix: whenever every row's alive count fits in the next narrower width
    (W/2, W/4, ... down to _NARROW_W), left-pack survivors within each row
    and continue on the narrow slice at proportionally lower per-segment
    cost; finally inverse-route results back out through each packing.
    Rays carry their PCG state, so results are bit-identical to the
    uncompacted loop.
    """
    wide_w = init[1].shape[1]
    widths = []
    w = wide_w // 2
    while w >= _NARROW_W:
        widths.append(w)
        w //= 2

    cur = init
    infos = []
    for nw in widths:
        def stage_cond(c, nw=nw):
            row_max = jnp.max(jnp.sum(c[13], axis=1))
            return cond(c) & (row_max > nw)

        cur = jax.lax.while_loop(stage_cond, body, cur)
        cur, info = _pack_stage(cur, nw, nee=nee)
        infos.append(info)

    final = jax.lax.while_loop(cond, body, cur)
    (_, _, _, _, _, _, _,
     tp_r, tp_g, tp_b, res_r, res_g, res_b, alive_f, _) = final
    if not nee:
        surv = alive_f != 0
        res_r = jnp.where(surv, tp_r, res_r)
        res_g = jnp.where(surv, tp_g, res_g)
        res_b = jnp.where(surv, tp_b, res_b)

    res = (res_r, res_g, res_b)
    for info in reversed(infos):
        res = _unpack_stage(res, info, nee=nee)
    return res


def _pair_test(pair_ref, t, ox, oy, oz, dx, dy, dz, state, cfg):
    """One merged-pair test; ``state`` is the accumulator tuple of
    (best_t, hit_i, bnx, bny, bnz, bar, bag, bab)."""
    t_max = jnp.float32(cfg.t_max)
    best_t, hit_i, bnx, bny, bnz, bar, bag, bab = state
    nx, ny, nz, d0 = pair_ref[t, 0], pair_ref[t, 1], pair_ref[t, 2], pair_ref[t, 3]
    nd = dx * nx + dy * ny + dz * nz
    no = ox * nx + oy * ny + oz * nz
    t_hit = (d0 - no) / nd  # nan/inf self-rejects below

    def inside(base):
        n1x, n1y, n1z, d1 = (
            pair_ref[t, base], pair_ref[t, base + 1],
            pair_ref[t, base + 2], pair_ref[t, base + 3],
        )
        n2x, n2y, n2z, d2 = (
            pair_ref[t, base + 4], pair_ref[t, base + 5],
            pair_ref[t, base + 6], pair_ref[t, base + 7],
        )
        u = (n1x * ox + n1y * oy + n1z * oz) + t_hit * (
            n1x * dx + n1y * dy + n1z * dz
        ) + d1
        v = (n2x * ox + n2y * oy + n2z * oz) + t_hit * (
            n2x * dx + n2y * dy + n2z * dz
        ) + d2
        return (jnp.minimum(u, v) >= 0.0) & (u + v <= 1.0)

    # t_max always enforced (see _nearest_hit_unrolled).
    valid = (inside(4) | inside(12)) & (t_hit > 0.0) & (t_hit <= t_max)
    closer = valid & (t_hit < best_t)
    best_t = jnp.where(closer, t_hit, best_t)
    hit_i = hit_i | closer.astype(jnp.int32)
    bnx = jnp.where(closer, pair_ref[t, 23], bnx)
    bny = jnp.where(closer, pair_ref[t, 24], bny)
    bnz = jnp.where(closer, pair_ref[t, 25], bnz)
    bar = jnp.where(closer, pair_ref[t, 20], bar)
    bag = jnp.where(closer, pair_ref[t, 21], bag)
    bab = jnp.where(closer, pair_ref[t, 22], bab)
    return best_t, hit_i, bnx, bny, bnz, bar, bag, bab


# Distance bins for the ordered streamed traversal: visited clusters are
# counting-sorted by their whole-tile entry distance so near geometry is
# tested first and far clusters can skip their pair loops once every live
# lane's committed hit is closer (the TPU stand-in for front-to-back BVH
# traversal order, raytrace.comp.glsl:216's tMax pruning).
NBINS = 64

# Sub-blocks per streamed cluster: each cluster's HBM block carries an
# nsub-row header (sub-AABB sb in row sb, cols 0:6) ahead of its csize
# table rows; the row phase tests csize/nsub-row sub-blocks against the
# per-lane best, compacts the passing ids, and runs only those rows.
# Measured ladder at 32k tris (v5e, oct_cell, cond-free compacted walk):
# nsub 8 = 2116 ms, 16 = 1973, 32 = 1834, 64 = 1729 -- per-ROW headers
# win because a header is ~6 scalar reads + 15 vec-ops while a table row
# is ~26 scalar reads + ~50 vec-ops with 7 predicated updates. (With the
# old per-sub-block lax.cond gate the ladder INVERTED: 16 cost 2523 vs
# 2334 at 8 -- each in-loop cond costs ~135 ns, the compaction is what
# makes fine granularity affordable.)
NSUB = 64


def nsub_for(csize: int) -> int:
    """Sub-blocks for a cluster of ``csize`` rows: per-row headers up to
    NSUB. csize is a power of two >= 8, so the DMA block (csize + nsub
    rows) stays a multiple of 8 (Mosaic row-slice alignment)."""
    return min(NSUB, csize)


# Rows of the transposed (lane-parallel) header block: component r of
# sub-block sb lives at [r, sb], r in 0..5 = lox loy loz hix hiy hiz.
# 8 rows keep every DMA slice 8-aligned (Mosaic row-slice rule).
HDR_ROWS = 8


def assemble_stream_table(
    table_cols, sub_aabbs, num_clusters, csize, hdr_lanes=False
):
    """Interleave the sub-AABB header block before each cluster's rows.

    ``table_cols``: (num_clusters*csize, COLS) column-padded table.
    ``sub_aabbs``: (num_clusters*nsub_for(csize), 6) from build_hierarchy /
    pack_geometry_clusters, or None for conservative always-test headers
    (a [-3e37, 3e37] universe box per sub-block = pre-header behavior).

    ``hdr_lanes=False`` (row-major): the header is nsub rows, sub-block sb's
    box in row sb cols 0:6, read scalarly by the per-sub-block whole-tile
    slab test. Returns (num_clusters*(csize+nsub), COLS).

    ``hdr_lanes=True`` (lane-parallel): the header is HDR_ROWS rows with
    component r of sub-block sb at [r, sb] -- all nsub boxes load as six
    (1, COLS) vector rows so ONE interval slab test covers every sub-block
    (see _ordered_stream_loop). Requires COLS >= nsub. Returns
    (num_clusters*(HDR_ROWS+csize), COLS)."""
    cols = int(table_cols.shape[1])
    nsub = nsub_for(csize)
    if sub_aabbs is None:
        hdr6 = jnp.tile(
            jnp.array([[-3e37] * 3 + [3e37] * 3], jnp.float32),
            (num_clusters * nsub, 1),
        )
    else:
        hdr6 = jnp.asarray(sub_aabbs, jnp.float32)
    if hdr_lanes:
        assert cols >= nsub, "lane-parallel headers need COLS >= nsub"
        hdr_t = jnp.transpose(
            hdr6.reshape(num_clusters, nsub, 6), (0, 2, 1)
        )  # (C, 6, nsub)
        hdr = jnp.zeros((num_clusters, HDR_ROWS, cols), jnp.float32)
        hdr = hdr.at[:, :6, :nsub].set(hdr_t)
        return jnp.concatenate(
            [hdr, table_cols.reshape(num_clusters, csize, cols)], axis=1
        ).reshape(num_clusters * (HDR_ROWS + csize), cols)
    hdr = jnp.concatenate(
        [hdr6, jnp.zeros((num_clusters * nsub, cols - 6), jnp.float32)],
        axis=1,
    )
    return jnp.concatenate(
        [
            hdr.reshape(num_clusters, nsub, cols),
            table_cols.reshape(num_clusters, csize, cols),
        ],
        axis=1,
    ).reshape(num_clusters * (csize + nsub), cols)


def _slab_test(aabb_ref, c, ox, oy, oz, inv_dx, inv_dy, inv_dz):
    """Whole-tile ray/AABB slab test -> (tmin, overlap mask).

    ``aabb_ref`` is the FLAT (C*6,) SMEM box table: a 2D (C, 6) SMEM array
    would be lane-padded to (C, 128) and blow the ~1 MB SMEM budget 21x
    over at Sponza-scale cluster counts (observed compile failure)."""
    lox, loy, loz = aabb_ref[c * 6 + 0], aabb_ref[c * 6 + 1], aabb_ref[c * 6 + 2]
    hix, hiy, hiz = aabb_ref[c * 6 + 3], aabb_ref[c * 6 + 4], aabb_ref[c * 6 + 5]
    tx0 = (lox - ox) * inv_dx
    tx1 = (hix - ox) * inv_dx
    ty0 = (loy - oy) * inv_dy
    ty1 = (hiy - oy) * inv_dy
    tz0 = (loz - oz) * inv_dz
    tz1 = (hiz - oz) * inv_dz
    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
        jnp.minimum(tz0, tz1),
    )
    tmax = jnp.minimum(
        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
        jnp.maximum(tz0, tz1),
    )
    return tmin, tmax >= jnp.maximum(tmin, 0.0)


def _lane_mask_words16(mask, n):
    """Pack an (1, L) bool lane mask into ceil(n/16) int32 scalars, 16
    lanes per word (lane sb -> bit sb & 15 of word sb >> 4).

    Mosaic-safe by construction: no vector shifts by vector amounts, no
    dynamic-lane reads -- powers of two are assembled exactly as float32
    exponent bits ((k+127)<<23 bitcast to f32 = 2^k; jnp.exp2 is an
    APPROXIMATION on some backends: exp2(15) -> 32767.998 -> 32767) and
    each word is one masked whole-vector sum reduce."""
    lane = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 1)
    p2 = jax.lax.bitcast_convert_type(
        ((lane & 15) + 127) << 23, jnp.float32
    ).astype(jnp.int32)
    return [
        jnp.sum(jnp.where(mask & ((lane >> 4) == w), p2, 0))
        for w in range((n + 15) // 16)
    ]


def _ordered_stream_loop(
    table_ref, caabb_ref, saabb_ref,
    num_clusters, csize, num_supers, ssize,
    ox, oy, oz, dx, dy, dz, alive, inv_diam,
    row_fn, init_state,
    bins_ref, ids_ref, cnt_ref, buf0, buf1, sem0, sem1,
    counters=None, hdr=None, probe=None,
):
    """Streamed nearest-hit traversal in approximate front-to-back order.

    Three phase KINDS (visit / sort / walk), composed once per (tile,
    call) when the scene has no supercluster level:
      A. slab-test every cluster, appending visited ones to a compact
         list (bins_ref) as packed (distance_bin << 16) | cluster entries
         -- O(visited) everywhere after this, never O(num_clusters);
      B. counting-sort the visited list into ids_ref (cnt_ref holds the
         bin offsets) -- near bins first;
      C. walk the sorted list with two HBM->SMEM DMA buffers in flight
         (prefetch distance 2): each entry is slab-tested against the
         *current* per-lane best at ISSUE time (prefetch distance 2 ahead
         of its wait slot) and its DMA + row phase skipped outright when
         no live lane can improve inside it or its bin lower bound exceeds
         every live lane's committed hit -- both conditions are monotone
         in the evolving best, so the skip is bit-identical
         (prune-at-issue; the verdict rides in bins_ref, dead storage
         after B's scatter). Within a run cluster the passing sub-block
         ids are compacted into cnt_ref (free after B) and their rows run
         in one dynamic-trip loop, cond-free.

    With a supercluster level the composition is SUPER-MAJOR, the TPU
    stand-in for per-ray BVH descent order (raytrace.comp.glsl:208-222):
      A1/B1: slab-test only the num_supers super boxes, sort the passing
         ones by entry-distance bin into ids_ref's tail;
      C1: a scalar while_loop walks supers near-first and EXITS once the
         current super's bin lower bound exceeds every live lane's
         committed best (entries are bin-sorted, so the bound is monotone
         along the walk -- nothing beyond it can improve any lane). Each
         run super's ssize clusters are then visit/sort/walk'd (A2/B2/C2,
         exactly the flat phases) against the EVOLVING best. Clusters of
         far supers are never slab-tested at all: at Sponza scale the
         round-2 flat phase A tested every cluster per tile-segment
         (~480 visited, ~16 run, docs/DESIGN_ROUND3.md) while tiles
         typically commit all their hits inside their first super or two.

    ``table_ref`` must be laid out by :func:`assemble_stream_table`: each
    cluster's block is a sub-AABB header followed by its csize table rows.
    With ``hdr=None`` the header is row-major (nsub rows; DMA buffers are
    SMEM (csize+nsub, COLS)) and each sub-block gets its own whole-tile
    slab test -- nsub sequential tests of ~18 vector ops x tile vregs each,
    the measured hot phase at Sponza scale (docs/DESIGN_ROUND3.md
    section 1). With ``hdr=(hbuf0, hbuf1, hsem0, hsem1)`` (two VMEM
    (HDR_ROWS, COLS) scratch buffers + DMA semaphores) the table must be
    assembled with ``hdr_lanes=True``: each cluster's boxes stream as six
    component ROWS (sub-blocks in lanes) and ONE conservative
    interval-arithmetic slab test of the tile's ray bundle (origin box x
    inv-direction interval, reduced once per call) covers all nsub
    sub-blocks in ~80 single-vreg ops. The interval test bounds every live
    lane's per-axis entry/exit, so any sub-block that any exact per-lane
    test would run also passes the bundle test -- it can only run MORE
    rows, and row tests never change a committed hit (strict < plus
    validity in _pair_test), keeping the output bit-identical.
    ``row_fn(buf_ref, r, state) -> state`` consumes one table row from the
    active SMEM buffer (``r`` includes the nsub header offset only in
    row-major mode); ``state[0]`` must be the per-lane best hit t.
    ``counters`` (optional (8,) int32 SMEM ref, pre-zeroed) collects
    traversal statistics without touching the computed state:
    [0] visited clusters, [1] super groups descended (their clusters
    slab-tested), [2] cluster row phases run, [3] sum of per-run
    live-lane counts, [4] sub-blocks run, [5] sum of per-sub-block
    live-lane counts, [6] visited clusters whose row phase was skipped
    (pruned at issue or at wait).
    Returns the final state. Ordering only changes which primitives are
    *tested*, never the committed nearest hit (strict < keeps the first
    packed row on exact ties within a cluster; cross-cluster exact-t ties
    between non-coplanar primitives are measure-zero).

    ``probe``: optional (scale, which) DOUBLING probe for time breakdown
    (benchmarks/wavefront_breakdown.py). ``scale`` is a traced f32 that is
    1.0 AT RUNTIME but unknown at compile time; the phase named by
    ``which`` ('visits' | 'issue' | 'skeleton' | 'headers' | 'rows') runs
    a second time with its ray inputs multiplied by it -- structurally
    distinct expressions (never CSE'd), bit-identical values (x*1.0 is
    exact), results parked in dead SMEM slots (never DCE'd). The frame
    output is bit-identical and the extra wall time IS that phase's cost,
    which a per-op cost model cannot give (round 2's model mispredicted
    two A/Bs; see docs/DESIGN_ROUND3.md). Row-major headers only.

    Two round-4 sub-tile variants of this walk -- group_split (per-128-
    ray-packet interval headers + per-column-group row execution) and
    vmem_prune (resident-VMEM conservative header pre-gate) -- were
    MEASURED AND REJECTED on v5e (2-3x losses at both 32k and 248k tris,
    worsening with scale; docs/DESIGN_ROUND4.md) and deleted per the
    variant-pruning policy. Implementations in git history: commits
    ca82dad (group_split), 6260322 (vmem_prune).
    """
    assert num_clusters < (1 << 16), "packed visit entries hold 16-bit ids"
    tiny = jnp.float32(1e-12)
    inv_dx = 1.0 / jnp.where(jnp.abs(dx) < tiny, tiny, dx)
    inv_dy = 1.0 / jnp.where(jnp.abs(dy) < tiny, tiny, dy)
    inv_dz = 1.0 / jnp.where(jnp.abs(dz) < tiny, tiny, dz)
    nbins_f = jnp.float32(NBINS)
    bin_w = 1.0 / (inv_diam * nbins_f)  # bin lower-bound distance step

    p_scale, p_which = probe if probe is not None else (None, None)
    if p_which is not None:
        assert hdr is None, "doubling probes support row-major headers only"

    def dup_slab(aabb_ref, c, best):
        """One perturbed-but-identical slab test for the doubling probes;
        the caller must store the scalar result somewhere dead (else DCE)."""
        tmin, ok = _slab_test(
            aabb_ref, c, ox * p_scale, oy * p_scale, oz * p_scale,
            inv_dx, inv_dy, inv_dz,
        )
        return jnp.any(alive & ok & (tmin < best)).astype(jnp.int32)

    # --- visit phase: append one box's packed entry when it can still
    # matter. Append-only: every later phase is O(visited), never
    # O(num_clusters) (a dense bins array cost three O(C) scalar loops per
    # tile per call, ~2 s/frame at Sponza-scale C). Entries pack as
    # (bin << 16) | id into ONE SMEM slot per visit (C < 2^16 enforced by
    # hierarchy_sizes' csize floor of 8 and the HBM table size). ``best``
    # prunes at visit time: a lane whose committed hit is nearer than the
    # box entry can never improve inside it (row t >= box tmin; strict <
    # in the row update), so dropping the box is bit-identical. At init
    # ``best`` is the caller's cap (t_exit clamp / NEE sphere entry);
    # inside the super walk it is the evolving best.
    def visit_entry(aabb_ref, c, best, n):
        tmin, ok = _slab_test(aabb_ref, c, ox, oy, oz, inv_dx, inv_dy, inv_dz)
        near = alive & ok & (tmin < best)
        tmin_pos = jnp.min(
            jnp.where(near, jnp.maximum(tmin, 0.0), jnp.float32(3.4e38))
        )
        b = jnp.clip(
            (tmin_pos * inv_diam * nbins_f).astype(jnp.int32), 0, NBINS - 1
        )

        # tmin_pos < 1e30 also rejects DEGENERATE_BOX pad boxes for the
        # measure-zero ray aimed exactly at the pad point
        visited = jnp.any(near) & (tmin_pos < jnp.float32(1e30))

        @pl.when(visited)
        def _():
            bins_ref[n] = (b << 16) | c

        return n + visited.astype(jnp.int32)

    # --- sort phase: counting sort of bins_ref[0:total_v] by bin into
    # ids_ref[dst_base:] (near bins first; cnt_ref holds the offsets) ---
    def counting_sort(total_v, dst_base):
        def zero_cnt(b, acc):
            cnt_ref[b] = 0
            return acc

        jax.lax.fori_loop(0, NBINS, zero_cnt, 0)

        def count(k, acc):
            cnt_ref[bins_ref[k] >> 16] = cnt_ref[bins_ref[k] >> 16] + 1
            return acc

        jax.lax.fori_loop(0, total_v, count, 0)

        def prefix(b, tot):
            v = cnt_ref[b]
            cnt_ref[b] = tot
            return tot + v

        total = jax.lax.fori_loop(0, NBINS, prefix, 0)

        def scatter(k, acc):
            e = bins_ref[k]
            pos = cnt_ref[e >> 16]
            ids_ref[dst_base + pos] = e
            cnt_ref[e >> 16] = pos + 1
            return acc

        jax.lax.fori_loop(0, total_v, scatter, 0)
        return total

    # --- walk phase: pipelined DMA over sorted cluster entries ---
    nsub = nsub_for(csize)
    hdr_lanes = hdr is not None
    if hdr_lanes:
        hbuf0, hbuf1, hsem0, hsem1 = hdr
        block = HDR_ROWS + csize  # transposed header block + table rows
        # ray-bundle intervals, reduced ONCE per call: per axis the live
        # lanes' [origin min, origin max, inv-dir min, inv-dir max]. A
        # mixed-sign direction axis (tile straddling an octant boundary)
        # just widens the inv interval -- still conservative.
        pos_f = jnp.float32(3.4e38)
        neg_f = jnp.float32(-3.4e38)
        bundle = tuple(
            (
                jnp.min(jnp.where(alive, o, pos_f)),
                jnp.max(jnp.where(alive, o, neg_f)),
                jnp.min(jnp.where(alive, iv, pos_f)),
                jnp.max(jnp.where(alive, iv, neg_f)),
            )
            for o, iv in ((ox, inv_dx), (oy, inv_dy), (oz, inv_dz))
        )
    else:
        hbuf0 = hbuf1 = hsem0 = hsem1 = None
        block = csize + nsub  # nsub-row sub-AABB header + csize table rows
    k_rows = csize // nsub  # rows per sub-block
    cmask = jnp.int32(0xFFFF)

    def dma(k, buf, sem, hbuf, hsem):
        c = ids_ref[k] & cmask
        if hdr_lanes:
            base = c * block
            return (
                pltpu.make_async_copy(
                    table_ref.at[pl.ds(base, HDR_ROWS), :], hbuf, hsem
                ),
                pltpu.make_async_copy(
                    table_ref.at[pl.ds(base + HDR_ROWS, csize), :], buf, sem
                ),
            )
        return (
            pltpu.make_async_copy(
                table_ref.at[pl.ds(c * block, block), :], buf, sem
            ),
        )

    def issue(j, buf, sem, hbuf, hsem, state):
        """Prune-at-issue: decide entry ``j``'s fate BEFORE streaming it.

        A cluster whose bin lower bound already exceeds every live lane's
        committed best, or that no live lane can still hit nearer than its
        best, can never run its row phase (``best`` only decreases as hits
        commit, so both conditions are monotone: false now => false at
        wait time too). Skipping its DMA is therefore bit-identical -- and
        at Sponza scale it is most of them: ~480 clusters/tile visit per
        segment but only ~16 run (docs/DESIGN_ROUND3.md), so the round-2
        walk streamed ~30x more HBM bytes than the row phase consumed.
        The verdict lands in bins_ref[j] (dead storage after phase B's
        scatter) for the wait side to read."""
        e = ids_ref[j]
        c = e & cmask
        best = state[0]
        max_best = jnp.max(jnp.where(alive, best, jnp.float32(-3.4e38)))
        lb = (e >> 16).astype(jnp.float32) * bin_w
        tmin, ok = _slab_test(caabb_ref, c, ox, oy, oz, inv_dx, inv_dy, inv_dz)
        near = alive & ok & (tmin < best)
        start_it = jnp.any(near) & (lb <= max_best)
        if p_which == "issue":
            # doubling probe: dead store, overwritten by the verdict below
            bins_ref[j] = dup_slab(caabb_ref, c, best)
        bins_ref[j] = start_it.astype(jnp.int32)

        @pl.when(start_it)
        def _():
            for cp in dma(j, buf, sem, hbuf, hsem):
                cp.start()

    def slot(k, buf, sem, hbuf, hsem, state, total):
        started = bins_ref[k] != 0

        @pl.when(started)
        def _():
            for cp in dma(k, buf, sem, hbuf, hsem):
                cp.wait()

        e = ids_ref[k]
        c = e & cmask
        best = state[0]
        max_best = jnp.max(jnp.where(alive, best, jnp.float32(-3.4e38)))
        lb = (e >> 16).astype(jnp.float32) * bin_w
        tmin, ok = _slab_test(caabb_ref, c, ox, oy, oz, inv_dx, inv_dy, inv_dz)
        near = alive & ok & (tmin < best)
        if p_which == "skeleton":
            # doubling probe: ids_ref[k] is dead after the read above (its
            # two consumers, issue(k) and slot(k), have both read it)
            ids_ref[k] = dup_slab(caabb_ref, c, best)

        def run_hdr_lanes(s):
            # ONE interval slab test covers all nsub sub-blocks: boxes sit
            # in lanes (six component rows from the VMEM header), rays are
            # the per-call bundle. For every live lane r and sub-block sb:
            # tmin_lo[sb] <= tmin_r[sb] and tmax_hi[sb] >= tmax_r[sb], so
            # each exact per-lane pass implies a bundle pass (superset;
            # extra rows never change the committed hit). Pass ids compact
            # into cnt_ref via 16-bit mask words -- no dynamic-lane reads,
            # no per-sub-block conds.
            best0 = s[0]
            best_mx = jnp.max(jnp.where(alive, best0, neg_f))
            cols = hbuf.shape[1]
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, cols), 1)
            tmin_lo = jnp.full((1, cols), neg_f, jnp.float32)
            tmax_hi = jnp.full((1, cols), pos_f, jnp.float32)
            for ax in range(3):
                o_l, o_h, i_l, i_h = bundle[ax]
                lo_c = hbuf[ax:ax + 1, :]
                hi_c = hbuf[ax + 3:ax + 4, :]
                a_l = lo_c - o_h
                a_h = lo_c - o_l
                b_l = hi_c - o_h
                b_h = hi_c - o_l
                p1, p2 = a_l * i_l, a_l * i_h
                p3, p4 = a_h * i_l, a_h * i_h
                t0_l = jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4))
                t0_h = jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4))
                q1, q2 = b_l * i_l, b_l * i_h
                q3, q4 = b_h * i_l, b_h * i_h
                t1_l = jnp.minimum(jnp.minimum(q1, q2), jnp.minimum(q3, q4))
                t1_h = jnp.maximum(jnp.maximum(q1, q2), jnp.maximum(q3, q4))
                tmin_lo = jnp.maximum(tmin_lo, jnp.minimum(t0_l, t1_l))
                tmax_hi = jnp.minimum(tmax_hi, jnp.maximum(t0_h, t1_h))
            ok_m = (
                (lane < nsub)
                & (tmax_hi >= jnp.maximum(tmin_lo, 0.0))
                & (tmin_lo < best_mx)
            )
            words = _lane_mask_words16(ok_m, nsub)
            n_pass = jnp.int32(0)
            for sb in range(nsub):
                bit = (words[sb >> 4] >> (sb & 15)) & 1

                @pl.when(bit == 1)
                def _():
                    cnt_ref[n_pass] = sb

                n_pass = n_pass + bit
            if counters is not None:
                counters[4] = counters[4] + n_pass

            def sub_run(i, s2):
                sb_i = cnt_ref[i]

                def body(j, s3):
                    return row_fn(buf, sb_i * k_rows + j, s3)

                return jax.lax.fori_loop(0, k_rows, body, s2)

            return jax.lax.fori_loop(0, n_pass, sub_run, s)

        def run(s):
            # Header-test all nsub sub-blocks up front against the
            # cluster-ENTRY best, appending passing ids to cnt_ref (free
            # once phase B's scatter consumed it; NBINS >= nsub), then run
            # their rows in ONE dynamic-trip loop with no per-sub-block
            # lax.cond: the NSUB-16 A/B measured ~135 ns per in-loop gate,
            # more than the rows a finer gate saves. Sub-blocks an
            # evolving best would have pruned still satisfy
            # t >= tmin_sb >= best, so the strict < in _pair_test never
            # commits them -- output bit-identical, only spare rows.
            best0 = s[0]

            def exact_sb(sb):
                lox, loy, loz = buf[sb, 0], buf[sb, 1], buf[sb, 2]
                hix, hiy, hiz = buf[sb, 3], buf[sb, 4], buf[sb, 5]
                tx0 = (lox - ox) * inv_dx
                tx1 = (hix - ox) * inv_dx
                ty0 = (loy - oy) * inv_dy
                ty1 = (hiy - oy) * inv_dy
                tz0 = (loz - oz) * inv_dz
                tz1 = (hiz - oz) * inv_dz
                tmin_sb = jnp.maximum(
                    jnp.maximum(
                        jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)
                    ),
                    jnp.minimum(tz0, tz1),
                )
                tmax_sb = jnp.minimum(
                    jnp.minimum(
                        jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)
                    ),
                    jnp.maximum(tz0, tz1),
                )
                ok_sb = tmax_sb >= jnp.maximum(tmin_sb, 0.0)
                return alive & ok_sb & (tmin_sb < best0)

            n_pass = jnp.int32(0)
            for sb in range(nsub):
                near_sb = exact_sb(sb)
                run_sb = jnp.any(near_sb)
                if counters is not None:
                    # [7]: 128-lane vreg groups with >=1 needy lane, summed
                    # over run sub-blocks -- tot[7] / (tot[4] * ngroups) is
                    # the row-phase vector work a lane-group-granular row
                    # loop would keep (DESIGN_ROUND3 section 1, occupancy)
                    ngroups = near_sb.shape[1] // 128
                    gq = jnp.int32(0)
                    for q in range(ngroups):
                        gq = gq + jnp.any(
                            near_sb[:, q * 128:(q + 1) * 128]
                        ).astype(jnp.int32)

                    @pl.when(run_sb)
                    def _():
                        counters[4] = counters[4] + 1
                        counters[5] = counters[5] + jnp.sum(
                            near_sb.astype(jnp.int32)
                        )
                        counters[7] = counters[7] + gq

                @pl.when(run_sb)
                def _():
                    cnt_ref[n_pass] = sb

                n_pass = n_pass + run_sb.astype(jnp.int32)

            if p_which == "headers":
                # doubling probe: re-run every header slab test perturbed;
                # dead store (see the skeleton probe)
                n2 = jnp.int32(0)
                for sb in range(nsub):
                    lox2 = buf[sb, 0] * p_scale
                    loy2 = buf[sb, 1] * p_scale
                    loz2 = buf[sb, 2] * p_scale
                    hix2, hiy2, hiz2 = buf[sb, 3], buf[sb, 4], buf[sb, 5]
                    tx0 = (lox2 - ox) * inv_dx
                    tx1 = (hix2 - ox) * inv_dx
                    ty0 = (loy2 - oy) * inv_dy
                    ty1 = (hiy2 - oy) * inv_dy
                    tz0 = (loz2 - oz) * inv_dz
                    tz1 = (hiz2 - oz) * inv_dz
                    tmin_sb = jnp.maximum(
                        jnp.maximum(
                            jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)
                        ),
                        jnp.minimum(tz0, tz1),
                    )
                    tmax_sb = jnp.minimum(
                        jnp.minimum(
                            jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)
                        ),
                        jnp.maximum(tz0, tz1),
                    )
                    ok2 = tmax_sb >= jnp.maximum(tmin_sb, 0.0)
                    n2 = n2 + jnp.any(
                        alive & ok2 & (tmin_sb < best0)
                    ).astype(jnp.int32)
                ids_ref[k] = n2

            def sub_run(i, s2):
                sb_i = cnt_ref[i]

                def body(j, s3):
                    return row_fn(buf, nsub + sb_i * k_rows + j, s3)

                return jax.lax.fori_loop(0, k_rows, body, s2)

            if p_which == "rows":
                # doubling probe: run the row phase twice; the second pass
                # re-tests the same rows against the already-improved best
                # and can commit nothing (strict <) -- bit-identical state
                s = jax.lax.fori_loop(0, n_pass, sub_run, s)
            return jax.lax.fori_loop(0, n_pass, sub_run, s)

        # Freshness: ``best`` may have dropped since issue-time, so re-test
        # before paying the header walk (started clusters can still be
        # pruned here; the reverse -- run without started -- cannot happen,
        # see issue()'s monotonicity argument).
        run_c = started & jnp.any(near) & (lb <= max_best)
        if counters is not None:
            @pl.when(run_c)
            def _():
                counters[2] = counters[2] + 1
                counters[3] = counters[3] + jnp.sum(near.astype(jnp.int32))

            @pl.when(jnp.logical_not(run_c))
            def _():
                counters[6] = counters[6] + 1

        state = jax.lax.cond(
            run_c,
            run_hdr_lanes if hdr_lanes else run,
            lambda s: s,
            state,
        )

        @pl.when(k + 2 < total)
        def _():
            issue(k + 2, buf, sem, hbuf, hsem, state)

        return state

    def walk(total, init_s):
        @pl.when(total > 0)
        def _():
            issue(0, buf0, sem0, hbuf0, hsem0, init_s)

        @pl.when(total > 1)
        def _():
            issue(1, buf1, sem1, hbuf1, hsem1, init_s)

        def body2(kk, state):
            k0 = 2 * kk
            state = jax.lax.cond(
                k0 < total,
                lambda s: slot(k0, buf0, sem0, hbuf0, hsem0, s, total),
                lambda s: s,
                state,
            )
            state = jax.lax.cond(
                k0 + 1 < total,
                lambda s: slot(k0 + 1, buf1, sem1, hbuf1, hsem1, s, total),
                lambda s: s,
                state,
            )
            return state

        return jax.lax.fori_loop(0, (total + 1) // 2, body2, init_s)

    if not num_supers:
        # flat composition: visit every cluster once, sort, walk
        tot0 = jax.lax.fori_loop(
            0,
            num_clusters,
            lambda c, n: visit_entry(caabb_ref, c, init_state[0], n),
            0,
        )
        if p_which == "visits":
            # doubling probe; cnt_ref[0] is dead (zeroed by counting_sort)
            cnt_ref[0] = jax.lax.fori_loop(
                0,
                num_clusters,
                lambda c, n: n + dup_slab(caabb_ref, c, init_state[0]),
                0,
            )
        if counters is not None:
            counters[0] = counters[0] + tot0
        return walk(counting_sort(tot0, 0), init_state)

    # --- super-major composition (see docstring): walk supers near-first
    # with a best-driven early exit; only run supers get their clusters
    # slab-tested, against the best as it stands THEN ---
    tot_s0 = jax.lax.fori_loop(
        0,
        num_supers,
        lambda g, n: visit_entry(saabb_ref, g, init_state[0], n),
        0,
    )
    # sorted supers park in ids_ref's tail, clear of the per-super cluster
    # region [0, ssize): ssize <= S*(ssize-1) = sbase for S >= 2, and
    # hierarchy_sizes only builds a super level with S >= 2
    sbase = num_clusters - num_supers
    total_s = counting_sort(tot_s0, sbase)

    def s_cond(carry):
        si, best = carry[0], carry[1]
        # in-bounds read even at si == total_s (value unused: the < term
        # is False); sorted bins make lb monotone along the walk, so the
        # first too-far super proves every later one can't improve any
        # live lane (lb <= tmin <= any row t inside; strict < commits)
        e = ids_ref[jnp.minimum(sbase + si, num_clusters - 1)]
        lb = (e >> 16).astype(jnp.float32) * bin_w
        max_best = jnp.max(jnp.where(alive, best, jnp.float32(-3.4e38)))
        return (si < total_s) & (lb <= max_best)

    def s_body(carry):
        si = carry[0]
        state = tuple(carry[1:])
        g = ids_ref[sbase + si] & cmask
        tmin_s, ok_s = _slab_test(
            saabb_ref, g, ox, oy, oz, inv_dx, inv_dy, inv_dz
        )
        near_s = alive & ok_s & (tmin_s < state[0])

        def descend(state):
            if counters is not None:
                counters[1] = counters[1] + 1
            best0 = state[0]

            def test_c(cj, n):
                return visit_entry(caabb_ref, g * ssize + cj, best0, n)

            tc0 = jax.lax.fori_loop(0, ssize, test_c, 0)
            if p_which == "visits":
                cnt_ref[0] = jax.lax.fori_loop(
                    0,
                    ssize,
                    lambda cj, n: n + dup_slab(
                        caabb_ref, g * ssize + cj, best0
                    ),
                    0,
                )
            if counters is not None:
                counters[0] = counters[0] + tc0
            return walk(counting_sort(tc0, 0), state)

        state = jax.lax.cond(jnp.any(near_s), descend, lambda s: s, state)
        return (si + jnp.int32(1),) + tuple(state)

    out = jax.lax.while_loop(
        s_cond, s_body, (jnp.int32(0),) + tuple(init_state)
    )
    return tuple(out[1:])


def _nearest_hit_clustered(
    pair_ref, caabb_ref, saabb_ref, num_clusters, csize, num_supers, ssize,
    ox, oy, oz, dx, dy, dz, alive, cfg, init_best=None,
):
    """Closest-hit over a 2-level Morton hierarchy of merged pairs with the
    table resident on-chip (tables beyond the SMEM budget use
    :func:`_ordered_stream_loop` instead).

    Per supercluster and per cluster, a whole-tile slab test against the
    AABB skips the subtree entirely when no live lane's ray can improve on
    its current best hit (in-kernel lax.cond). Composes with lane
    compaction (narrow tiles carry fewer rays -> more skips). With
    ``num_supers`` == 0 the outer level is absent.
    """
    t_max = jnp.float32(cfg.t_max)
    big = t_max * jnp.float32(2.0)
    tiny = jnp.float32(1e-12)
    inv_dx = 1.0 / jnp.where(jnp.abs(dx) < tiny, tiny, dx)
    inv_dy = 1.0 / jnp.where(jnp.abs(dy) < tiny, tiny, dy)
    inv_dz = 1.0 / jnp.where(jnp.abs(dz) < tiny, tiny, dz)

    def box_near(aabb_ref, c, best_t):
        tmin, ok = _slab_test(aabb_ref, c, ox, oy, oz, inv_dx, inv_dy, inv_dz)
        return alive & ok & (tmin < best_t)

    def cluster_body(c, s):
        near = box_near(caabb_ref, c, s[0])

        def run(s):
            def pair_body(j, s2):
                return _pair_test(
                    pair_ref, c * csize + j,
                    ox, oy, oz, dx, dy, dz, s2, cfg,
                )

            return jax.lax.fori_loop(0, csize, pair_body, s)

        return jax.lax.cond(jnp.any(near), run, lambda s2: s2, s)

    zero = jnp.zeros_like(ox)
    init = (
        # init_best: cap the search (e.g. a shadow ray's sphere-entry
        # distance) -- subtrees entirely beyond it are skipped and a commit
        # means "occluded", never a wrong nearest (strict < in _pair_test).
        jnp.full_like(ox, big) if init_best is None else init_best,
        jnp.zeros_like(ox, dtype=jnp.int32),
        zero, zero, zero, zero, zero, zero,
    )

    if num_supers:
        def super_body(g, s):
            near = box_near(saabb_ref, g, s[0])

            def run(s):
                def inner(cj, s2):
                    return cluster_body(g * ssize + cj, s2)

                return jax.lax.fori_loop(0, ssize, inner, s)

            return jax.lax.cond(jnp.any(near), run, lambda s2: s2, s)

        out = jax.lax.fori_loop(0, num_supers, super_body, init)
    else:
        out = jax.lax.fori_loop(0, num_clusters, cluster_body, init)
    best_t, hit_i, bnx, bny, bnz, bar, bag, bab = out
    return best_t, hit_i != 0, (bnx, bny, bnz), (bar, bag, bab)


def _shade_segment(
    seg, ox, oy, oz, dx, dy, dz, tp_r, tp_g, tp_b,
    res_r, res_g, res_b, alive, st,
    best_t, hit, bnx, bny, bnz, bar, bag, bab,
    lx, ly, lz, hdr_r, hdr_g, hdr_b, radius,
    inv_first_dim, eps_off, cfg,
):
    """One bounce segment's shading given the committed nearest hit: sphere
    light (raytrace.comp.glsl:226-235), triangle bounce with cosine
    hemisphere sampling (:238-266), sky fallback (:268-276). Shared
    op-for-op by the megakernel's in-kernel bounce loop and the wavefront
    tracer's per-segment kernel (bit-identical streams).

    Returns (ox, oy, oz, dx, dy, dz, tp_r, tp_g, tp_b,
    res_r, res_g, res_b, tri_hit mask, st)."""
    # --- sphere light, checked first (raytrace:226-235) ---
    ocx, ocy, ocz = ox - lx, oy - ly, oz - lz
    a = dx * dx + dy * dy + dz * dz
    b = jnp.float32(2.0) * (ocx * dx + ocy * dy + ocz * dz)
    cc = ocx * ocx + ocy * ocy + ocz * ocz - radius * radius
    disc = b * b - jnp.float32(4.0) * a * cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b - sq) / (jnp.float32(2.0) * a)
    t2 = (-b + sq) / (jnp.float32(2.0) * a)
    lt = jnp.where(t1 > 0.0, t1, t2)
    light_hit = (disc >= 0.0) & (lt > 0.0)
    if not cfg.light_through_walls or cfg.nee:
        # NEE always uses the occlusion-aware geometry: its shadow rays
        # respect walls, so its termination must too (ops/pathtrace.py).
        light_hit = light_hit & (~hit | (lt < best_t))

    dim = jnp.where(seg == 0, inv_first_dim, jnp.float32(1.0))
    light_term = alive & light_hit
    if cfg.nee:
        # the sphere still blocks-and-terminates, but only the camera
        # segment adds emission (deeper crossings were banked by the
        # previous vertex's NEE shadow ray)
        emit = light_term & (seg == 0)
    else:
        emit = light_term
    res_r = jnp.where(emit, tp_r * hdr_r * dim, res_r)
    res_g = jnp.where(emit, tp_g * hdr_g * dim, res_g)
    res_b = jnp.where(emit, tp_b * hdr_b * dim, res_b)

    # --- triangle bounce ---
    tri_hit = alive & ~light_hit & hit
    tp_r = jnp.where(tri_hit, tp_r * bar, tp_r)
    tp_g = jnp.where(tri_hit, tp_g * bag, tp_g)
    tp_b = jnp.where(tri_hit, tp_b * bab, tp_b)
    # faceforward: flip unless facing against the ray
    flip = (dx * bnx + dy * bny + dz * bnz) >= 0.0
    fnx = jnp.where(flip, -bnx, bnx)
    fny = jnp.where(flip, -bny, bny)
    fnz = jnp.where(flip, -bnz, bnz)
    hx = ox + best_t * dx + eps_off * fnx
    hy = oy + best_t * dy + eps_off * fny
    hz = oz + best_t * dz + eps_off * fnz

    new_st, ra = _pcg(st)
    new_st, rb = _pcg(new_st)
    theta = _TWO_PI * ra
    uu = jnp.float32(2.0) * rb - jnp.float32(1.0)
    rr = jnp.sqrt(jnp.maximum(jnp.float32(0.0), 1.0 - uu * uu))
    ndx = fnx + rr * jnp.cos(theta)
    ndy = fny + rr * jnp.sin(theta)
    ndz = fnz + uu
    inv = jax.lax.rsqrt(ndx * ndx + ndy * ndy + ndz * ndz)
    ndx, ndy, ndz = ndx * inv, ndy * inv, ndz * inv

    ox = jnp.where(tri_hit, hx, ox)
    oy = jnp.where(tri_hit, hy, oy)
    oz = jnp.where(tri_hit, hz, oz)
    # sky uses the PRE-bounce direction for terminated lanes
    sky_term = alive & ~light_hit & ~hit
    skr, skg, skb = _sky(dx, dy, dz)
    if cfg.nee:
        # res accumulates NEE banks on OTHER (tri_hit) lanes; sky lanes are
        # disjoint, so add-form is bit-identical to the replace-form here
        # and keeps one code shape with the XLA oracle.
        res_r = res_r + jnp.where(sky_term, tp_r * skr, jnp.float32(0.0))
        res_g = res_g + jnp.where(sky_term, tp_g * skg, jnp.float32(0.0))
        res_b = res_b + jnp.where(sky_term, tp_b * skb, jnp.float32(0.0))
    else:
        res_r = jnp.where(sky_term, tp_r * skr, res_r)
        res_g = jnp.where(sky_term, tp_g * skg, res_g)
        res_b = jnp.where(sky_term, tp_b * skb, res_b)
    dx = jnp.where(tri_hit, ndx, dx)
    dy = jnp.where(tri_hit, ndy, dy)
    dz = jnp.where(tri_hit, ndz, dz)
    st = jnp.where(tri_hit, new_st, st)

    nee_extras = None
    if cfg.nee:
        # --- next-event estimation sample (mirrors ops/pathtrace.py
        # op-for-op; the caller runs the shadow traversal and banks
        # tp * hdr * gain where the ray reaches the light) ---
        tlx, tly, tlz = lx - hx, ly - hy, lz - hz
        dist = jnp.sqrt(tlx * tlx + tly * tly + tlz * tlz)
        inv_dist = jnp.float32(1.0) / jnp.maximum(dist, jnp.float32(1e-20))
        wcx, wcy, wcz = tlx * inv_dist, tly * inv_dist, tlz * inv_dist
        sin_max = jnp.clip(
            radius * inv_dist, jnp.float32(0.0), jnp.float32(1.0)
        )
        cos_max = jnp.sqrt(
            jnp.maximum(jnp.float32(0.0), 1.0 - sin_max * sin_max)
        )
        nst, u1 = _pcg(st)
        nst, u2 = _pcg(nst)
        st = jnp.where(tri_hit, nst, st)
        cos_t = jnp.float32(1.0) - u1 * (jnp.float32(1.0) - cos_max)
        sin_t = jnp.sqrt(jnp.maximum(jnp.float32(0.0), 1.0 - cos_t * cos_t))
        phi = _TWO_PI * u2
        # branchless basis: a = (0,1,0) when |wc.x| > 0.9 else (1,0,0);
        # tang = normalize(cross(a, wc)), bitang = cross(wc, tang)
        pick = jnp.abs(wcx) > jnp.float32(0.9)
        tx = jnp.where(pick, wcz, jnp.float32(0.0))
        ty = jnp.where(pick, jnp.float32(0.0), -wcz)
        tz = jnp.where(pick, -wcx, wcy)
        tnorm = jnp.maximum(
            jnp.sqrt(tx * tx + ty * ty + tz * tz), jnp.float32(1e-20)
        )
        tx, ty, tz = tx / tnorm, ty / tnorm, tz / tnorm
        bx = wcy * tz - wcz * ty
        by = wcz * tx - wcx * tz
        bz = wcx * ty - wcy * tx
        spc = sin_t * jnp.cos(phi)
        sps = sin_t * jnp.sin(phi)
        wlx = cos_t * wcx + spc * tx + sps * bx
        wly = cos_t * wcy + spc * ty + sps * by
        wlz = cos_t * wcz + spc * tz + sps * bz
        cos_x = fnx * wlx + fny * wly + fnz * wlz
        socx, socy, socz = hx - lx, hy - ly, hz - lz
        a_s = wlx * wlx + wly * wly + wlz * wlz
        sb = jnp.float32(2.0) * (socx * wlx + socy * wly + socz * wlz)
        scc = socx * socx + socy * socy + socz * socz - radius * radius
        sdisc = sb * sb - jnp.float32(4.0) * a_s * scc
        ssq = jnp.sqrt(jnp.maximum(sdisc, 0.0))
        st1 = (-sb - ssq) / (jnp.float32(2.0) * a_s)
        st2 = (-sb + ssq) / (jnp.float32(2.0) * a_s)
        s_t = jnp.where(st1 > 0.0, st1, st2)
        s_hit = (sdisc >= 0.0) & (s_t > 0.0)
        nee_mask = tri_hit & (cos_x > 0.0) & s_hit
        omega = _TWO_PI * (jnp.float32(1.0) - cos_max)
        gain = cos_x * omega * jnp.float32(1.0 / 3.14159265)
        # bank amounts use THIS tp (pre-RR-boost, matching the XLA order:
        # NEE before RR); the caller adds them where the shadow ray clears
        nee_extras = (
            wlx, wly, wlz, s_t,
            tp_r * hdr_r * gain, tp_g * hdr_g * gain, tp_b * hdr_b * gain,
            nee_mask,
        )

    if cfg.rr_start_bounce:
        # --- Russian roulette (non-parity; mirrors ops/pathtrace.py
        # op-for-op so XLA/Pallas parity holds with RR enabled) ---
        gamble = tri_hit & (seg >= cfg.rr_start_bounce)
        rr_st, u = _pcg(st)
        maxc = jnp.maximum(tp_r, jnp.maximum(tp_g, tp_b))
        p = jnp.clip(
            maxc, jnp.float32(cfg.rr_min_prob), jnp.float32(cfg.rr_max_prob)
        )
        st = jnp.where(gamble, rr_st, st)
        survive = jnp.logical_not(gamble) | (u < p)
        boost = gamble & survive
        tp_r = jnp.where(boost, tp_r / p, tp_r)
        tp_g = jnp.where(boost, tp_g / p, tp_g)
        tp_b = jnp.where(boost, tp_b / p, tp_b)
        tri_hit = tri_hit & survive

    out = (ox, oy, oz, dx, dy, dz, tp_r, tp_g, tp_b,
           res_r, res_g, res_b, tri_hit, st)
    if cfg.nee:
        return out + (nee_extras,)
    return out


def _sky(dx, dy, dz):
    up_r = (1.0 - dy) * 1.0 + dy * 0.25
    up_g = (1.0 - dy) * 1.0 + dy * 0.5
    up_b = (1.0 - dy) * 1.0 + dy * 1.0
    above = dy > 0.0
    dim = jnp.float32(0.03)
    return (
        jnp.where(above, up_r, dim),
        jnp.where(above, up_g, dim),
        jnp.where(above, up_b, dim),
    )


def _trace_kernel(fparams_ref, iparams_ref, uparams_ref, tri_ref, caabb_ref, saabb_ref, out_r, out_g, out_b, *rest, cfg, num_tris, pairs, num_clusters, csize, num_supers, ssize):
    # streaming mode appends (bins, ids, cnt, buf0, buf1, sem0, sem1)
    # scratch args for the ordered streamed traversal
    if rest:
        bins_ref, ids_ref, cnt_ref, buf0, buf1, sem0, sem1 = rest
    else:
        bins_ref = None
    cam_x, cam_y, cam_z = fparams_ref[0], fparams_ref[1], fparams_ref[2]
    lx, ly, lz = fparams_ref[3], fparams_ref[4], fparams_ref[5]
    hdr_r, hdr_g, hdr_b = fparams_ref[6], fparams_ref[7], fparams_ref[8]
    radius = fparams_ref[9]
    row_offset = iparams_ref[0]
    # frame * 374761393 (uint32, precomputed host-side: Mosaic cannot
    # bitcast scalars in SMEM)
    frame_term = uparams_ref[0]

    i = pl.program_id(0)
    j = pl.program_id(1)
    py = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
        + i * TILE_H
        + row_offset
    )
    px = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1) + j * TILE_W

    slope = jnp.float32(math.tan(cfg.fov))
    wf = jnp.float32(cfg.width)
    hf = jnp.float32(cfg.height)
    inv_h = jnp.float32(1.0) / hf
    eps_off = jnp.float32(cfg.ray_offset_eps)
    inv_first_dim = jnp.float32(1.0 / cfg.first_hit_light_dim)

    acc_r = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    acc_g = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    acc_b = jnp.zeros((TILE_H, TILE_W), jnp.float32)

    for batch in range(cfg.sample_batches):
        seed = (
            pltpu.bitcast(px, jnp.uint32) * _U(3266489917)
            + pltpu.bitcast(py, jnp.uint32) * _U(668265263)
        ) ^ frame_term ^ (_U(batch) * _U(2654435761))
        state = seed
        for _sample in range(cfg.spp):
            # --- AA jitter (raytrace.comp.glsl:84-92, 314) ---
            state, u1 = _pcg(state)
            state, u2 = _pcg(state)
            u1 = jnp.maximum(jnp.float32(1e-38), u1)
            r_g = jnp.sqrt(jnp.float32(-2.0) * jnp.log(u1))
            theta_g = _TWO_PI * u2
            jx = jnp.float32(cfg.aa_sigma) * r_g * jnp.cos(theta_g)
            jy = jnp.float32(cfg.aa_sigma) * r_g * jnp.sin(theta_g)

            fx = px.astype(jnp.float32) + jnp.float32(0.5) + jx
            fy = py.astype(jnp.float32) + jnp.float32(0.5) + jy
            su = (jnp.float32(2.0) * fx - wf) * inv_h
            sv = -(jnp.float32(2.0) * fy - hf) * inv_h
            cx_ = slope * su
            cy_ = slope * sv
            # camera->world rotation (identity in reference-parity mode)
            r = [fparams_ref[10 + m] for m in range(9)]
            ddx = r[0] * cx_ + r[1] * cy_ - r[2]
            ddy = r[3] * cx_ + r[4] * cy_ - r[5]
            ddz = r[6] * cx_ + r[7] * cy_ - r[8]
            inv_n = jax.lax.rsqrt(ddx * ddx + ddy * ddy + ddz * ddz)
            ddx, ddy, ddz = ddx * inv_n, ddy * inv_n, ddz * inv_n

            ox = jnp.full_like(ddx, cam_x)
            oy = jnp.full_like(ddx, cam_y)
            oz = jnp.full_like(ddx, cam_z)
            tp_r = jnp.ones_like(ddx)  # throughput (accumulatedRayColor)
            tp_g = jnp.ones_like(ddx)
            tp_b = jnp.ones_like(ddx)
            res_r = jnp.zeros_like(ddx)
            res_g = jnp.zeros_like(ddx)
            res_b = jnp.zeros_like(ddx)
            # Mosaic cannot carry i1 vectors through scf.while: keep the
            # alive mask as int32 in the carry and rebool inside the body.
            alive_i = jnp.ones_like(ddx, dtype=jnp.int32)

            def cond(c):
                seg = c[0]
                alive_c = c[13]
                return (seg < cfg.max_bounces) & (jnp.max(alive_c) > 0)

            def body(c):
                (seg, ox, oy, oz, dx, dy, dz,
                 tp_r, tp_g, tp_b, res_r, res_g, res_b, alive_c, st) = c
                alive = alive_c != 0

                if num_clusters and bins_ref is not None:
                    big_s = jnp.float32(cfg.t_max) * jnp.float32(2.0)
                    zero_s = jnp.zeros_like(ox)
                    init_s = (
                        jnp.full_like(ox, big_s),
                        jnp.zeros_like(ox, dtype=jnp.int32),
                        zero_s, zero_s, zero_s, zero_s, zero_s, zero_s,
                    )

                    def row(buf, j, s2):
                        return _pair_test(
                            buf, j, ox, oy, oz, dx, dy, dz, s2, cfg
                        )

                    o_s = _ordered_stream_loop(
                        tri_ref, caabb_ref, saabb_ref,
                        num_clusters, csize, num_supers, ssize,
                        ox, oy, oz, dx, dy, dz, alive, fparams_ref[19],
                        row, init_s,
                        bins_ref, ids_ref, cnt_ref, buf0, buf1, sem0, sem1,
                    )
                    best_t, hit = o_s[0], o_s[1] != 0
                    bnx, bny, bnz = o_s[2], o_s[3], o_s[4]
                    bar, bag, bab = o_s[5], o_s[6], o_s[7]
                elif num_clusters:
                    best_t, hit, (bnx, bny, bnz), (bar, bag, bab) = (
                        _nearest_hit_clustered(
                            tri_ref, caabb_ref, saabb_ref,
                            num_clusters, csize, num_supers, ssize,
                            ox, oy, oz, dx, dy, dz, alive, cfg,
                        )
                    )
                elif pairs:
                    best_t, hit, (bnx, bny, bnz), (bar, bag, bab) = (
                        _nearest_hit_pairs(
                            tri_ref, num_tris, ox, oy, oz, dx, dy, dz, cfg
                        )
                    )
                else:
                    best_t, hit, (bnx, bny, bnz), (bar, bag, bab) = (
                        _nearest_hit_unrolled(
                            tri_ref, num_tris, ox, oy, oz, dx, dy, dz, cfg
                        )
                    )

                shaded = _shade_segment(
                    seg, ox, oy, oz, dx, dy, dz, tp_r, tp_g, tp_b,
                    res_r, res_g, res_b, alive, st,
                    best_t, hit, bnx, bny, bnz, bar, bag, bab,
                    lx, ly, lz, hdr_r, hdr_g, hdr_b, radius,
                    inv_first_dim, eps_off, cfg,
                )
                (ox, oy, oz, dx, dy, dz, tp_r, tp_g, tp_b,
                 res_r, res_g, res_b, tri_hit, st) = shaded[:14]

                if cfg.nee:
                    # shadow traversal for the NEE sample: any committed
                    # hit closer than the sphere entry occludes. ox/oy/oz
                    # are already the offset bounce origins on nee lanes.
                    wlx, wly, wlz, s_t, bk_r, bk_g, bk_b, nmask = shaded[14]
                    if num_clusters and bins_ref is not None:
                        zero_s = jnp.zeros_like(ox)
                        sinit = (
                            s_t, jnp.zeros_like(ox, dtype=jnp.int32),
                            zero_s, zero_s, zero_s, zero_s, zero_s, zero_s,
                        )

                        def srow(buf, j, s2):
                            return _pair_test(
                                buf, j, ox, oy, oz, wlx, wly, wlz, s2, cfg
                            )

                        s_o = _ordered_stream_loop(
                            tri_ref, caabb_ref, saabb_ref,
                            num_clusters, csize, num_supers, ssize,
                            ox, oy, oz, wlx, wly, wlz, nmask, fparams_ref[19],
                            srow, sinit,
                            bins_ref, ids_ref, cnt_ref, buf0, buf1, sem0, sem1,
                        )
                        occluded = s_o[1] != 0
                    elif num_clusters:
                        _, s_hit2, _, _ = _nearest_hit_clustered(
                            tri_ref, caabb_ref, saabb_ref,
                            num_clusters, csize, num_supers, ssize,
                            ox, oy, oz, wlx, wly, wlz, nmask, cfg,
                            init_best=s_t,
                        )
                        occluded = s_hit2
                    elif pairs:
                        s_best, s_hit2, _, _ = _nearest_hit_pairs(
                            tri_ref, num_tris, ox, oy, oz, wlx, wly, wlz, cfg
                        )
                        occluded = s_hit2 & (s_best <= s_t)
                    else:
                        s_best, s_hit2, _, _ = _nearest_hit_unrolled(
                            tri_ref, num_tris, ox, oy, oz, wlx, wly, wlz, cfg
                        )
                        occluded = s_hit2 & (s_best <= s_t)
                    lit = nmask & jnp.logical_not(occluded)
                    res_r = res_r + jnp.where(lit, bk_r, jnp.float32(0.0))
                    res_g = res_g + jnp.where(lit, bk_g, jnp.float32(0.0))
                    res_b = res_b + jnp.where(lit, bk_b, jnp.float32(0.0))

                return (seg + 1, ox, oy, oz, dx, dy, dz,
                        tp_r, tp_g, tp_b, res_r, res_g, res_b,
                        tri_hit.astype(jnp.int32), st)

            init = (jnp.int32(0), ox, oy, oz, ddx, ddy, ddz,
                    tp_r, tp_g, tp_b, res_r, res_g, res_b, alive_i, state)

            compact = (
                cfg.bounce_compaction
                and TILE_W >= 4 * _NARROW_W
                and cfg.max_bounces > 4
            )
            if not compact:
                final = jax.lax.while_loop(cond, body, init)
                (_, _, _, _, _, _, _,
                 tp_r, tp_g, tp_b, res_r, res_g, res_b, alive_i, _) = final
                if not cfg.nee:
                    # fall-through: surviving paths keep bare throughput
                    # (raytrace.comp.glsl:270); with NEE the result
                    # accumulates instead and the quirk is dropped.
                    survived = alive_i != 0
                    res_r = jnp.where(survived, tp_r, res_r)
                    res_g = jnp.where(survived, tp_g, res_g)
                    res_b = jnp.where(survived, tp_b, res_b)
            else:
                res_r, res_g, res_b = _run_with_compaction(
                    cond, body, init, nee=cfg.nee
                )
            acc_r = acc_r + res_r
            acc_g = acc_g + res_g
            acc_b = acc_b + res_b

    norm = jnp.float32(1.0 / (cfg.spp * cfg.sample_batches))
    out_r[:] = acc_r * norm
    out_g[:] = acc_g * norm
    out_b[:] = acc_b * norm


def _gbuffer_kernel(
    fparams_ref, iparams_ref, tri_ref,
    out_vis, out_depth, out_wx, out_wy, out_wz, *, cfg, num_tris,
):
    """Primary-ray visibility kernel: one center-ray intersection per pixel,
    emitting primID+1, raster-equivalent NDC depth (via the proj@view matrix
    in fparams[3:19]), and the hit world position as three planes."""
    cam_x, cam_y, cam_z = fparams_ref[0], fparams_ref[1], fparams_ref[2]
    row_offset = iparams_ref[0]

    i = pl.program_id(0)
    j = pl.program_id(1)
    py = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
        + i * TILE_H
        + row_offset
    )
    px = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1) + j * TILE_W

    slope = jnp.float32(math.tan(cfg.fov))
    wf = jnp.float32(cfg.width)
    hf = jnp.float32(cfg.height)
    inv_h = jnp.float32(1.0) / hf

    fx = px.astype(jnp.float32) + jnp.float32(0.5)
    fy = py.astype(jnp.float32) + jnp.float32(0.5)
    su = (jnp.float32(2.0) * fx - wf) * inv_h
    sv = -(jnp.float32(2.0) * fy - hf) * inv_h
    cx_ = slope * su
    cy_ = slope * sv
    r = [fparams_ref[11 + m] for m in range(9)]
    dx = r[0] * cx_ + r[1] * cy_ - r[2]
    dy = r[3] * cx_ + r[4] * cy_ - r[5]
    dz = r[6] * cx_ + r[7] * cy_ - r[8]
    inv_n = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
    dx, dy, dz = dx * inv_n, dy * inv_n, dz * inv_n
    ox = jnp.full_like(dx, cam_x)
    oy = jnp.full_like(dx, cam_y)
    oz = jnp.full_like(dx, cam_z)

    best_t, hit, _, _, vis = _nearest_hit_unrolled(
        tri_ref, num_tris, ox, oy, oz, dx, dy, dz, cfg, track_prim=True
    )
    wx = jnp.where(hit, ox + best_t * dx, 0.0)
    wy = jnp.where(hit, oy + best_t * dy, 0.0)
    wz = jnp.where(hit, oz + best_t * dz, 0.0)

    # clip.z / clip.w with mat = proj @ view (rows 2 and 3 packed at 3:11)
    m20, m21, m22, m23 = fparams_ref[3], fparams_ref[4], fparams_ref[5], fparams_ref[6]
    m30, m31, m32, m33 = fparams_ref[7], fparams_ref[8], fparams_ref[9], fparams_ref[10]
    cz = m20 * wx + m21 * wy + m22 * wz + m23
    cw = m30 * wx + m31 * wy + m32 * wz + m33
    depth = jnp.where(hit, cz / cw, jnp.float32(1.0))

    out_vis[:] = vis
    out_depth[:] = depth
    out_wx[:] = wx
    out_wy[:] = wy
    out_wz[:] = wz


def visibility_pass_pallas(
    tri_data, camera_pos, view, proj, cfg,
    row_offset=0, rows=None, interpret=False, rotation=None,
):
    """Pallas drop-in for ops.gbuffer.visibility_pass (same outputs).

    Hit positions are o + t*d rather than the barycentric recombination
    (difference ~1e-6, see module docstring)."""
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.gbuffer import (
        GBuffer,
    )

    h = cfg.height if rows is None else rows
    w = cfg.width
    tri_table = pack_triangles(tri_data)
    num_tris = int(tri_table.shape[0])

    if rotation is None:
        rotation = jnp.eye(3, dtype=jnp.float32)
    mat = jnp.matmul(proj, view, precision=jax.lax.Precision.HIGHEST)
    fparams = jnp.concatenate(
        [
            jnp.asarray(camera_pos, jnp.float32).reshape(3),
            mat[2].reshape(4),
            mat[3].reshape(4),
            jnp.asarray(rotation, jnp.float32).reshape(9),
        ]
    )
    iparams = jnp.asarray(row_offset, jnp.int32).reshape(1)

    grid = (pl.cdiv(h, TILE_H), pl.cdiv(w, TILE_W))
    kernel = functools.partial(_gbuffer_kernel, cfg=cfg, num_tris=num_tris)
    out_shape = [jax.ShapeDtypeStruct((h, w), jnp.float32)] * 5
    vis, depth, wx, wy, wz = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=_table_space(num_tris, TRI_COLS)),
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j)),
        ] * 5,
        out_shape=out_shape,
        interpret=interpret,
    )(fparams, iparams, tri_table)
    return GBuffer(
        visibility=vis,
        world_pos=jnp.stack([wx, wy, wz], axis=-1),
        depth=depth,
    )


def path_trace_pass_pallas(
    tri_data, camera_pos, light, frame_idx, cfg,
    row_offset=0, rows=None, interpret=False, planar=False, rotation=None,
    stream_tables=False,
):
    """Pallas drop-in for ops.pathtrace.path_trace_pass (same signature +
    semantics). Returns (rows, W, 3) radiance, or the three (rows, W)
    channel planes when ``planar`` (saves a 25 MB stack copy at 1080p).

    Uses the merged coplanar-pair table when TriangleData carries one
    (pack_shading_pairs); falls back to per-triangle tests otherwise.

    ``stream_tables`` (oracle mode, requires a clustered scene): keep the
    pair table in HBM (rows padded to 128 columns for DMA alignment) and
    stream each visited cluster's block into VMEM scratch -- removes the
    on-chip table size cap (docs/DESIGN_ROUND2.md section 1a). NOT a
    production path: frames route streaming scenes to the wavefront
    tracer (pipeline/frame.py); this mode survives as the second,
    independently-structured implementation behind the
    wavefront==megakernel bit-parity tests (tests/test_pallas.py) and
    benchmarks/scaling.py."""
    if cfg.truncate_radiance and not cfg.nee:
        raise ValueError(
            "truncate_radiance is not plumbed through the megakernel's "
            "preemptive fall-through (_pack_stage); use the wavefront "
            "tracer or the XLA formulation (ops/multires.py routes there)"
        )
    h = cfg.height if rows is None else rows
    w = cfg.width
    pair_table = getattr(tri_data, "pair_table", None)
    cluster_aabbs = getattr(tri_data, "cluster_aabbs", None)
    super_aabbs = getattr(tri_data, "super_aabbs", None)
    num_clusters = csize = num_supers = ssize = 0
    if pair_table is not None:
        tri_table = pair_table
        pairs = True
        if cluster_aabbs is not None:
            csize, num_clusters, ssize, num_supers = hierarchy_sizes(
                int(tri_table.shape[0])
            )
            assert num_clusters == int(cluster_aabbs.shape[0]), (
                "cluster table inconsistent with hierarchy_sizes"
            )
            # pad the pair table so every cluster spans csize rows;
            # zero rows self-reject (nd == 0 -> nan t)
            padded = num_clusters * csize
            if int(tri_table.shape[0]) < padded:
                tri_table = jnp.concatenate(
                    [
                        tri_table,
                        jnp.zeros(
                            (padded - int(tri_table.shape[0]), PAIR_COLS),
                            jnp.float32,
                        ),
                    ]
                )
    else:
        tri_table = pack_triangles(tri_data)
        pairs = False
    if cluster_aabbs is None:
        cluster_aabbs = jnp.zeros((1, 6), jnp.float32)  # unused dummy
    if super_aabbs is None:
        super_aabbs = jnp.zeros((1, 6), jnp.float32)  # unused dummy
    num_tris = int(tri_table.shape[0])

    if rotation is None:
        rotation = jnp.eye(3, dtype=jnp.float32)
    # scene-diameter scale for the streamed traversal's distance bins
    # (in-graph: tri_data may be traced)
    if stream_tables and cluster_aabbs.shape[0] > 1:
        inv_diam, _, _ = scene_bounds_from_clusters(cluster_aabbs)
    else:
        inv_diam = jnp.float32(1.0)
    fparams = jnp.concatenate(
        [
            jnp.asarray(camera_pos, jnp.float32).reshape(3),
            jnp.asarray(light.position, jnp.float32).reshape(3),
            (jnp.asarray(light.color, jnp.float32) * cfg.light_intensity).reshape(3),
            jnp.array([cfg.light_radius], jnp.float32),
            jnp.asarray(rotation, jnp.float32).reshape(9),
            jnp.asarray(inv_diam, jnp.float32).reshape(1),
        ]
    )
    iparams = jnp.asarray(row_offset, jnp.int32).reshape(1)
    uparams = (
        jnp.asarray(frame_idx, jnp.int32).astype(jnp.uint32) * jnp.uint32(374761393)
    ).reshape(1)

    grid = (pl.cdiv(h, TILE_H), pl.cdiv(w, TILE_W))
    kernel = functools.partial(
        _trace_kernel, cfg=cfg, num_tris=num_tris, pairs=pairs,
        num_clusters=num_clusters, csize=csize,
        num_supers=num_supers, ssize=ssize,
    )
    out_shape = [jax.ShapeDtypeStruct((h, w), jnp.float32)] * 3
    if stream_tables:
        if not num_clusters:
            raise ValueError("stream_tables requires a clustered scene")
        # pad columns to 128 (DMA lane-dim alignment) and keep the table in
        # HBM; a (csize, 128) scratch receives each visited cluster's block
        tri_table = jnp.concatenate(
            [
                tri_table,
                jnp.zeros((int(tri_table.shape[0]), 128 - PAIR_COLS), jnp.float32),
            ],
            axis=1,
        )
        tri_table = assemble_stream_table(
            tri_table, getattr(tri_data, "sub_aabbs", None),
            num_clusters, csize,
        )
        table_spec = pl.BlockSpec(memory_space=pl.ANY)
        # SMEM scratch, not VMEM: dynamic scalar reads from VMEM cost ~180
        # cycles/row-visit vs ~84 from SMEM (measured on v5e; the pair loop
        # is scalar-read bound). Two buffers: the ordered traversal keeps
        # one DMA in flight behind the active cluster's pair loop.
        scratch_shapes = [
            pltpu.SMEM((num_clusters,), jnp.int32),   # bins
            pltpu.SMEM((num_clusters,), jnp.int32),   # sorted visited ids
            pltpu.SMEM((NBINS,), jnp.int32),          # bin counts/offsets
            pltpu.SMEM((csize + nsub_for(csize), 128), jnp.float32),
            pltpu.SMEM((csize + nsub_for(csize), 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ]
    else:
        table_spec = pl.BlockSpec(
            memory_space=_table_space(num_tris, int(tri_table.shape[1]))
        )
        scratch_shapes = []
    r, g, b = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
        + [table_spec]
        + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2,
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j)),
        ] * 3,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        # AABB tables flat 1D: 2D SMEM would lane-pad (C, 6) to (C, 128)
    )(fparams, iparams, uparams, tri_table,
      cluster_aabbs.reshape(-1), super_aabbs.reshape(-1))
    if planar:
        return r, g, b
    return jnp.stack([r, g, b], axis=-1)
