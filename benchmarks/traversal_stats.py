"""Traversal-counter probe for the wavefront tracer (DESIGN_ROUND3 §1).

Runs one 1-spp wavefront trace with the in-kernel counters enabled and
prints, per bounce segment and in total, where the streamed row loop's
work actually goes: clusters visited per tile, row phases run vs bin-
pruned, live-lane occupancy of run clusters, and sub-block row counts.
These numbers pick between the round-3 optimization candidates
(occupancy compaction / cond gating / sub-block granularity / phase-A
cost). Usage:

    python -m benchmarks.traversal_stats [--tris 247808] [--width 1920]
        [--height 1080] [--segments 32]
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tris", type=int, default=32768)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--segments", type=int, default=32)
    p.add_argument("--interpret", action="store_true")
    p.add_argument("--sort-mode", default=None, help="default: production default")
    p.add_argument("--tile-w", type=int, default=None)
    p.add_argument("--csize", type=int, default=None)
    p.add_argument(
        "--time", action="store_true",
        help="also time the production (non-stats) trace",
    )
    p.add_argument(
        "--soup", action="store_true",
        help="random volumetric soup instead of subdivided Cornell "
        "(worst-case traversal: geometry fills the volume)",
    )
    args = p.parse_args()

    import real_time_path_tracing_with_spatiotemporal_filtering_tpu as ptsf
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas import (
        pathtrace as pt_mod,
        wavefront as wf_mod,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene import (
        procedural,
    )

    cfg = ptsf.RenderConfig(
        width=args.width, height=args.height, max_bounces=args.segments
    )
    pt_mod.set_cluster_size_override(args.csize)
    if args.sort_mode is None:
        args.sort_mode = wf_mod.DEFAULT_SORT_MODE
    if args.soup:
        verts, idx = procedural.random_soup(args.tris, seed=3, extent=2.0)
    else:
        splits = max(1, int(round((args.tris / 32) ** 0.5)))
        verts, idx = procedural.subdivided_cornell(splits)
    scene = ptsf.Scene.from_arrays(verts, idx)
    td = ptsf.precompute_triangle_data(scene)
    csize, num_clusters, ssize, num_supers = pt_mod.hierarchy_sizes(
        int(td.pair_table.shape[0])
    )
    k_rows = csize // pt_mod.nsub_for(csize) if csize else 0
    lanes = wf_mod._LANES if args.tile_w is None else 8 * args.tile_w
    print(
        f"# tris={scene.num_triangles} pairs={int(td.pair_table.shape[0])} "
        f"csize={csize} clusters={num_clusters} ssize={ssize} "
        f"supers={num_supers} k_rows={k_rows}"
    )

    cam = ptsf.Camera.default()
    light = ptsf.Light.default()
    _, stats = wf_mod.path_trace_wavefront(
        td, cam.position, light, 1, cfg,
        interpret=args.interpret, collect_stats=True,
        sort_mode=args.sort_mode, tile_w=args.tile_w,
    )

    tot = np.zeros(8, np.int64)
    hdr = (
        "seg  tiles visited/t run/t skip/t supers/t  occ%  sb/run "
        "sb_occ% rows/t"
    )
    print(hdr)
    for seg, s in enumerate(stats):
        s = s.astype(np.int64)
        live_tiles = int((s[:, 0] > 0).sum()) or 1
        t = s.sum(0)
        tot += t
        runs = max(int(t[2]), 1)
        sbs = max(int(t[4]), 1)
        print(
            f"{seg:3d} {live_tiles:6d} {t[0]/live_tiles:9.1f} "
            f"{t[2]/live_tiles:5.1f} {t[6]/live_tiles:6.1f} "
            f"{t[1]/live_tiles:8.1f} {100.0*t[3]/(runs*lanes):5.1f} "
            f"{t[4]/runs:7.2f} {100.0*t[5]/(sbs*lanes):7.1f} "
            f"{t[4]*k_rows/live_tiles:6.0f}"
        )
    runs = max(int(tot[2]), 1)
    sbs = max(int(tot[4]), 1)
    ngroups = max(lanes // 8 // 128, 1)
    print(
        f"TOTAL visited={tot[0]} run={tot[2]} skipped={tot[6]} "
        f"supers={tot[1]} rows={tot[4]*k_rows} "
        f"occ%={100.0*tot[3]/(runs*lanes):.1f} "
        f"sb_occ%={100.0*tot[5]/(sbs*lanes):.1f} "
        f"grp%={100.0*tot[7]/(sbs*ngroups):.1f}"
    )
    # first-order time model (v5e): ~85 ns per whole-tile slab test, ~130
    # ns per table row, ~85 ns per sub-block header test
    ms = 1e-6
    slab_tests = tot[0] + tot[1] * 0  # visited appends imply a slab test each
    phase_a = (tot[1] * ssize if num_supers else 0) * 85 * ms
    rows_t = tot[4] * k_rows * 130 * ms
    hdrs_t = tot[2] * pt_mod.nsub_for(csize) * 85 * ms
    slot_t = tot[0] * 200 * ms
    print(
        f"# model: phaseA~{phase_a:.0f}ms rows~{rows_t:.0f}ms "
        f"headers~{hdrs_t:.0f}ms slot~{slot_t:.0f}ms "
        f"(slab appends {slab_tests})"
    )

    if args.time:
        import time

        import jax

        fn = jax.jit(
            lambda f: wf_mod.path_trace_wavefront(
                td, cam.position, light, f, cfg, sort_mode=args.sort_mode,
                tile_w=args.tile_w,
            )[..., 0]
        )
        out = fn(1)
        np.asarray(out[0, 0])
        t0 = time.perf_counter()
        frames = 2
        for i in range(frames):
            out = fn(i + 2)
        np.asarray(out[0, 0])
        ms = (time.perf_counter() - t0) / frames * 1000.0
        print(f"# trace time ({args.sort_mode}): {ms:.0f} ms/frame")

        # --- roofline: issued vector work & streamed bytes vs v5e peaks ---
        # VPU peak (approx, documented assumption): 8 sublanes x 128 lanes
        # x 4 ALUs x ~0.94 GHz ~= 3.9e12 f32 lane-ops/s per chip. HBM peak
        # ~= 819 GB/s (v5e). Lane-ops issued = whole-tile ops x the tile's
        # lane count (the VPU executes all lanes whether needy or not);
        # "useful" discounts by measured run-cluster occupancy.
        vpu_peak = 8 * 128 * 4 * 0.94e9
        hbm_peak = 819e9
        ops_row = 50.0  # _pair_test: ~50 vector ops per table row
        ops_hdr = 15.0  # per-row sub-block header slab test
        ops_slab = 15.0  # whole-tile cluster slab test (phase A/visit)
        nsub = pt_mod.nsub_for(csize)
        lane_ops = (
            float(tot[4]) * k_rows * ops_row
            + float(tot[2]) * nsub * ops_hdr
            + float(tot[0] + tot[1]) * ops_slab
        ) * lanes
        # streamed bytes: each RUN cluster DMAs (csize + nsub) 512-byte
        # rows (prune-at-issue skips the rest)
        bytes_streamed = float(tot[2]) * (csize + nsub) * 512.0
        sec = ms / 1e3
        issued_pct = 100.0 * lane_ops / (sec * vpu_peak)
        useful_pct = issued_pct * float(tot[3]) / max(float(tot[2]) * lanes, 1)
        bw_pct = 100.0 * bytes_streamed / (sec * hbm_peak)
        print(
            f"# roofline: issued {lane_ops/1e12:.2f} Tlane-ops "
            f"= {issued_pct:.0f}% of VPU peak over the measured frame; "
            f"useful (occupancy-weighted) {useful_pct:.1f}%; "
            f"streamed {bytes_streamed/1e9:.2f} GB = {bw_pct:.0f}% of HBM peak"
        )


if __name__ == "__main__":
    main()
