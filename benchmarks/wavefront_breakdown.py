"""Wavefront-trace time breakdown via doubling probes.

Each probed phase of the streamed traversal runs TWICE per frame with a
runtime-1.0 perturbation (never CSE'd, bit-identical output -- see
_ordered_stream_loop's ``probe``); the wall-clock delta vs the unprobed
trace IS that phase's true cost. This replaces the per-op cost model,
which mispredicted two round-2 hardware A/Bs (hdr_lanes, two-level
headers -- docs/DESIGN_ROUND3.md) because scalar/DMA/cond costs on the
real pipeline do not add linearly.

Also checks that every probed frame is bit-identical to the baseline
frame (a wrong probe would otherwise silently skew the breakdown).

Usage:
    python -m benchmarks.wavefront_breakdown [--tris 32768] [--frames 3]
        [--soup] [--phases sort,visits,issue,skeleton,headers,rows]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

PHASES = (
    "sort", "visits", "issue", "skeleton", "headers", "rows",
    # round-4 additions attributing the previously ~25% unaccounted tail:
    # shading (in-kernel _shade_segment), XLA ray generation, and the
    # final pixel-id descramble sort
    "shade", "raygen", "descramble",
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tris", type=int, default=32768)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--frames", type=int, default=3)
    p.add_argument("--segments", type=int, default=32)
    p.add_argument("--soup", action="store_true")
    p.add_argument("--phases", default=",".join(PHASES))
    p.add_argument("--sort-mode", default=None)
    p.add_argument("--check", action="store_true",
                   help="assert probed output == baseline bit-for-bit")
    args = p.parse_args()

    import jax

    import real_time_path_tracing_with_spatiotemporal_filtering_tpu as ptsf
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas import (
        wavefront as wf_mod,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene import (
        procedural,
    )

    cfg = ptsf.RenderConfig(
        width=args.width, height=args.height, max_bounces=args.segments
    )
    if args.soup:
        verts, idx = procedural.random_soup(args.tris, seed=3, extent=2.0)
    else:
        splits = max(1, int(round((args.tris / 32) ** 0.5)))
        verts, idx = procedural.subdivided_cornell(splits)
    scene = ptsf.Scene.from_arrays(verts, idx)
    td = ptsf.precompute_triangle_data(scene)
    cam, light = ptsf.Camera.default(), ptsf.Light.default()
    sort_mode = args.sort_mode or wf_mod.DEFAULT_SORT_MODE
    print(f"# device: {jax.devices()[0]}  tris={scene.num_triangles} "
          f"sort={sort_mode} soup={args.soup}")

    def timed(probe):
        fn = jax.jit(
            lambda f: wf_mod.path_trace_wavefront(
                td, cam.position, light, f, cfg, sort_mode=sort_mode,
                probe_double=probe,
            )[..., 0]
        )
        out = fn(1)
        np.asarray(out[0, 0])  # compile + sync (axon-safe)
        t0 = time.perf_counter()
        for i in range(args.frames):
            out = fn(i + 2)
        np.asarray(out[0, 0])
        ms = (time.perf_counter() - t0) / args.frames * 1000.0
        ref = np.asarray(fn(99)) if args.check else None
        return ms, ref

    base_ms, base_img = timed(None)
    print(f"baseline        {base_ms:8.0f} ms/frame")
    rows = []
    for phase in args.phases.split(","):
        ms, img = timed(phase)
        if args.check:
            assert (img == base_img).all(), f"probe {phase} changed output"
        delta = ms - base_ms
        rows.append((phase, delta))
        print(f"2x {phase:<12} {ms:8.0f} ms/frame   "
              f"-> {phase} ~ {delta:6.0f} ms ({100 * delta / base_ms:5.1f}%)")
    accounted = sum(d for _, d in rows)
    print(f"# accounted {accounted:.0f} of {base_ms:.0f} ms "
          f"({100 * accounted / base_ms:.1f}%); the rest = DMA waits and "
          "loop/cond bookkeeping (no probe doubles those)")


if __name__ == "__main__":
    main()
