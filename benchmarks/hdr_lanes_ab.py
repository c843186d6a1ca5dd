"""Hardware A/B: wavefront tracer row-major vs lane-parallel header walk.

Both arms in ONE process (shared axon warmup + scene prep) so the numbers
are comparable. Measured outcome (v5e, 1080p 1spp, 2026-08): hdr_lanes
REJECTED — 2289 vs 1732 ms at 32k tris, 9596 vs 4908 ms at 248k; see
docs/DESIGN_ROUND3.md. Run: python -m benchmarks.hdr_lanes_ab [--frames N]
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

import real_time_path_tracing_with_spatiotemporal_filtering_tpu as ptsf
from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas import (
    wavefront as wf_mod,
)
from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene import procedural

parser = argparse.ArgumentParser()
parser.add_argument(
    "--tile-w", type=int, default=None,
    help="wavefront tile width (lanes); round-4 re-tests hdr_lanes at 128 "
    "where the 1024-ray bundle is ~4x tighter than tw=512's",
)
parser.add_argument(
    "--frames", type=int, default=5,
    help="timed frames per arm (raise for close comparisons; the recorded "
    "round-2 gaps of 30-95%% were clear at 2)",
)
cli = parser.parse_args()

print(f"# device: {jax.devices()[0]}", flush=True)
# warm up the axon tunnel (first transfer can stall minutes)
t0 = time.perf_counter()
np.asarray(jnp.zeros((8, 128))[0, 0])
print(f"# warmup transfer {time.perf_counter() - t0:.1f}s", flush=True)

cfg = ptsf.RenderConfig(width=1920, height=1080)
cam = ptsf.Camera.default()
light = ptsf.Light.default()


def sync(x):
    np.asarray(x[0, 0])


def time_fn(fn, frames):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(frames):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / frames * 1000.0


for splits, frames in [(32, cli.frames), (88, cli.frames)]:
    verts, idx = procedural.subdivided_cornell(splits)
    scene = ptsf.Scene.from_arrays(verts, idx)
    td = ptsf.precompute_triangle_data(scene)
    ntri = scene.num_triangles
    for hl in (False, True):
        wf = jax.jit(
            lambda hl=hl: wf_mod.path_trace_wavefront(
                td, cam.position, light, 1, cfg, hdr_lanes=hl,
                tile_w=cli.tile_w,
            )[..., 0]
        )
        try:
            ms = time_fn(wf, frames)
            print(f"tris={ntri:>7} tw={cli.tile_w or wf_mod.TILE_W} "
              f"hdr_lanes={hl} {ms:10.1f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"tris={ntri:>7} hdr_lanes={hl} FAILED {type(e).__name__}: {e}",
                  flush=True)
