"""Hardware A/B: re-sort cadence for the wavefront tracer at scale.

At >=128 clusters the tracer re-sorts rays EVERY segment
(SORT_EVERY_MIN_CLUSTERS); the round-2 A/B beat the sparse (1,2,4,8,16)
schedule. But the round-3 hardware breakdown (wavefront_breakdown.py) put
the sort at 28% of the 32k trace — the top single phase — so intermediate
cadences (every 2nd/3rd segment) trade sort time against culling quality.
The traced RESULT is bit-identical for ANY schedule (the final descramble
restores pixel order; shading is per-ray), so this is purely a time A/B.

Measured outcome (v5e, 1080p 1spp, 2026-08): every-segment sorting
(stride 1) CONFIRMED optimal at both scales — 32k: 1817 / 1855 / 1972 ms
for stride 1/2/3; 248k: 4952 / 6357 / 7364 ms. The culling quality lost
by even one unsorted segment costs more row/header work than the ~16 ms
sort saves; the gap widens with scale. See docs/DESIGN_ROUND3.md.

Run: python -m benchmarks.sort_stride_ab [--frames N] [--splits 32 88]
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
parser.add_argument("--frames", type=int, default=2)
parser.add_argument("--splits", type=int, nargs="+", default=[32, 88])
parser.add_argument("--strides", type=int, nargs="+", default=[1, 2, 3])
cli = parser.parse_args()

print(f"# device: {jax.devices()[0]}", flush=True)
t0 = time.perf_counter()
np.asarray(jnp.zeros((8, 128))[0, 0])
print(f"# warmup transfer {time.perf_counter() - t0:.1f}s", flush=True)

cfg = ptsf.RenderConfig(width=1920, height=1080)
cam = ptsf.Camera.default()
light = ptsf.Light.default()


def sync(x):
    np.asarray(x[0, 0])


def time_fn(fn, frames):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(frames):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / frames * 1000.0


orig = wf_mod._sort_segments_for

for splits in cli.splits:
    verts, idx = procedural.subdivided_cornell(splits)
    scene = ptsf.Scene.from_arrays(verts, idx)
    td = ptsf.precompute_triangle_data(scene)
    ntri = scene.num_triangles
    ref = None
    for stride in cli.strides:
        wf_mod._sort_segments_for = (
            orig
            if stride == 1
            else lambda nc, mb, s=stride: tuple(range(1, mb, s))
        )
        try:
            fn = jax.jit(
                lambda: wf_mod.path_trace_wavefront(
                    td, cam.position, light, 1, cfg
                )[..., 0]
            )
            out = np.asarray(fn())
            if ref is None:
                ref = out
            else:
                print(
                    f"# max abs diff vs stride-1: "
                    f"{float(np.abs(out - ref).max())}",
                    flush=True,
                )
            ms = time_fn(fn, cli.frames)
            print(f"tris={ntri:>7} stride={stride} {ms:10.1f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(
                f"tris={ntri:>7} stride={stride} FAILED "
                f"{type(e).__name__}: {e}",
                flush=True,
            )
        finally:
            wf_mod._sort_segments_for = orig
