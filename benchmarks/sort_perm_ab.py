"""Hardware A/B: multi-operand ray re-sort vs (key, iota) sort + row gather.

The wavefront tracer re-sorts the 15 ray-state planes by coherence key
every segment (ops/pallas/wavefront.py::sort_planes). The hardware
breakdown (benchmarks/wavefront_breakdown.py, v5e 32k tris 1080p) put that
sort at 28% of the trace — the top single phase. sort_perm=True sorts only
(key, iota) and applies the stable permutation with ONE packed (n, 15)
uint32 row gather; output is bit-identical (lax.sort is stable).

Measured outcome (v5e, 1080p 1spp, 2026-08): sort_perm REJECTED —
3425 vs 1818 ms at 32k tris, 6558 vs 4951 ms at 248k (max abs diff 0.0
both scales). The packed row gather runs near-scalar on TPU and costs
more than the whole multi-operand sort. See docs/DESIGN_ROUND3.md.

Both arms in ONE process (shared axon warmup + scene prep).
Run: python -m benchmarks.sort_perm_ab [--frames N] [--splits 32 88]
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
parser.add_argument("--frames", type=int, default=3)
parser.add_argument("--splits", type=int, nargs="+", default=[32, 88])
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


for splits in cli.splits:
    verts, idx = procedural.subdivided_cornell(splits)
    scene = ptsf.Scene.from_arrays(verts, idx)
    td = ptsf.precompute_triangle_data(scene)
    ntri = scene.num_triangles
    ref = None
    for sp in (False, True):
        wf = jax.jit(
            lambda sp=sp: wf_mod.path_trace_wavefront(
                td, cam.position, light, 1, cfg, sort_perm=sp
            )[..., 0]
        )
        try:
            out = np.asarray(wf())
            if ref is None:
                ref = out
            else:
                d = float(np.abs(out - ref).max())
                print(f"# max abs diff vs multi-operand arm: {d}", flush=True)
            ms = time_fn(wf, cli.frames)
            print(f"tris={ntri:>7} sort_perm={sp} {ms:10.1f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(
                f"tris={ntri:>7} sort_perm={sp} FAILED {type(e).__name__}: {e}",
                flush=True,
            )
