"""Hardware A/B: wavefront tracer whole-tile walk vs a flagged variant.

The group-split walk (docs/DESIGN_ROUND4.md; _ordered_stream_loop
``groups``) replaces the per-run-cluster header phase (nsub sequential
whole-tile slab tests) with ONE interval slab test per 128-lane column
group covering all nsub boxes x 8 packets, and runs table rows on 1-vreg
group slices against per-group state. Output is bit-identical
(tests/test_pallas.py::test_wavefront_group_split_bit_parity).

Both arms in ONE process (shared axon warmup + scene prep).
Run: python -m benchmarks.group_split_ab [--frames N] [--tris a,b,...]
     [--soup] [--tile-w W]
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
parser.add_argument(
    "--mode", default="group_split", choices=["group_split", "vmem_prune"],
    help="which flagged walk variant the ON arm enables",
)
parser.add_argument("--tris", default="32768,247808")
parser.add_argument("--soup", action="store_true")
parser.add_argument("--tile-w", type=int, default=None)
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
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(frames):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / frames * 1000.0


for tris in [int(t) for t in cli.tris.split(",")]:
    if cli.soup:
        verts, idx = procedural.random_soup(tris, seed=3, extent=2.0)
    else:
        splits = max(1, int(round((tris / 32) ** 0.5)))
        verts, idx = procedural.subdivided_cornell(splits)
    scene = ptsf.Scene.from_arrays(verts, idx)
    td = ptsf.precompute_triangle_data(scene)
    ntri = scene.num_triangles
    for gs in (False, True):
        kw = {cli.mode: gs, "tile_w": cli.tile_w}
        wf = jax.jit(
            lambda kw=kw: wf_mod.path_trace_wavefront(
                td, cam.position, light, 1, cfg, **kw
            )[..., 0]
        )
        try:
            ms = time_fn(wf, cli.frames)
            print(
                f"tris={ntri:>7} soup={cli.soup} "
                f"tw={cli.tile_w or wf_mod.TILE_W} {cli.mode}={gs} "
                f"{ms:10.1f} ms",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(
                f"tris={ntri:>7} {cli.mode}={gs} FAILED "
                f"{type(e).__name__}: {e}",
                flush=True,
            )
