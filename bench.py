"""Headline benchmark: denoised 1-spp 1080p Cornell Box, ms/frame, one chip.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "ms/frame", "vs_baseline": N}

The baseline is the north-star target from BASELINE.md (<= 33 ms/frame for
the full A-SVGF frame at 1080p 1spp on one v5e chip; the reference publishes
no numbers of its own). vs_baseline = 33 / measured: > 1 beats the target.

Usage: python bench.py [--width W --height H --frames N --json-only]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

BASELINE_MS = 33.0  # BASELINE.md north-star target (one v5e chip)


def run_bench(width: int, height: int, frames: int, warmup: int, verbose: bool):
    import jax

    import real_time_path_tracing_with_spatiotemporal_filtering_tpu as ptsf

    cfg = ptsf.RenderConfig(width=width, height=height)
    scene = ptsf.Scene.cornell_box()
    renderer = ptsf.Renderer(scene, cfg)

    platform = jax.devices()[0].platform
    if verbose:
        print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    # compile + temporal warmup
    for _ in range(warmup):
        renderer.step().block_until_ready()

    import numpy as np

    # Throughput timing: frames are serially dependent through the donated
    # history pytree, so syncing on the last frame's output waits for the
    # whole chain while letting dispatch overlap device execution. The sync
    # is a one-pixel device->host transfer -- block_until_ready() returns
    # early under the axon runtime and full-image transfers would pollute
    # the measurement.
    def sync(x):
        np.asarray(x[0, 0])

    sync(renderer.step())  # ensure warmup completed
    t0 = time.perf_counter()
    rgb = None
    for _ in range(frames):
        rgb = renderer.step()
    sync(rgb)
    ms = (time.perf_counter() - t0) / frames * 1000.0
    return ms, platform


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument("--height", type=int, default=1080)
    parser.add_argument("--frames", type=int, default=20)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()

    ms, platform = run_bench(
        args.width, args.height, args.frames, args.warmup, args.verbose
    )
    print(
        json.dumps(
            {
                "metric": (
                    f"ms/frame, {args.width}x{args.height} 1spp Cornell Box, "
                    f"full A-SVGF (G-buffer + gradient + path trace + 9x "
                    f"a-trous + EMA), single {platform} chip"
                ),
                "value": round(ms, 3),
                "unit": "ms/frame",
                "vs_baseline": round(BASELINE_MS / ms, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
