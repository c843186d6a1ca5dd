"""Mosaic primitive microbenchmarks for the per-packet traversal design.

The round-3 A/Bs proved per-op cost models unreliable; this measures the
primitives a sub-tile (per-sublane-packet) BVH descent would be built
from, directly on the chip:

  scalar    -- SMEM scalar arithmetic + dynamic SMEM reads in a fori_loop
               (the per-packet walk's control flow budget)
  dynrow    -- dynamic-sublane VMEM row read -> accumulate (per-packet
               node/pair fetch)
  assemble  -- 8 dynamic VMEM row reads written into the 8 sublanes of a
               scratch vreg + one consuming op (per-8-packet row assembly)
  vec1x128  -- elementwise chain on (1, 128) arrays (one sublane)
  vec8x128  -- same chain on (8, 128) (one full vreg)
  vec8x512  -- same chain on (8, 512) (4 vregs, the production tile)
  cond      -- in-loop lax.cond with trivial branches (known ~135 ns)

Each kernel runs its primitive ITERS times inside one Pallas program and
the program is dispatched REPS times back-to-back (axon dispatch is
~30 ms, so per-primitive cost = slope over ITERS, not absolute time).

Usage: python -m benchmarks.mosaic_micro [--which all]
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def _timed(fn, x, reps=8):
    import jax

    out = fn(x)
    np.asarray(jax.device_get(out)).ravel()[:1]  # compile + sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(out)
    np.asarray(jax.device_get(out)).ravel()[:1]
    return (time.perf_counter() - t0) / reps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--which", default="all")
    p.add_argument("--iters", type=int, default=200_000)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"# device: {jax.devices()[0]}")
    which = args.which.split(",") if args.which != "all" else [
        "scalar", "dynrow", "assemble", "vec1x128", "vec8x128", "vec8x512",
        "when", "reduce", "dynwin", "cond",
    ]

    ITERS = args.iters

    def run_pair(name, make, iters_hi, iters_lo):
        """Cost/iter from the delta between two iteration counts (removes
        dispatch + fixed kernel overhead)."""
        f_hi = jax.jit(make(iters_hi))
        f_lo = jax.jit(make(iters_lo))
        x = jnp.arange(8 * 512, dtype=jnp.float32).reshape(8, 512) * 1e-6
        t_hi = _timed(f_hi, x)
        t_lo = _timed(f_lo, x)
        ns = (t_hi - t_lo) / (iters_hi - iters_lo) * 1e9
        print(f"{name:<10} {ns:8.2f} ns/iter   "
              f"(hi {t_hi * 1e3:.1f} ms, lo {t_lo * 1e3:.1f} ms)")

    # --- scalar: ~8 scalar ops + 1 dynamic SMEM read per iteration ---
    if "scalar" in which:
        def make(iters):
            def kernel(x_ref, o_ref, tab):
                def init(i, a):
                    tab[i] = i * 3 + 1
                    return a

                jax.lax.fori_loop(0, 512, init, 0)

                def body(i, c):
                    a, b = c
                    v = tab[a & 511]
                    a = (a * 5 + v) & 0x7FFFFFF
                    b = b ^ (a >> 3)
                    return a, b

                a, b = jax.lax.fori_loop(0, iters, body, (1, 2))
                o_ref[:] = x_ref[:] + (a + b).astype(jnp.float32) * 0.0

            def f(x):
                return pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
                    scratch_shapes=[pltpu.SMEM((512,), jnp.int32)],
                )(x)

            return f

        run_pair("scalar", make, ITERS, ITERS // 4)

    # --- dynrow: one dynamic-sublane VMEM read + accumulate ---
    if "dynrow" in which:
        def make(iters):
            def kernel(x_ref, o_ref, vbuf):
                vbuf[:, :] = jnp.tile(x_ref[:, :128], (16, 1))

                def body(i, c):
                    a, acc = c
                    row = vbuf[pl.ds(a & 127, 1), :]
                    acc = acc + row
                    a = a * 5 + 1
                    return a, acc

                _, acc = jax.lax.fori_loop(
                    0, iters, body, (1, jnp.zeros((1, 128), jnp.float32))
                )
                o_ref[:] = x_ref[:]
                o_ref[0:1, :128] = x_ref[0:1, :128] + acc * 0.0

            def f(x):
                return pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
                    scratch_shapes=[pltpu.VMEM((128, 128), jnp.float32)],
                )(x)

            return f

        run_pair("dynrow", make, ITERS // 4, ITERS // 16)

    # --- assemble: 8 dynamic reads -> 8 sublanes of a scratch vreg + op ---
    if "assemble" in which:
        def make(iters):
            def kernel(x_ref, o_ref, vbuf, asm):
                vbuf[:, :] = jnp.tile(x_ref[:, :128], (16, 1))

                def body(i, c):
                    a, acc = c
                    for s in range(8):
                        asm[s : s + 1, :] = vbuf[pl.ds((a + s * 37) & 127, 1), :]
                    acc = acc + asm[:, :]
                    a = a * 5 + 1
                    return a, acc

                _, acc = jax.lax.fori_loop(
                    0, iters, body, (1, jnp.zeros((8, 128), jnp.float32))
                )
                o_ref[:] = x_ref[:]
                o_ref[:, :128] = x_ref[:, :128] + acc * 0.0

            def f(x):
                return pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
                    scratch_shapes=[
                        pltpu.VMEM((128, 128), jnp.float32),
                        pltpu.VMEM((8, 128), jnp.float32),
                    ],
                )(x)

            return f

        run_pair("assemble", make, ITERS // 8, ITERS // 32)

    # --- vecNxM: ~12-op elementwise chain at three widths ---
    def vec_make(shape):
        def make(iters):
            def kernel(x_ref, o_ref):
                v = x_ref[: shape[0], : shape[1]]

                def body(i, acc):
                    t = acc * 1.0001 + v
                    t = jnp.minimum(jnp.maximum(t, v * 0.5), v * 2.0 + acc)
                    t = t - (acc * v) * 1e-7
                    return t

                acc = jax.lax.fori_loop(0, iters, body, v * 0.0)
                o_ref[:] = x_ref[:]
                o_ref[: shape[0], : shape[1]] = v + acc * 0.0

            def f(x):
                return pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
                )(x)

            return f

        return make

    for nm, shp in (
        ("vec1x128", (1, 128)),
        ("vec8x128", (8, 128)),
        ("vec8x512", (8, 512)),
    ):
        if nm in which:
            run_pair(nm, vec_make(shp), ITERS // 2, ITERS // 8)

    # --- when: one in-loop pl.when-guarded SMEM store (predicated region
    # without value joins -- potentially much cheaper than lax.cond) ---
    if "when" in which:
        def make(iters):
            def kernel(x_ref, o_ref, tab):
                def body(i, a):
                    @pl.when(a & 1 == 0)
                    def _():
                        tab[a & 255] = a

                    return a * 5 + 1

                a = jax.lax.fori_loop(0, iters, body, 1)
                o_ref[:] = x_ref[:] + (a + tab[0]).astype(jnp.float32) * 0.0

            def f(x):
                return pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
                    scratch_shapes=[pltpu.SMEM((256,), jnp.int32)],
                )(x)

            return f

        run_pair("when", make, ITERS // 4, ITERS // 16)

    # --- reduce: full-array vector -> scalar reduction (jnp.max) used as
    # a scalar in the next iteration's control flow ---
    if "reduce" in which:
        def make(iters):
            def kernel(x_ref, o_ref):
                v = x_ref[:]

                def body(i, c):
                    a, s = c
                    m = jnp.max(v + s)  # scalar from an (8,512) reduce
                    return a * 5 + 1, s + m * jnp.float32(1e-20)

                a, s = jax.lax.fori_loop(
                    0, iters, body, (1, jnp.float32(0))
                )
                o_ref[:] = x_ref[:] + s * 0.0 + a.astype(jnp.float32) * 0.0

            def f(x):
                return pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
                )(x)

            return f

        run_pair("reduce", make, ITERS // 4, ITERS // 16)

    # --- dynwin: read an (8,128) window at a dynamic 8-aligned sublane
    # offset from a VMEM ref, one op, write back (the targeted-row access
    # pattern: state slabs in VMEM scratch, dynamic octet offset) ---
    if "dynwin" in which:
        def make(iters):
            def kernel(x_ref, o_ref, big):
                big[:, :] = jnp.tile(x_ref[:, :128], (8, 1))

                def body(i, a):
                    off = pl.multiple_of((a & 7) * 8, 8)
                    w = big[pl.ds(off, 8), :]
                    big[pl.ds(off, 8), :] = w * 1.0000001
                    return a * 5 + 1

                a = jax.lax.fori_loop(0, iters, body, 1)
                o_ref[:] = x_ref[:]
                o_ref[0:1, :128] = x_ref[0:1, :128] + big[0:1, :] * 0.0 + (
                    a.astype(jnp.float32) * 0.0
                )

            def f(x):
                return pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
                    scratch_shapes=[pltpu.VMEM((64, 128), jnp.float32)],
                )(x)

            return f

        run_pair("dynwin", make, ITERS // 4, ITERS // 16)

    # --- cond: one in-loop lax.cond with trivial branches ---
    if "cond" in which:
        def make(iters):
            def kernel(x_ref, o_ref):
                def body(i, c):
                    a, b = c
                    b = jax.lax.cond(
                        a & 1 == 0, lambda t: t + 1, lambda t: t - 1, b
                    )
                    return a * 5 + 1, b

                a, b = jax.lax.fori_loop(0, iters, body, (1, 0))
                o_ref[:] = x_ref[:] + (a + b).astype(jnp.float32) * 0.0

            def f(x):
                return pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
                )(x)

            return f

        run_pair("cond", make, ITERS // 4, ITERS // 16)


if __name__ == "__main__":
    main()
