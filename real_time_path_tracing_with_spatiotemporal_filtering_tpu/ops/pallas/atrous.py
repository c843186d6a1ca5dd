"""Pallas a-trous stencil kernel.

The XLA formulation (ops/atrous.py) makes 9 whole-image HBM round trips per
iteration (one per tap); this kernel DMAs each row-slab plus a fixed halo
into VMEM once and evaluates all 9 taps on-chip, writing each iteration's
output once. Inputs are planar (H, W) channels pre-padded with edge values
(the global pad reproduces the shader's pixel clamp,
temporalFiltering.comp.glsl:136, without any in-kernel clamping).

Mosaic alignment rules shape the layout: DMA row slices must be 8-aligned,
so the halo is a fixed PAD_ROWS = 16 (>= max stride 9) regardless of the
iteration's stride k, and the padded width is rounded up to a lane multiple
(128). Weight math and accumulation order match ops.atrous.atrous_iteration
op-for-op (same GLSL source: temporalFiltering.comp.glsl:118-155).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD_ROWS = 16   # fixed row halo, 8-aligned, >= max stride (9)
PAD_COLS = 16   # left column pad, >= max stride
TILE_ROWS = 8   # output slab height (grid dim 0)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _iter_kernel(cr, cg, cb, nx, ny, nz, dd, out_r, out_g, out_b,
                 scr, sem, *, k, cfg, width):
    """One wavelet iteration at stride k over a TILE_ROWS row slab.

    ``scr``: (7, TILE_ROWS + 2*PAD_ROWS, padded_width) VMEM scratch;
    channel order cr, cg, cb, nx, ny, nz, depth.
    """
    i = pl.program_id(0)
    rows = TILE_ROWS + 2 * PAD_ROWS
    row_start = i * TILE_ROWS  # padded coords: unpadded row i*TH - PAD_ROWS

    planes = (cr, cg, cb, nx, ny, nz, dd)
    copies = [
        pltpu.make_async_copy(
            ref.at[pl.ds(row_start, rows), :], scr.at[c], sem.at[c]
        )
        for c, ref in enumerate(planes)
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    def window(c, dy, dx):
        r0 = PAD_ROWS + dy
        c0 = PAD_COLS + dx
        return scr[c, r0 : r0 + TILE_ROWS, c0 : c0 + width]

    cpr, cpg, cpb = window(0, 0, 0), window(1, 0, 0), window(2, 0, 0)
    npx, npy, npz = window(3, 0, 0), window(4, 0, 0), window(5, 0, 0)
    dp = window(6, 0, 0)

    num_r = jnp.zeros_like(cpr)
    num_g = jnp.zeros_like(cpr)
    num_b = jnp.zeros_like(cpr)
    den = jnp.zeros_like(cpr)
    h_box = jnp.float32(1.0 / 9.0)
    sig_n = jnp.float32(cfg.sigma_n)
    inv_sz = jnp.float32(1.0 / cfg.sigma_z)
    inv_sl = jnp.float32(1.0 / cfg.sigma_l)

    # GLSL tap order: i (x offset) outer, j (y offset) inner
    for ix in (-1, 0, 1):
        for jy in (-1, 0, 1):
            cqr = window(0, jy * k, ix * k)
            cqg = window(1, jy * k, ix * k)
            cqb = window(2, jy * k, ix * k)
            nqx = window(3, jy * k, ix * k)
            nqy = window(4, jy * k, ix * k)
            nqz = window(5, jy * k, ix * k)
            dq = window(6, jy * k, ix * k)

            ndot = jnp.maximum(npx * nqx + npy * nqy + npz * nqz, 0.0)
            w_n = jnp.power(ndot, sig_n)
            w_z = jnp.exp(-jnp.abs(dp - dq) * inv_sz)
            dr, dg, db = cpr - cqr, cpg - cqg, cpb - cqb
            w_l = jnp.exp(-jnp.sqrt(dr * dr + dg * dg + db * db) * inv_sl)
            w = w_n * w_z * w_l * h_box
            num_r = num_r + w * cqr
            num_g = num_g + w * cqg
            num_b = num_b + w * cqb
            den = den + w

    inv_den = 1.0 / den
    out_r[:] = num_r * inv_den
    out_g[:] = num_g * inv_den
    out_b[:] = num_b * inv_den


def _iter_var_kernel(cr, cg, cb, vv, nx, ny, nz, dd,
                     out_r, out_g, out_b, out_v,
                     scr, sem, *, k, cfg, width):
    """One variance-guided wavelet iteration at stride k (SVGF extension;
    numerics match ops.atrous.atrous_iteration_var op-for-op).

    ``scr``: (8, TILE_ROWS + 2*PAD_ROWS, padded_width) VMEM scratch;
    channel order cr, cg, cb, var, nx, ny, nz, depth.
    """
    i = pl.program_id(0)
    rows = TILE_ROWS + 2 * PAD_ROWS
    row_start = i * TILE_ROWS

    planes = (cr, cg, cb, vv, nx, ny, nz, dd)
    copies = [
        pltpu.make_async_copy(
            ref.at[pl.ds(row_start, rows), :], scr.at[c], sem.at[c]
        )
        for c, ref in enumerate(planes)
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    def window(c, dy, dx):
        r0 = PAD_ROWS + dy
        c0 = PAD_COLS + dx
        return scr[c, r0 : r0 + TILE_ROWS, c0 : c0 + width]

    lr, lg, lb = (
        jnp.float32(0.2126), jnp.float32(0.7152), jnp.float32(0.0722),
    )

    def lum(dy, dx):
        return (
            lr * window(0, dy, dx)
            + lg * window(1, dy, dx)
            + lb * window(2, dy, dx)
        )

    cpr, cpg, cpb = window(0, 0, 0), window(1, 0, 0), window(2, 0, 0)
    npx, npy, npz = window(4, 0, 0), window(5, 0, 0), window(6, 0, 0)
    dp = window(7, 0, 0)
    lp = lr * cpr + lg * cpg + lb * cpb

    # 3x3 [1/4,1/2,1/4]^2 gaussian prefilter of the variance (SVGF eq. 5)
    w3 = (jnp.float32(0.25), jnp.float32(0.5), jnp.float32(0.25))
    g = jnp.zeros_like(dp)
    for gy, wy in zip((-1, 0, 1), w3):
        for gx_, wx_ in zip((-1, 0, 1), w3):
            g = g + wy * wx_ * window(3, gy, gx_)
    inv_dl = 1.0 / (
        jnp.float32(cfg.sigma_l) * jnp.sqrt(g) + jnp.float32(cfg.variance_eps)
    )

    num_r = jnp.zeros_like(cpr)
    num_g = jnp.zeros_like(cpr)
    num_b = jnp.zeros_like(cpr)
    vnum = jnp.zeros_like(cpr)
    den = jnp.zeros_like(cpr)
    h_box = jnp.float32(1.0 / 9.0)
    sig_n = jnp.float32(cfg.sigma_n)
    inv_sz = jnp.float32(1.0 / cfg.sigma_z)

    for ix in (-1, 0, 1):
        for jy in (-1, 0, 1):
            nqx = window(4, jy * k, ix * k)
            nqy = window(5, jy * k, ix * k)
            nqz = window(6, jy * k, ix * k)
            dq = window(7, jy * k, ix * k)
            ndot = jnp.maximum(npx * nqx + npy * nqy + npz * nqz, 0.0)
            w_n = jnp.power(ndot, sig_n)
            w_z = jnp.exp(-jnp.abs(dp - dq) * inv_sz)
            w_l = jnp.exp(-jnp.abs(lp - lum(jy * k, ix * k)) * inv_dl)
            hw = h_box * w_n * w_z * w_l
            num_r = num_r + hw * window(0, jy * k, ix * k)
            num_g = num_g + hw * window(1, jy * k, ix * k)
            num_b = num_b + hw * window(2, jy * k, ix * k)
            vnum = vnum + hw * hw * window(3, jy * k, ix * k)
            den = den + hw

    inv_den = 1.0 / den
    out_r[:] = num_r * inv_den
    out_g[:] = num_g * inv_den
    out_b[:] = num_b * inv_den
    out_v[:] = vnum * inv_den * inv_den


def atrous_filter_var_pallas(color, var, normal, depth, cfg, interpret=False):
    """All variance-guided iterations (strides 1..n); planar or stacked
    inputs like :func:`atrous_filter_pallas`. Returns ((H, W, 3), (H, W)).

    Falls back to the XLA formulation when the shape is unsupported."""
    if isinstance(color, tuple):
        cr, cg, cb = color
    else:
        cr, cg, cb = color[..., 0], color[..., 1], color[..., 2]
    if isinstance(normal, tuple):
        nx, ny, nz = normal
    else:
        nx, ny, nz = normal[..., 0], normal[..., 1], normal[..., 2]
    h, w = cr.shape

    if not supported(h, w, cfg):
        from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.atrous import (
            atrous_filter_var,
        )

        color_img = jnp.stack([cr, cg, cb], axis=-1)
        normal_img = jnp.stack([nx, ny, nz], axis=-1)
        return atrous_filter_var(color_img, var, normal_img, depth, cfg)

    padded_w = _round_up(w + 2 * PAD_COLS, 128)
    nx_p, ny_p, nz_p = (
        _pad_plane(nx, padded_w),
        _pad_plane(ny, padded_w),
        _pad_plane(nz, padded_w),
    )
    dd_p = _pad_plane(depth, padded_w)

    grid = (h // TILE_ROWS,)
    rows = TILE_ROWS + 2 * PAD_ROWS
    for k in range(1, cfg.wavelet_iterations + 1):
        kernel = functools.partial(_iter_var_kernel, k=k, cfg=cfg, width=w)
        cr_p = _pad_plane(cr, padded_w)
        cg_p = _pad_plane(cg, padded_w)
        cb_p = _pad_plane(cb, padded_w)
        vv_p = _pad_plane(var, padded_w)
        cr, cg, cb, var = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 8,
            out_specs=[
                pl.BlockSpec((TILE_ROWS, w), lambda i: (i, 0)),
            ] * 4,
            out_shape=[jax.ShapeDtypeStruct((h, w), jnp.float32)] * 4,
            scratch_shapes=[
                pltpu.VMEM((8, rows, padded_w), jnp.float32),
                pltpu.SemaphoreType.DMA((8,)),
            ],
            interpret=interpret,
        )(cr_p, cg_p, cb_p, vv_p, nx_p, ny_p, nz_p, dd_p)
    return jnp.stack([cr, cg, cb], axis=-1), var


def _pad_plane(x, padded_w):
    w = x.shape[1]
    return jnp.pad(
        x,
        ((PAD_ROWS, PAD_ROWS), (PAD_COLS, padded_w - w - PAD_COLS)),
        mode="edge",
    )


# --- temporal reprojection blend (temporalFiltering.comp.glsl:242-263) ----
#
# The reprojection gather prev[py, px] is a true 2D gather; Mosaic has no
# per-lane gather and the XLA gather costs ~13 ms at 1080p. But consecutive-
# frame motion is small: on the orbit benchmark (0.01 rad/frame, camera
# looking at the scene center) the measured per-frame deltas are |dy| <= 2,
# |dx| <= 5 (the look-at rotation cancels most of the orbital translation),
# and background pixels keep their own coordinates. So the gather decomposes
# into (2*REPROJ_DY+1) x (2*REPROJ_DX+1) predicated static shifts over a
# DMA'd halo window -- ~3 ms at 1080p. The caller checks the actual deltas
# and falls back to the XLA gather beyond the window (fast cuts, teleports).

REPROJ_DY = 4    # row half-window (measured orbit deltas: <= 2)
REPROJ_DX = 8    # col half-window (measured orbit deltas: <= 5)
_BL_ROWS = 8     # output slab height
_BL_PAD_R = 8    # row padding (8-aligned DMA, >= REPROJ_DY)
_BL_PAD_C = 128  # col padding (lane-aligned DMA, >= REPROJ_DX)


def _blend_kernel(
    iparams_ref, *refs, cfg, ramp=False,
):
    """Windowed-reprojection EMA blend over one (8, TILE_BW) slab.

    ``ramp`` (cfg.accumulation_ramp): two more history planes (age,
    visibility) ride the same DMA'd halo window and predicated shifts; the
    per-pixel history length and its gradient/visibility reset are
    computed in-kernel (op-for-op ops.atrous.accumulate_age + ramp_alpha)
    and the blend uses alpha = max(ramp_alpha_min, 1/N). Emits the new
    age plane as a fourth output."""
    if ramp:
        (prev_r, prev_g, prev_b, prev_a, prev_v,
         fil_r, fil_g, fil_b, py_ref, px_ref, lam_ref, vis_ref,
         out_r, out_g, out_b, out_age, scr, sem) = refs
        planes = (prev_r, prev_g, prev_b, prev_a, prev_v)
    else:
        (prev_r, prev_g, prev_b,
         fil_r, fil_g, fil_b, py_ref, px_ref, lam_ref,
         out_r, out_g, out_b, scr, sem) = refs
        planes = (prev_r, prev_g, prev_b)
    i = pl.program_id(0)
    j = pl.program_id(1)
    frame_idx = iparams_ref[0]
    bw = out_r.shape[1]
    rows = _BL_ROWS + 2 * _BL_PAD_R
    cols = bw + 2 * _BL_PAD_C

    copies = [
        pltpu.make_async_copy(
            ref.at[pl.ds(i * _BL_ROWS, rows), pl.ds(j * bw, cols)],
            scr.at[c],
            sem.at[c],
        )
        for c, ref in enumerate(planes)
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    gy = (
        jax.lax.broadcasted_iota(jnp.int32, (_BL_ROWS, bw), 0) + i * _BL_ROWS
    )
    gx = jax.lax.broadcasted_iota(jnp.int32, (_BL_ROWS, bw), 1) + j * bw
    dyp = py_ref[...] - gy
    dxp = px_ref[...] - gx

    n_acc = 5 if ramp else 3
    acc = [jnp.zeros((_BL_ROWS, bw), jnp.float32) for _ in range(n_acc)]
    for oy in range(-REPROJ_DY, REPROJ_DY + 1):
        r0 = _BL_PAD_R + oy
        for ox in range(-REPROJ_DX, REPROJ_DX + 1):
            c0 = _BL_PAD_C + ox
            m = (dyp == oy) & (dxp == ox)
            for c in range(n_acc):
                acc[c] = jnp.where(
                    m, scr[c, r0 : r0 + _BL_ROWS, c0 : c0 + bw], acc[c]
                )
    acc_r, acc_g, acc_b = acc[0], acc[1], acc[2]

    first = frame_idx <= 0
    if ramp:
        # op-for-op ops.atrous.accumulate_age + ramp_alpha
        lam = lam_ref[...]
        n = jnp.minimum(acc[3] + 1.0, jnp.float32(cfg.ramp_age_cap))
        reset = lam > jnp.float32(cfg.ramp_reset_lam)
        reset = reset | (acc[4] != vis_ref[...])
        n = jnp.where(reset, jnp.float32(1.0), n)
        n = jnp.where(first, jnp.float32(1.0), n)
        alpha = jnp.maximum(jnp.float32(cfg.ramp_alpha_min), 1.0 / n)
        if cfg.adaptive_alpha:
            alpha = (1.0 - lam) * alpha + lam
        out_age[...] = n
    else:
        alpha = jnp.float32(cfg.ema_alpha)
        if cfg.adaptive_alpha:
            lam = lam_ref[...]
            alpha = (1.0 - lam) * alpha + lam
    blend_r = acc_r * (1.0 - alpha) + fil_r[...] * alpha
    blend_g = acc_g * (1.0 - alpha) + fil_g[...] * alpha
    blend_b = acc_b * (1.0 - alpha) + fil_b[...] * alpha
    out_r[...] = jnp.where(first, fil_r[...], blend_r)
    out_g[...] = jnp.where(first, fil_g[...], blend_g)
    out_b[...] = jnp.where(first, fil_b[...], blend_b)


def temporal_blend_pallas(
    filtered, prev_image, prev_y, prev_x, frame_idx, lam, cfg, interpret=False,
    prev_age=None, prev_vis=None, cur_vis=None,
):
    """Drop-in for ops.atrous.temporal_accumulate_at on the Pallas frame
    path. Three-way routed under one jit:

      * identity backprojection (static view): aligned read, no gather;
      * deltas within the (REPROJ_DY, REPROJ_DX) window (the interactive
        orbit/walk case): the windowed Pallas kernel above;
      * anything larger (cuts): the XLA gather (correct at any delta).

    With ``prev_age``/``prev_vis``/``cur_vis`` (cfg.accumulation_ramp):
    the SVGF accumulation ramp's age plane rides the same three-way
    routing (the windowed kernel gathers it through the halo window and
    computes the per-pixel alpha in-kernel); returns ((H, W, 3), age)
    instead of just the image. Numerics match ops.atrous.accumulate_age +
    temporal_accumulate_at op-for-op.
    """
    h, w = prev_y.shape
    ramp = prev_age is not None
    if isinstance(filtered, tuple):
        fil_r, fil_g, fil_b = filtered
    else:
        fil_r, fil_g, fil_b = (
            filtered[..., 0], filtered[..., 1], filtered[..., 2],
        )
    prev_r = prev_image[..., 0]
    prev_g = prev_image[..., 1]
    prev_b = prev_image[..., 2]

    own_y = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    own_x = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    dy = prev_y - own_y
    dx = prev_x - own_x
    aligned = jnp.all((dy == 0) & (dx == 0))
    small = jnp.all(
        (jnp.abs(dy) <= REPROJ_DY) & (jnp.abs(dx) <= REPROJ_DX)
    )

    def xla_reproj(_):
        img = jnp.stack([prev_r, prev_g, prev_b], axis=-1)[prev_y, prev_x]
        return img[..., 0], img[..., 1], img[..., 2]

    def window_reproj(_):
        padded_w = _round_up(w + 2 * _BL_PAD_C, 128)
        pads = lambda p: jnp.pad(
            p,
            ((_BL_PAD_R, _BL_PAD_R), (_BL_PAD_C, padded_w - w - _BL_PAD_C)),
            mode="edge",
        )
        grid = (h // _BL_ROWS, w // bw)
        rows = _BL_ROWS + 2 * _BL_PAD_R
        kernel = functools.partial(_blend_kernel, cfg=cfg, ramp=ramp)
        iparams = jnp.asarray(frame_idx, jnp.int32).reshape(1)
        tile = pl.BlockSpec((_BL_ROWS, bw), lambda i, j: (i, j))
        n_hist = 5 if ramp else 3
        n_out = 4 if ramp else 3
        hist = [pads(prev_r), pads(prev_g), pads(prev_b)]
        tiles = [fil_r, fil_g, fil_b, prev_y, prev_x]
        lam_in = (
            lam
            if (cfg.adaptive_alpha or ramp)
            else jnp.zeros_like(fil_r)
        )
        tiles.append(lam_in)
        if ramp:
            hist += [pads(prev_age), pads(prev_vis)]
            tiles.append(cur_vis)
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pl.ANY)] * n_hist
            + [tile] * len(tiles),
            out_specs=[tile] * n_out,
            out_shape=[jax.ShapeDtypeStruct((h, w), jnp.float32)] * n_out,
            scratch_shapes=[
                pltpu.VMEM((n_hist, rows, bw + 2 * _BL_PAD_C), jnp.float32),
                pltpu.SemaphoreType.DMA((n_hist,)),
            ],
            interpret=interpret,
        )(iparams, *hist, *tiles)
        return tuple(outs)

    # slab width: largest lane-aligned divisor of w (1920 -> 384, 512 -> 512)
    bw = next(
        (c for c in (512, 384, 256, 128) if w % c == 0), None
    )
    kernel_supported = h % _BL_ROWS == 0 and bw is not None

    def blend(reproj, reproj_age=None, reproj_vis=None):
        """XLA blend (op-for-op ops.atrous.temporal_accumulate_at). With
        ramp: age accumulation from the pre-gathered planes, per-pixel
        alpha; returns a 4-tuple either way (age slot zeros when off)."""
        rr, rg, rb = reproj
        from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops import (
            atrous as atrous_xla,
        )

        if ramp:
            age = atrous_xla.accumulate_age(
                prev_age, prev_y, prev_x, lam, frame_idx, cfg,
                reproj=reproj_age, cur_vis=cur_vis, reproj_vis=reproj_vis,
            )
            alpha = atrous_xla.ramp_alpha(age, lam, cfg)[..., 0]
        else:
            age = jnp.zeros_like(fil_r)
            alpha = jnp.float32(cfg.ema_alpha)
            if cfg.adaptive_alpha:
                alpha = (1.0 - lam) * alpha + lam
        out_r = rr * (1.0 - alpha) + fil_r * alpha
        out_g = rg * (1.0 - alpha) + fil_g * alpha
        out_b = rb * (1.0 - alpha) + fil_b * alpha
        first = frame_idx <= 0
        return (
            jnp.where(first, fil_r, out_r),
            jnp.where(first, fil_g, out_g),
            jnp.where(first, fil_b, out_b),
            age,
        )

    def blend_aligned(_):
        return blend(
            (prev_r, prev_g, prev_b),
            reproj_age=prev_age, reproj_vis=prev_vis,
        )

    def blend_gather(_):
        return blend(
            xla_reproj(None),
            reproj_age=prev_age[prev_y, prev_x] if ramp else None,
            reproj_vis=prev_vis[prev_y, prev_x] if ramp else None,
        )

    if not kernel_supported:
        out = jax.lax.cond(aligned, blend_aligned, blend_gather, None)
    else:
        def fast(_):
            return jax.lax.cond(small, window_reproj_4, blend_gather, None)

        def window_reproj_4(_):
            outs = window_reproj(None)
            if ramp:
                return outs
            return outs + (jnp.zeros_like(fil_r),)

        out = jax.lax.cond(aligned, blend_aligned, fast, None)
    r, g, b, age = out
    rgb = jnp.stack([r, g, b], axis=-1)
    if ramp:
        return rgb, age
    return rgb


def supported(h: int, w: int, cfg) -> bool:
    """The kernel needs 8-aligned slabs and strides within the fixed halo."""
    return h % TILE_ROWS == 0 and cfg.wavelet_iterations <= PAD_ROWS


def atrous_filter_pallas(color, normal, depth, cfg, interpret=False):
    """All wavelet iterations (strides 1..n). ``color`` (H, W, 3) or a tuple
    of 3 planes; ``normal`` likewise; ``depth`` (H, W). Returns (H, W, 3).

    Falls back to the XLA filter when the shape is unsupported.
    """
    if isinstance(color, tuple):
        cr, cg, cb = color
    else:
        cr, cg, cb = color[..., 0], color[..., 1], color[..., 2]
    if isinstance(normal, tuple):
        nx, ny, nz = normal
    else:
        nx, ny, nz = normal[..., 0], normal[..., 1], normal[..., 2]
    h, w = cr.shape

    if not supported(h, w, cfg):
        from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.atrous import (
            atrous_filter,
        )

        color_img = jnp.stack([cr, cg, cb], axis=-1)
        normal_img = jnp.stack([nx, ny, nz], axis=-1)
        return atrous_filter(color_img, normal_img, depth, cfg)

    padded_w = _round_up(w + 2 * PAD_COLS, 128)
    nx_p, ny_p, nz_p = (
        _pad_plane(nx, padded_w),
        _pad_plane(ny, padded_w),
        _pad_plane(nz, padded_w),
    )
    dd_p = _pad_plane(depth, padded_w)

    grid = (h // TILE_ROWS,)
    rows = TILE_ROWS + 2 * PAD_ROWS
    for k in range(1, cfg.wavelet_iterations + 1):
        kernel = functools.partial(_iter_kernel, k=k, cfg=cfg, width=w)
        cr_p = _pad_plane(cr, padded_w)
        cg_p = _pad_plane(cg, padded_w)
        cb_p = _pad_plane(cb, padded_w)
        cr, cg, cb = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 7,
            out_specs=[
                pl.BlockSpec((TILE_ROWS, w), lambda i: (i, 0)),
            ] * 3,
            out_shape=[jax.ShapeDtypeStruct((h, w), jnp.float32)] * 3,
            scratch_shapes=[
                pltpu.VMEM((7, rows, padded_w), jnp.float32),
                pltpu.SemaphoreType.DMA((7,)),
            ],
            interpret=interpret,
        )(cr_p, cg_p, cb_p, nx_p, ny_p, nz_p, dd_p)
    return jnp.stack([cr, cg, cb], axis=-1)
