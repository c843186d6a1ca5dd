"""The frame function: the whole reference frame as one pure jitted program.

The reference crosses the host/device boundary >= 16 times per frame with a
full queue drain each time (main.cpp:1090-1113; SURVEY.md section 3.2). The
TPU-native design collapses the four passes --

    visibility G-buffer -> temporal gradient -> path trace -> a-trous+EMA

-- into one XLA program over a History pytree: zero host round-trips, full
cross-pass fusion, and history buffers donated back in place.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from real_time_path_tracing_with_spatiotemporal_filtering_tpu.config import (
    RenderConfig,
)
from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops import (
    atrous,
    camera as cam_ops,
    gbuffer,
    gradient,
    multires,
    pathgrad,
    pathtrace,
)
from real_time_path_tracing_with_spatiotemporal_filtering_tpu.pipeline.history import (
    History,
)
from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene.scene import (
    Camera,
    Light,
    TriangleData,
)


def camera_matrices(camera, cfg: RenderConfig):
    """The reference's per-frame UBO matrices (main.cpp:1463-1475): the view
    (translate-only in the reference; general camera->world basis here) and
    glm::perspective(2*FOV) with the Vulkan y flip. Accepts a Camera or a
    bare (3,) position (identity rotation)."""
    if isinstance(camera, Camera):
        view = cam_ops.camera_view(camera.position, camera.rotation)
    else:
        view = cam_ops.reference_view(camera)
    proj = cam_ops.vulkan_perspective(
        cfg.fov * 2.0, cfg.width / cfg.height, cfg.near, cfg.far
    )
    return view, proj


_warned_fallback = False


def _warn_fallback_once(num_rows: int, cap: int) -> None:
    global _warned_fallback
    if _warned_fallback:
        return
    _warned_fallback = True
    import warnings

    warnings.warn(
        f"scene tables ({num_rows} rows) exceed the Pallas on-chip row cap "
        f"({cap}) and the scene carries no cluster hierarchy for HBM "
        "streaming (precompute_triangle_data builds one for concrete "
        "geometry); falling back to the dense O(pixels x triangles) XLA "
        "formulation, which is correct at any size but orders of magnitude "
        "slower. See device_info()['pallas_resident_row_cap'].",
        stacklevel=3,
    )


def _use_pallas(cfg: RenderConfig, tri_data=None) -> bool:
    if cfg.backend == "xla":
        return False
    if tri_data is not None:
        from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas import (
            pathtrace as pt_mod,
        )

        if not pt_mod.pallas_scene_supported(tri_data):
            rows = pt_mod._resident_table_rows(tri_data)
            cap = pt_mod.MAX_VMEM_TABLE_BYTES // pt_mod._VMEM_ROW_BYTES
            _warn_fallback_once(rows, cap)
            return False
    if cfg.backend == "pallas":
        return True
    return jax.default_backend() == "tpu"


def render_frame_impl(
    tri_data: TriangleData,
    camera: Camera,
    light: Light,
    history: History,
    cfg: RenderConfig,
    model=None,
):
    """One frame: (triangle tables, camera, light, history) -> (rgb, history').

    Pass order matches drawScene (main.cpp:1104-1110). Returns the final
    denoised image and the next frame's history. On TPU (cfg.backend) the
    G-buffer/gradient/backprojection run as one fused Pallas kernel and the
    path tracer as a Pallas megakernel; numerics match the XLA formulation
    (tests/test_pallas.py).

    ``model``: optional (4, 4) per-frame model matrix (the reference's
    UBO model slot, visibility.vert.glsl:22-24); applied in-graph to the
    static tables (scene.transform_triangle_data). History.lut then
    carries the previous frame's transformed vertices, so reprojection
    and the temporal gradient handle geometry motion exactly like the
    reference's modelPrev would (main.cpp:1465-1469).
    """
    if model is not None:
        from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene.scene import (
            transform_triangle_data,
        )

        tri_data = transform_triangle_data(tri_data, model)
    if _use_pallas(cfg, tri_data):
        return _render_frame_pallas(tri_data, camera, light, history, cfg)
    frame_idx = history.frame
    view, proj = camera_matrices(camera, cfg)

    # -- pass 1: visibility G-buffer (replaces visibility.{vert,geom,frag}) --
    gbuf = gbuffer.visibility_pass(
        tri_data, camera.position, view, proj, cfg, rotation=camera.rotation
    )
    lut = tri_data.lut  # static geometry: rebuilt-per-frame in the reference

    # -- pass 2: temporal gradient (temporalGradient.comp.glsl) --
    lam = gradient.temporal_gradient_pass(
        gbuf,
        lut,
        history.lut,
        camera.position,
        light.position,
        history.light_pos,
        light.color,
        history.light_color,
    )

    py = px = None
    if cfg.variance_guided or cfg.accumulation_ramp or cfg.path_gradient:
        py, px = atrous.backproject_pixels(
            gbuf, history.lut, history.view, history.proj, cfg
        )
    if cfg.path_gradient:
        # A-SVGF path-space gradient (config.py): re-trace last frame's
        # samples under the current light; max() with the Phong proxy
        # (disjoint blind spots -- see ops/pathgrad.py).
        lam = jnp.maximum(
            lam,
            pathgrad.path_gradient_pass(
                tri_data, light, frame_idx, cfg,
                history.noisy_lum, history.cam_pos, history.cam_rot,
                py, px, gbuf.visibility, history.visibility,
            ),
        )

    # -- pass 3: path trace (raytrace.comp.glsl) --
    normal_img = tri_data.lut_normals[gbuf.visibility.astype(jnp.int32)]
    primary = None
    if cfg.gbuffer_primary:
        # seed bounce 0 from the already-traced G-buffer (config.py):
        # the trace starts at segment 1
        primary = (
            gbuf.visibility,
            gbuf.world_pos,
            normal_img,
            atrous.albedo_image(tri_data, gbuf.visibility),
        )
    if cfg.indirect_split:
        # multi-res indirect (config.py): full-res truncated trace +
        # coarse full-length trace, G-buffer-guided upsample
        noisy = multires.multires_noisy_xla(
            tri_data, camera.position, light, frame_idx, cfg,
            normal_img, gbuf.depth, rotation=camera.rotation,
            primary=primary,
        )
    else:
        noisy = pathtrace.path_trace_pass(
            tri_data, camera.position, light, frame_idx, cfg,
            rotation=camera.rotation, primary=primary,
        )
    noisy_lum = atrous.luminance(noisy) if cfg.path_gradient else None
    if cfg.firefly_clamp:
        # after noisy_lum: the gradient's stored luminance must stay
        # stream-exact vs the (unclamped) re-trace (ops/pathgrad.py)
        noisy = jnp.minimum(noisy, jnp.float32(cfg.firefly_clamp))

    # -- pass 4: a-trous filter + temporal EMA (temporalFiltering.comp.glsl) --
    if cfg.demodulate_albedo:
        # SVGF extension: filter irradiance, not radiance (config.py) --
        # history is carried demodulated; display re-modulates at the end
        demod_s = atrous.demod_scale(
            atrous.albedo_image(tri_data, gbuf.visibility), cfg
        )
        noisy = atrous.demodulate(noisy, demod_s)
    age = None
    cls_cur = None
    if cfg.accumulation_ramp:
        # SVGF accumulation ramp (config.py): per-pixel history length,
        # reprojected like the color history; reset by the temporal
        # gradient (shading change) or a surface-consistency mismatch
        # (disocclusion / camera cut -- SVGF's G-buffer consistency test;
        # exact primitive ids or quantized normals per ramp_reset_mode).
        if cfg.ramp_reset_mode == "normal":
            cls_cur = atrous.normal_class(normal_img, gbuf.visibility)
            age = atrous.accumulate_age(
                history.age, py, px, lam, frame_idx, cfg,
                prev_vis=history.vis_class, cur_vis=cls_cur,
            )
        else:
            age = atrous.accumulate_age(
                history.age, py, px, lam, frame_idx, cfg,
                prev_vis=history.visibility, cur_vis=gbuf.visibility,
            )
    if cfg.variance_guided:
        # SVGF extension (config.py): moments reprojected with the same
        # backprojection as the color history, variance-normalized w_l.
        moments, var = atrous.accumulate_moments(
            atrous.luminance(noisy), history.moments, py, px, frame_idx, cfg
        )
        filtered, _ = atrous.atrous_filter_var(
            noisy, var, normal_img, gbuf.depth, cfg
        )
        rgb = atrous.temporal_accumulate_at(
            filtered, history.image, py, px, frame_idx, lam, cfg, age=age
        )
    else:
        moments = None
        filtered = atrous.atrous_filter(noisy, normal_img, gbuf.depth, cfg)
        if cfg.accumulation_ramp:
            rgb = atrous.temporal_accumulate_at(
                filtered, history.image, py, px, frame_idx, lam, cfg,
                age=age,
            )
        else:
            rgb = atrous.temporal_accumulate(
                filtered,
                history.image,
                gbuf,
                history.lut,
                history.view,
                history.proj,
                frame_idx,
                lam,
                cfg,
            )

    # -- history commit (the reference's end-of-frame blits, main.cpp:1361-72)
    new_history = History(
        image=rgb,
        visibility=gbuf.visibility,
        lut=lut,
        view=view,
        proj=proj,
        light_pos=light.position,
        light_color=light.color,
        frame=frame_idx + 1,
        moments=moments,
        age=age,
        vis_class=cls_cur,
        noisy_lum=noisy_lum,
        cam_pos=jnp.asarray(camera.position) if cfg.path_gradient else None,
        cam_rot=jnp.asarray(camera.rotation) if cfg.path_gradient else None,
    )
    if cfg.demodulate_albedo:
        # display radiance; history stays demodulated
        return atrous.modulate(rgb, demod_s), new_history
    return rgb, new_history


def _render_frame_pallas(tri_data, camera, light, history, cfg: RenderConfig):
    """Pallas-kernel frame: fused geometry pass + path-trace megakernel;
    filter and EMA blend in XLA (the gathers they needed are precomputed
    by the geometry kernel)."""
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas import (
        atrous as atrous_pl,
        geometry as geo_mod,
        pathtrace as pt_mod,
    )

    interpret = jax.default_backend() != "tpu"
    frame_idx = history.frame
    view, proj = camera_matrices(camera, cfg)

    geo = geo_mod.geometry_pass_pallas(
        tri_data, history.lut, camera.position,
        light.position, history.light_pos, light.color, history.light_color,
        view, proj, history.view, history.proj, cfg,
        interpret=interpret, planar=True, rotation=camera.rotation,
        emit_albedo=cfg.demodulate_albedo or cfg.gbuffer_primary,
    )
    prim_img = None
    if cfg.gbuffer_primary:
        # full-res G-buffer attribute planes seeding bounce 0 (config.py)
        prim_img = (
            (geo.visibility,)
            + tuple(geo.world_pos)
            + tuple(geo.normal)
            + tuple(geo.albedo)
        )
    if pt_mod.trace_needs_streaming(tri_data):
        # beyond-SMEM scenes: wavefront tracer (per-segment kernels +
        # global ray sorting beats the streamed megakernel ~2x at 8k tris,
        # more at scale -- sorted tiles make bounce-ray culling work)
        from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas import (
            wavefront as wf_mod,
        )

        if cfg.indirect_split:
            # multi-res indirect (config.py): full-res truncated trace +
            # coarse full-length trace, G-buffer-guided upsample
            noisy = multires.multires_noisy_wavefront(
                tri_data, camera.position, light, frame_idx, cfg,
                geo.normal, geo.depth, rotation=camera.rotation,
                interpret=interpret, primary=prim_img,
            )
        else:
            noisy = wf_mod.path_trace_wavefront(
                tri_data, camera.position, light, frame_idx, cfg,
                interpret=interpret, planar=True, rotation=camera.rotation,
                primary_from=(
                    tuple(p.reshape(-1) for p in prim_img)
                    if prim_img is not None else None
                ),
            )
    else:
        if cfg.gbuffer_primary:
            # The SMEM-resident megakernel traces all bounces in one
            # launch; there is no separate bounce-0 segment for the
            # G-buffer seed to delete. Small scenes don't need it --
            # use backend="xla" to exercise the flag there.
            raise ValueError(
                "gbuffer_primary requires an HBM-streamed scene on the "
                "Pallas backend (the SMEM megakernel has no per-segment "
                "cost to save); use backend='xla' or a clustered scene"
            )
        if cfg.indirect_split:
            # SMEM-resident scenes trace all bounces in one megakernel
            # launch -- there is no per-segment cost for the split to
            # save, and the truncated-trace plumbing does not exist there.
            # Use backend="xla" to exercise the flag on small scenes.
            raise ValueError(
                "indirect_split requires an HBM-streamed scene on the "
                "Pallas backend (SMEM-resident scenes gain nothing from "
                "the split); use backend='xla' or a clustered scene"
            )
        noisy = pt_mod.path_trace_pass_pallas(
            tri_data, camera.position, light, frame_idx, cfg,
            interpret=interpret, planar=True, rotation=camera.rotation,
        )
    noisy_lum = atrous.luminance_planes(*noisy) if cfg.path_gradient else None
    if cfg.firefly_clamp:
        noisy = tuple(
            jnp.minimum(c, jnp.float32(cfg.firefly_clamp)) for c in noisy
        )
    lam_plane = geo.lam
    if cfg.path_gradient:
        if pt_mod.trace_needs_streaming(tri_data):
            # HBM-streamed scenes: the stratum re-trace (1/stratum^2 of a
            # 1-spp trace) routes through the wavefront tracer's
            # explicit-pixel twin -- bitwise identical to the dense XLA
            # tracer, affordable at any scene size.
            from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas import (
                wavefront as wf_mod,
            )

            trace_fn = functools.partial(
                wf_mod.trace_pixels_wavefront, interpret=interpret
            )
        else:
            trace_fn = None
        lam_plane = jnp.maximum(
            lam_plane,
            pathgrad.path_gradient_pass(
                tri_data, light, frame_idx, cfg,
                history.noisy_lum, history.cam_pos, history.cam_rot,
                geo.prev_y, geo.prev_x, geo.visibility,
                history.visibility, trace_fn=trace_fn,
            ),
        )
    if cfg.demodulate_albedo:
        demod_s = atrous.demod_scale(geo.albedo, cfg)
        noisy = tuple(atrous.demodulate(c, demod_s) for c in noisy)
    if cfg.variance_guided:
        moments, var = atrous.accumulate_moments(
            atrous.luminance_planes(*noisy), history.moments,
            geo.prev_y, geo.prev_x, frame_idx, cfg,
        )
        filtered, _ = atrous_pl.atrous_filter_var_pallas(
            noisy, var, geo.normal, geo.depth, cfg, interpret=interpret
        )
    else:
        moments = None
        filtered = atrous_pl.atrous_filter_pallas(
            noisy, geo.normal, geo.depth, cfg, interpret=interpret
        )
    cls_cur = None
    if cfg.accumulation_ramp:
        # the age/visibility planes ride the windowed blend kernel's halo
        # window (per-pixel ramp alpha computed in-kernel), so ramp mode
        # keeps the moving-camera blend off the ~13 ms XLA gather. The
        # consistency planes are raw ids or quantized-normal classes per
        # cfg.ramp_reset_mode (the kernel only tests equality).
        if cfg.ramp_reset_mode == "normal":
            cls_cur = atrous.normal_class(geo.normal, geo.visibility)
            prev_cons, cur_cons = history.vis_class, cls_cur
        else:
            prev_cons, cur_cons = history.visibility, geo.visibility
        rgb, age = atrous_pl.temporal_blend_pallas(
            filtered, history.image, geo.prev_y, geo.prev_x, frame_idx,
            lam_plane, cfg, interpret=interpret,
            prev_age=history.age, prev_vis=prev_cons,
            cur_vis=cur_cons,
        )
    else:
        age = None
        rgb = atrous_pl.temporal_blend_pallas(
            filtered, history.image, geo.prev_y, geo.prev_x, frame_idx,
            lam_plane, cfg, interpret=interpret,
        )
    new_history = History(
        image=rgb,
        visibility=geo.visibility,
        lut=tri_data.lut,
        view=view,
        proj=proj,
        light_pos=light.position,
        light_color=light.color,
        frame=frame_idx + 1,
        moments=moments,
        age=age,
        vis_class=cls_cur,
        noisy_lum=noisy_lum,
        cam_pos=jnp.asarray(camera.position) if cfg.path_gradient else None,
        cam_rot=jnp.asarray(camera.rotation) if cfg.path_gradient else None,
    )
    if cfg.demodulate_albedo:
        # display radiance; history stays demodulated
        return atrous.modulate(rgb, demod_s), new_history
    return rgb, new_history


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("history",))
def render_frame(tri_data, camera, light, history, cfg, model=None):
    """Jitted :func:`render_frame_impl`; history buffers are donated so XLA
    reuses them in place (the functional analogue of the reference's
    ping-pong blits)."""
    return render_frame_impl(tri_data, camera, light, history, cfg, model)


def init_history(tri_data: TriangleData, cfg: RenderConfig) -> History:
    """Frame-0 history.

    Previous matrices start equal to the current ones (main.cpp:486-489);
    the image/visibility planes start at zero (frame 0 skips blending,
    temporalFiltering.comp.glsl:251-259, so their values never leak). The
    previous LUT starts as the current LUT -- the reference leaves that
    buffer uninitialized on frame 0 (it is only copied at end-of-frame,
    main.cpp:1370-1372) and nothing consumes it before frame 1.
    """
    camera = Camera.default()
    light = Light.default()
    view, proj = camera_matrices(camera.position, cfg)
    return History(
        image=jnp.zeros((cfg.height, cfg.width, 3), jnp.float32),
        visibility=jnp.zeros((cfg.height, cfg.width), jnp.float32),
        # copy=True: the history is donated to the jitted frame, so it must
        # not alias the (non-donated) tri_data.lut buffer.
        lut=jnp.array(tri_data.lut, copy=True),
        view=view,
        proj=proj,
        light_pos=light.position,
        light_color=light.color,
        frame=jnp.zeros((), jnp.int32),
        moments=(
            jnp.zeros((cfg.height, cfg.width, 2), jnp.float32)
            if cfg.variance_guided
            else None
        ),
        age=(
            jnp.zeros((cfg.height, cfg.width), jnp.float32)
            if cfg.accumulation_ramp
            else None
        ),
        vis_class=(
            jnp.zeros((cfg.height, cfg.width), jnp.float32)
            if cfg.accumulation_ramp and cfg.ramp_reset_mode == "normal"
            else None
        ),
        noisy_lum=(
            jnp.zeros((cfg.height, cfg.width), jnp.float32)
            if cfg.path_gradient
            else None
        ),
        cam_pos=jnp.asarray(camera.position) if cfg.path_gradient else None,
        cam_rot=jnp.asarray(camera.rotation) if cfg.path_gradient else None,
    )
