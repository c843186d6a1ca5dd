"""Pallas kernels vs the XLA reference formulation (interpret mode on CPU)."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from real_time_path_tracing_with_spatiotemporal_filtering_tpu.config import (
    RenderConfig,
)
from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops import (
    atrous,
    gbuffer,
    gradient,
    pathtrace,
)
from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas.geometry import (
    geometry_pass_pallas,
)
from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas.pathtrace import (
    path_trace_pass_pallas,
    visibility_pass_pallas,
)
from real_time_path_tracing_with_spatiotemporal_filtering_tpu.pipeline import (
    frame as frame_mod,
)
from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene.scene import (
    Camera,
    Light,
)

CFG = RenderConfig(width=64, height=48, max_bounces=8)


def test_pathtrace_kernel_matches_xla(cornell_tri_data):
    cam, light = Camera.default(), Light.default()
    ref = np.asarray(
        pathtrace.path_trace_pass(
            cornell_tri_data, cam.position, light, jnp.int32(2), CFG
        )
    )
    pal = np.asarray(
        path_trace_pass_pallas(
            cornell_tri_data, cam.position, light, jnp.int32(2), CFG,
            interpret=True,
        )
    )
    # identical RNG streams; only the hit-position formulation differs
    # (o + t*d vs barycentric recombination, ~1e-6)
    assert np.abs(ref - pal).max() < 1e-4


def test_visibility_kernel_matches_xla(cornell_tri_data):
    cam = Camera.default()
    view, proj = frame_mod.camera_matrices(cam.position, CFG)
    ref = gbuffer.visibility_pass(cornell_tri_data, cam.position, view, proj, CFG)
    pal = visibility_pass_pallas(
        cornell_tri_data, cam.position, view, proj, CFG, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(ref.visibility), np.asarray(pal.visibility)
    )
    np.testing.assert_allclose(
        np.asarray(ref.depth), np.asarray(pal.depth), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ref.world_pos), np.asarray(pal.world_pos), atol=1e-4
    )


def test_geometry_kernel_matches_xla_passes(cornell_tri_data):
    cam, light = Camera.default(), Light.default()
    light_prev_pos = light.position + jnp.array([0.5, 0.0, 0.0])
    view, proj = frame_mod.camera_matrices(cam.position, CFG)
    view_prev, proj_prev = frame_mod.camera_matrices(
        cam.position + jnp.array([0.0, 0.0, 0.5]), CFG
    )
    lut_prev = cornell_tri_data.lut  # static geometry

    geo = geometry_pass_pallas(
        cornell_tri_data, lut_prev, cam.position,
        light.position, light_prev_pos, light.color, light.color * 0.5,
        view, proj, view_prev, proj_prev, CFG, interpret=True,
    )

    ref_g = gbuffer.visibility_pass(cornell_tri_data, cam.position, view, proj, CFG)
    np.testing.assert_array_equal(
        np.asarray(geo.visibility), np.asarray(ref_g.visibility)
    )
    np.testing.assert_allclose(
        np.asarray(geo.depth), np.asarray(ref_g.depth), atol=1e-5
    )

    # normals: slot-0 sentinel + per-tri unit normals
    prim = np.asarray(ref_g.visibility).astype(np.int32)
    ref_n = np.asarray(cornell_tri_data.lut_normals)[prim]
    np.testing.assert_allclose(np.asarray(geo.normal), ref_n, atol=1e-5)

    ref_lam = gradient.temporal_gradient_pass(
        ref_g, cornell_tri_data.lut, lut_prev, cam.position,
        light.position, light_prev_pos, light.color, light.color * 0.5,
    )
    np.testing.assert_allclose(
        np.asarray(geo.lam), np.asarray(ref_lam), atol=2e-4
    )

    ref_py, ref_px = atrous.backproject_pixels(
        ref_g, lut_prev, view_prev, proj_prev, CFG
    )
    # truncation can differ by 1 pixel where the float coordinate sits on
    # an integer boundary (hit-position epsilon); allow that on <1% of pixels
    dy = np.abs(np.asarray(geo.prev_y) - np.asarray(ref_py))
    dx = np.abs(np.asarray(geo.prev_x) - np.asarray(ref_px))
    assert (dy > 0).mean() < 0.01 and dy.max() <= 1
    assert (dx > 0).mean() < 0.01 and dx.max() <= 1


def test_pallas_frame_matches_xla_frame(cornell_tri_data):
    cfg_x = dataclasses.replace(CFG, backend="xla")
    cfg_p = dataclasses.replace(CFG, backend="pallas")
    cam, light = Camera.default(), Light.default()

    hist_x = frame_mod.init_history(cornell_tri_data, cfg_x)
    hist_p = frame_mod.init_history(cornell_tri_data, cfg_p)
    for i in range(3):
        # move light so the gradient/backprojection paths are nontrivial
        light = dataclasses.replace(
            light, position=light.position + jnp.array([0.1, 0.0, 0.0])
        )
        rgb_x, hist_x = frame_mod.render_frame_impl(
            cornell_tri_data, cam, light, hist_x, cfg_x
        )
        rgb_p, hist_p = frame_mod.render_frame_impl(
            cornell_tri_data, cam, light, hist_p, cfg_p
        )
    diff = np.abs(np.asarray(rgb_x) - np.asarray(rgb_p))
    assert diff.max() < 1e-3


def test_pallas_frame_odd_resolution(cornell_tri_data):
    """Non-tile-aligned sizes: path trace pads, a-trous falls back to XLA
    when rows aren't slab-aligned; results must match the XLA frame."""
    cfg_p = dataclasses.replace(
        CFG, width=101, height=75, backend="pallas", wavelet_iterations=3,
        max_bounces=6,
    )
    cfg_x = dataclasses.replace(cfg_p, backend="xla")
    cam, light = Camera.default(), Light.default()
    hist_p = frame_mod.init_history(cornell_tri_data, cfg_p)
    hist_x = frame_mod.init_history(cornell_tri_data, cfg_x)
    rgb_p, _ = frame_mod.render_frame_impl(cornell_tri_data, cam, light, hist_p, cfg_p)
    rgb_x, _ = frame_mod.render_frame_impl(cornell_tri_data, cam, light, hist_x, cfg_x)
    assert np.abs(np.asarray(rgb_p) - np.asarray(rgb_x)).max() < 1e-3


def test_clustered_pathtrace_matches_xla():
    """Scenes above CLUSTER_MIN_PAIRS use Morton-cluster AABB culling in
    the bounce loop; results must match the flat XLA tracer."""
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene import (
        procedural,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene.scene import (
        Scene,
        precompute_triangle_data,
    )

    cfg = dataclasses.replace(CFG, max_bounces=6)
    scene = Scene.from_arrays(*procedural.subdivided_cornell(2))
    td = precompute_triangle_data(scene)
    assert td.cluster_aabbs is not None  # clustering active
    cam, light = Camera.default(), Light.default()
    ref = np.asarray(
        pathtrace.path_trace_pass(td, cam.position, light, jnp.int32(2), cfg)
    )
    pal = np.asarray(
        path_trace_pass_pallas(
            td, cam.position, light, jnp.int32(2), cfg, interpret=True
        )
    )
    assert np.abs(ref - pal).max() < 1e-3


def test_stream_tables_bitwise_parity():
    """Experimental streaming mode (HBM tables, per-cluster DMA) must be
    bit-identical to the on-chip table path."""
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene import (
        procedural,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene.scene import (
        Scene,
        precompute_triangle_data,
    )

    cfg = dataclasses.replace(CFG, width=48, height=32, max_bounces=5)
    scene = Scene.from_arrays(*procedural.subdivided_cornell(6))
    td = precompute_triangle_data(scene)
    assert td.cluster_aabbs is not None
    cam, light = Camera.default(), Light.default()
    ref = np.asarray(
        path_trace_pass_pallas(
            td, cam.position, light, jnp.int32(2), cfg, interpret=True
        )
    )
    stm = np.asarray(
        path_trace_pass_pallas(
            td, cam.position, light, jnp.int32(2), cfg, interpret=True,
            stream_tables=True,
        )
    )
    np.testing.assert_array_equal(ref, stm)


def test_greedy_pairing_matches_sequential_oracle():
    """_greedy_adjacent_pairs (vectorized) vs the round-1 sequential scan."""
    import numpy as np

    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas.pathtrace import (
        _greedy_adjacent_pairs,
    )

    rng = np.random.default_rng(7)
    for trial in range(200):
        num = int(rng.integers(1, 40))
        m = rng.random(num - 1) < 0.5 if num > 1 else np.zeros((0,), bool)
        # sequential greedy oracle
        oracle = []
        i = 0
        while i < num:
            if i + 1 < num and m[i]:
                oracle.append((i, i + 1))
                i += 2
            else:
                oracle.append((i, i))
                i += 1
        got = _greedy_adjacent_pairs(m)
        assert [tuple(r) for r in got] == oracle, (num, m)


def test_numpy_prep_matches_jax_tables():
    """The large-scene numpy table build matches the jax build to 1 ulp and
    produces identical pairing/cluster decisions."""
    import numpy as np

    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops import (
        shading,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.intersect import (
        build_triangle_planes,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene import (
        procedural,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene.scene import (
        Scene,
        _base_tables_np,
    )

    sc = Scene.from_arrays(*procedural.subdivided_cornell(4))
    tris = sc.triangles
    pj = build_triangle_planes(tris)
    nj = pj.n / jnp.linalg.norm(pj.n, axis=-1, keepdims=True)
    aj = shading.albedo_from_normal(nj)
    pn, nn, an, lut, lutn = _base_tables_np(np.asarray(tris))
    for f in pj._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(pj, f)), getattr(pn, f), rtol=1e-6, atol=1e-6
        )
    np.testing.assert_allclose(np.asarray(nj), nn, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(aj), an)  # thresholded: exact
    np.testing.assert_array_equal(np.asarray(tris), lut[1:])


def test_geometry_clustered_matches_dense():
    """The clustered+streamed geometry kernel (HBM table, per-visited-
    cluster DMA, fused vertex select) must match the dense kernel exactly
    on every output plane."""
    import dataclasses as dc

    import jax

    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas import (
        geometry as geo_mod,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.pipeline import (
        frame as frame_mod,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene import (
        procedural,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene.scene import (
        Camera,
        Light,
        Scene,
        precompute_triangle_data,
    )

    cfg = dataclasses.replace(CFG, width=64, height=48)
    td = precompute_triangle_data(
        Scene.from_arrays(*procedural.subdivided_cornell(12))
    )
    assert td.geo_static is not None  # above GEO_CLUSTER_MIN_TRIS
    td_dense = dc.replace(
        td, geo_static=None, geo_perm=None,
        geo_cluster_aabbs=None, geo_super_aabbs=None,
    )
    cam, light = Camera.default(), Light.default()
    view, proj = frame_mod.camera_matrices(cam, cfg)
    args = (
        td.lut, cam.position, light.position, light.position,
        light.color, light.color, view, proj, view, proj, cfg,
    )
    g_clustered = geo_mod.geometry_pass_pallas(td, *args, interpret=True)
    g_dense = geo_mod.geometry_pass_pallas(td_dense, *args, interpret=True)
    for f in g_dense._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(g_dense, f)),
            np.asarray(getattr(g_clustered, f)),
            err_msg=f,
        )


def test_streaming_routing():
    """Scenes beyond the resident cap route to streaming (not XLA) when the
    cluster hierarchy exists; trace_needs_streaming flags exactly them."""
    import types

    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas.pathtrace import (
        pallas_scene_supported,
        trace_needs_streaming,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene import (
        procedural,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene.scene import (
        Scene,
        precompute_triangle_data,
    )

    small = precompute_triangle_data(
        Scene.from_arrays(*procedural.subdivided_cornell(4))
    )
    assert pallas_scene_supported(small)
    assert not trace_needs_streaming(small)  # 272 pairs: SMEM-resident

    td = precompute_triangle_data(
        Scene.from_arrays(*procedural.subdivided_cornell(12))
    )
    assert pallas_scene_supported(td)
    # 2.4k pairs outgrow the SMEM-resident budget: streamed (HBM tables
    # beat a VMEM-resident copy -- scalar reads are 2x cheaper from SMEM)
    assert trace_needs_streaming(td)

    big = types.SimpleNamespace(
        normals=np.zeros((400_000, 3), np.float32),
        pair_table=np.zeros((200_000, 26), np.float32),
        cluster_aabbs=np.zeros((3125, 6), np.float32),
        geo_static=np.zeros((400_000, 31), np.float32),
    )
    assert trace_needs_streaming(big)
    assert pallas_scene_supported(big)  # streams instead of XLA fallback


def test_wavefront_matches_megakernel():
    """The wavefront tracer (per-segment kernels + ray sorting) must match
    the megakernel on a streamed scene: same PCG streams, same shading,
    different ray order. Agreement is to 1 ulp (XLA may fuse the ray-gen
    arithmetic differently across the two programs; observed: 2 values in
    4608 off by 6e-8)."""
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas.wavefront import (
        path_trace_wavefront,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene import (
        procedural,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene.scene import (
        Scene,
        precompute_triangle_data,
    )

    cfg = dataclasses.replace(CFG, width=48, height=32, max_bounces=6)
    td = precompute_triangle_data(
        Scene.from_arrays(*procedural.subdivided_cornell(6))
    )
    assert td.cluster_aabbs is not None
    cam, light = Camera.default(), Light.default()
    mega = np.asarray(
        path_trace_pass_pallas(
            td, cam.position, light, jnp.int32(2), cfg, interpret=True,
            stream_tables=True,
        )
    )
    wf = np.asarray(
        path_trace_wavefront(
            td, cam.position, light, jnp.int32(2), cfg, interpret=True
        )
    )
    np.testing.assert_allclose(mega, wf, rtol=0, atol=1e-6)


def test_wavefront_spp_batches():
    """Multi-sample/multi-batch averaging matches the megakernel."""
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas.wavefront import (
        path_trace_wavefront,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene import (
        procedural,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene.scene import (
        Scene,
        precompute_triangle_data,
    )

    cfg = dataclasses.replace(
        CFG, width=48, height=32, max_bounces=4, spp=2, sample_batches=2
    )
    td = precompute_triangle_data(
        Scene.from_arrays(*procedural.subdivided_cornell(6))
    )
    cam, light = Camera.default(), Light.default()
    mega = np.asarray(
        path_trace_pass_pallas(
            td, cam.position, light, jnp.int32(3), cfg, interpret=True,
            stream_tables=True,
        )
    )
    wf = np.asarray(
        path_trace_wavefront(
            td, cam.position, light, jnp.int32(3), cfg, interpret=True
        )
    )
    np.testing.assert_allclose(mega, wf, rtol=1e-6, atol=1e-6)


def test_wavefront_exit_clamp_open_scene():
    """Wavefront vs megakernel on a scene where rays MISS: the wavefront's
    per-lane scene-exit clamp on the initial best (DESIGN_ROUND3 section 2)
    changes which clusters get row-tested for missing rays but can never
    change a committed hit (any hit point lies inside the scene AABB, so
    t_hit <= t_exit with margin). The megakernel carries no clamp, so
    agreement here pins the clamp's correctness."""
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas.wavefront import (
        path_trace_wavefront,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene import (
        procedural,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene.scene import (
        Scene,
        precompute_triangle_data,
    )

    cfg = dataclasses.replace(CFG, width=48, height=32, max_bounces=5)
    td = precompute_triangle_data(
        Scene.from_arrays(*procedural.random_soup(600, seed=3, extent=2.0))
    )
    assert td.cluster_aabbs is not None
    cam, light = Camera.default(), Light.default()
    mega = np.asarray(
        path_trace_pass_pallas(
            td, cam.position, light, jnp.int32(5), cfg, interpret=True,
            stream_tables=True,
        )
    )
    wf = np.asarray(
        path_trace_wavefront(
            td, cam.position, light, jnp.int32(5), cfg, interpret=True
        )
    )
    np.testing.assert_allclose(mega, wf, rtol=0, atol=1e-6)


def test_wavefront_hdr_lanes_bit_parity():
    """The lane-parallel sub-block header walk (transposed header block,
    split hdr/rows DMA, ONE interval-bundle slab test over all nsub
    sub-blocks) must be bit-identical to the row-major per-sub-block walk:
    the bundle test is a conservative superset (every sub-block any exact
    per-lane test would run also passes), and extra rows never change a
    committed hit. Covered on a closed scene, an open soup (miss-heavy:
    exercises the mixed-sign direction intervals), and with NEE shadow
    walks (a second traversal with a capped initial best)."""
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas.wavefront import (
        path_trace_wavefront,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene import (
        procedural,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene.scene import (
        Scene,
        precompute_triangle_data,
    )

    closed = precompute_triangle_data(
        Scene.from_arrays(*procedural.subdivided_cornell(6))
    )
    soup = precompute_triangle_data(
        Scene.from_arrays(*procedural.random_soup(600, seed=3, extent=2.0))
    )
    cam, light = Camera.default(), Light.default()
    cases = [
        (closed, dataclasses.replace(CFG, width=48, height=32, max_bounces=6)),
        (soup, dataclasses.replace(CFG, width=48, height=32, max_bounces=4)),
        (
            closed,
            dataclasses.replace(
                CFG, width=48, height=32, max_bounces=4, nee=True
            ),
        ),
    ]
    for td, cfg in cases:
        assert td.cluster_aabbs is not None
        base = np.asarray(
            path_trace_wavefront(
                td, cam.position, light, jnp.int32(2), cfg, interpret=True,
                hdr_lanes=False,
            )
        )
        lanes = np.asarray(
            path_trace_wavefront(
                td, cam.position, light, jnp.int32(2), cfg, interpret=True,
                hdr_lanes=True,
            )
        )
        np.testing.assert_array_equal(base, lanes)


def test_geometry_hdr_lanes_bit_parity():
    """The streamed geometry kernel's lane-parallel header walk must be
    bit-identical to the row-major walk across every G-buffer plane
    (primary rays are the most bundle-coherent case: one shared origin)."""
    import real_time_path_tracing_with_spatiotemporal_filtering_tpu as ptsf
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas import (
        geometry as geo,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.pipeline import (
        frame as frame_mod,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene import (
        procedural,
    )

    cfg = dataclasses.replace(CFG, width=64, height=48)
    td = ptsf.precompute_triangle_data(
        ptsf.Scene.from_arrays(*procedural.subdivided_cornell(12))
    )
    assert getattr(td, "geo_static", None) is not None
    cam, light = Camera.default(), Light.default()
    view, proj = frame_mod.camera_matrices(cam, cfg)
    outs = [
        geo.geometry_pass_pallas(
            td, td.lut, cam.position, light.position, light.position,
            light.color, light.color, view, proj, view, proj, cfg,
            interpret=True, emit_albedo=True, hdr_lanes=hl,
        )
        for hl in (False, True)
    ]
    a, b = outs
    for name in (
        "visibility", "depth", "normal", "lam", "prev_y", "prev_x",
        "world_pos", "albedo",
    ):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            err_msg=name,
        )


def test_lane_mask_words16_exact():
    """The 16-bit mask packing must be exact for every bit position --
    jnp.exp2 is approximate on some backends (exp2(15) -> 32767.998 ->
    truncates to 32767, silently corrupting EVERY word), which is why the
    powers of two are assembled as float32 exponent bits."""
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas.pathtrace import (
        _lane_mask_words16,
    )

    rng = np.random.default_rng(7)
    for n in (16, 32, 64):
        for _ in range(4):
            m = rng.random((1, 128)) < 0.4
            m[:, n:] = False
            words = [int(w) for w in _lane_mask_words16(jnp.asarray(m), n)]
            expect = [
                sum(1 << (i & 15) for i in range(w * 16, w * 16 + 16) if m[0, i])
                for w in range((n + 15) // 16)
            ]
            assert words == expect


def test_wavefront_collect_stats_is_invariant():
    """The collect_stats probe path (python segment loop + counters) must
    return the production radiance bit-for-bit, and its counters must
    satisfy the traversal invariants (run + skipped == visited)."""
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas.wavefront import (
        path_trace_wavefront,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene import (
        procedural,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene.scene import (
        Scene,
        precompute_triangle_data,
    )

    cfg = dataclasses.replace(CFG, width=48, height=32, max_bounces=4)
    td = precompute_triangle_data(
        Scene.from_arrays(*procedural.subdivided_cornell(6))
    )
    cam, light = Camera.default(), Light.default()
    prod = np.asarray(
        path_trace_wavefront(
            td, cam.position, light, jnp.int32(2), cfg, interpret=True
        )
    )
    probed, stats = path_trace_wavefront(
        td, cam.position, light, jnp.int32(2), cfg, interpret=True,
        collect_stats=True,
    )
    np.testing.assert_array_equal(prod, np.asarray(probed))
    assert 0 < len(stats) <= cfg.max_bounces
    for s in stats:
        tot = s.astype(np.int64).sum(0)
        assert tot[0] > 0  # someone visited something
        assert tot[2] + tot[6] == tot[0]  # run + skipped == visited
        assert tot[3] <= tot[2] * 8 * 512  # occupancy bounded by lanes


def test_wavefront_sort_modes_equal():
    """Every coherence-key layout must produce bit-identical radiance: the
    sort only permutes rays and the final descramble sort restores pixel
    order (wavefront.py SORT_MODES)."""
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas.wavefront import (
        SORT_MODES,
        path_trace_wavefront,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene import (
        procedural,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene.scene import (
        Scene,
        precompute_triangle_data,
    )

    cfg = dataclasses.replace(CFG, width=48, height=32, max_bounces=4)
    td = precompute_triangle_data(
        Scene.from_arrays(*procedural.subdivided_cornell(6))
    )
    cam, light = Camera.default(), Light.default()
    ref = None
    for mode in SORT_MODES:
        out = np.asarray(
            path_trace_wavefront(
                td, cam.position, light, jnp.int32(2), cfg, interpret=True,
                sort_mode=mode,
            )
        )
        if ref is None:
            ref = out
        else:
            np.testing.assert_array_equal(ref, out)


def test_wavefront_tile_width_equal():
    """Narrower kernel tiles only re-partition the sorted ray array; the
    committed hits and the descramble are tile-size-independent, so
    radiance must be bit-identical (wavefront.py path_trace_wavefront
    tile_w)."""
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas.wavefront import (
        path_trace_wavefront,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene import (
        procedural,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene.scene import (
        Scene,
        precompute_triangle_data,
    )

    cfg = dataclasses.replace(CFG, width=48, height=32, max_bounces=4)
    td = precompute_triangle_data(
        Scene.from_arrays(*procedural.subdivided_cornell(6))
    )
    cam, light = Camera.default(), Light.default()
    ref = None
    for tw in (None, 128, 256):
        out = np.asarray(
            path_trace_wavefront(
                td, cam.position, light, jnp.int32(2), cfg, interpret=True,
                tile_w=tw,
            )
        )
        if ref is None:
            ref = out
        else:
            np.testing.assert_array_equal(ref, out)


def test_nearest_super_broad_phase():
    """_nearest_super (the traversal-guided sort key's broad phase) picks
    the first-pierced box, ignores boxes behind the ray and degenerate
    pads, and reports entry distance 0 for rays starting inside."""
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas.wavefront import (
        _nearest_super,
    )

    # three unit boxes along +x at x in [2,3], [5,6], [8,9]; one 3e37 pad
    saabb = jnp.asarray(
        [
            [2.0, 0.0, 0.0, 3.0, 1.0, 1.0],
            [5.0, 0.0, 0.0, 6.0, 1.0, 1.0],
            [8.0, 0.0, 0.0, 9.0, 1.0, 1.0],
            [3e37, 3e37, 3e37, 3e37, 3e37, 3e37],
        ],
        jnp.float32,
    )
    ox = jnp.asarray([0.0, 4.0, 7.0, 5.5, 10.0, 0.0], jnp.float32)
    oy = jnp.full_like(ox, 0.5)
    oz = jnp.full_like(ox, 0.5)
    dx = jnp.asarray([1.0, 1.0, 1.0, 1.0, 1.0, -1.0], jnp.float32)
    dy = jnp.zeros_like(dx)
    dz = jnp.zeros_like(dx)
    sid, t_in = _nearest_super(ox, oy, oz, dx, dy, dz, saabb, 4)
    sid, t_in = np.asarray(sid), np.asarray(t_in)
    # from 0: box0 at t=2; from 4: box1 at t=1; from 7: box2 at t=1;
    # inside box1: id 1 at t=0; past all boxes: miss sentinel; looking
    # away from every box: miss sentinel
    np.testing.assert_array_equal(sid, [0, 1, 2, 1, 4, 4])
    np.testing.assert_allclose(t_in, [2.0, 1.0, 1.0, 0.0, 0.0, 0.0])
