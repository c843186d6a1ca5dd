"""Extension points beyond the reference: albedo overrides, sharded Pallas,
device info."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from real_time_path_tracing_with_spatiotemporal_filtering_tpu.config import (
    RenderConfig,
)
from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops import pathtrace
from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene.scene import (
    Camera,
    Light,
    Scene,
    precompute_triangle_data,
)
from real_time_path_tracing_with_spatiotemporal_filtering_tpu.utils.device import (
    device_info,
)

CFG = RenderConfig(width=48, height=32, max_bounces=5, wavelet_iterations=3)


def test_albedo_override_changes_render(cornell_scene):
    cam, light = Camera.default(), Light.default()
    default_td = precompute_triangle_data(cornell_scene)
    blue = np.tile(np.array([0.2, 0.2, 0.9], np.float32), (cornell_scene.num_triangles, 1))
    blue_td = precompute_triangle_data(cornell_scene, albedo=blue)

    a = np.asarray(
        pathtrace.path_trace_pass(default_td, cam.position, light, jnp.int32(1), CFG)
    )
    b = np.asarray(
        pathtrace.path_trace_pass(blue_td, cam.position, light, jnp.int32(1), CFG)
    )
    assert not np.allclose(a, b)
    # blue scene: blue channel dominates the average surface response
    assert b[..., 2].mean() > b[..., 0].mean()


def test_albedo_override_shape_check(cornell_scene):
    with pytest.raises(ValueError):
        precompute_triangle_data(cornell_scene, albedo=np.ones((5, 3)))


def test_albedo_override_pallas_parity(cornell_scene):
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas.pathtrace import (
        path_trace_pass_pallas,
    )

    cam, light = Camera.default(), Light.default()
    rng = np.random.default_rng(0)
    albedo = rng.uniform(0.1, 0.9, (cornell_scene.num_triangles, 3)).astype(np.float32)
    td = precompute_triangle_data(cornell_scene, albedo=albedo)
    ref = np.asarray(
        pathtrace.path_trace_pass(td, cam.position, light, jnp.int32(3), CFG)
    )
    pal = np.asarray(
        path_trace_pass_pallas(
            td, cam.position, light, jnp.int32(3), CFG, interpret=True
        )
    )
    assert np.abs(ref - pal).max() < 1e-3


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
def test_sharded_pallas_matches_single(cornell_tri_data):
    """The sharded frame with Pallas kernels (interpret mode) must match the
    single-chip Pallas frame."""
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.parallel import (
        frame_sharded,
        sharding,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.pipeline import (
        frame as frame_mod,
    )

    cfg = dataclasses.replace(CFG, backend="pallas")
    mesh = sharding.make_mesh(2)
    step = frame_sharded.make_sharded_frame(cfg, mesh)
    hist_s = frame_sharded.init_sharded_history(cornell_tri_data, cfg, mesh)
    hist_r = frame_mod.init_history(cornell_tri_data, cfg)
    cam, light = Camera.default(), Light.default()
    for _ in range(2):
        rgb_s, hist_s = step(cornell_tri_data, cam, light, hist_s)
        rgb_r, hist_r = frame_mod.render_frame_impl(
            cornell_tri_data, cam, light, hist_r, cfg
        )
    np.testing.assert_allclose(
        np.asarray(rgb_s), np.asarray(rgb_r), rtol=1e-4, atol=1e-5
    )


def test_device_info():
    info = device_info()
    assert info["num_devices"] >= 1
    assert info["backend"] in ("cpu", "tpu", "gpu", "axon")


def test_scene_size_guard_and_xla_fallback():
    """Mid-size scenes stay on the Pallas path (VMEM tables); scenes beyond
    the VMEM budget are rejected by the guard and render on the XLA path
    (correct at any size)."""
    import types

    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas.pathtrace import (
        pallas_scene_supported,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.pipeline import (
        frame as frame_mod,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene import (
        procedural,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene.scene import (
        Scene,
        precompute_triangle_data,
    )

    # 8192 triangles: VMEM-table territory, still Pallas-supported
    big = Scene.from_arrays(*procedural.subdivided_cornell(16))
    td = precompute_triangle_data(big)
    assert pallas_scene_supported(td)

    # guard arithmetic for a Sponza-plus scene beyond the VMEM budget
    monster = types.SimpleNamespace(
        normals=np.zeros((400_000, 3), np.float32),
        pair_table=np.zeros((200_000, 26), np.float32),
    )
    assert not pallas_scene_supported(monster)

    # the XLA path renders the 8192-tri scene correctly on any backend
    cfg = dataclasses.replace(
        CFG, width=32, height=24, max_bounces=3, wavelet_iterations=3,
        backend="xla",
    )
    hist = frame_mod.init_history(td, cfg)
    rgb, _ = frame_mod.render_frame_impl(
        td, Camera.default(), Light.default(), hist, cfg
    )
    assert np.isfinite(np.asarray(rgb)).all()


def test_default_scene_loads_out_of_the_box(tmp_path, monkeypatch):
    """load_obj() with no arguments must work (the reference vendors the
    asset and loads it at main.cpp:417); ours is synthesized on first use."""
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene import (
        obj as obj_mod,
    )

    target = str(tmp_path / "assets" / "CornellBox-Original-Merged.obj")
    monkeypatch.setattr(obj_mod, "DEFAULT_SCENE", target)
    verts, idx = obj_mod.load_obj()
    assert verts.shape == (64, 3)
    assert idx.shape == (32, 3)
    # second call reuses the materialized asset
    verts2, idx2 = obj_mod.load_obj()
    np.testing.assert_array_equal(verts, verts2)
    np.testing.assert_array_equal(idx, idx2)
    # triangle-exact vs the procedural generator (itself verified against
    # the reference OBJ)
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene import (
        procedural,
    )

    pv, pi = procedural.cornell_box()
    np.testing.assert_allclose(verts[idx], pv[pi], atol=1e-6)


def test_missing_obj_raises_file_not_found():
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene import (
        obj as obj_mod,
    )

    with pytest.raises(FileNotFoundError):
        obj_mod.load_obj("/nonexistent/scene.obj")


def test_oversize_scene_warns_once_on_fallback():
    import types
    import warnings

    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.pipeline import (
        frame as frame_mod,
    )

    monster = types.SimpleNamespace(
        normals=np.zeros((400_000, 3), np.float32),
        pair_table=np.zeros((200_000, 26), np.float32),
    )
    frame_mod._warned_fallback = False
    cfg = dataclasses.replace(CFG, backend="pallas")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        assert not frame_mod._use_pallas(cfg, monster)
        assert not frame_mod._use_pallas(cfg, monster)
    msgs = [str(w.message) for w in rec if "row cap" in str(w.message)]
    assert len(msgs) == 1  # warned exactly once
    frame_mod._warned_fallback = False


def test_device_info_exposes_row_cap():
    info = device_info()
    assert info["pallas_resident_row_cap"] > 20_000


def test_empty_scene_renders_sky():
    """A zero-triangle scene must load and render (sky gradient only) --
    pack_shading_pairs degrades to an empty pair table, not a crash."""
    import numpy as np
    import jax.numpy as jnp

    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.config import (
        RenderConfig,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.pipeline.renderer import (
        Renderer,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene.scene import (
        Scene,
    )

    scene = Scene.from_arrays(
        np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    )
    cfg = RenderConfig(width=48, height=32, max_bounces=3,
                       wavelet_iterations=3)
    r = Renderer(scene, cfg)
    out = np.asarray(r.step())
    assert np.isfinite(out).all()
    assert out.max() > 0.0  # the sky gradient is visible
