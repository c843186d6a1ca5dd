"""Variance-guided filtering (full-SVGF extension, cfg.variance_guided).

The reference's color weight has no variance normalization
(temporalFiltering.comp.glsl:72-74); these tests cover the SVGF estimator
extension: moment accumulation, the variance-guided a-trous iteration
(XLA + Pallas parity), frame integration, and that reference-parity mode
stays bit-identical with the flag off.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import real_time_path_tracing_with_spatiotemporal_filtering_tpu as ptsf
from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops import atrous


CFG = ptsf.RenderConfig(width=64, height=48, variance_guided=True)


def _render(cfg, frames=3, backend=None):
    if backend is not None:
        cfg = dataclasses.replace(cfg, backend=backend)
    r = ptsf.Renderer(ptsf.Scene.cornell_box(), cfg)
    out = r.render(frames)
    return np.asarray(out), r


def test_moment_accumulation_frame0():
    """Frame 0 takes the current moments verbatim (no history to blend)."""
    h, w = 8, 16
    noisy = jnp.linspace(0, 1, h * w * 3, dtype=jnp.float32).reshape(h, w, 3)
    lum = atrous.luminance(noisy)
    prev = jnp.full((h, w, 2), 99.0, jnp.float32)
    own_y = jnp.broadcast_to(jnp.arange(h, dtype=jnp.int32)[:, None], (h, w))
    own_x = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[None, :], (h, w))
    m, var = atrous.accumulate_moments(lum, prev, own_y, own_x, 0, CFG)
    np.testing.assert_array_equal(np.asarray(m[..., 0]), np.asarray(lum))
    np.testing.assert_array_equal(np.asarray(m[..., 1]), np.asarray(lum * lum))
    assert np.all(np.asarray(var) >= 0.0)


def test_moment_accumulation_blends_reprojected():
    """Later frames EMA-blend the reprojected previous moments."""
    h, w = 8, 16
    lum = jnp.ones((h, w), jnp.float32) * 0.5
    prev = jnp.stack(
        [jnp.full((h, w), 0.1, jnp.float32), jnp.full((h, w), 0.3, jnp.float32)],
        axis=-1,
    )
    own_y = jnp.broadcast_to(jnp.arange(h, dtype=jnp.int32)[:, None], (h, w))
    own_x = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[None, :], (h, w))
    m, _ = atrous.accumulate_moments(
        lum, prev, own_y, own_x, CFG.variance_boost_frames + 1, CFG
    )
    a = CFG.moments_alpha
    np.testing.assert_allclose(
        np.asarray(m[..., 0]), 0.1 * (1 - a) + 0.5 * a, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(m[..., 1]), 0.3 * (1 - a) + 0.25 * a, rtol=1e-6
    )


def test_variance_nonnegative_and_spatial_boost():
    """Variance is clamped >= 0; young history uses the spatial estimate."""
    rng = np.random.default_rng(3)
    h, w = 16, 32
    noisy = jnp.asarray(rng.random((h, w, 3), dtype=np.float32))
    lum = atrous.luminance(noisy)
    prev = jnp.zeros((h, w, 2), jnp.float32)
    own_y = jnp.broadcast_to(jnp.arange(h, dtype=jnp.int32)[:, None], (h, w))
    own_x = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[None, :], (h, w))
    _, var_young = atrous.accumulate_moments(lum, prev, own_y, own_x, 1, CFG)
    _, var_old = atrous.accumulate_moments(
        lum, prev, own_y, own_x, CFG.variance_boost_frames, CFG
    )
    assert np.all(np.asarray(var_young) >= 0.0)
    assert np.all(np.asarray(var_old) >= 0.0)
    # young history: spatial estimate of a random field is strictly positive
    assert np.asarray(var_young).mean() > 0.0


def test_variance_guided_frame_runs_and_is_finite():
    out, r = _render(CFG, frames=4)
    assert np.all(np.isfinite(out))
    assert out.min() >= 0.0
    assert r.history.moments is not None
    assert r.history.moments.shape == (CFG.height, CFG.width, 2)
    assert np.all(np.isfinite(np.asarray(r.history.moments)))


def test_parity_mode_bit_unchanged():
    """variance_guided=False must not perturb the reference-parity output
    (the flag only adds state when on)."""
    cfg_off = dataclasses.replace(CFG, variance_guided=False)
    a, ra = _render(cfg_off, frames=2)
    assert ra.history.moments is None
    # golden tests pin the exact values; here just re-check determinism
    b, _ = _render(cfg_off, frames=2)
    np.testing.assert_array_equal(a, b)


def test_xla_vs_pallas_variance_filter():
    """The Pallas variance-guided filter matches the XLA formulation."""
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas import (
        atrous as atrous_pl,
    )

    rng = np.random.default_rng(11)
    cfg = ptsf.RenderConfig(width=128, height=32, variance_guided=True)
    h, w = cfg.height, cfg.width
    color = jnp.asarray(rng.random((h, w, 3), dtype=np.float32))
    var = jnp.asarray(rng.random((h, w), dtype=np.float32) * 0.1)
    normal = jnp.asarray(rng.standard_normal((h, w, 3)).astype(np.float32))
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
    depth = jnp.asarray(rng.random((h, w), dtype=np.float32))

    ref_c, ref_v = atrous.atrous_filter_var(color, var, normal, depth, cfg)
    pal_c, pal_v = atrous_pl.atrous_filter_var_pallas(
        color, var, normal, depth, cfg, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(ref_c), np.asarray(pal_c), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(ref_v), np.asarray(pal_v), rtol=2e-4, atol=2e-6
    )


def test_xla_vs_pallas_variance_frame():
    """Whole-frame parity between backends with variance guiding on."""
    xla, _ = _render(CFG, frames=3, backend="xla")
    pal, _ = _render(CFG, frames=3, backend="pallas")
    assert np.abs(xla - pal).max() < 2e-3


def test_variance_guided_denoises_noise():
    """On a noisy Cornell render the variance-guided filter still smooths:
    filtered output has much lower high-frequency energy than the input."""
    cfg = dataclasses.replace(CFG, ema_alpha=1.0)  # isolate the filter
    r = ptsf.Renderer(ptsf.Scene.cornell_box(), cfg)
    out = np.asarray(r.render(2))
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops import (
        pathtrace,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.pipeline import (
        frame as frame_mod,
    )

    noisy = np.asarray(
        pathtrace.path_trace_pass(
            r.tri_data, r.camera.position, r.light, 1, cfg
        )
    )

    def hf_energy(img):
        return np.abs(np.diff(img, axis=0)).mean() + np.abs(
            np.diff(img, axis=1)
        ).mean()

    assert hf_energy(out) < 0.5 * hf_energy(noisy)


def test_sharded_variance_matches_single_chip():
    """Row-sharded variance-guided frame == single-chip (virtual mesh)."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device mesh")
    from jax.sharding import Mesh

    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.parallel import (
        frame_sharded,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.pipeline import (
        frame as frame_mod,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene.scene import (
        Camera,
        Light,
        precompute_triangle_data,
    )

    cfg = ptsf.RenderConfig(width=64, height=64, variance_guided=True)
    devices = jax.devices()[:4]
    mesh = Mesh(np.array(devices), ("rows",))
    td = precompute_triangle_data(ptsf.Scene.cornell_box())
    cam, light = Camera.default(), Light.default()

    frame_fn = frame_sharded.make_sharded_frame(cfg, mesh, "rows")
    hist_sh = frame_sharded.init_sharded_history(td, cfg, mesh, "rows")
    hist = frame_mod.init_history(td, cfg)
    # 6 frames: covers both the young-history spatial-variance path
    # (frames < variance_boost_frames) and the temporal-moments path
    for _ in range(6):
        rgb_sh, hist_sh = frame_fn(td, cam, light, hist_sh)
        rgb, hist = frame_mod.render_frame(td, cam, light, hist, cfg)
    np.testing.assert_allclose(
        np.asarray(rgb_sh), np.asarray(rgb), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(hist_sh.moments), np.asarray(hist.moments),
        rtol=1e-6, atol=1e-6,
    )
