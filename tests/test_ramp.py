"""SVGF accumulation ramp (cfg.accumulation_ramp, extension).

History carries a per-pixel consecutive-history length N (History.age,
reprojected like the color history); the temporal blend uses
alpha = max(ramp_alpha_min, 1/N) instead of the reference's fixed
alpha=0.3 (temporalFiltering.comp.glsl:243), and the A-SVGF temporal
gradient resets N where shading changed (SVGF Schied et al. 2017
section 4's "alpha = max(1/N, 0.2)" with the gradient playing the
history-rejection role). Off by default -- parity mode is bit-unchanged
(History.age is None; covered by the golden tests).
"""

import dataclasses

import numpy as np

import real_time_path_tracing_with_spatiotemporal_filtering_tpu as ptsf
from real_time_path_tracing_with_spatiotemporal_filtering_tpu.config import (
    RenderConfig,
)

CFG = RenderConfig(
    width=64, height=48, max_bounces=6, wavelet_iterations=3,
    variance_guided=True, accumulation_ramp=True,
)


def _renderer(cfg):
    return ptsf.Renderer(ptsf.Scene.cornell_box(), cfg)


def test_ramp_off_has_no_age_plane():
    r = _renderer(dataclasses.replace(CFG, accumulation_ramp=False))
    r.step()
    assert r.history.age is None


def test_age_counts_static_frames():
    """Static scene, static camera: every pixel's age is the frame count
    (no gradient fires, the reprojection is the identity)."""
    r = _renderer(CFG)
    for _ in range(5):
        r.step()
    age = np.asarray(r.history.age)
    np.testing.assert_array_equal(age, np.full_like(age, 5.0))


def test_age_resets_on_light_cut():
    """A light jump makes the temporal gradient fire on lit pixels; their
    age must reset to 1 while unaffected pixels keep accumulating."""
    r = _renderer(CFG)
    for _ in range(6):
        r.step()
    r.move_light(dx=0.5)
    r.step()
    age = np.asarray(r.history.age)
    assert (age == 1.0).any(), "no pixel reset on a light cut"
    assert (age == 7.0).any(), "every pixel reset (gradient too eager)"
    assert age.min() >= 1.0 and age.max() <= 7.0


def test_age_survives_camera_orbit():
    """Age follows the reprojection: a small orbit step must NOT zero the
    age field wholesale (ghost-free motion is the ramp's whole point)."""
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene.scene import (
        Camera,
    )

    r = _renderer(CFG)
    for i in range(7):
        r.camera = Camera.orbit([0.0, 1.0, 0.0], 6.0, 0.01 * i, 1.0)
        r.step()
    age = np.asarray(r.history.age)
    # most pixels keep deep history (reprojected age reaches the frame
    # count; the box edges may churn)
    assert (age >= 6.0).mean() > 0.5


def test_age_resets_on_camera_cut():
    """A camera cut is invisible to the temporal gradient (it Phong-shades
    the SAME world point under both lights -- camera-independent), so
    history rejection must come from the visibility-id mismatch: the
    backprojected history pixel saw a different primitive. After a large
    sideways jump, a substantial share of pixels must reset to age 1
    (the blend then REPLACES the stale history, alpha = 1/1), instead of
    ghosting it in at the ramp's 0.1 alpha floor."""
    r = _renderer(CFG)
    for _ in range(8):
        r.step()
    r.move_camera(dx=1.5)
    r.step()
    age = np.asarray(r.history.age)
    assert (age == 1.0).mean() > 0.1, (
        f"only {(age == 1.0).mean():.3f} of pixels rejected stale history "
        "after a camera cut"
    )


def test_ramp_converges_deeper_than_fixed_alpha():
    """Static scene: after enough frames the ramp's alpha floor (0.1)
    averages ~3x more effective history than the fixed alpha=0.3, so the
    steady-state output must be strictly smoother. Proxy: temporal
    variance of the last few outputs (ground truth-free, cheap)."""
    outs = {}
    for ramp in (False, True):
        cfg = dataclasses.replace(CFG, accumulation_ramp=ramp)
        r = _renderer(cfg)
        frames = []
        for i in range(24):
            out = np.asarray(r.step())
            if i >= 18:
                frames.append(out)
        outs[ramp] = np.stack(frames)
    # frame-to-frame fluctuation of the blended output
    flut_fixed = np.abs(np.diff(outs[False], axis=0)).mean()
    flut_ramp = np.abs(np.diff(outs[True], axis=0)).mean()
    assert flut_ramp < 0.6 * flut_fixed, (flut_ramp, flut_fixed)


def test_checkpoint_roundtrip_with_ramp(tmp_path):
    """The age plane rides the checkpoint like every other history leaf."""
    r = _renderer(CFG)
    for _ in range(4):
        r.step()
    p = str(tmp_path / "state.npz")
    r.save_state(p)
    r2 = _renderer(CFG)
    r2.load_state(p)
    np.testing.assert_array_equal(
        np.asarray(r.history.age), np.asarray(r2.history.age)
    )
    a = np.asarray(r.step())
    b = np.asarray(r2.step())
    np.testing.assert_array_equal(a, b)
