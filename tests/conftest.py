"""Test harness configuration.

Tests run on CPU with 8 virtual devices (the TPU-equivalent of testing
multi-node without a cluster, SURVEY.md section 4): kernels are validated
via interpreter/CPU execution and shardings via a virtual mesh. Must run
before any jax backend initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize force-registers the axon TPU backend and
# pins JAX_PLATFORMS=axon; this restores CPU for hermetic tests.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_footprint():
    """Free compiled executables at module boundaries.

    A single pytest process accumulates hundreds of XLA:CPU executables;
    after ~140 compile-heavy tests the NEXT big compile segfaults inside
    XLA's compiler (reproduced deterministically at
    test_pathgrad::test_trace_pixels_wavefront_matches_full_and_dense on
    BOTH the round-4 and round-5 trees, twice each -- an upstream
    JIT-resource exhaustion, not a framework bug; every test passes in
    isolation). Dropping the jit caches per module keeps the resident
    footprint bounded at the cost of a few cross-module recompiles.
    """
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def cornell_scene():
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene.scene import (
        Scene,
    )

    return Scene.cornell_box()


@pytest.fixture(scope="session")
def cornell_tri_data(cornell_scene):
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.scene.scene import (
        precompute_triangle_data,
    )

    return precompute_triangle_data(cornell_scene)


@pytest.fixture(scope="session")
def small_cfg():
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.config import (
        RenderConfig,
    )

    # Small-but-not-tiny so every pass has interesting content; 8 bounces
    # keeps the CPU path-trace loop fast while exercising multi-bounce code.
    return RenderConfig(width=64, height=48, max_bounces=8)


@pytest.fixture(scope="session")
def rng_np():
    return np.random.default_rng(1234)
