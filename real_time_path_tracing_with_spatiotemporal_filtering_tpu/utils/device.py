"""Device/platform introspection.

The reference's nvvk::Context prints device capabilities at init
(context.hpp:166-174, context.cpp:1234); this is the JAX-side analogue,
plus the backend-selection logic quirks of this container (the axon
sitecustomize pins JAX_PLATFORMS, see tests/conftest.py).
"""

from __future__ import annotations

from typing import Any

import jax


def device_info() -> dict[str, Any]:
    """Capabilities summary of the default backend."""
    devices = jax.devices()
    d = devices[0]
    info: dict[str, Any] = {
        "backend": jax.default_backend(),
        "num_devices": len(devices),
        "platform": d.platform,
        "device_kind": getattr(d, "device_kind", "unknown"),
        "jax_version": jax.__version__,
    }
    stats = None
    try:
        stats = d.memory_stats()
    except Exception:
        pass
    if stats:
        info["bytes_limit"] = stats.get("bytes_limit")
        info["bytes_in_use"] = stats.get("bytes_in_use")
    from real_time_path_tracing_with_spatiotemporal_filtering_tpu.ops.pallas.pathtrace import (
        MAX_VMEM_TABLE_BYTES,
        _VMEM_ROW_BYTES,
    )

    # On-chip table-row budget for the resident Pallas fast path; larger
    # scenes stream their tables from HBM (stream_tables) or fall back to
    # the dense XLA formulation.
    info["pallas_resident_row_cap"] = MAX_VMEM_TABLE_BYTES // _VMEM_ROW_BYTES
    return info


def log_device_info() -> str:
    info = device_info()
    line = (
        f"[tpu-pathtracer] {info['num_devices']}x {info['device_kind']} "
        f"({info['platform']}, jax {info['jax_version']})"
    )
    print(line)
    return line


def force_cpu() -> None:
    """Force the CPU backend (must run before first backend use); the
    env var alone is overridden by the container's sitecustomize."""
    jax.config.update("jax_platforms", "cpu")


def enable_validation(enabled: bool = True) -> None:
    """The Vulkan validation-layer analogue (context.cpp:807-808 enables
    VK_LAYER_KHRONOS_validation in debug builds): turn on JAX's NaN/Inf
    checking so any non-finite value raises at the producing op instead of
    propagating into the image. Costs a sync per op -- debug only."""
    jax.config.update("jax_debug_nans", enabled)
    jax.config.update("jax_debug_infs", enabled)
