"""Mesh construction and halo-exchange collectives."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

ROW_AXIS = "rows"


def make_mesh(n_devices: int | None = None, axis: str = ROW_AXIS) -> Mesh:
    """1-D device mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices, only {len(devices)} available"
        )
    import numpy as np

    return Mesh(np.asarray(devices[:n_devices]), (axis,))


def exchange_row_halo(x: jnp.ndarray, halo: int, axis_name: str = ROW_AXIS):
    """Pad a row-sharded array with ``halo`` rows from each row-neighbor.

    Neighbor rows travel over ICI via ``ppermute``; at the global top/bottom
    the halo is edge-clamped (repeat of the boundary row), which reproduces
    the single-chip filter's pixel clamp (temporalFiltering.comp.glsl:136)
    exactly: a tap that would read global row < 0 reads row 0.

    This is the moral analogue of ring/context-parallel halo exchange in
    sequence-parallel attention (SURVEY.md section 5.7), applied to the
    pixel axis.

    Local rows must be >= halo.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    if x.shape[0] < halo:
        raise ValueError(
            f"shard has {x.shape[0]} rows < halo {halo}; use fewer devices"
        )
    down = [(i, i + 1) for i in range(n - 1)]   # i's bottom rows -> i+1's top halo
    up = [(i + 1, i) for i in range(n - 1)]     # i+1's top rows -> i's bottom halo
    from_above = jax.lax.ppermute(x[-halo:], axis_name, down)
    from_below = jax.lax.ppermute(x[:halo], axis_name, up)
    edge_top = jnp.repeat(x[:1], halo, axis=0)
    edge_bot = jnp.repeat(x[-1:], halo, axis=0)
    top = jnp.where(idx == 0, edge_top, from_above)
    bot = jnp.where(idx == n - 1, edge_bot, from_below)
    return jnp.concatenate([top, x, bot], axis=0)
