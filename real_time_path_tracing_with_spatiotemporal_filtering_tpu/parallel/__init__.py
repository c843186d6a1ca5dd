"""Multi-chip execution over a TPU mesh.

The reference is strictly single-GPU (its only multi-device hook, nvvk
device groups, is never enabled -- context.hpp:153, SURVEY.md section 2).
The TPU-native scaling story is image-space data parallelism: shard the
pixel rows of the frame across a ``jax.sharding.Mesh`` with ``shard_map``,
exchange a-trous stencil halos between row-neighbors with
``jax.lax.ppermute`` over ICI, and all-gather only the small history image
for temporal reprojection.
"""
