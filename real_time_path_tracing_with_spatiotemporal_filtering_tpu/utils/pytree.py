"""Small helper for declaring JAX-pytree dataclasses.

All framework state (Scene, Camera, Light, History, ...) are pytree
dataclasses so the whole frame is a pure function over pytrees -- the
functional replacement for the reference's mutable Vulkan buffer soup
(main.cpp:357-407).
"""

from __future__ import annotations

import dataclasses

import jax


def pytree_dataclass(cls=None, *, meta_fields: tuple[str, ...] = ()):
    """Decorator: frozen dataclass registered as a JAX pytree.

    ``meta_fields`` become static (hashable) auxiliary data; everything else
    is a traced leaf.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = tuple(
            f.name for f in dataclasses.fields(c) if f.name not in meta_fields
        )
        return jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=list(meta_fields)
        )

    if cls is None:
        return wrap
    return wrap(cls)
