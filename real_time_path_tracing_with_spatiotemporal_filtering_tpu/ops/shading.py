"""Shading functions: sky, normal-keyed albedo, Phong.

Direct behavioral ports of the reference shading math -- these are the
"material system" of the reference scene (raytrace.comp.glsl:95-163,
temporalGradient.comp.glsl:71-101), expressed as vectorized jnp functions.
"""

from __future__ import annotations

import jax.numpy as jnp


def sky_color(directions):
    """skyColor (raytrace.comp.glsl:95-107): vertical gradient above the
    horizon, dim constant below."""
    y = directions[..., 1]
    up = (1.0 - y)[..., None] * jnp.array([1.0, 1.0, 1.0], jnp.float32) + y[
        ..., None
    ] * jnp.array([0.25, 0.5, 1.0], jnp.float32)
    down = jnp.full_like(up, 0.03)
    return jnp.where((y > 0.0)[..., None], up, down)


def albedo_from_normal(normals):
    """Hardcoded Cornell materials (raytrace.comp.glsl:155-163): walls whose
    geometric normal points +x are red, -x green, everything else 0.7 gray.
    Evaluated on the *unflipped* geometric normal, as in the reference."""
    nx = normals[..., 0]
    red = jnp.array([1.0, 0.0, 0.0], jnp.float32)
    green = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    gray = jnp.array([0.7, 0.7, 0.7], jnp.float32)
    return jnp.where(
        (nx > 0.99)[..., None],
        red,
        jnp.where((nx < -0.99)[..., None], green, gray),
    )


def faceforward(n, incident):
    """GLSL faceforward(N, I, Nref=N): flip n to oppose the incident
    direction (raytrace.comp.glsl:247)."""
    flip = jnp.sum(incident * n, axis=-1, keepdims=True) < 0.0
    return jnp.where(flip, n, -n)


def reflect(incident, n):
    """GLSL reflect(I, N) = I - 2*dot(N, I)*N."""
    return incident - 2.0 * jnp.sum(n * incident, axis=-1, keepdims=True) * n


def phong(p, n, cam_pos, light_pos, light_color):
    """phongShading (temporalGradient.comp.glsl:71-101).

    Fixed 0.7-gray object color, ambient 0.1, specular 0.5 with exponent
    128, attenuation 1. Used only by the temporal-gradient estimator.
    """
    object_color = jnp.array([0.7, 0.7, 0.7], jnp.float32)
    light_dir = light_pos - p
    light_dir = light_dir / jnp.linalg.norm(light_dir, axis=-1, keepdims=True)

    ambient = 0.1 * light_color
    diff = jnp.maximum(jnp.sum(n * light_dir, axis=-1, keepdims=True), 0.0)
    diffuse = diff * light_color

    view_dir = cam_pos - p
    view_dir = view_dir / jnp.linalg.norm(view_dir, axis=-1, keepdims=True)
    reflect_dir = reflect(-light_dir, n)
    spec = jnp.power(
        jnp.maximum(jnp.sum(view_dir * reflect_dir, axis=-1, keepdims=True), 0.0),
        jnp.float32(128.0),
    )
    specular = 0.5 * spec * light_color

    return (ambient + diffuse + specular) * object_color
