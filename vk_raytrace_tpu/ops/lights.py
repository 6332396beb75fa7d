"""Punctual lights (KHR_lights_punctual).

Vectorized forms of ``shaders/punctual.glsl`` attenuation plus the light
selection/evaluation half of ``DirectLight`` (``pathtrace.glsl:118-153``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.schema import LIGHT_DIRECTIONAL, LIGHT_SPOT, Lights
from .math import normalize, smoothstep


def range_attenuation(light_range: jax.Array, distance: jax.Array) -> jax.Array:
    """(punctual.glsl:28-36): unlimited when range <= 0."""
    d2 = jnp.maximum(distance * distance, 1e-12)
    win = jnp.clip(1.0 - (distance / jnp.maximum(light_range, 1e-9)) ** 4, 0.0, 1.0)
    att = win / d2
    return jnp.where(light_range <= 0.0, 1.0 / d2, att)


def spot_attenuation(
    point_to_light: jax.Array,
    spot_direction: jax.Array,
    outer_cone_cos: jax.Array,
    inner_cone_cos: jax.Array,
) -> jax.Array:
    """(punctual.glsl:39-51)"""
    actual_cos = jnp.sum(
        normalize(spot_direction) * normalize(-point_to_light), axis=-1
    )
    ramp = smoothstep(outer_cone_cos, inner_cone_cos, actual_cos)
    full = jnp.where(actual_cos < inner_cone_cos, ramp, 1.0)
    return jnp.where(actual_cos > outer_cone_cos, full, 0.0)


def sample_light(
    lights: Lights,
    light_index: jax.Array,   # (R,) i32
    position: jax.Array,      # (R, 3) shading point
):
    """Evaluate one punctual light toward a shading point
    (``DirectLight``, pathtrace.glsl:119-152).

    Returns ``(intensity (R,3), light_dir (R,3), light_dist (R,))`` with
    pdf = 1 (delta lights).
    """
    i = light_index
    ltype = lights.type[i]
    is_dir = ltype == LIGHT_DIRECTIONAL
    lpos = lights.position[i]
    ldirection = lights.direction[i]

    point_to_light = jnp.where(is_dir[..., None], -ldirection, lpos - position)
    light_dist = jnp.sqrt(jnp.maximum(jnp.sum(point_to_light**2, axis=-1), 1e-20))
    light_dist = jnp.where(is_dir, 1e32, light_dist)

    r_att = jnp.where(
        is_dir, 1.0, range_attenuation(lights.range[i], light_dist)
    )
    s_att = jnp.where(
        ltype == LIGHT_SPOT,
        spot_attenuation(
            point_to_light, ldirection, lights.outer_cone_cos[i], lights.inner_cone_cos[i]
        ),
        1.0,
    )
    intensity = (r_att * s_att * lights.intensity[i])[..., None] * lights.color[i]
    light_dir = normalize(point_to_light)
    return intensity, light_dir, light_dist
