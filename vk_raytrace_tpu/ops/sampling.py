"""Shared sampling distributions for the BSDFs and lights.

Vectorized forms of the reference's hemisphere/sphere/GGX samplers
(``shaders/pbr_disney.glsl:68-229``, ``shaders/pbr_gltf.glsl:189-199``).
Each takes uniform variates ``r1, r2`` (arrays of matching batch shape) and
returns directions in tangent space (z = normal).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def cosine_sample_hemisphere(r1: jax.Array, r2: jax.Array) -> jax.Array:
    """Cosine-weighted hemisphere (pbr_disney.glsl:190-200)."""
    r = jnp.sqrt(r1)
    phi = TWO_PI * r2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x - y * y))
    return jnp.stack([x, y, z], axis=-1)


def uniform_sample_hemisphere(r1: jax.Array, r2: jax.Array) -> jax.Array:
    """Uniform hemisphere (pbr_disney.glsl:204-210)."""
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - r1 * r1))
    phi = TWO_PI * r2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), r1], axis=-1)


def uniform_sample_sphere(r1: jax.Array, r2: jax.Array) -> jax.Array:
    """Uniform sphere (pbr_disney.glsl:214-221)."""
    z = 1.0 - 2.0 * r1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = TWO_PI * r2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def ggx_sample(alpha: jax.Array, r1: jax.Array, r2: jax.Array) -> jax.Array:
    """GGX/GTR2 half-vector sample (pbr_gltf.glsl:189-199 ``GgxSampling`` /
    pbr_disney.glsl:98-110 ``ImportanceSampleGTR2`` — identical math)."""
    a = jnp.maximum(0.001, alpha)
    phi = r1 * TWO_PI
    cos_theta = jnp.sqrt((1.0 - r2) / (1.0 + (a * a - 1.0) * r2))
    sin_theta = jnp.clip(jnp.sqrt(1.0 - cos_theta * cos_theta), 0.0, 1.0)
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def gtr1_sample(alpha: jax.Array, r1: jax.Array, r2: jax.Array) -> jax.Array:
    """GTR1 (clearcoat) half-vector sample (pbr_disney.glsl:68-81).

    Note: the reference reuses r1 both for phi and for the cos-theta term;
    we keep that behavior for parity.
    """
    a = jnp.maximum(0.001, alpha)
    a2 = a * a
    phi = r1 * TWO_PI
    cos_theta = jnp.sqrt((1.0 - jnp.power(a2, 1.0 - r1)) / (1.0 - a2))
    sin_theta = jnp.clip(jnp.sqrt(1.0 - cos_theta * cos_theta), 0.0, 1.0)
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def gtr2_aniso_sample(ax: jax.Array, ay: jax.Array, r1: jax.Array, r2: jax.Array) -> jax.Array:
    """Anisotropic GTR2 half-vector sample (pbr_disney.glsl:85-94).

    Returns the *unnormalized* direction (caller builds world H then
    normalizes), matching the reference usage.
    """
    phi = r1 * TWO_PI
    sin_phi = ay * jnp.sin(phi)
    cos_phi = ax * jnp.cos(phi)
    tan_theta = jnp.sqrt(r2 / jnp.maximum(1.0 - r2, 1e-12))
    return jnp.stack(
        [tan_theta * cos_phi, tan_theta * sin_phi, jnp.ones_like(phi)], axis=-1
    )
