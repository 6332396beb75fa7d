"""Shading state structures — the SoA analog of the reference's ``State`` /
``State.mat`` structs (``shaders/globals.glsl``; filled by
``gltf_material.glsl`` and ``shade_state.glsl``).

Every field is a batch array over the ray wavefront; BSDF eval/sample and the
integrator are pure functions over these pytrees.
"""

from __future__ import annotations

from typing import NamedTuple

import jax


class MatState(NamedTuple):
    """Resolved material at a hit point (post texture fetches)."""

    albedo: jax.Array                # (R, 3)
    metallic: jax.Array              # (R,)
    roughness: jax.Array             # (R,)
    f0: jax.Array                    # (R, 3)
    alpha: jax.Array                 # (R,)
    emission: jax.Array              # (R, 3)
    transmission: jax.Array          # (R,)
    ior: jax.Array                   # (R,)
    unlit: jax.Array                 # (R,) bool
    anisotropy: jax.Array            # (R,)
    ax: jax.Array                    # (R,)
    ay: jax.Array                    # (R,)
    attenuation_color: jax.Array     # (R, 3)
    attenuation_distance: jax.Array  # (R,)
    thinwalled: jax.Array            # (R,) bool
    clearcoat: jax.Array             # (R,)
    clearcoat_roughness: jax.Array   # (R,)
    sheen_color: jax.Array           # (R, 3)  (sheenTint in the Disney path)
    sheen_roughness: jax.Array       # (R,)
    # Disney-only constants in the reference (gltf_material.glsl:115-118)
    specular: jax.Array              # (R,) = 0.5
    specular_tint: jax.Array         # (R,) = 1.0
    subsurface: jax.Array            # (R,) = 0.0


class SurfState(NamedTuple):
    """Geometric + material state at a hit (``State`` in globals.glsl)."""

    position: jax.Array      # (R, 3) world
    normal: jax.Array        # (R, 3) shading normal (post normal map)
    geom_normal: jax.Array   # (R, 3)
    ffnormal: jax.Array      # (R, 3) forward-facing normal
    tangent: jax.Array       # (R, 3)
    bitangent: jax.Array     # (R, 3)
    tex_coord: jax.Array     # (R, 2)
    eta: jax.Array           # (R,) relative IOR at the interface
    mat: MatState
