"""Hit shading state + material resolve.

The gather/interpolate stage of the wavefront: reconstructs geometric state
from a :class:`~vk_raytrace_tpu.ops.traverse.Hit` (the analog of
``GetShadeState``, ``shaders/shade_state.glsl:63-145``) and resolves the full
material (``GetMaterialsAndTextures``/``GetMetallicRoughness``,
``shaders/gltf_material.glsl:52-193``) into a :class:`SurfState`.

Geometry is stored world-space (instance transforms baked at scene build),
so the object->world matrix chain of the reference collapses to identity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.schema import Geometry, Materials, TextureAtlas
from ..ops.math import (
    dot,
    make_coordinate_system,
    normalize,
    oct_decode,
    srgb_to_linear,
)
from ..ops.state import MatState, SurfState
from ..ops.texture import sample_atlas


def _unpack_rgba8(c: jax.Array) -> jax.Array:
    c = c.astype(jnp.uint32)
    return (
        jnp.stack(
            [
                (c & 0xFF).astype(jnp.float32),
                ((c >> 8) & 0xFF).astype(jnp.float32),
                ((c >> 16) & 0xFF).astype(jnp.float32),
                ((c >> 24) & 0xFF).astype(jnp.float32),
            ],
            axis=-1,
        )
        * (1.0 / 255.0)
    )


def get_shade_state(geom: Geometry, tri: jax.Array, u: jax.Array, v: jax.Array):
    """Interpolate vertex attributes at hit points (shade_state.glsl:63-145).

    ``tri`` (R,) original triangle ids (callers mask invalid lanes),
    ``u``/``v`` barycentrics of vertices 1/2.

    Returns a dict with position/normal/geom_normal/tangent/bitangent/uv/
    color/mat_id arrays.
    """
    trc = jnp.maximum(tri, 0)
    idx = geom.indices[trc]                   # (R, 3)
    w = 1.0 - u - v
    bary = jnp.stack([w, u, v], axis=-1)      # (R, 3)

    p = geom.positions[idx]                   # (R, 3, 3)
    position = jnp.einsum("rk,rkc->rc", bary, p)

    n = oct_decode(geom.normals[idx])         # (R, 3, 3)
    normal = normalize(jnp.einsum("rk,rkc->rc", bary, n))
    geom_normal = normalize(jnp.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]))

    t = oct_decode(geom.tangents[idx])        # (R, 3, 3)
    tangent = normalize(jnp.einsum("rk,rkc->rc", bary, t))
    # Gram-Schmidt against the shading normal (shade_state.glsl:112-113)
    tangent = normalize(tangent - dot(tangent, normal, keepdims=True) * normal)
    handed = geom.tangent_handedness[idx[:, 0]]
    bitangent = jnp.cross(normal, tangent) * handed[..., None]

    uv = jnp.einsum("rk,rkc->rc", bary, geom.uv[idx])
    color = jnp.einsum("rk,rkc->rc", bary, _unpack_rgba8(geom.color[idx]))

    # Put the shading normal on the geometric side (shade_state.glsl:139-143)
    flip = dot(normal, geom_normal) <= 0.0
    normal = jnp.where(flip[..., None], -normal, normal)

    return dict(
        position=position,
        normal=normal,
        geom_normal=geom_normal,
        tangent=tangent,
        bitangent=bitangent,
        uv=uv,
        color=color[..., :3],
        mat_id=jnp.maximum(geom.tri_material[trc], 0),
    )


def _tex_or(atlas, tex_id, uv, default, srgb=False):
    """Fetch a texture or return ``default`` where tex_id < 0."""
    val = sample_atlas(atlas, tex_id, uv)
    if srgb:
        val = jnp.concatenate(
            [srgb_to_linear(val[..., :3]), val[..., 3:4]], axis=-1
        )
    has = (tex_id >= 0)[..., None]
    return jnp.where(has, val, default)


def resolve_material(
    ss: dict,
    materials: Materials,
    atlas: TextureAtlas,
    ray_dir: jax.Array,
) -> SurfState:
    """``GetMaterialsAndTextures`` (gltf_material.glsl:105-193) over the batch."""
    mid = ss["mat_id"]
    m = materials

    # UV transform: [u, v, 1] @ T (gltf_material.glsl:116)
    uv1 = jnp.concatenate([ss["uv"], jnp.ones_like(ss["uv"][..., :1])], axis=-1)
    uv = jnp.einsum("ri,rij->rj", uv1, m.uv_transform[mid])[..., :2]

    normal = ss["normal"]
    tangent = ss["tangent"]
    bitangent = ss["bitangent"]
    ffnormal = jnp.where(
        dot(normal, ray_dir, keepdims=True) <= 0.0, normal, -normal
    )

    # Normal mapping (gltf_material.glsl:121-129): perturb, refresh ffnormal,
    # rebuild the tangent frame from the new ffnormal.
    ntex = m.normal_texture[mid]
    nscale = m.normal_texture_scale[mid]
    nval = sample_atlas(atlas, ntex, uv)[..., :3]
    nvec = normalize(nval * 2.0 - 1.0)
    nvec = nvec * jnp.stack([nscale, nscale, jnp.ones_like(nscale)], axis=-1)
    mapped = normalize(
        nvec[..., 0:1] * tangent + nvec[..., 1:2] * bitangent + nvec[..., 2:3] * normal
    )
    has_nmap = (ntex >= 0)[..., None]
    normal = jnp.where(has_nmap, mapped, normal)
    ffnormal = jnp.where(
        dot(normal, ray_dir, keepdims=True) <= 0.0, normal, -normal
    )
    t2, b2 = make_coordinate_system(ffnormal)
    tangent = jnp.where(has_nmap, t2, tangent)
    bitangent = jnp.where(has_nmap, b2, bitangent)

    # Emission (gltf_material.glsl:131-135)
    emission = m.emissive_factor[mid] * _tex_or(
        atlas, m.emissive_texture[mid], uv, jnp.ones((4,), jnp.float32), srgb=True
    )[..., :3]

    # Metallic-roughness + base color (gltf_material.glsl:52-93)
    ior = m.ior[mid]
    dielectric_spec = ((ior - 1.0) / (ior + 1.0)) ** 2
    mr = _tex_or(atlas, m.metallic_roughness_texture[mid], uv, jnp.ones((4,), jnp.float32))
    roughness = mr[..., 1] * m.roughness_factor[mid]
    metallic = mr[..., 2] * m.metallic_factor[mid]
    base = m.base_color_factor[mid] * _tex_or(
        atlas, m.base_color_texture[mid], uv, jnp.ones((4,), jnp.float32), srgb=True
    )
    f0 = (
        dielectric_spec[..., None] * (1.0 - metallic[..., None])
        + base[..., :3] * metallic[..., None]
    )
    albedo = base[..., :3]
    alpha = base[..., 3]
    roughness = jnp.maximum(roughness, 0.001)

    # Transmission (gltf_material.glsl:144-149)
    transmission = m.transmission_factor[mid] * jnp.where(
        m.transmission_texture[mid] >= 0,
        sample_atlas(atlas, m.transmission_texture[mid], uv)[..., 0],
        1.0,
    )

    # eta at the interface (gltf_material.glsl:152-153)
    eta = jnp.where(dot(normal, ffnormal) > 0.0, 1.0 / ior, ior)

    unlit = m.unlit[mid] == 1

    # Anisotropy (gltf_material.glsl:157-169)
    anisotropy = m.anisotropy[mid]
    aspect = jnp.sqrt(1.0 - anisotropy * 0.9)
    ax = jnp.maximum(0.001, roughness / aspect)
    ay = jnp.maximum(0.001, roughness * aspect)
    adir = m.anisotropy_direction[mid]
    t_rot = normalize(
        adir[..., 0:1] * tangent + adir[..., 1:2] * bitangent + adir[..., 2:3] * normal
    )
    b_rot = normalize(jnp.cross(normal, t_rot))
    has_aniso = (anisotropy > 0.0)[..., None]
    tangent = jnp.where(has_aniso, t_rot, tangent)
    bitangent = jnp.where(has_aniso, b_rot, bitangent)

    # Volume (gltf_material.glsl:171-174)
    attenuation_color = m.attenuation_color[mid]
    attenuation_distance = m.attenuation_distance[mid]
    thinwalled = m.thickness_factor[mid] == 0.0

    # Clearcoat (gltf_material.glsl:176-188)
    clearcoat = m.clearcoat_factor[mid] * jnp.where(
        m.clearcoat_texture[mid] >= 0,
        sample_atlas(atlas, m.clearcoat_texture[mid], uv)[..., 0],
        1.0,
    )
    ccr = m.clearcoat_roughness[mid] * jnp.where(
        m.clearcoat_roughness_texture[mid] >= 0,
        sample_atlas(atlas, m.clearcoat_roughness_texture[mid], uv)[..., 1],
        1.0,
    )
    ccr = jnp.maximum(ccr, 0.001)

    mat = MatState(
        albedo=albedo * ss["color"],  # vertex color (pathtrace.glsl:252)
        metallic=metallic,
        roughness=roughness,
        f0=f0,
        alpha=alpha,
        emission=emission,
        transmission=transmission,
        ior=ior,
        unlit=unlit,
        anisotropy=anisotropy,
        ax=ax,
        ay=ay,
        attenuation_color=attenuation_color,
        attenuation_distance=attenuation_distance,
        thinwalled=thinwalled,
        clearcoat=clearcoat,
        clearcoat_roughness=ccr,
        sheen_color=m.sheen_color[mid],
        sheen_roughness=m.sheen_roughness[mid],
        specular=jnp.full_like(metallic, 0.5),
        specular_tint=jnp.ones_like(metallic),
        subsurface=jnp.zeros_like(metallic),
    )
    return SurfState(
        position=ss["position"],
        normal=normal,
        geom_normal=ss["geom_normal"],
        ffnormal=ffnormal,
        tangent=tangent,
        bitangent=bitangent,
        tex_coord=uv,
        eta=eta,
        mat=mat,
    )
