"""Atlas-based texture sampling.

The reference binds a variable-count array of combined image samplers and
lets the hardware filter (``scene.cpp:447-580``, descriptor at
``scene.cpp:586-624``). XLA wants static shapes and explicit gathers, so all
textures live in one uint8 atlas (packed at scene build, ``models/textures.py``)
and filtering is 4 explicit gathers + a bilinear blend on the VPU.

Wrap modes mirror ``gltfSamplerToVulkan`` (scene.cpp): REPEAT / CLAMP_TO_EDGE /
MIRRORED_REPEAT. Lookups are level-0 bilinear, matching the shaders' use of
``textureLod(..., 0)`` everywhere in the material path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.schema import TextureAtlas

WRAP_REPEAT = 0
WRAP_CLAMP = 1
WRAP_MIRROR = 2


def _wrap(coord: jax.Array, size: jax.Array, mode: jax.Array) -> jax.Array:
    """Apply the per-texture wrap mode to integer texel coords."""
    size = jnp.maximum(size, 1)
    rep = jnp.remainder(coord, size)
    clm = jnp.clip(coord, 0, size - 1)
    period = 2 * size
    m = jnp.remainder(coord, period)
    mir = jnp.where(m >= size, period - 1 - m, m)
    out = jnp.where(mode == WRAP_REPEAT, rep, jnp.where(mode == WRAP_CLAMP, clm, mir))
    return out


def sample_atlas(atlas: TextureAtlas, tex_id: jax.Array, uv: jax.Array) -> jax.Array:
    """Bilinear RGBA fetch. ``tex_id`` (...,) i32, ``uv`` (..., 2) f32.

    Returns (..., 4) f32 in [0, 1] (raw values; sRGB decode is the caller's
    choice, matching ``SRGBtoLINEAR`` usage in gltf_material.glsl:37-46).
    Invalid ids (< 0) return white.
    """
    tid = jnp.clip(tex_id, 0, atlas.x.shape[0] - 1)
    w = atlas.width[tid]
    h = atlas.height[tid]
    ox = atlas.x[tid]
    oy = atlas.y[tid]
    ws = atlas.wrap_s[tid]
    wt = atlas.wrap_t[tid]

    px = uv[..., 0] * w.astype(jnp.float32) - 0.5
    py = uv[..., 1] * h.astype(jnp.float32) - 0.5
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    fx = (px - x0.astype(jnp.float32))[..., None]
    fy = (py - y0.astype(jnp.float32))[..., None]

    aw = atlas.data.shape[1]
    flat = atlas.data.reshape(-1, 4)

    def tap(xi, yi):
        xw = _wrap(xi, w, ws) + ox
        yw = _wrap(yi, h, wt) + oy
        texel = flat[yw * aw + xw]
        return texel.astype(jnp.float32) * (1.0 / 255.0)

    c00 = tap(x0, y0)
    c10 = tap(x0 + 1, y0)
    c01 = tap(x0, y0 + 1)
    c11 = tap(x0 + 1, y0 + 1)

    top = c00 + (c10 - c00) * fx
    bot = c01 + (c11 - c01) * fx
    out = top + (bot - top) * fy
    return jnp.where((tex_id < 0)[..., None], jnp.ones_like(out), out)


def sample_env(image: jax.Array, uv: jax.Array) -> jax.Array:
    """Bilinear fetch from the f32 lat-long environment map.

    U wraps (longitude), V clamps (the reference HDR sampler uses clamp on V,
    hdr_sampling.cpp:68-77).
    """
    h, w = image.shape[0], image.shape[1]
    px = uv[..., 0] * w - 0.5
    py = uv[..., 1] * h - 0.5
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    fx = (px - x0.astype(jnp.float32))[..., None]
    fy = (py - y0.astype(jnp.float32))[..., None]

    flat = image.reshape(-1, image.shape[-1])

    def tap(xi, yi):
        xw = jnp.remainder(xi, w)
        yw = jnp.clip(yi, 0, h - 1)
        return flat[yw * w + xw]

    c00 = tap(x0, y0)
    c10 = tap(x0 + 1, y0)
    c01 = tap(x0, y0 + 1)
    c11 = tap(x0 + 1, y0 + 1)
    top = c00 + (c10 - c00) * fx
    bot = c01 + (c11 - c01) * fx
    return top + (bot - top) * fy
