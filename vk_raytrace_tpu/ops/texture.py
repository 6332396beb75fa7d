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


# ---------------------------------------------------------------------------
# Mip chain layout (VERDICT r3 item 6).
#
# Level l >= 1 of a (w0, h0) texture lives in a dedicated strip at
# (mip_x, mip_y) in the atlas:
#
#     ox(l) = mip_x + w0 - (w0 >> (l-1))      # closed form, no gathers
#     oy(l) = mip_y
#     size  = (max(w0 >> l, 1), max(h0 >> l, 1))
#
# Non-overlap: 2*(w0>>l) <= w0>>(l-1) for floor shifts, so level l ends at
# or before level l+1 starts, and the strip fits in (w0, max(h0>>1, 1)).
# The closed form means a per-lane level pick costs zero extra placement
# gathers — the material row only carries (mip_x, mip_y) per texture.
# ---------------------------------------------------------------------------


def n_mip_levels(w0, h0):
    """Number of levels ABOVE the base (levels 1..n all have both dims of
    w0>>l, h0>>l >= 1): floor(log2(min(w0, h0)))."""
    import numpy as np

    m = np.minimum(np.asarray(w0), np.asarray(h0)).astype(np.int64)
    return np.where(m > 0, np.floor(np.log2(np.maximum(m, 1))), 0).astype(
        np.int32
    )


def mip_placement(mip_x, mip_y, w0, h0, lvl):
    """(ox, oy, w, h) of mip level ``lvl`` (traced ints OK; lvl==0 returns
    garbage offsets — callers select the base placement for level 0)."""
    ox = mip_x + w0 - (w0 >> jnp.maximum(lvl - 1, 0))
    w = jnp.maximum(w0 >> lvl, 1)
    h = jnp.maximum(h0 >> lvl, 1)
    return ox, mip_y, w, h


def downsample_2x2(img):
    """One mip step: 2x2 box average with edge clamping on odd dims
    (uint8 (H, W, 4) -> (max(H//2,1), max(W//2,1), 4)). Linear-space-naive
    on sRGB data — matching the reference's vkCmdBlitImage mip generation,
    which also averages raw texel values (scene.cpp mipmap blits)."""
    import numpy as np

    h, w = img.shape[:2]
    h2, w2 = max(h // 2, 1), max(w // 2, 1)
    a = img.astype(np.uint16)
    x0 = np.minimum(np.arange(w2) * 2, w - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    y0 = np.minimum(np.arange(h2) * 2, h - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    s = (
        a[y0][:, x0].astype(np.uint32) + a[y0][:, x1]
        + a[y1][:, x0] + a[y1][:, x1]
    )
    return ((s + 2) // 4).astype(np.uint8)


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


def build_tap_rows(atlas: TextureAtlas):
    """Per-texel 2x2 bilinear footprint table: ``(H*W, 4) u32`` where row
    ``y*W + x`` holds the RGBA8 texels ``[c00, c10, c01, c11]`` of the
    bilinear footprint whose base texel is ``(x, y)``, with the +1 neighbors
    already wrapped per the owning texture's wrap mode.

    Turns the 4 texel gathers of :func:`sample_atlas` into ONE row gather
    (v5e gathers cost flat per ROW up to 512 B — docs/PERFORMANCE.md), the
    same packing that took env-map misses from 4 gathers to 1
    (``models/hdr.py::pack_env_rows``). Integer rows carry the raw RGBA8
    words: u32 lanes are exact on TPU (no f32 denormal flushing concerns).

    Neighbor maps per wrap mode (see ``integrator/shade.py::_axis_base`` for
    the matching per-ray base/weight remap):

    * REPEAT: ``(i+1) % size``
    * CLAMP: ``min(i+1, size-1)``
    * MIRROR: ``min(i+1, size-1)`` — the ascending-branch map; the
      descending branch of the mirror period is expressed at sample time as
      base ``i-1`` with weight ``1-f``, which lands on the same rows.
    """
    import numpy as np

    data = np.asarray(atlas.data)
    h_a, w_a = data.shape[:2]
    u32 = (
        data[..., 0].astype(np.uint32)
        | (data[..., 1].astype(np.uint32) << 8)
        | (data[..., 2].astype(np.uint32) << 16)
        | (data[..., 3].astype(np.uint32) << 24)
    )
    rows = np.zeros((h_a * w_a, 4), np.uint32)

    def neighbor(i, size, mode):
        if mode == WRAP_REPEAT:
            return (i + 1) % size
        return np.minimum(i + 1, size - 1)  # clamp & mirror-ascending

    n = len(np.asarray(atlas.x))
    xs_t = np.asarray(atlas.x)
    ys_t = np.asarray(atlas.y)
    ws_t = np.asarray(atlas.width)
    hs_t = np.asarray(atlas.height)
    wraps = np.asarray(atlas.wrap_s)
    wrapt = np.asarray(atlas.wrap_t)
    mx_t = np.asarray(atlas.mip_x) if atlas.mip_x is not None else None
    my_t = np.asarray(atlas.mip_y) if atlas.mip_y is not None else None

    def fill_rect(ox, oy, w, h, ws_mode, wt_mode):
        xs = np.arange(w)
        ys = np.arange(h)
        nx = neighbor(xs, w, ws_mode)
        ny = neighbor(ys, h, wt_mode)
        sub = u32[oy : oy + h, ox : ox + w]
        flat = ((oy + ys)[:, None] * w_a + (ox + xs)[None, :]).ravel()
        rows[flat, 0] = sub.ravel()
        rows[flat, 1] = sub[:, nx].ravel()
        rows[flat, 2] = sub[ny, :].ravel()
        rows[flat, 3] = sub[ny][:, nx].ravel()

    for t in range(n):
        ox, oy = int(xs_t[t]), int(ys_t[t])
        w, h = int(ws_t[t]), int(hs_t[t])
        if w <= 0 or h <= 0:
            continue
        fill_rect(ox, oy, w, h, int(wraps[t]), int(wrapt[t]))
        # Mip level rects get their own wrapped footprints (each level wraps
        # within ITS rect, same modes as the base texture).
        if mx_t is not None and mx_t[t] >= 0:
            for lvl in range(1, int(n_mip_levels(w, h)) + 1):
                lx = int(mx_t[t]) + w - (w >> (lvl - 1))
                lw, lh = max(w >> lvl, 1), max(h >> lvl, 1)
                fill_rect(lx, int(my_t[t]), lw, lh,
                          int(wraps[t]), int(wrapt[t]))
    return rows


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
