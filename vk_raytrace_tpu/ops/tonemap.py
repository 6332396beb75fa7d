"""Tonemapping + post-processing chain.

The reference renders the HDR accumulation image through a fullscreen
fragment pass (``shaders/post.frag``, curves in ``shaders/tonemapping.glsl``);
here the whole chain is one fused elementwise jitted function over the image —
exactly the kind of bandwidth-bound map XLA fuses into a single HBM pass.

Implements: Uncharted2 (default), Hejl-Richard, ACES; Reinhard-style
auto-exposure from log-average luminance (global and "local" 7-level variant);
PCG3D dithering; contrast/brightness/saturation/vignette (post.frag:98-147).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.schema import Tonemapper
from . import rng
from .math import linear_to_srgb, srgb_to_linear

TM_UNCHARTED = 0
TM_HEJLRICHARD = 1
TM_ACES = 2
TM_LINEAR = 3


def _uncharted2_impl(c):
    a, b, cc, d, e, f = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
    return ((c * (a * c + cc * b) + d * e) / (c * (a * c + b) + d * f)) - e / f


def tonemap_uncharted(color):
    """(tonemapping.glsl:48-65)"""
    w = 11.2
    c = _uncharted2_impl(color * 2.0)
    white_scale = 1.0 / _uncharted2_impl(jnp.full((3,), w))
    return linear_to_srgb(c * white_scale)


def tonemap_hejl_richard(color):
    """(tonemapping.glsl:69-74) — outputs sRGB-ish directly."""
    c = jnp.maximum(0.0, color - 0.004)
    return (c * (6.2 * c + 0.5)) / (c * (6.2 * c + 1.7) + 0.06)


def tonemap_aces(color):
    """(tonemapping.glsl:78-85)"""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return linear_to_srgb(
        jnp.clip((color * (a * color + b)) / (color * (c * color + d) + e), 0.0, 1.0)
    )


def tone_map(color, exposure, mode: int = TM_UNCHARTED):
    """``toneMap`` (tonemapping.glsl:88-105). ``mode`` is static."""
    color = color * exposure
    if mode == TM_UNCHARTED:
        return tonemap_uncharted(color)
    if mode == TM_HEJLRICHARD:
        return tonemap_hejl_richard(color)
    if mode == TM_ACES:
        return tonemap_aces(color)
    return linear_to_srgb(color)


_RGB2Y = jnp.asarray([0.2126, 0.7152, 0.0722])
# Y row of the RGB->XYZ matrix (post.frag:56): the reference normalizes by
# the *XYZ luminance channel* rather than the Rec.709 luma above.
_XYZ_Y = jnp.asarray([0.2126729, 0.7151522, 0.0721750])


def _lum(c):
    return jnp.sum(c * _RGB2Y, axis=-1)


def tone_exposure(rgb, log_avg_lum, key, ywhite):
    """Reinhard-style photographic exposure (post.frag:62-70): scale the
    XYZ Y channel through the global operator, preserve chromaticity."""
    yc = jnp.sum(rgb * _XYZ_Y, axis=-1)
    y = (key / jnp.maximum(log_avg_lum, 1e-9)) * yc
    yd = (y * (1.0 + y / (ywhite * ywhite))) / (1.0 + y)
    scale = yd / jnp.maximum(yc, 1e-9)
    return rgb * scale[..., None]


def luminance_pyramid(rgb, levels: int = 8) -> list[jax.Array]:
    """Mip chain of the image's luminance, each level bilinearly upsampled
    back to full resolution — the analog of ``texture(inImage, uv, lod=i)``
    over the mipmapped accumulation image (render_output.cpp:188-193).
    Returns ``levels`` full-res (H, W) planes; level 0 is the raw luminance.
    """
    lum = _lum(rgb)
    h, w = lum.shape
    out = [lum]
    cur = lum
    for _ in range(1, levels):
        nh, nw = max(1, cur.shape[0] // 2), max(1, cur.shape[1] // 2)
        cur = jax.image.resize(cur, (nh, nw), method="linear")
        out.append(jax.image.resize(cur, (h, w), method="linear"))
    return out


def tone_local_exposure(rgb, log_avg_lum, key, ywhite, mips):
    """Local-adaptation photographic exposure (post.frag:72-95): per pixel,
    walk the luminance mip chain coarse-ward and adapt to the first level
    whose next-coarser level differs by more than ``epsilon`` relative to
    the Reinhard zone measure — small bright features keep their own
    exposure instead of being crushed by the global mean."""
    epsilon, phi = 0.05, 2.0
    yc = jnp.sum(rgb * _XYZ_Y, axis=-1)
    factor = key / jnp.maximum(log_avg_lum, 1e-9)
    y = factor * yc
    v = [m * factor for m in mips]
    la = v[7]
    # First-true-from-fine semantics via a reverse fold (the GLSL breaks at
    # the first level whose center/surround contrast exceeds epsilon).
    for i in reversed(range(7)):
        scale = float(1 << i)
        denom = (key * (2.0 ** phi) / (scale * scale)) + v[i]
        cond = jnp.abs(v[i] - v[i + 1]) / denom > epsilon
        la = jnp.where(cond, v[i], la)
    yd = y / (1.0 + la)
    scale_px = yd / jnp.maximum(yc, 1e-9)
    return rgb * scale_px[..., None]


def _dither(linear_color, noise, quant):
    """(post.frag:46-54)"""
    c0 = jnp.floor(linear_to_srgb(linear_color) / quant) * quant
    c1 = c0 + quant
    discr = srgb_to_linear(c0) + (srgb_to_linear(c1) - srgb_to_linear(c0)) * noise
    return jnp.where(discr < linear_color, c1, c0)


def apply_post(
    hdr: jax.Array,        # (H, W, 3) linear radiance (accumulated)
    tm: Tonemapper,
    mode: int = TM_UNCHARTED,
) -> jax.Array:
    """Full post chain of ``post.frag:98-147``. Returns (H, W, 3) in [0, 1]."""
    h, w = hdr.shape[0], hdr.shape[1]
    rgb = hdr

    # Auto exposure from average luminance (mip-chain top in the reference,
    # render_output.cpp:188-193; here an exact mean).
    avg = jnp.mean(rgb.reshape(-1, 3), axis=0)
    avg_lum2 = _lum(avg)
    auto = (tm.auto_exposure & 1) == 1
    local = (tm.auto_exposure & 2) == 2
    exposed_g = tone_exposure(rgb, avg_lum2, tm.key, tm.ywhite)
    exposed_l = tone_local_exposure(
        rgb, avg_lum2, tm.key, tm.ywhite, luminance_pyramid(rgb)
    )
    rgb = jnp.where(auto, jnp.where(local, exposed_l, exposed_g), rgb)

    # `avg_lum` is the manual exposure multiplier (toneMap's u_Exposure,
    # tonemapping.glsl:86-88; default 1.0, render_output.hpp:42).
    color = tone_map(rgb, tm.avg_lum, mode)

    # Dither against banding
    yy = jax.lax.broadcasted_iota(jnp.uint32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.uint32, (h, w), 1)
    r3 = rng.pcg3d(jnp.stack([xx, yy, jnp.zeros_like(xx)], axis=-1))
    noise = rng.bits_to_unit_float(r3)
    dithered = _dither(srgb_to_linear(color), noise, 1.0 / 255.0)
    color = jnp.where(tm.dither > 0, dithered, color)

    # Contrast / brightness / saturation / vignette
    color = jnp.clip(0.5 + (color - 0.5) * tm.contrast, 0.0, 1.0)
    color = jnp.power(jnp.maximum(color, 0.0), 1.0 / tm.brightness)
    grey = jnp.sum(color * jnp.asarray([0.299, 0.587, 0.114]), axis=-1, keepdims=True)
    color = grey + (color - grey) * tm.saturation

    u = (xx.astype(jnp.float32) + 0.5) / w
    v = (yy.astype(jnp.float32) + 0.5) / h
    uv = jnp.stack([u, v], -1) * tm.rendering_ratio
    duv = (uv - 0.5) * 2.0
    vig = 1.0 - jnp.sum(duv * duv, axis=-1) * tm.vignette
    color = color * vig[..., None]
    return jnp.clip(color, 0.0, 1.0)
