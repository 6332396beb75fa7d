"""Environment-light sampling (HDR alias method + sun&sky).

Runtime half of the importance-sampling pipeline: ``models/hdr.py`` builds the
alias table, these kernels consume it — vectorized forms of
``Environment_sample`` / ``EnvSample`` (``shaders/env_sampling.glsl:38-135``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.schema import Environment, SunSky
from . import rng
from .math import make_coordinate_system, normalize, spherical_uv
from .texture import sample_env
from .sunsky import sun_and_sky

M_PI = jnp.pi


def environment_sample(env: Environment, xi: jax.Array):
    """Alias-method sample of the lat-long HDR (env_sampling.glsl:38-99).

    ``xi`` is (..., 3) uniform. Returns ``(radiance (...,3), dir (...,3),
    pdf (...,))`` — radiance WITHOUT the hdrMultiplier (caller applies it).
    """
    h, w = env.image.shape[0], env.image.shape[1]
    size = h * w
    idx = jnp.minimum((xi[..., 0] * size).astype(jnp.int32), size - 1)

    if env.rows is not None:
        arow = env.rows[idx]                       # ONE gather: alias data
        q = arow[..., 12]
        alias = arow[..., 13].astype(jnp.int32)
        pdf_self, pdf_alias = arow[..., 14], arow[..., 15]
    else:
        q = env.accel.q[idx]
        alias = env.accel.alias[idx]
        pdf_self, pdf_alias = env.accel.pdf[idx], env.accel.alias_pdf[idx]
    take_self = xi[..., 1] < q
    env_idx = jnp.where(take_self, idx, alias)
    # Renormalize the used variate (reference reuses it for sub-texel phi).
    xi_y = jnp.where(
        take_self,
        xi[..., 1] / jnp.maximum(q, 1e-12),
        (xi[..., 1] - q) / jnp.maximum(1.0 - q, 1e-12),
    )
    pdf = jnp.where(take_self, pdf_self, pdf_alias)

    px = (env_idx % w).astype(jnp.float32)
    py = (env_idx // w).astype(jnp.float32)

    # Uniform direction within the texel's solid angle.
    u = (px + xi_y) / w
    phi = u * (2.0 * M_PI) - M_PI
    sin_phi = jnp.sin(phi)
    cos_phi = jnp.cos(phi)

    step_theta = M_PI / h
    theta0 = py * step_theta
    cos_theta = jnp.cos(theta0) * (1.0 - xi[..., 2]) + jnp.cos(theta0 + step_theta) * xi[..., 2]
    theta = jnp.arccos(jnp.clip(cos_theta, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    v = theta * (1.0 / M_PI)

    direction = jnp.stack(
        [cos_phi * sin_theta, cos_theta, sin_phi * sin_theta], axis=-1
    )
    uv = jnp.stack([u, v], axis=-1)
    if env.rows is not None:
        radiance = _bilinear_packed(env.rows, h, w, uv)
    else:
        radiance = sample_env(env.image, uv)
    return radiance, direction, pdf


def environment_pdf(env: Environment, direction: jax.Array) -> jax.Array:
    """PDF of :func:`environment_sample` for a given direction (per steradian).

    Not used by the reference integrator (its miss shader adds the full env
    contribution without MIS), provided for completeness/testing.
    """
    h, w = env.image.shape[0], env.image.shape[1]
    uv = spherical_uv(direction)
    x = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    # Texel selection prob = importance/total = pdf * solid_angle, and the
    # in-texel distribution is solid-angle uniform, so the per-steradian
    # density is exactly the stored pdf (maxChannel / integral).
    if env.rows is not None:
        return env.rows[y * w + x, 14]
    return env.accel.pdf[y * w + x]


def env_sample(
    env: Environment,
    sun_sky: SunSky,
    use_sun_sky: bool,
    hdr_multiplier: jax.Array,
    seed: jax.Array,
):
    """``EnvSample`` (env_sampling.glsl:105-135): draw an environment light
    sample from either the procedural sky (sun-disk cone, pdf 0.5) or the
    HDR alias table. ``use_sun_sky`` is static (scene config).

    Returns ``(radiance, dir, pdf, seed')``.
    """
    if use_sun_sky:
        seed, r = rng.rand2(seed)
        sun_radius = (0.00465 * 10.0) * sun_sky.sun_disk_scale
        t, b = make_coordinate_system(
            jnp.broadcast_to(sun_sky.sun_direction, r.shape[:-1] + (3,))
        )
        dx = r[..., 0] * sun_radius
        dy = r[..., 1] * sun_radius
        dz = jnp.sqrt(jnp.maximum(0.0, 1.0 - dx * dx - dy * dy))
        direction = normalize(
            t * dx[..., None] + b * dy[..., None] + sun_sky.sun_direction * dz[..., None]
        )
        radiance = sun_and_sky(sun_sky, direction)
        pdf = jnp.full(direction.shape[:-1], 0.5, jnp.float32)
    else:
        seed, xi = rng.rand3(seed)
        radiance, direction, pdf = environment_sample(env, xi)
    radiance = radiance * hdr_multiplier
    return radiance, direction, pdf, seed


def _bilinear_packed(rows: jax.Array, h: int, w: int, uv: jax.Array):
    """Bilinear env tap from the packed per-texel rows: the gathered row
    already holds the 2x2 footprint (models/hdr.py::pack_env_rows) — one
    gather instead of four. Matches sample_env exactly (U wrap, V clamp)."""
    px = uv[..., 0] * w - 0.5
    py = uv[..., 1] * h - 0.5
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    fx = (px - x0.astype(jnp.float32))[..., None]
    fy = (py - y0.astype(jnp.float32))[..., None]
    xw = jnp.remainder(x0, w)
    yw = jnp.clip(y0, 0, h - 1)
    row = rows[yw * w + xw]
    c00, c10 = row[..., 0:3], row[..., 3:6]
    c01, c11 = row[..., 6:9], row[..., 9:12]
    # V-clamp top edge: y0 == -1 clamps both taps to row 0 in sample_env;
    # the gathered y=0 row reproduces that with fy forced to 0. (The bottom
    # edge is handled at build time: the last row's "down" is itself.)
    fy = jnp.where((y0 < 0)[..., None], 0.0, fy)
    top = c00 + (c10 - c00) * fx
    bot = c01 + (c11 - c01) * fx
    return top + (bot - top) * fy


def env_radiance(
    env: Environment,
    sun_sky: SunSky,
    use_sun_sky: bool,
    hdr_multiplier: jax.Array,
    direction: jax.Array,
) -> jax.Array:
    """Environment radiance along a miss direction
    (pathtrace.glsl:218-227): sun&sky or lat-long lookup, x hdrMultiplier."""
    if use_sun_sky:
        e = sun_and_sky(sun_sky, direction)
    elif env.rows is not None:
        e = _bilinear_packed(
            env.rows, env.image.shape[0], env.image.shape[1],
            spherical_uv(direction),
        )
    else:
        e = sample_env(env.image, spherical_uv(direction))
    return e * hdr_multiplier
