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
from .sunsky import sun_and_sky, sun_disk_cone, sun_disk_radiance

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


def environment_pdf(
    env: Environment,
    direction: jax.Array,
    sun_sky: SunSky = None,
    sun_disk: bool = False,
) -> jax.Array:
    """PDF of :func:`environment_sample` for a given direction (per steradian).

    Not used by the reference integrator (its miss shader adds the full env
    contribution without MIS), provided for the full-MIS estimator.

    ``sun_disk`` (static): the hybrid analytic-sun strategy — the density
    becomes the 50/50 mixture of the alias table and the uniform sun-disk
    cone of :func:`env_sample`, so BSDF-side MIS weights stay consistent
    with the NEE sampler.
    """
    h, w = env.image.shape[0], env.image.shape[1]
    uv = spherical_uv(direction)
    x = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    # Texel selection prob = importance/total = pdf * solid_angle, and the
    # in-texel distribution is solid-angle uniform, so the per-steradian
    # density is exactly the stored pdf (maxChannel / integral).
    if env.rows is not None:
        pdf = env.rows[y * w + x, 14]
    else:
        pdf = env.accel.pdf[y * w + x]
    if sun_disk:
        q, p_cone = _cone_pdf(sun_sky, direction)
        pdf = (1.0 - q) * pdf + q * p_cone
    return pdf


def _cone_pdf(sun_sky: SunSky, direction: jax.Array):
    """(q, p_cone(direction)) of the sun-cone half of the NEE mixture:
    uniform density over the cone's solid angle, zero outside; ``q`` is the
    traced cone-selection probability (0 when the disk is disabled)."""
    present, axis, cos_theta = sun_disk_cone(sun_sky)
    q = jnp.where(present, 0.5, 0.0)
    solid_angle = 2.0 * M_PI * jnp.maximum(1.0 - cos_theta, 1e-12)
    # Rim slack: a direction drawn AT the cone boundary (cz == cos_theta at
    # xi=1) can evaluate dot < cos_theta after normalization rounding, which
    # would drop the cone term from the mixture pdf and ~double that
    # sample's contribution (rim fireflies) — test with eps (ADVICE r4 #4).
    inside = jnp.sum(direction * axis, axis=-1) >= cos_theta - 1e-6
    return q, jnp.where(inside, 1.0 / solid_angle, 0.0)


def env_sample(
    env: Environment,
    sun_sky: SunSky,
    use_sun_sky: bool,
    hdr_multiplier: jax.Array,
    seed: jax.Array,
    sun_disk: bool = False,
):
    """``EnvSample`` (env_sampling.glsl:105-135): draw an environment light
    sample from either the procedural sky (sun-disk cone, pdf 0.5) or the
    HDR alias table. ``use_sun_sky`` is static (scene config).

    ``sun_disk`` (static, production sun&sky path): the baked-sky alias
    table cannot resolve the sub-texel disk core, so the env strategy
    becomes a 50/50 MIXTURE of (a) a uniform sample of the sun-disk cone
    and (b) the alias table over the disk-less baked sky, with the proper
    mixture density (unlike the reference's hardcoded pdf=0.5,
    env_sampling.glsl:123 — its own comment says "#TODO: find proper
    light direction + PDF"). Radiance returned is the TOTAL environment
    along the sampled direction (baked + analytic disk delta).

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
    elif sun_disk:
        seed, u_mix = rng.rand(seed)
        seed, xi = rng.rand3(seed)
        radiance, direction, pdf = sample_env_mixture(env, sun_sky, u_mix, xi)
    else:
        seed, xi = rng.rand3(seed)
        radiance, direction, pdf = environment_sample(env, xi)
    radiance = radiance * hdr_multiplier
    return radiance, direction, pdf, seed


def sample_env_mixture(env: Environment, sun_sky: SunSky, u_mix, xi):
    """The sun-disk NEE mixture with pre-drawn variates (``u_mix`` then
    ``xi``; the fused-shade prologue draws them up front to keep per-lane
    streams bit-identical — integrator/shade_fused.py).

    Returns ``(radiance, direction, pdf)`` where radiance is the TOTAL env
    (disk-less baked lookup + analytic disk delta) and pdf the proper
    mixture density at the chosen direction.
    """
    # Alias half (the disk-less baked sky).
    a_rad, a_dir, a_pdf = environment_sample(env, xi)
    # Cone half: uniform over the disk cone's solid angle (reuses xi[1:]
    # so both halves consume the same draws).
    present, axis, cos_theta = sun_disk_cone(sun_sky)
    q = jnp.where(present, 0.5, 0.0)
    cz = 1.0 - xi[..., 1] * (1.0 - cos_theta)
    sz = jnp.sqrt(jnp.maximum(0.0, 1.0 - cz * cz))
    phi = xi[..., 2] * (2.0 * M_PI)
    t, b = make_coordinate_system(
        jnp.broadcast_to(axis, xi.shape[:-1] + (3,))
    )
    c_dir = normalize(
        t * (sz * jnp.cos(phi))[..., None]
        + b * (sz * jnp.sin(phi))[..., None]
        + axis * cz[..., None]
    )
    take_cone = u_mix < q
    direction = jnp.where(take_cone[..., None], c_dir, a_dir)
    # Mixture density at the CHOSEN direction: the cone branch needs the
    # alias pdf of the cone direction (one extra row gather), the alias
    # branch the analytic cone density of its direction.
    _, p_cone_at = _cone_pdf(sun_sky, direction)
    p_alias_at = jnp.where(take_cone, environment_pdf(env, c_dir), a_pdf)
    pdf = (1.0 - q) * p_alias_at + q * p_cone_at
    # Total env radiance along the chosen direction: baked lookup for cone
    # dirs + the analytic disk delta everywhere.
    if env.rows is not None:
        c_rad = _bilinear_packed(
            env.rows, env.image.shape[0], env.image.shape[1],
            spherical_uv(c_dir),
        )
    else:
        c_rad = sample_env(env.image, spherical_uv(c_dir))
    radiance = jnp.where(take_cone[..., None], c_rad, a_rad)
    radiance = radiance + sun_disk_radiance(sun_sky, direction)
    return radiance, direction, pdf


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
    sun_disk: bool = False,
) -> jax.Array:
    """Environment radiance along a miss direction
    (pathtrace.glsl:218-227): sun&sky or lat-long lookup, x hdrMultiplier.

    ``sun_disk`` (static): baked-sky mode with the analytic disk core added
    back per ray (the bake dropped it — ops/sunsky.py::sun_disk_radiance),
    giving a sharp sun at any bake resolution."""
    if use_sun_sky:
        e = sun_and_sky(sun_sky, direction)
    elif env.rows is not None:
        e = _bilinear_packed(
            env.rows, env.image.shape[0], env.image.shape[1],
            spherical_uv(direction),
        )
    else:
        e = sample_env(env.image, spherical_uv(direction))
    if sun_disk and not use_sun_sky:
        e = e + sun_disk_radiance(sun_sky, direction)
    return e * hdr_multiplier
