"""Procedural physically-based sun & sky.

Vectorized reimplementation of the reference's Preetham-style analytic model
(``shaders/sun_and_sky.glsl``, a port of the mental ray "MDL sun & sky"):

* Perez luminance/chromaticity distributions with turbidity-dependent
  coefficients (``sky_color_xyz`` :167-221, ``sky_luminance`` :224-250)
* spectral sun color via aerosol/ozone/Rayleigh attenuation
  (``calc_sun_color`` :141-164)
* sun disk + glow with optional physical scaling (``calc_physical_scale``
  :359-438)
* ground hemisphere with irradiance estimate (``calc_irrad`` :269-289),
  horizon height/blur, night color floor, red/blue shift, saturation tweaks

All branches become ``where`` masks over the direction batch; the 5x5
hemisphere quadrature of ``calc_irrad`` depends only on the sun direction, so
it is computed once on a constant direction set and broadcast.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.schema import SunSky
from .math import luminance, normalize, smoothstep

M_PI = jnp.pi


def _square_to_disk(x, y):
    """Concentric square->disk map (sun_and_sky.glsl:74-115)."""
    lx = 2.0 * x - 1.0
    ly = 2.0 * y - 1.0
    safe_lx = np.where(lx == 0.0, 1.0, lx)
    safe_ly = np.where(ly == 0.0, 1.0, ly)
    r1, p1 = lx, (np.pi / 4.0) * (1.0 + ly / safe_lx)
    r2, p2 = ly, (np.pi / 4.0) * (3.0 - lx / safe_ly)
    r3, p3 = -lx, (np.pi / 4.0) * (5.0 + ly / safe_lx)
    r4, p4 = -ly, (np.pi / 4.0) * (7.0 - lx / safe_ly)
    c1 = lx > -ly
    c2 = lx > ly
    c3 = lx < ly
    r = np.where(c1, np.where(c2, r1, r2), np.where(c3, r3, r4))
    p = np.where(c1, np.where(c2, p1, p2), np.where(c3, p3, p4))
    zero = (lx == 0.0) & (ly == 0.0)
    return np.where(zero, 0.0, r), np.where(zero, 0.0, p)


def _irrad_directions() -> np.ndarray:
    """The fixed 5x5 cosine-ish hemisphere directions of calc_irrad
    (sun_and_sky.glsl:277-286); normal = +z so xyz2dir is identity-ish."""
    dirs = []
    u = 1.0 / 10.0
    while u < 1.0:
        v = 1.0 / 10.0
        while v < 1.0:
            r, phi = _square_to_disk(np.float64(u), np.float64(v))
            x = r * np.cos(phi)
            y = r * np.sin(phi)
            z2 = 1.0 - x * x - y * y
            z = np.sqrt(z2) if z2 > 0 else 0.0
            # xyz2dir with main=+z: u-axis=(0? ) — for n=(0,0,1), |x|<|y| false
            # path gives u=(z,0,-x)->(1,0,0), v=cross(n,u)=(0,1,0): identity.
            dirs.append([x, y, z])
            v += 1.0 / 5.0
        u += 1.0 / 5.0
    return np.asarray(dirs)  # (25, 3)


_IRRAD_DIRS = _irrad_directions()


def _sun_color(sun_dir: jax.Array, turbidity: jax.Array) -> jax.Array:
    """Spectral sun attenuation (sun_and_sky.glsl:141-164). sun_dir (...,3)
    with z up (internal frame)."""
    ko = jnp.asarray([12.0, 8.5, 0.9])
    wavelength = jnp.asarray([0.610, 0.550, 0.470])
    sol_rad = jnp.asarray(
        [1.0 * 127500 / 0.9878, 0.992 * 127500 / 0.9878, 0.911 * 127500 / 0.9878]
    )
    z = sun_dir[..., 2]
    zc = jnp.clip(z, 1e-4, 1.0)
    m = 1.0 / (
        zc + 0.15 * jnp.power(jnp.maximum(93.885 - jnp.arccos(zc) * 180.0 / M_PI, 1e-3), -1.253)
    )
    beta = 0.04608 * turbidity - 0.04586
    alpha = 1.3
    ta = jnp.exp(-m[..., None] * beta[..., None] * jnp.power(wavelength, -alpha))
    to = jnp.exp(-m[..., None] * ko * 0.0035)
    tr = jnp.exp(-m[..., None] * 0.008735 * jnp.power(wavelength, -4.08))
    color = tr * ta * to * sol_rad
    return jnp.where((z > 0.0)[..., None], color, 0.0)


def _perez(cos_theta, gamma, cos_gamma, cos_theta_sun, theta_sun, a, b, c, d, e):
    num = (1.0 + a * jnp.exp(b / jnp.maximum(cos_theta, 1e-4))) * (
        1.0 + c * jnp.exp(d * gamma) + e * cos_gamma * cos_gamma
    )
    den = (1.0 + a * jnp.exp(b)) * (
        1.0 + c * jnp.exp(d * theta_sun) + e * cos_theta_sun * cos_theta_sun
    )
    return num / den


def _sky_luminance(direction, sun_pos, turbidity):
    """(sun_and_sky.glsl:224-250)"""
    cos_gamma = jnp.sum(sun_pos * direction, axis=-1)
    cos_gamma = jnp.maximum(cos_gamma, 0.0)
    cos_gamma = jnp.where(cos_gamma > 1.0, 2.0 - cos_gamma, cos_gamma)
    gamma = jnp.arccos(jnp.clip(cos_gamma, -1.0, 1.0))
    cos_theta = direction[..., 2]
    cos_theta_sun = sun_pos[..., 2]
    theta_sun = jnp.arccos(jnp.clip(cos_theta_sun, -1.0, 1.0))

    a = 0.178721 * turbidity - 1.463037
    b = -0.355402 * turbidity + 0.427494
    c = -0.022669 * turbidity + 5.325056
    d = 0.120647 * turbidity - 2.577052
    e = -0.066967 * turbidity + 0.370275
    return _perez(cos_theta, gamma, cos_gamma, cos_theta_sun, theta_sun, a, b, c, d, e)


def _sky_color_xyz(direction, sun_pos, turbidity, lum):
    """(sun_and_sky.glsl:167-221)"""
    cos_gamma = jnp.sum(sun_pos * direction, axis=-1)
    cos_gamma = jnp.where(cos_gamma > 1.0, 2.0 - cos_gamma, cos_gamma)
    gamma = jnp.arccos(jnp.clip(cos_gamma, -1.0, 1.0))
    cos_theta = direction[..., 2]
    cos_theta_sun = sun_pos[..., 2]
    theta_sun = jnp.arccos(jnp.clip(cos_theta_sun, -1.0, 1.0))
    t = turbidity
    t2 = t * t
    ts = theta_sun
    ts2 = ts * ts
    ts3 = ts2 * ts

    zenith_x = (
        (0.001650 * ts3 - 0.003742 * ts2 + 0.002088 * ts + 0.0) * t2
        + (-0.029028 * ts3 + 0.063773 * ts2 - 0.032020 * ts + 0.003948) * t
        + (0.116936 * ts3 - 0.211960 * ts2 + 0.060523 * ts + 0.258852)
    )
    zenith_y = (
        (0.002759 * ts3 - 0.006105 * ts2 + 0.003162 * ts + 0.0) * t2
        + (-0.042149 * ts3 + 0.089701 * ts2 - 0.041536 * ts + 0.005158) * t
        + (0.153467 * ts3 - 0.267568 * ts2 + 0.066698 * ts + 0.266881)
    )

    a = -0.019257 * t - (0.29 - jnp.sqrt(jnp.maximum(cos_theta_sun, 0.0)) * 0.09)
    b = -0.066513 * t + 0.000818
    c = -0.000417 * t + 0.212479
    d = -0.064097 * t - 0.898875
    e = -0.003251 * t + 0.045178
    x = _perez(cos_theta, gamma, cos_gamma, cos_theta_sun, theta_sun, a, b, c, d, e)

    a = -0.016698 * t - 0.260787
    b = -0.094958 * t + 0.009213
    c = -0.007928 * t + 0.210230
    d = -0.044050 * t - 1.653694
    e = -0.010922 * t + 0.052919
    y = _perez(cos_theta, gamma, cos_gamma, cos_theta_sun, theta_sun, a, b, c, d, e)

    x = zenith_x * x
    y = zenith_y * y
    y_safe = jnp.maximum(y, 1e-6)
    return jnp.stack(
        [(x / y_safe) * lum, lum, ((1.0 - x - y) / y_safe) * lum], axis=-1
    )


def _env_color(sun_dir, direction, turbidity):
    """Sky radiance for a direction (sun_and_sky.glsl:253-267)."""
    theta_sun = jnp.arccos(jnp.clip(sun_dir[..., 2], -1.0, 1.0))
    chi = (4.0 / 9.0 - turbidity / 120.0) * (M_PI - 2.0 * theta_sun)
    lum = 1000.0 * ((4.0453 * turbidity - 4.9710) * jnp.tan(chi) - 0.2155 * turbidity + 2.4192)
    lum = lum * _sky_luminance(direction, sun_dir, turbidity)
    xyz = _sky_color_xyz(direction, sun_dir, turbidity, lum)
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    rgb = jnp.stack(
        [
            3.241 * x - 1.537 * y - 0.499 * z,
            -0.969 * x + 1.876 * y + 0.042 * z,
            0.056 * x - 0.204 * y + 1.057 * z,
        ],
        axis=-1,
    )
    return rgb * M_PI


def _calc_irrad(sun_dir, turbidity):
    """Hemisphere irradiance estimate (sun_and_sky.glsl:269-289). Depends
    only on the sun direction: 25 fixed quadrature directions."""
    dirs = jnp.asarray(_IRRAD_DIRS, jnp.float32)  # (25, 3)
    cols = _env_color(sun_dir[..., None, :], dirs, turbidity[..., None])
    return jnp.mean(cols, axis=-2)


def _tweak_saturation(saturation, haze):
    """(sun_and_sky.glsl:292-308)"""
    lowsat = jnp.power(jnp.maximum(saturation, 0.0), 3.0)
    lh = jnp.clip((haze - 2.0) / 15.0, 0.0, 1.0) ** 3
    mixed = saturation * (1.0 - lh) + lowsat * lh
    return jnp.where(saturation <= 1.0, mixed, 1.0)


def _vector_tweak(d, y_is_up, horiz_height):
    """Swap to z-up and bend for horizon height (sun_and_sky.glsl:311-324)."""
    d_sw = jnp.stack([d[..., 0], d[..., 2], d[..., 1]], axis=-1)
    d = jnp.where(y_is_up == 1, d_sw, d)
    dz = d[..., 2] - horiz_height
    bent = normalize(jnp.stack([d[..., 0], d[..., 1], dz], axis=-1))
    return jnp.where(horiz_height != 0.0, bent, d)


def _color_tweak(tint, saturation, redness):
    """(sun_and_sky.glsl:327-356)"""
    inten = luminance(tint)[..., None]
    desat = tint * saturation + inten * (1.0 - saturation)
    out = jnp.where(saturation <= 0.0, inten * jnp.ones_like(tint), desat)
    return out * jnp.stack(
        [1.0 + redness, jnp.ones_like(redness), 1.0 - redness], axis=-1
    )


def _night_adjustment(sun_dir):
    """(sun_and_sky.glsl:441-450)"""
    lmt = 0.30901699437494742
    f = jnp.clip((sun_dir[..., 2] + lmt) / lmt, 0.0, None)
    f = f * f
    f = f * f
    return jnp.where(sun_dir[..., 2] <= -lmt, 0.0, f)


def _physical_scale(sun_disk_scale, sun_glow_intensity, sun_disk_intensity):
    """(sun_and_sky.glsl:359-438). Returns (disk_scale, glow_scale)."""
    sun_disk_radius = 0.00465 * sun_disk_scale
    sun_glow_radius = sun_disk_radius * 10.0
    r = sun_glow_radius
    glow_integral = sun_glow_intensity * (
        (4.0 * M_PI) - (24.0 * M_PI) / (r * r) + (24.0 * M_PI) * jnp.sin(r) / (r * r * r)
    )
    target = sun_disk_intensity * M_PI
    max_glow = 0.5 * target
    over = glow_integral > max_glow
    glow_scale = jnp.where(over, max_glow / jnp.maximum(glow_integral, 1e-12), 1.0)
    target = jnp.where(over, target - max_glow, target - glow_integral)

    area = 2.0 * M_PI * (1.0 - jnp.cos(sun_disk_radius))
    target_intensity = target / jnp.maximum(area, 1e-12)
    actual_intensity = sun_disk_intensity * 100.0
    disk_scale = jnp.where(
        target_intensity == 0.0, 0.0, target_intensity / jnp.maximum(actual_intensity, 1e-12)
    )
    return disk_scale, glow_scale


def bake_environment(
    ss: SunSky, height: int = 512, width: int = 1024, disk: bool = True
) -> jax.Array:
    """Evaluate the procedural sky into a lat-long map (H, W, 3).

    TPU-first design decision: the reference evaluates ``sun_and_sky`` per
    ray in-shader (pathtrace.glsl:220); on a vector machine the model's
    ~1000 transcendentals/ray (incl. the 25-sample ground irradiance
    quadrature) dominate whole frames. Baking once per parameter change
    turns the runtime path into a plain environment lookup; the alias table
    importance-samples the sky and glow. The production path bakes with
    ``disk=False`` and re-adds the sub-texel disk core analytically
    (:func:`sun_disk_radiance`, render.py::prepare_sun_sky).
    The grid matches ``GetSphericalUv``'s mapping exactly.
    """
    us = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    vs = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
    theta = (us - 0.5) * (2.0 * M_PI)          # atan2(z, x)
    gamma = (vs - 0.5) * M_PI                  # asin(-y)
    cg = jnp.cos(gamma)[:, None]
    y = -jnp.sin(gamma)[:, None] * jnp.ones((1, width))
    x = cg * jnp.cos(theta)[None, :]
    z = cg * jnp.sin(theta)[None, :]
    dirs = jnp.stack([x, y, z], axis=-1)

    # Evaluate in row chunks to keep each program small.
    rows = []
    chunk = max(1, (1 << 16) // width)
    f = jax.jit(lambda d: sun_and_sky(ss, d, disk=disk))
    for y0 in range(0, height, chunk):
        rows.append(f(dirs[y0 : y0 + chunk].reshape(-1, 3)))
    out = jnp.concatenate(rows, axis=0).reshape(height, width, 3)
    return jnp.maximum(out, 0.0)


def sun_and_sky(
    ss: SunSky, direction: jax.Array, disk: bool = True
) -> jax.Array:
    """Radiance of the procedural sky along ``direction`` (..., 3).

    Vectorized port of ``sun_and_sky`` (sun_and_sky.glsl:453-601).

    ``disk=False`` (static) drops ONLY the hard sun-disk core term (the
    ``smoothstep(8.5, ...)`` clause of the sun factor,
    sun_and_sky.glsl:543-548) while keeping the wide glow. The production
    sun&sky path bakes the sky without the core (its ~0.27° radius is
    sub-texel at any practical bake resolution) and re-adds it analytically
    per miss ray — :func:`sun_disk_radiance` is the exact dropped term.
    """
    horiz_height = ss.horizon_height / 10.0
    d = _vector_tweak(direction, ss.y_is_up, horiz_height)

    local_haze = jnp.maximum(2.0 + ss.haze, 2.0)
    local_sat = _tweak_saturation(ss.saturation, local_haze)
    rgb_scale = jnp.where(
        luminance(ss.rgb_unit_conversion) < 0.0,
        jnp.full((3,), 1.0 / 80000.0),
        ss.rgb_unit_conversion,
    ) * ss.multiplier

    downness = d[..., 2]
    real_dir = d
    d_up = d.at[..., 2].set(jnp.maximum(d[..., 2], 0.001))
    d_up = normalize(d_up)

    sun_dir0 = _vector_tweak(normalize(ss.sun_direction), ss.y_is_up, horiz_height)
    factor = jnp.where(sun_dir0[..., 2] < 0.0, _night_adjustment(sun_dir0), 1.0)
    real_sun = sun_dir0
    sun_dir = normalize(sun_dir0.at[..., 2].set(jnp.maximum(sun_dir0[..., 2], 0.001)))

    tint = _env_color(sun_dir, d_up, local_haze) * jnp.minimum(factor, 1.0)[..., None]
    tint = jnp.where((factor > 0.0)[..., None], tint, 0.0)

    sun_color = _sun_color(
        sun_dir, jnp.where(downness > 0.0, local_haze, 2.0)
    )

    # Sun disk + glow
    cosang = jnp.clip(jnp.sum(real_dir * real_sun, axis=-1), -1.0, 1.0)
    sun_angle = jnp.arccos(cosang)
    sun_radius = 0.00465 * ss.sun_disk_scale * 10.0
    in_disk = (sun_angle < sun_radius) & (ss.sun_disk_intensity > 0.0) & (ss.sun_disk_scale > 0.0)
    disk_scale, glow_scale = _physical_scale(
        ss.sun_disk_scale, ss.sun_glow_intensity, ss.sun_disk_intensity
    )
    disk_scale = jnp.where(ss.physically_scaled_sun == 1, disk_scale, 1.0)
    glow_scale = jnp.where(ss.physically_scaled_sun == 1, glow_scale, 1.0)
    sf = (1.0 - sun_angle / jnp.maximum(sun_radius, 1e-9)) * 10.0
    sun_factor = (
        jnp.power(jnp.maximum(sf, 0.0) / 10.0, 3.0) * 2.0 * ss.sun_glow_intensity * glow_scale
    )
    if disk:
        sun_factor = sun_factor + (
            smoothstep(8.5, 9.5 + local_haze / 50.0, sf)
            * 100.0 * ss.sun_disk_intensity * disk_scale
        )
    tint = tint + jnp.where(in_disk[..., None], sun_color * sun_factor[..., None], 0.0)

    out_color = tint * rgb_scale

    # Ground hemisphere
    irrad = _calc_irrad(sun_dir, jnp.full_like(local_haze, 2.0))
    downcolor = ss.ground_color * (irrad + sun_color * sun_dir[..., 2:3]) * rgb_scale
    downcolor = downcolor * jnp.minimum(factor, 1.0)

    hor_blur = ss.horizon_blur / 10.0
    dness = jnp.clip(-downness / jnp.maximum(hor_blur, 1e-9), 0.0, 1.0)
    dness = smoothstep(0.0, 1.0, dness)
    below = downness <= 0.0
    blended = out_color * (1.0 - dness[..., None]) + downcolor * dness[..., None]
    night_factor = jnp.where(
        below, jnp.where(hor_blur > 0.0, 1.0 - dness, 0.0), 1.0
    )
    out_color = jnp.where(
        below[..., None],
        jnp.where(hor_blur > 0.0, blended, downcolor),
        out_color,
    )

    out_color = _color_tweak(out_color, local_sat, ss.redblueshift)
    night = ss.night_color * night_factor[..., None]
    result = jnp.maximum(out_color, jnp.where(night_factor[..., None] > 0.0, night, 0.0))
    result = result * M_PI
    return jnp.where(ss.multiplier <= 0.0, 0.0, result)


# ---------------------------------------------------------------------------
# Analytic sun disk (hybrid sky): the baked environment drops the hard disk
# core (sub-texel at any practical bake resolution) and the runtime adds it
# back analytically — on env miss (ops/env.py::env_radiance) and as a cone
# NEE strategy (ops/env.py::env_sample), the TPU counterpart of the
# reference's per-ray disk evaluation (sun_and_sky.glsl:543-548) + sun-cone
# NEE sample (env_sampling.glsl:110-125).
# ---------------------------------------------------------------------------


def sun_disk_radiance(ss: SunSky, direction: jax.Array) -> jax.Array:
    """The exact radiance term dropped by ``sun_and_sky(..., disk=False)``.

    ``sun_and_sky(ss, d) == sun_and_sky(ss, d, disk=False)
    + sun_disk_radiance(ss, d)`` for every direction, up to the night-color
    floor: the reference takes ``max(out_color, night)`` of the TOTAL
    (sun_and_sky.glsl:592-596) while the split applies the floor to the
    disk-less sky only. The difference is bounded by ``night_color``
    (default luminance ~0.002 vs a disk core ~1e4x brighter) and only at
    dusk — tests/test_sunsky_disk.py checks the identity with the floor
    disabled and the bound with it enabled.

    Per-ray cost: one dot, one arccos, one smoothstep + ~20 mults — cheap
    enough for every miss lane (the full model is ~1000 transcendentals).
    """
    horiz_height = ss.horizon_height / 10.0
    d = _vector_tweak(direction, ss.y_is_up, horiz_height)
    local_haze = jnp.maximum(2.0 + ss.haze, 2.0)
    local_sat = _tweak_saturation(ss.saturation, local_haze)
    rgb_scale = jnp.where(
        luminance(ss.rgb_unit_conversion) < 0.0,
        jnp.full((3,), 1.0 / 80000.0),
        ss.rgb_unit_conversion,
    ) * ss.multiplier

    downness = d[..., 2]
    sun_dir0 = _vector_tweak(normalize(ss.sun_direction), ss.y_is_up, horiz_height)

    # Disk core term of sun_factor (sun_and_sky.glsl:543-548).
    cosang = jnp.clip(jnp.sum(d * sun_dir0, axis=-1), -1.0, 1.0)
    sun_angle = jnp.arccos(cosang)
    sun_radius = 0.00465 * ss.sun_disk_scale * 10.0
    in_disk = (
        (sun_angle < sun_radius)
        & (ss.sun_disk_intensity > 0.0)
        & (ss.sun_disk_scale > 0.0)
    )
    disk_scale, _glow_scale = _physical_scale(
        ss.sun_disk_scale, ss.sun_glow_intensity, ss.sun_disk_intensity
    )
    disk_scale = jnp.where(ss.physically_scaled_sun == 1, disk_scale, 1.0)
    sf = (1.0 - sun_angle / jnp.maximum(sun_radius, 1e-9)) * 10.0
    disk_term = (
        smoothstep(8.5, 9.5 + local_haze / 50.0, sf)
        * 100.0 * ss.sun_disk_intensity * disk_scale
    )
    sun_color = _sun_color(
        normalize(sun_dir0.at[..., 2].set(jnp.maximum(sun_dir0[..., 2], 0.001))),
        jnp.where(downness > 0.0, local_haze, 2.0),
    )
    delta = jnp.where(in_disk[..., None], sun_color * disk_term[..., None], 0.0)
    delta = delta * rgb_scale

    # Horizon blend scaling: below the horizon the sky blends toward the
    # ground color (sun_and_sky.glsl:565-583); the disk contributes through
    # the (1 - dness) sky weight only (zero below with no blur).
    hor_blur = ss.horizon_blur / 10.0
    dness = smoothstep(
        0.0, 1.0, jnp.clip(-downness / jnp.maximum(hor_blur, 1e-9), 0.0, 1.0)
    )
    h_scale = jnp.where(
        downness <= 0.0, jnp.where(hor_blur > 0.0, 1.0 - dness, 0.0), 1.0
    )
    delta = delta * h_scale[..., None]

    # Linear color tweak commutes with the split (both blend and tweak are
    # linear in the radiance).
    delta = _color_tweak(delta, local_sat, ss.redblueshift)
    delta = delta * M_PI
    return jnp.where(ss.multiplier <= 0.0, 0.0, delta)


def sun_disk_cone(ss: SunSky):
    """Sampling cone for the analytic disk: ``(present, axis, cos_theta)``.

    ``axis`` is the normalized WORLD sun direction; ``cos_theta`` the cone
    half-angle covering the disk-core support (``sf > 8.5`` ⇔ angle <
    0.15 x glow radius, sun_and_sky.glsl:543) with a 1.25x guard for the
    horizon-height bend of ``_vector_tweak``. Coverage is a variance knob
    only — the alias half of the NEE mixture has full-sphere support, so an
    under-covering cone cannot bias the estimator (ops/env.py::env_sample).
    """
    axis = normalize(ss.sun_direction)
    theta = 0.15 * (0.00465 * ss.sun_disk_scale * 10.0) * 1.25
    cos_theta = jnp.cos(jnp.minimum(theta, M_PI))
    present = (
        (ss.multiplier > 0.0)
        & (ss.sun_disk_intensity > 0.0)
        & (ss.sun_disk_scale > 0.0)
    )
    return present, axis, cos_theta
