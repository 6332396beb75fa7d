"""Core math kernels shared across the framework.

TPU-native reimplementations of the reference's shared GLSL/C++ utility math:

* Octahedral unit-vector compression (reference: ``shaders/compress.glsl:111-180``).
  Normals/tangents are stored as a single ``uint32`` (2x16-bit snorm octahedral
  coordinates), halving the vertex-attribute bandwidth of the gather-heavy
  shade-state reconstruction.
* Self-intersection-safe ray offsetting (reference: ``shaders/common.glsl:98-113``,
  Ray Tracing Gems ch. 6): integer-ULP offsets along the geometric normal.
* Spherical (lat-long) UV mapping for environment lookups
  (reference: ``shaders/common.glsl:67-74``).
* Orthonormal-basis construction (reference: ``shaders/common.glsl:80-92``,
  ``shaders/shade_state.glsl:36-41``).

Everything is pure ``jnp`` on arrays of arbitrary leading batch shape; all
functions are jit/vmap/shard_map friendly (no data-dependent control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Sentinel meaning "no hit" / invalid. float32 max, as in the reference's
# C_Stack_Max (shaders/compress.glsl:104).
F32_MAX = 3.402823466e38
INFINITY = 1e32  # reference uses 1e32 for "infinite" light distance


def round_even(x: jax.Array) -> jax.Array:
    """Round-half-to-even, matching GLSL ``roundEven`` used by the encoder."""
    return jnp.round(x)


def oct_encode(v: jax.Array) -> jax.Array:
    """Compress unit vectors ``(..., 3)`` to octahedral uint32.

    Bit-compatible with the reference ``compress_unit_vec``
    (shaders/compress.glsl:111-139): 16-bit snorm x in the low half,
    y in the high half, lower-hemisphere folding done in integer space.
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    d = 32767.0 / (jnp.abs(x) + jnp.abs(y) + jnp.abs(z))
    xi = round_even(x * d).astype(jnp.int32)
    yi = round_even(y * d).astype(jnp.int32)

    # Fold the lower hemisphere over the diagonals (integer-exact).
    maskx = xi >> 31
    masky = yi >> 31
    tmp = 32767 + maskx + masky
    xf = (tmp - (yi ^ masky)) ^ maskx
    yf = (tmp - (xi ^ maskx)) ^ masky
    neg_z = z < 0.0
    xi = jnp.where(neg_z, xf, xi)
    yi = jnp.where(neg_z, yf, yi)

    packed = (((yi + 32767).astype(jnp.uint32)) << 16) | (xi + 32767).astype(jnp.uint32)
    # Reserve ~0u as the invalid marker.
    packed = jnp.where(packed == jnp.uint32(0xFFFFFFFF), jnp.uint32(0xFFFFFFFE), packed)
    return packed


def oct_decode(packed: jax.Array) -> jax.Array:
    """Decompress octahedral uint32 ``(...,)`` back to unit vectors ``(..., 3)``.

    Matches the reference ``decompress_unit_vec`` (shaders/compress.glsl:149-180).
    The reference's bit-twiddled short->float maps short v exactly to v/32768,
    which we use directly (exact: division by a power of two).
    """
    packed = packed.astype(jnp.uint32)
    x = (packed & jnp.uint32(0xFFFF)).astype(jnp.int32) - 32767
    y = (packed >> 16).astype(jnp.int32) - 32767

    maskx = x >> 31
    masky = y >> 31
    tmp0 = 32767 + maskx + masky
    ymask = y ^ masky
    tmp1 = tmp0 - (x ^ maskx)
    z = tmp1 - ymask
    xf = (tmp0 - ymask) ^ maskx
    yf = tmp1 ^ masky
    neg_z = z < 0
    x = jnp.where(neg_z, xf, x)
    y = jnp.where(neg_z, yf, y)

    vec = jnp.stack(
        [x.astype(jnp.float32), y.astype(jnp.float32), z.astype(jnp.float32)],
        axis=-1,
    ) * (1.0 / 32768.0)
    return normalize(vec)


def normalize(v: jax.Array, eps: float = 0.0) -> jax.Array:
    """L2-normalize over the last axis (GLSL ``normalize`` semantics)."""
    n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    if eps:
        n = jnp.maximum(n, eps)
    return v / n


def dot(a: jax.Array, b: jax.Array, keepdims: bool = False) -> jax.Array:
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def cross(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.cross(a, b)


def luminance(rgb: jax.Array) -> jax.Array:
    """CIE luminance, reference weights (shaders/sun_and_sky.glsl:31-34)."""
    return 0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]


def firefly_luminance(rgb: jax.Array) -> jax.Array:
    """Luminance weights used by the firefly clamp (shaders/pathtrace.glsl:380)."""
    return (
        0.212671 * rgb[..., 0] + 0.715160 * rgb[..., 1] + 0.072169 * rgb[..., 2]
    )


def offset_ray(p: jax.Array, n: jax.Array) -> jax.Array:
    """Offset ray origin ``p`` along normal ``n`` to avoid self-intersection.

    Integer-ULP offset away from the surface (reference:
    ``shaders/common.glsl:98-113``; Ray Tracing Gems ch. 6).
    """
    int_scale = 256.0
    float_scale = 1.0 / 65536.0
    origin = 1.0 / 32.0

    of_i = (int_scale * n).astype(jnp.int32)
    p_bits = jax.lax.bitcast_convert_type(p, jnp.int32)
    p_i_bits = p_bits + jnp.where(p < 0.0, -of_i, of_i)
    p_i = jax.lax.bitcast_convert_type(p_i_bits, jnp.float32)

    return jnp.where(jnp.abs(p) < origin, p + float_scale * n, p_i)


def spherical_uv(v: jax.Array) -> jax.Array:
    """Direction -> lat-long UV (reference ``GetSphericalUv``, common.glsl:67-74)."""
    gamma = jnp.arcsin(-jnp.clip(v[..., 1], -1.0, 1.0))
    theta = jnp.arctan2(v[..., 2], v[..., 0])
    u = theta * (0.5 / jnp.pi) + 0.5
    w = gamma / jnp.pi + 0.5
    return jnp.stack([u, w], axis=-1)


def make_coordinate_system(n: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Build tangent/bitangent for normal ``(..., 3)``.

    Matches ``CreateCoordinateSystem`` (shaders/common.glsl:80-92) /
    ``CreateTangent`` (shaders/shade_state.glsl:36-41): branch on |Nz|.
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    big_z = jnp.abs(nz) > 0.99999
    t = jnp.where(
        big_z[..., None],
        jnp.stack([-nx * ny, 1.0 - ny * ny, -ny * nz], axis=-1),
        jnp.stack([-nx * nz, -ny * nz, 1.0 - nz * nz], axis=-1),
    )
    t = normalize(t)
    b = jnp.cross(t, n)
    return t, b


def to_local(v: jax.Array, t: jax.Array, b: jax.Array, n: jax.Array) -> jax.Array:
    """World -> tangent-space components (dot with each basis vector)."""
    return jnp.stack([dot(v, t), dot(v, b), dot(v, n)], axis=-1)


def from_local(v: jax.Array, t: jax.Array, b: jax.Array, n: jax.Array) -> jax.Array:
    """Tangent-space -> world: ``x*T + y*B + z*N``."""
    return v[..., 0:1] * t + v[..., 1:2] * b + v[..., 2:3] * n


def reflect(i: jax.Array, n: jax.Array) -> jax.Array:
    """GLSL ``reflect``: ``i - 2*dot(n,i)*n`` (incident points at surface)."""
    return i - 2.0 * dot(i, n, keepdims=True) * n


def refract(i: jax.Array, n: jax.Array, eta: jax.Array) -> jax.Array:
    """GLSL ``refract``. Returns 0-vector on total internal reflection."""
    if jnp.ndim(eta) and eta.shape and eta.shape[-1] != 1:
        eta = eta[..., None]
    cosi = dot(n, i, keepdims=True)
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    tir = k < 0.0
    k_safe = jnp.maximum(k, 0.0)
    out = eta * i - (eta * cosi + jnp.sqrt(k_safe)) * n
    return jnp.where(tir, jnp.zeros_like(out), out)


def mix(a, b, t):
    """GLSL ``mix``: linear blend a*(1-t)+b*t."""
    return a + (b - a) * t


def smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def power_heuristic(a: jax.Array, b: jax.Array) -> jax.Array:
    """MIS power heuristic (beta=2), reference ``powerHeuristic``
    (shaders/pbr_disney.glsl:224-229)."""
    t = a * a
    return t / (b * b + t)


def transform_point(m: jax.Array, p: jax.Array) -> jax.Array:
    """Apply 4x4 row-major matrix to points ``(..., 3)``."""
    ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
    out = jnp.einsum("ij,...j->...i", m, ph)
    return out[..., :3]


def transform_vector(m: jax.Array, v: jax.Array) -> jax.Array:
    """Apply the linear part of a 4x4 matrix to vectors ``(..., 3)``."""
    return jnp.einsum("ij,...j->...i", m[:3, :3], v)


def transform_normal(m: jax.Array, n: jax.Array) -> jax.Array:
    """Transform normals with the inverse-transpose of the linear part."""
    inv_t = jnp.linalg.inv(m[:3, :3]).T
    return jnp.einsum("ij,...j->...i", inv_t, n)


def srgb_to_linear(c: jax.Array) -> jax.Array:
    """Fast sRGB->linear approximation used by the reference
    (shaders/gltf_material.glsl:37-46): ``pow(c, 2.2)``."""
    return jnp.power(jnp.maximum(c, 0.0), 2.2)


def linear_to_srgb(c: jax.Array) -> jax.Array:
    """Fast linear->sRGB approximation (shaders/tonemapping.glsl:27-31)."""
    return jnp.power(jnp.maximum(c, 0.0), 1.0 / 2.2)


def temperature(intensity: jax.Array) -> jax.Array:
    """Cold-hot heatmap ramp (reference ``temperature``, common.glsl:48-62)."""

    def fade(low, high, value):
        mid = (low + high) * 0.5
        rng = (high - low) * 0.5
        x = 1.0 - jnp.clip(jnp.abs(mid - value) / rng, 0.0, 1.0)
        return smoothstep(0.0, 1.0, x)

    blue = jnp.array([0.0, 0.0, 1.0])
    cyan = jnp.array([0.0, 1.0, 1.0])
    green = jnp.array([0.0, 1.0, 0.0])
    yellow = jnp.array([1.0, 1.0, 0.0])
    red = jnp.array([1.0, 0.0, 0.0])
    i = intensity[..., None]
    return (
        fade(-0.25, 0.25, i) * blue
        + fade(0.0, 0.5, i) * cyan
        + fade(0.25, 0.75, i) * green
        + fade(0.5, 1.0, i) * yellow
        + smoothstep(0.75, 1.0, i) * red
    )
