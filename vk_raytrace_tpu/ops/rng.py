"""Counter-based RNG matching the reference's TEA/PCG streams.

The reference path tracer seeds one ``uint32`` PCG stream per pixel with a
16-round TEA hash of (pixel index, frame) (``shaders/random.glsl:34-65``;
seeding at ``shaders/pathtrace.rgen:72`` and ``shaders/pathtrace.comp:97``),
then draws uniforms by taking the top 23 mantissa bits.

Here the stream state is an explicit ``uint32`` array (one lane per ray),
threaded functionally through the wavefront integrator — this keeps the
integrator a pure function (checkpointable, shardable, replayable) while
remaining bit-compatible with the reference sequence for a given seed.

All ops are elementwise uint32 arithmetic (wrapping), ideal for the TPU VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_U32 = jnp.uint32


def _u32(x) -> jax.Array:
    return jnp.asarray(x, dtype=_U32)


def tea(val0: jax.Array, val1: jax.Array, rounds: int = 16) -> jax.Array:
    """Tiny Encryption Algorithm hash of two uint32s (random.glsl:34-48).

    Used to decorrelate per-pixel streams across frames. ``rounds`` is static;
    the loop is unrolled at trace time (16 rounds of cheap VPU integer ops).
    """
    v0 = _u32(val0)
    v1 = _u32(val1)
    s0 = _u32(0)
    for _ in range(rounds):
        s0 = s0 + _u32(0x9E3779B9)
        v0 = v0 + ((((v1 << 4) + _u32(0xA341316C)) ^ (v1 + s0)) ^ ((v1 >> 5) + _u32(0xC8013EA4)))
        v1 = v1 + ((((v0 << 4) + _u32(0xAD90777D)) ^ (v0 + s0)) ^ ((v0 >> 5) + _u32(0x7E95761E)))
    return v0


def init_seed(resolution_x, pixel_x, pixel_y, frame) -> jax.Array:
    """Per-pixel stream seed, matching ``initRandom`` (random.glsl:50-53)."""
    return tea(_u32(pixel_y) * _u32(resolution_x) + _u32(pixel_x), _u32(frame))


def pcg(state: jax.Array) -> tuple[jax.Array, jax.Array]:
    """One PCG-RXS-M-XS step (random.glsl:59-65).

    Returns ``(new_state, random_bits)``.
    """
    state = _u32(state)
    prev = state * _u32(747796405) + _u32(2891336453)
    shift = (prev >> 28) + _u32(4)
    word = ((prev >> shift) ^ prev) * _u32(277803737)
    return prev, (word >> 22) ^ word


def pcg2d(v: jax.Array) -> jax.Array:
    """pcg2d hash (random.glsl:69-80); ``v`` is ``(..., 2)`` uint32."""
    v = _u32(v)
    v = v * _u32(1664525) + _u32(1013904223)
    x, y = v[..., 0], v[..., 1]
    x = x + y * _u32(1664525)
    y = y + x * _u32(1664525)
    x, y = x ^ (x >> 16), y ^ (y >> 16)
    x = x + y * _u32(1664525)
    y = y + x * _u32(1664525)
    x, y = x ^ (x >> 16), y ^ (y >> 16)
    return jnp.stack([x, y], axis=-1)


def pcg3d(v: jax.Array) -> jax.Array:
    """pcg3d hash (random.glsl:82-92); ``v`` is ``(..., 3)`` uint32."""
    v = _u32(v) * _u32(1664525) + _u32(1013904223)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    x = x + y * z
    y = y + z * x
    z = z + x * y
    x, y, z = x ^ (x >> 16), y ^ (y >> 16), z ^ (z >> 16)
    x = x + y * z
    y = y + z * x
    z = z + x * y
    return jnp.stack([x, y, z], axis=-1)


def bits_to_unit_float(bits: jax.Array) -> jax.Array:
    """Map uint32 random bits to float in [0, 1).

    The reference sets the exponent to 0 and fills the mantissa
    (``uintBitsToFloat(0x3f800000 | (r >> 9)) - 1.0``), which is exactly
    ``(r >> 9) / 2**23`` — computed here directly (exact in fp32).
    """
    return (bits >> 9).astype(jnp.float32) * jnp.float32(1.0 / 8388608.0)


def rand(seed: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Draw one uniform float in [0,1) per lane. Returns ``(seed', u)``."""
    seed, bits = pcg(seed)
    return seed, bits_to_unit_float(bits)


def rand2(seed: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Draw 2 uniforms per lane, stacked on the last axis."""
    seed, a = rand(seed)
    seed, b = rand(seed)
    return seed, jnp.stack([a, b], axis=-1)


def rand3(seed: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Draw 3 uniforms per lane, stacked on the last axis."""
    seed, a = rand(seed)
    seed, b = rand(seed)
    seed, c = rand(seed)
    return seed, jnp.stack([a, b, c], axis=-1)
