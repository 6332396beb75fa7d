"""Camera ray generation with subpixel jitter and depth of field.

Vectorized form of ``samplePixel``'s ray setup (``shaders/pathtrace.glsl:
348-374``): NDC from pixel+jitter, origin/direction through the inverse
view/projection matrices, thin-lens aperture sampling for DoF.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.schema import Camera
from ..ops import rng
from ..ops.math import normalize

TWO_PI = 2.0 * jnp.pi


def with_aspect(cam: Camera, width: int, height: int) -> Camera:
    """Recompute the projection for the actual render aspect ratio.

    The reference rebuilds proj from the window size every frame
    (``scene.cpp:629-668``); a loaded glTF camera's aspectRatio would
    otherwise stretch non-matching render sizes. For the standard
    perspective inverse ``proj_inverse[1,1] = -tan(fov/2)`` is
    aspect-invariant, so ``proj_inverse[0,0] = aspect * tan(fov/2)``
    re-derives the x scale exactly."""
    # Host numpy (scene build stays off-device; see models/builder.py).
    pi = np.array(np.asarray(cam.proj_inverse), np.float32)
    pi[0, 0] = (width / height) * abs(float(pi[1, 1]))
    return cam._replace(proj_inverse=pi)


def generate_rays(
    cam: Camera,
    width: int,
    height: int,
    frame: jax.Array,     # () i32 — frame 0 uses the pixel center (no jitter)
    seed: jax.Array,      # (R,) uint32, R = width*height
):
    """Primary rays for every pixel, row-major flat. Returns
    ``(origin (R,3), direction (R,3), seed')``."""
    pix = jnp.arange(width * height, dtype=jnp.uint32)
    return generate_rays_for_pixels(cam, width, height, pix, frame, seed)


def generate_rays_for_pixels(
    cam: Camera,
    width: int,
    height: int,
    pix: jax.Array,       # (R,) u32 global flat pixel ids (row-major)
    frame: jax.Array,
    seed: jax.Array,
):
    """Primary rays for an explicit set of pixels — the entry point used by
    tile-sharded rendering, where each chip owns a row chunk."""
    px = (pix % width).astype(jnp.float32)
    py = (pix // width).astype(jnp.float32)

    seed, jit = rng.rand2(seed)
    jitter = jnp.where(frame == 0, jnp.full_like(jit, 0.5), jit)

    # NDC in [-1, 1] (pathtrace.glsl:355-358)
    u = (px + jitter[..., 0]) / width * 2.0 - 1.0
    v = (py + jitter[..., 1]) / height * 2.0 - 1.0

    origin = cam.view_inverse[:3, 3]
    target = jnp.einsum(
        "ij,rj->ri",
        cam.proj_inverse,
        jnp.stack([u, v, jnp.ones_like(u), jnp.ones_like(u)], axis=-1),
    )
    tdir = normalize(target[:, :3])
    direction = jnp.einsum("ij,rj->ri", cam.view_inverse[:3, :3], tdir)

    # Depth of field (pathtrace.glsl:365-374)
    seed, r1 = rng.rand(seed)
    seed, r2 = rng.rand(seed)
    focal_point = cam.focal_dist * direction
    ang = r1 * TWO_PI
    rad = r2 * cam.aperture
    cam_right = cam.view_inverse[:3, 0]
    cam_up = cam.view_inverse[:3, 1]
    aperture_pos = (
        jnp.cos(ang)[..., None] * cam_right + jnp.sin(ang)[..., None] * cam_up
    ) * jnp.sqrt(rad)[..., None]
    direction = normalize(focal_point - aperture_pos)
    origin = origin + aperture_pos
    return origin, direction, seed
