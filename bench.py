"""Benchmark driver: prints ONE JSON line with ray throughput.

Headline metric: Mrays/s tracing the Sponza-class procedural city scene
(alpha-cutout panels + punctual light, depth 4 — BASELINE.md config #3
geometry class) at 1080p on the available device, with the Cornell box
(config #1) as a secondary. ``vs_baseline`` is measured against the
BASELINE.json north-star of 500 Mrays/s (a full v5p-8 target; this
harness runs on however many chips are visible).

Rays are counted honestly inside the integrator (primary + bounce +
shadow rays actually traced; idle lanes don't count).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def bench_scene(scene, cfg, has_alpha, warmup=1, iters=4):
    from vk_raytrace_tpu.integrator.camera import generate_rays
    from vk_raytrace_tpu.integrator.path import sample_pixels
    from vk_raytrace_tpu.ops import rng
    from vk_raytrace_tpu.render import pack_scene

    packed = pack_scene(scene.bvh, scene.geometry)
    w, h = cfg.width, cfg.height
    pix = jnp.arange(w * h, dtype=jnp.uint32)

    @jax.jit
    def frame(frame_idx):
        seed = rng.tea(pix, frame_idx.astype(jnp.uint32))
        o, d, seed = generate_rays(scene.camera, w, h, frame_idx, seed)
        radiance, seed, st = sample_pixels(
            scene, packed, cfg, o, d, seed, has_alpha
        )
        return radiance.reshape(h, w, 3), jnp.sum(st.rays.astype(jnp.int64))

    for i in range(warmup):
        img, nrays = frame(jnp.asarray(i + 1, jnp.int32))
        jax.block_until_ready(img)

    t0 = time.perf_counter()
    total_rays = 0
    for i in range(iters):
        img, nrays = frame(jnp.asarray(100 + i, jnp.int32))
        jax.block_until_ready(img)
        total_rays += int(nrays)
    dt = time.perf_counter() - t0
    return total_rays / dt / 1e6, img


def main():
    from vk_raytrace_tpu.models import procedural
    from vk_raytrace_tpu.models.schema import PBR_GLTF, RenderConfig
    from vk_raytrace_tpu import render as R

    t_start = time.time()

    # Headline: Sponza-class city scene, 1080p, depth 4, alpha-cutout + light
    geom, mats, lights, cam = procedural.city_scene(n_blocks=24)
    n_tris = int(geom.indices.shape[0])
    scene = R.build_scene(geom, mats, lights, cam)
    jax.block_until_ready(scene.bvh)
    cfg = RenderConfig(
        width=1920,
        height=1080,
        max_depth=4,
        max_samples=1,
        hdr_multiplier=1.0,
        pbr_mode=PBR_GLTF,
        firefly_clamp=10.0,
        use_sun_sky=True,
    )
    mrays, img = bench_scene(scene, cfg, has_alpha=True)

    result = {
        "metric": "city_1080p_d4_mrays_per_sec",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 500.0, 4),
        "extra": {
            "tris": n_tris,
            "devices": len(jax.devices()),
            "device_kind": jax.devices()[0].device_kind,
            "wall_s": round(time.time() - t_start, 1),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
