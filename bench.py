"""Benchmark driver: prints ONE JSON line with ray throughput.

Headline metric: Mrays/s path-tracing the Sponza-class procedural city
(alpha-cutout panels, punctual light, baked sun&sky, depth 4 — the
BASELINE.md config #3 workload class) on the visible device(s).
``vs_baseline`` compares against the BASELINE.json north star of
500 Mrays/s (a v5p-8 target; this harness typically sees one v5e chip).

Rays are counted inside the integrator (primary + bounce + shadow rays
actually traced; masked idle lanes don't count), and timing blocks on
device completion — no async-dispatch flattery.
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


def _enable_compile_cache():
    """Persistent XLA compilation cache: first compiles are minutes-long on
    this hardware; caching them across processes makes reruns fast."""
    try:
        import jax

        cache_dir = os.environ.get(
            "VKRT_COMPILE_CACHE", os.path.expanduser("~/.cache/vkrt_xla")
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


_enable_compile_cache()

# Keep bench runtime bounded: one strip-sized batch at 1080p width.
BENCH_W, BENCH_H = 1920, 270
FULL_H = 1080
WARMUP = 1
ITERS = 3


def main():
    from vk_raytrace_tpu.models import procedural
    from vk_raytrace_tpu.models.schema import PBR_GLTF, RenderConfig
    from vk_raytrace_tpu import render as R
    from vk_raytrace_tpu.integrator.camera import generate_rays_for_pixels
    from vk_raytrace_tpu.integrator.path import sample_pixels
    from vk_raytrace_tpu.ops import rng

    t_start = time.time()

    geom, mats, lights, cam = procedural.city_scene(n_blocks=24)
    n_tris = int(geom.indices.shape[0])
    scene = R.build_scene(geom, mats, lights, cam)
    cfg0 = RenderConfig(
        width=BENCH_W,
        height=FULL_H,
        max_depth=4,
        max_samples=1,
        hdr_multiplier=1.0,
        pbr_mode=PBR_GLTF,
        firefly_clamp=10.0,
        use_sun_sky=True,
    )
    scene, cfg = R.prepare_sun_sky(scene, cfg0)
    bundle = R.pack_scene(scene.bvh, scene.geometry)
    jax.block_until_ready(bundle.opaque.rows)
    t_build = time.time() - t_start

    # A geometry-heavy strip (city rows, not sky) of the 1080p frame.
    row0 = 540
    pix = (
        jnp.arange(BENCH_W * BENCH_H, dtype=jnp.uint32)
        + jnp.uint32(row0 * BENCH_W)
    )

    @jax.jit
    def strip(frame_idx):
        seed = rng.tea(pix, frame_idx.astype(jnp.uint32))
        o, d, seed = generate_rays_for_pixels(
            scene.camera, BENCH_W, FULL_H, pix, frame_idx, seed
        )
        radiance, seed, st = sample_pixels(scene, bundle, cfg, o, d, seed, True)
        return radiance, jnp.sum(st.rays)  # i32 sum: <= ~2e7 per strip, no overflow

    t0 = time.time()
    for i in range(WARMUP):
        img, nrays = strip(jnp.asarray(i + 1, jnp.int32))
        jax.block_until_ready(img)
    t_compile = time.time() - t0

    t0 = time.perf_counter()
    total_rays = 0
    for i in range(ITERS):
        img, nrays = strip(jnp.asarray(100 + i, jnp.int32))
        jax.block_until_ready(img)
        total_rays += int(nrays)
    dt = time.perf_counter() - t0
    mrays = total_rays / dt / 1e6

    result = {
        "metric": "city_1080p_strip_d4_mrays_per_sec",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 500.0, 5),
        "extra": {
            "tris": n_tris,
            "rays_per_iter": total_rays // ITERS,
            "strip": f"{BENCH_W}x{BENCH_H}@row{row0}",
            "s_per_strip": round(dt / ITERS, 2),
            "est_s_per_1080p_frame": round(dt / ITERS * FULL_H / BENCH_H, 1),
            "build_s": round(t_build, 1),
            "compile_s": round(t_compile, 1),
            "devices": len(jax.devices()),
            "device_kind": jax.devices()[0].device_kind,
            "wall_s": round(time.time() - t_start, 1),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
