"""Benchmark driver: prints ONE JSON line with ray throughput.

Headline metric: Mrays/s path-tracing the Sponza-class procedural ATRIUM
(216k triangles, two-story colonnade, alpha-cutout banners, textured PBR,
punctual lights + baked sun&sky, 1080p, depth 4 — the BASELINE.md config
#3/#5 workload class) through the production pooled-wavefront renderer on
the visible device(s). ``vs_baseline`` compares against the BASELINE.json
north star of 500 Mrays/s (a v5p-8 target; this harness typically sees one
v5e chip).

Rays are counted inside the integrator (primary + bounce + shadow rays
actually traced; idle lanes don't count), and timing blocks on device
completion — no async-dispatch flattery.

Build time is reported with a component breakdown (scene_gen/tables/
sky_bake/accel/upload) plus ``tunnel_handshake_s``: on remote-TPU tunnels
the first device->host readback of a process blocks ~2 minutes on
transport setup; the build overlaps it on a background thread
(utils/device.py) so it bounds warmup, not build.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


from vk_raytrace_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

W, H = 1920, 1080
WARMUP_FRAMES = 1
ITERS = int(os.environ.get("VKRT_BENCH_ITERS", "6"))


def _build_atrium(w, h):
    """Shared scene+renderer build with per-phase timings."""
    from vk_raytrace_tpu.models import procedural
    from vk_raytrace_tpu.models.schema import PBR_GLTF, RenderConfig
    from vk_raytrace_tpu import render as R
    from vk_raytrace_tpu.utils import device as devutil

    devutil.warm_transfers_async()  # overlap tunnel handshake with build
    times = {}
    t0 = time.time()
    geom, mats, lights, cam, atlas = procedural.atrium_scene()
    times["scene_gen_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    scene = R.build_scene(geom, mats, lights, cam, atlas=atlas)
    times["scene_tables_s"] = round(time.time() - t0, 1)
    cfg = RenderConfig(
        width=w, height=h, max_depth=4, max_samples=1, hdr_multiplier=1.0,
        pbr_mode=PBR_GLTF, firefly_clamp=10.0, use_sun_sky=True,
    )
    r = R.Renderer(scene, cfg)
    times.update({k: round(v, 1) for k, v in r.build_times.items()})
    return geom, scene, cfg, r, times


def main_multichip(n_virtual: int | None):
    """``bench.py --multichip [N]``: the same atrium workload through the
    tile-sharded multi-chip path (``parallel/sharding.py``). With more than
    one real device visible it runs on the hardware mesh; ``N`` forces a
    virtual N-device CPU mesh instead (scaling smoke test — absolute numbers
    are then CPU numbers and only the per-chip ray split is meaningful).
    SURVEY.md §2.3: tile axis = pixel parallelism, no hot-path collectives.
    """
    if n_virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_virtual}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import jax.numpy as jnp

    from vk_raytrace_tpu import render as R
    from vk_raytrace_tpu.parallel import sharding as sh

    t_start = time.time()
    n_dev = len(jax.devices())
    # Virtual CPU meshes get a tiny frame; real chips get the full 1080p.
    w, h = (512, 256) if n_virtual else (W, H)
    geom, scene, cfg, r, times = _build_atrium(w, h)
    mesh = sh.make_mesh()
    scene_r = sh.replicate(mesh, r.scene)
    packed_r = sh.replicate(mesh, r.packed)
    step = sh.sharded_render_step(
        mesh, scene_r, packed_r, cfg, r.has_alpha, features=r.features
    )
    accum = sh.shard_accum(mesh, jnp.zeros((h, w, 3), jnp.float32))
    accum, rays = step(accum, jnp.int32(0))
    jax.block_until_ready(accum)
    t_warm = time.time() - t_start
    t0 = time.perf_counter()
    total_rays = 0
    for f in range(ITERS):
        accum, rays = step(accum, jnp.int32(1 + f))
        jax.block_until_ready(accum)
        total_rays += int(rays)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "atrium_multichip_mrays_per_sec",
        "value": round(total_rays / dt / 1e6, 4),
        "unit": "Mrays/s",
        "vs_baseline": round(total_rays / dt / 1e6 / 500.0, 5),
        "extra": {
            "devices": n_dev,
            "mesh": dict(mesh.shape),
            "virtual_cpu": bool(n_virtual),
            "size": [w, h],
            "s_per_frame": round(dt / ITERS, 3),
            "rays_per_frame": total_rays // ITERS,
            "warmup_s": round(t_warm, 1),
            "build": times,
        },
    }))


def main():
    import jax
    from vk_raytrace_tpu.utils import device as devutil

    t_start = time.time()
    geom, scene, cfg, r, times = _build_atrium(W, H)
    n_tris = int(geom.indices.shape[0])
    t_build = time.time() - t_start

    t0 = time.time()
    for _ in range(WARMUP_FRAMES):
        r.step()
    jax.block_until_ready(r.accum)
    t_compile = time.time() - t0

    t0 = time.perf_counter()
    total_rays = 0
    for _ in range(ITERS):
        r.step()
        jax.block_until_ready(r.accum)
        total_rays += r.last_rays
    dt = time.perf_counter() - t0
    mrays = total_rays / dt / 1e6

    result = {
        "metric": "atrium_1080p_d4_mrays_per_sec",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 500.0, 5),
        "extra": {
            "tris": n_tris,
            "rays_per_frame": total_rays // ITERS,
            "s_per_frame": round(dt / ITERS, 2),
            "build_s": round(t_build, 1),
            "build": times,
            "tunnel_handshake_s": (
                round(devutil.warm_seconds, 1) if devutil.warm_seconds else None
            ),
            "warmup_s": round(t_compile, 1),
            "frames_timed": ITERS,
            "devices": len(jax.devices()),
            "device_kind": jax.devices()[0].device_kind,
            "wall_s": round(time.time() - t_start, 1),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    if "--multichip" in sys.argv:
        i = sys.argv.index("--multichip")
        n = None
        if i + 1 < len(sys.argv) and sys.argv[i + 1].isdigit():
            n = int(sys.argv[i + 1])
        if n is None and len(__import__("jax").devices()) == 1:
            n = 8  # single-chip harness: default to the virtual CPU mesh
        main_multichip(n)
    else:
        main()
