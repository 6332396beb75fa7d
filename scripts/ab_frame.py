"""A/B frame timing on a shared scene build.

Usage: python scripts/ab_frame.py "NAME:VAR=V,VAR2=V2" "NAME2:..." ...

Builds the bench atrium ONCE, then for each spec constructs a Renderer with
the given VKRT_* env overrides applied, times ITERS frames (blocked), and
prints ms/frame + Mrays/s per variant. Env toggles that change traced
behavior ride the jit key (render.py::trace_env_key), so flipping them
inside one process produces genuinely different executables.

Examples:
  python scripts/ab_frame.py "mips:" "nomips:VKRT_MIP_SAMPLE=0"
  python scripts/ab_frame.py "xla:" "fused:VKRT_FUSED_SHADE=1"

VKRT_AB_SCENE=bistro selects the instanced bistro scene (579k tris,
two-level TLAS/BLAS) instead of the flat atrium. Frame-level A/Bs on the
tunnel carry an order-correlated drift (docs/PERFORMANCE.md round 5):
run ONE variant per process for load-bearing comparisons.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vk_raytrace_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

ITERS = int(os.environ.get("VKRT_BENCH_ITERS", "5"))
_BASE_KEYS = [
    "VKRT_MIP_SAMPLE", "VKRT_FUSED_SHADE", "VKRT_FUSED", "VKRT_FUSED_ALPHA",
    "VKRT_TIERS", "VKRT_ABLATE", "VKRT_MERGED_MAT", "VKRT_UNROLL",
    "VKRT_NOALIAS", "VKRT_PHASE_DIVS", "VKRT_ANALYTIC_SUN", "VKRT_MORTON",
    "VKRT_POOL", "VKRT_DISPATCH", "VKRT_STACK", "VKRT_ROOTPRO",
    "VKRT_TLAS_TIERS",
]


def main():
    import jax

    from vk_raytrace_tpu.models import procedural
    from vk_raytrace_tpu.models.schema import PBR_GLTF, RenderConfig
    from vk_raytrace_tpu import render as R
    from vk_raytrace_tpu.utils import device as devutil

    w, h = 1920, 1080
    if os.environ.get("VKRT_AB_SIZE"):
        w, h = (int(x) for x in os.environ["VKRT_AB_SIZE"].split("x"))
    devutil.warm_transfers_async()
    if os.environ.get("VKRT_AB_SCENE", "atrium") == "bistro":
        pool, inst, mats, lights, cam, atlas = procedural.bistro_scene()
        scene = R.build_instanced_scene(pool, inst, mats, lights, cam, atlas=atlas)
    else:
        geom, mats, lights, cam, atlas = procedural.atrium_scene()
        scene = R.build_scene(geom, mats, lights, cam, atlas=atlas)
    cfg = RenderConfig(
        width=w, height=h, max_depth=4, max_samples=1, hdr_multiplier=1.0,
        pbr_mode=PBR_GLTF, firefly_clamp=10.0, use_sun_sky=True,
    )

    specs = sys.argv[1:] or ["base:"]
    results = []
    for spec in specs:
        name, _, envs = spec.partition(":")
        for k in _BASE_KEYS:
            os.environ.pop(k, None)
        for kv in filter(None, envs.split(",")):
            k, _, v = kv.partition("=")
            os.environ[k.strip()] = v.strip()
        r = R.Renderer(scene, cfg)
        t0 = time.time()
        r.step()
        jax.block_until_ready(r.accum)
        warm = time.time() - t0
        t0 = time.perf_counter()
        rays = 0
        for _ in range(ITERS):
            r.step()
            jax.block_until_ready(r.accum)
            rays += r.last_rays
        dt = time.perf_counter() - t0
        ms = dt / ITERS * 1e3
        mrays = rays / dt / 1e6
        results.append((name, ms, mrays))
        print(
            f"{name:16s} {ms:8.1f} ms/frame  {mrays:6.3f} Mrays/s"
            f"  (warmup {warm:.0f}s, {ITERS} frames)",
            flush=True,
        )
    if len(results) > 1:
        base = results[0][1]
        for name, ms, _ in results[1:]:
            print(f"{name}: {ms / base * 100 - 100:+.1f}% vs {results[0][0]}")


if __name__ == "__main__":
    main()
