"""Frame-cost ablation harness: time the production pooled frame with
components disabled to attribute real in-frame cost (trace event times
overlap async copies and double-count nesting; wall-clock deltas don't).

Usage: python scripts/ablate.py [names...]   (default: all)
Names: base noscatter noalpha xlaalpha noshadow nonee notaprows
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vk_raytrace_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


def build():
    from vk_raytrace_tpu.models import procedural
    from vk_raytrace_tpu.models.schema import PBR_GLTF, RenderConfig
    from vk_raytrace_tpu import render as R

    geom, mats, lights, cam, atlas = procedural.atrium_scene()
    scene = R.build_scene(geom, mats, lights, cam, atlas=atlas)
    cfg = RenderConfig(
        width=1920, height=1080, max_depth=4, max_samples=1,
        hdr_multiplier=1.0, pbr_mode=PBR_GLTF, firefly_clamp=10.0,
        use_sun_sky=True,
    )
    return R.Renderer(scene, cfg)


def time_frames(r, n=4):
    import jax

    r.step()
    jax.block_until_ready(r.accum)
    t0 = time.perf_counter()
    for _ in range(n):
        r.step()
        jax.block_until_ready(r.accum)
    return (time.perf_counter() - t0) / n


def main():
    names = sys.argv[1:] or ["base", "noscatter", "noalpha", "noshadow"]
    r = build()
    results = {}
    for name in names:
        os.environ.pop("VKRT_ABLATE", None)
        os.environ.pop("VKRT_FUSED_ALPHA", None)
        packed_orig = r.packed
        scene_orig = r.scene
        if name == "notaprows":
            r.scene = r.scene._replace(tap_rows=None)
        elif name == "noscatter":
            os.environ["VKRT_ABLATE"] = "noscatter"
        elif name == "noalpha":
            r.packed = r.packed._replace(alpha=None)
        elif name == "xlaalpha":
            os.environ["VKRT_FUSED_ALPHA"] = "0"
        elif name == "noshadow":
            os.environ["VKRT_ABLATE"] = "noshadow"
        elif name == "nonee":
            os.environ["VKRT_ABLATE"] = "nonee"
        import vk_raytrace_tpu.render as R

        # env hooks are read at trace time: force a re-trace per ablation
        R.render_pool.clear_cache()
        dt = time_frames(r)
        results[name] = dt
        base = results.get("base")
        delta = f"  (base - this = {1e3*(base-dt):7.1f} ms)" if base and name != "base" else ""
        print(f"{name:12s} {dt*1e3:8.1f} ms/frame{delta}", flush=True)
        r.packed = packed_orig
        r.scene = scene_orig
    os.environ.pop("VKRT_ABLATE", None)


if __name__ == "__main__":
    main()
