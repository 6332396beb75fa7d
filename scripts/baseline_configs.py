"""Run the five BASELINE.md benchmark configurations as configured.

For each config: render through the production Renderer at the specified
resolution/spp/depth in REFERENCE-COMPAT estimator mode (``full_mis=False``
— the weighting any RMSE comparison against the Vulkan reference must use),
report measured Mrays/s + ms/frame, and (for configs with a tractable
ground truth) the RMSE of a reduced-resolution render against the BVH-free
brute-force tracer with identical RNG streams (tests/test_anchor.py
methodology: matched-set RMSE excluding shared-edge tie-break pixels).

Usage:
  python scripts/baseline_configs.py [--configs 1,2,3,4] [--frames N]
      [--rmse-res 64] [--scale 1.0] [--json out.json]

``--scale`` shrinks the throughput-leg resolutions for smoke runs on CPU;
the recorded table in docs/PERFORMANCE.md uses scale=1 on the TPU.
Config #5 (1024-spp accumulation + multi-chip) is the bench.py --multichip
workload; here it runs a reduced accumulation of the bistro scene.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vk_raytrace_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


def _scene(name, **kw):
    from vk_raytrace_tpu.models import procedural, hdr as hdr_mod
    from vk_raytrace_tpu import render as R

    if name == "cornell":
        geom, mats, lights, cam = procedural.cornell_box()
        return R.build_scene(geom, mats, lights, cam), geom
    if name == "helmet":
        geom, mats, lights, cam, atlas = procedural.helmet_scene()
        env = hdr_mod.build_environment(hdr_mod.procedural_sky_hdr())
        return R.build_scene(geom, mats, lights, cam, atlas=atlas, env=env), geom
    if name == "atrium":
        geom, mats, lights, cam, atlas = procedural.atrium_scene()
        return R.build_scene(geom, mats, lights, cam, atlas=atlas), geom
    if name == "materials":
        geom, mats, lights, cam = procedural.material_test_grid()
        env = hdr_mod.build_environment(hdr_mod.procedural_sky_hdr())
        return R.build_scene(geom, mats, lights, cam, env=env), geom
    if name == "bistro":
        pool, inst, mats, lights, cam, atlas = procedural.bistro_scene()
        s = R.build_instanced_scene(pool, inst, mats, lights, cam, atlas=atlas)
        return s, pool.geometry
    raise SystemExit(f"unknown scene {name}")


# (name, scene, w, h, spp, depth, pbr, use_sun_sky, hdr_mult, rmse_ok)
def _configs():
    from vk_raytrace_tpu.models.schema import PBR_DISNEY, PBR_GLTF

    return {
        1: ("cornell_256_4spp_d2", "cornell", 256, 256, 4, 2, PBR_GLTF,
            False, 0.0, True),
        2: ("helmet_512_16spp", "helmet", 512, 512, 16, 5, PBR_GLTF,
            False, 1.0, True),
        3: ("atrium_1080p_d4", "atrium", 1920, 1080, 1, 4, PBR_GLTF,
            True, 1.0, True),
        4: ("disney_materials_d8", "materials", 512, 512, 4, 8, PBR_DISNEY,
            False, 1.0, True),
        5: ("bistro_1080p_accum", "bistro", 1920, 1080, 1, 4, PBR_GLTF,
            True, 1.0, False),
    }


def run_config(idx, spec, frames, rmse_res, scale, accum_minutes=0,
               accum_png=None):
    import dataclasses

    import jax
    import numpy as np

    from vk_raytrace_tpu import render as R
    from vk_raytrace_tpu.models.schema import RenderConfig

    name, scn, w, h, spp, depth, pbr, sunsky, hdrm, rmse_ok = spec
    w = max(64, int(w * scale))
    h = max(64, int(h * scale))
    scene, geom = _scene(scn)
    cfg = RenderConfig(
        width=w, height=h, max_depth=depth, max_samples=spp, pbr_mode=pbr,
        use_sun_sky=sunsky, hdr_multiplier=hdrm, firefly_clamp=10.0,
        full_mis=False,  # reference-compat estimator
    )
    t0 = time.time()
    r = R.Renderer(scene, cfg)
    build_s = time.time() - t0
    r.step()
    jax.block_until_ready(r.accum)
    warm_s = time.time() - t0 - build_s

    accum_out = None
    if accum_minutes:
        # Config #5 AS CONFIGURED: progressive accumulation toward 1024 spp
        # (pathtrace.rgen:96-107 / sample_example.cpp:407-408 semantics),
        # TIME-BOXED — report spp reached, spp/hour and total rays within
        # the wall budget, plus the partial image.
        budget_s = accum_minutes * 60.0
        target_spp = 1024
        ta = time.perf_counter()
        a_frames, a_rays = 1, r.last_rays  # warm frame is frame 0
        while (time.perf_counter() - ta) < budget_s and a_frames < target_spp:
            r.step()
            jax.block_until_ready(r.accum)
            a_frames += 1
            a_rays += r.last_rays
        a_dt = time.perf_counter() - ta
        accum_out = {
            "budget_min": accum_minutes,
            "spp_reached": a_frames,
            "target_spp": target_spp,
            "spp_per_hour": round(a_frames / (a_dt / 3600.0), 1),
            "rays_total": int(a_rays),
            "mrays_per_s": round(a_rays / a_dt / 1e6, 3),
            "hours_to_target": round(target_spp / max(1e-9, a_frames / (a_dt / 3600.0)), 2),
        }
        if accum_png:
            import numpy as np_

            R.write_png(accum_png, np_.asarray(r.postprocess()))
            accum_out["png"] = accum_png

    t0 = time.perf_counter()
    rays = 0
    for _ in range(frames):
        r.step()
        jax.block_until_ready(r.accum)
        rays += r.last_rays
    dt = time.perf_counter() - t0
    out = {
        "config": idx,
        "name": name,
        "size": [w, h],
        "spp": spp,
        "depth": depth,
        "mrays_per_s": round(rays / dt / 1e6, 3),
        "ms_per_frame": round(1e3 * dt / frames, 1),
        "rays_per_frame": rays // frames,
        "build_s": round(build_s, 1),
        "warmup_s": round(warm_s, 1),
        "tris": int(np.asarray(geom.indices).shape[0]),
    }
    if accum_out is not None:
        out["accumulation"] = accum_out

    if rmse_ok and rmse_res:
        out["rmse_vs_brute"] = _rmse_leg(scn, spec, rmse_res)
    return out


def _rmse_leg(scn, spec, res):
    """Reduced-res compat-mode render, BVH vs brute-force, same RNG."""
    import numpy as np

    from vk_raytrace_tpu.integrator.brute import BruteTracer
    from vk_raytrace_tpu.models.schema import RenderConfig
    from vk_raytrace_tpu import render as R
    from tests.test_anchor import _render

    name, _, w0, h0, spp, depth, pbr, sunsky, hdrm, _ = spec
    scene, geom = _scene(scn)
    if scene.instances is not None:
        return None  # brute tracer needs the flat geometry path
    packed = R.pack_scene(scene.bvh, scene.geometry)
    cfg = RenderConfig(
        width=res, height=res, max_depth=depth,
        max_samples=min(spp, 2), pbr_mode=pbr, use_sun_sky=False,
        hdr_multiplier=hdrm, firefly_clamp=10.0, full_mis=False, rr=False,
    )
    a = _render(scene, packed, cfg, frames=2)
    b = _render(scene, packed, cfg, frames=2, tracer=BruteTracer(scene.geometry))
    scale = max(float(np.mean(b)), 1e-9)
    diff = np.abs(a - b).max(axis=-1)
    matched = diff < 0.02 * scale
    rmse = float(np.sqrt(np.mean((a[matched] - b[matched]) ** 2))) / scale
    return {
        "res": res,
        "matched_frac": round(float(matched.mean()), 4),
        "matched_rmse": round(rmse, 5),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4")
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--rmse-res", type=int, default=64)
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--json", default=None)
    ap.add_argument("--accum-minutes", type=float, default=0,
                    help="config #5: time-boxed 1024-spp accumulation leg")
    ap.add_argument("--accum-png", default=None,
                    help="config #5: write the partial accumulation image")
    args = ap.parse_args()

    results = []
    for idx in [int(x) for x in args.configs.split(",")]:
        spec = _configs()[idx]
        print(f"== config #{idx}: {spec[0]} ==", file=sys.stderr, flush=True)
        res = run_config(
            idx, spec, args.frames, args.rmse_res, args.scale,
            accum_minutes=(args.accum_minutes if idx == 5 else 0),
            accum_png=args.accum_png,
        )
        results.append(res)
        print(json.dumps(res), flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)

    # Markdown table for docs/PERFORMANCE.md
    print("\n| # | config | size | spp | depth | Mrays/s | ms/frame |"
          " RMSE vs brute |", file=sys.stderr)
    print("|---|---|---|---|---|---|---|---|", file=sys.stderr)
    for r in results:
        rm = r.get("rmse_vs_brute")
        rtxt = (f"{rm['matched_rmse']:.4f} @{rm['res']}px"
                f" ({rm['matched_frac']:.1%})" if rm else "—")
        print(f"| {r['config']} | {r['name']} | {r['size'][0]}x{r['size'][1]} "
              f"| {r['spp']} | {r['depth']} | {r['mrays_per_s']} "
              f"| {r['ms_per_frame']} | {rtxt} |", file=sys.stderr)


if __name__ == "__main__":
    main()
