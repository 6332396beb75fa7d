"""Headless CLI — the app shell replacing ``src/main.cpp``'s window loop.

Mirrors the reference flags (``main.cpp:55-57``): ``-f/--scene`` for the
glTF file, ``-e/--hdr`` for the environment, plus the full ``RtxState`` /
``Tonemapper`` field inventory as flags (the reference exposes these via
ImGui; headless rendering makes them CLI options — SURVEY.md §5 "config").

Examples::

    python -m vk_raytrace_tpu.cli --scene cornell --size 256 256 --spp 16 -o out.png
    python -m vk_raytrace_tpu.cli -f scene.gltf -e env.hdr --depth 4 --spp 64 -o out.png
    python -m vk_raytrace_tpu.cli --scene cornell --debug-mode normal -o dbg.png
"""

from __future__ import annotations

import argparse
import json
import sys
import time

DEBUG_NAMES = {
    "none": 0, "basecolor": 1, "normal": 2, "metallic": 3, "emissive": 4,
    "alpha": 5, "roughness": 6, "texcoord": 7, "tangent": 8, "radiance": 9,
    "weight": 10, "raydir": 11, "heatmap": 12,
}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="vk_raytrace_tpu",
        description="TPU-native glTF path tracer (vk_raytrace capabilities, JAX/Pallas engine)",
    )
    p.add_argument("-f", "--scene", default="cornell",
                   help="glTF/GLB file, or builtin: cornell | city | materials "
                        "| atrium (Sponza-class ~220k tris) | helmet "
                        "| bistro (Bistro-class >1M instanced tris) "
                        "(DamagedHelmet-class textured PBR)")
    p.add_argument("-e", "--hdr", default=None, help="HDR environment (.hdr)")
    p.add_argument("-o", "--output", default="out.png", help="output PNG")
    p.add_argument("--hdr-out", default=None, help="also write raw HDR (.npy)")
    p.add_argument("--size", nargs=2, type=int, default=[1280, 720],
                   metavar=("W", "H"), help="render size (ref default 1280x720)")
    p.add_argument("--depth", type=int, default=10, help="max path depth (ref: 10)")
    p.add_argument("--spp", type=int, default=16, help="total samples per pixel")
    p.add_argument("--samples-per-frame", type=int, default=1,
                   help="maxSamples per progressive frame (ref: 1)")
    p.add_argument("--pbr", choices=["disney", "gltf"], default="disney",
                   help="BSDF model (ref pbrMode: 0-Disney, 1-glTF)")
    p.add_argument("--hdr-multiplier", type=float, default=1.0)
    p.add_argument("--firefly-clamp", type=float, default=None,
                   help="luminance clamp (default: from env integral, like the ref)")
    p.add_argument("--sun-sky", action="store_true", help="use procedural sun & sky")
    p.add_argument("--no-rr", action="store_true", help="disable Russian roulette")
    p.add_argument("--no-any-hit", action="store_true",
                   help="disable stochastic alpha during traversal (ref: anyhit toggle)")
    p.add_argument("--debug-mode", choices=sorted(DEBUG_NAMES), default="none")
    p.add_argument("--render-scale", type=int, default=1,
                   help="descale factor while previewing (ref descaling)")
    p.add_argument("--seed-frame", type=int, default=0, help="starting frame index")
    p.add_argument("--checkpoint", default=None,
                   help="accumulation checkpoint (.npz) to resume/save")
    p.add_argument("--multichip", action="store_true",
                   help="shard the image over all visible devices")
    p.add_argument("--profile", action="store_true", help="print per-stage timings")
    p.add_argument("--stats", action="store_true", help="print scene statistics")
    p.add_argument("--instancing", choices=["auto", "bake", "always"],
                   default="auto",
                   help="glTF node instancing: 'auto' shares meshes drawn by "
                        "multiple nodes through a two-level TLAS/BLAS "
                        "structure (accelstruct.cpp:132-162 analog), 'bake' "
                        "flattens to world space, 'always' forces two-level")
    p.add_argument("--renderer", choices=["fused", "wide"], default=None,
                   help="traversal back end (createRender analog, "
                        "sample_example.cpp:322-337): 'fused' = Pallas step "
                        "kernel (RTX-pipeline analog, TPU default), 'wide' = "
                        "XLA elementwise body (RayQuery analog / fallback)")
    # Tonemapper block (render_output.hpp:37-49 defaults)
    p.add_argument("--tm-brightness", type=float, default=1.0)
    p.add_argument("--tm-contrast", type=float, default=1.0)
    p.add_argument("--tm-saturation", type=float, default=1.0)
    p.add_argument("--tm-vignette", type=float, default=0.0)
    p.add_argument("--tm-exposure", type=float, default=1.0, help="avgLum divisor")
    p.add_argument("--tm-auto-exposure", action="store_true")
    p.add_argument("--tm-no-dither", action="store_true")
    return p


def load_scene_from_args(args):
    import numpy as np

    from .models import hdr as hdr_mod
    from .models import procedural
    from .models.schema import default_sun_sky
    from . import render as R

    atlas = None
    if args.scene == "cornell":
        geom, mats, lights, cam = procedural.cornell_box()
    elif args.scene == "city":
        geom, mats, lights, cam = procedural.city_scene()
    elif args.scene == "materials":
        geom, mats, lights, cam = procedural.material_test_grid()
    elif args.scene == "atrium":
        geom, mats, lights, cam, atlas = procedural.atrium_scene()
    elif args.scene == "helmet":
        geom, mats, lights, cam, atlas = procedural.helmet_scene()
    elif args.scene == "bistro":
        # >1M instantiated tris through the two-level TLAS/BLAS path
        # (--instancing bake bakes them: the 1M-tri single-level stress).
        if args.instancing != "bake":
            pool, inst, mats, lights, cam, atlas = procedural.bistro_scene()
            geom = (pool, inst)
        else:
            geom, mats, lights, cam, atlas = procedural.bistro_scene(
                instanced=False
            )
    else:
        from .models.gltf import load_gltf

        t0 = time.time()
        geom, mats, lights, cam, atlas = load_gltf(
            args.scene, instancing=args.instancing
        )
        from .models.schema import Geometry as _Geometry

        if not isinstance(geom, _Geometry):
            pool, inst = geom
            print(
                f"loaded {args.scene}: {pool.geometry.indices.shape[0]} tris "
                f"in {len(pool.tri_start)} meshes x {len(inst.mesh_id)} "
                f"instances ({time.time() - t0:.2f}s)", file=sys.stderr,
            )
        else:
            print(f"loaded {args.scene}: {geom.indices.shape[0]} tris "
                  f"({time.time() - t0:.2f}s)", file=sys.stderr)

    env = None
    if args.hdr:
        t0 = time.time()
        img = hdr_mod.load_hdr(args.hdr)
        env = hdr_mod.build_environment(img)
        print(f"loaded {args.hdr}: {img.shape[1]}x{img.shape[0]} "
              f"integral={float(env.integral):.3f} ({time.time() - t0:.2f}s)",
              file=sys.stderr)
    elif args.scene in ("materials", "helmet"):
        env = hdr_mod.build_environment(hdr_mod.procedural_sky_hdr())

    from .models.schema import Geometry as _Geometry

    sun_sky = default_sun_sky(in_use=args.sun_sky)
    if isinstance(geom, tuple) and not isinstance(geom, _Geometry):
        pool, inst = geom
        scene = R.build_instanced_scene(
            pool, inst, mats, lights, cam, env=env, sun_sky=sun_sky, atlas=atlas
        )
    else:
        scene = R.build_scene(
            geom, mats, lights, cam, env=env, sun_sky=sun_sky, atlas=atlas
        )
    return scene, env


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import os as _os

    from .utils.cache import enable_compile_cache

    enable_compile_cache()

    if getattr(args, "renderer", None):
        # Renderer switch analog: route every opaque traversal through the
        # selected back end (ops/traverse_fused.py::enabled reads this).
        _os.environ["VKRT_FUSED"] = "1" if args.renderer == "fused" else "0"

    import jax
    import numpy as np

    from .models.schema import PBR_DISNEY, PBR_GLTF, RenderConfig, default_tonemapper
    from . import render as R

    t_start = time.time()
    scene, env = load_scene_from_args(args)

    # Firefly clamp driven by env integral like the reference
    # (sample_example.cpp:110: hdrResolution-based heuristic).
    clamp = args.firefly_clamp
    if clamp is None:
        clamp = 4.0 + float(scene.env.integral) if env is not None else 10.0

    w = args.size[0] // args.render_scale
    h = args.size[1] // args.render_scale
    cfg = RenderConfig(
        width=w,
        height=h,
        max_depth=args.depth,
        max_samples=args.samples_per_frame,
        firefly_clamp=clamp,
        hdr_multiplier=args.hdr_multiplier if (env is not None or args.sun_sky) else 0.0,
        debug_mode=DEBUG_NAMES[args.debug_mode],
        pbr_mode=PBR_DISNEY if args.pbr == "disney" else PBR_GLTF,
        use_sun_sky=args.sun_sky,
        render_scale=args.render_scale,
        use_any_hit=not args.no_any_hit,
        rr=not args.no_rr,
    )

    tm = default_tonemapper()
    import jax.numpy as jnp
    tm = tm._replace(
        brightness=jnp.float32(args.tm_brightness),
        contrast=jnp.float32(args.tm_contrast),
        saturation=jnp.float32(args.tm_saturation),
        vignette=jnp.float32(args.tm_vignette),
        avg_lum=jnp.float32(args.tm_exposure),
        auto_exposure=jnp.int32(1 if args.tm_auto_exposure else 0),
        dither=jnp.int32(0 if args.tm_no_dither else 1),
    )

    if args.stats:
        g = scene.geometry
        print(json.dumps({
            "triangles": int(g.indices.shape[0]),
            "vertices": int(g.positions.shape[0]),
            "materials": int(scene.materials.ior.shape[0]),
            "lights": int(scene.n_lights),
            "textures": int(scene.atlas.x.shape[0]),
            "bvh_nodes": (
                int(scene.bvh.left.shape[0]) if scene.bvh is not None else 0
            ),
            "devices": [str(d) for d in jax.devices()],
        }), file=sys.stderr)

    frames = max(1, args.spp // cfg.max_samples)

    if args.multichip and len(jax.devices()) > 1:
        from .parallel import sharding

        mesh = sharding.make_mesh()
        scene_r = sharding.replicate(mesh, scene)
        packed = sharding.replicate(mesh, R.pack_scene(scene.bvh, scene.geometry))
        step = sharding.sharded_render_step(
            mesh, scene_r, packed, cfg, R.scene_has_alpha(scene)
        )
        accum = sharding.shard_accum(mesh, jnp.zeros((h, w, 3), jnp.float32))
        t0 = time.time()
        for f in range(frames):
            accum = step(accum, jnp.asarray(f, jnp.int32))
        accum.block_until_ready()
        if args.profile:
            print(f"render: {time.time() - t0:.2f}s over {len(jax.devices())} devices",
                  file=sys.stderr)
        from .ops.tonemap import apply_post
        img = np.asarray(apply_post(jax.device_get(accum), tm))
        hdr_img = np.asarray(accum)
    else:
        r = R.Renderer(scene, cfg, tonemapper=tm)
        if args.checkpoint:
            try:
                ck = np.load(args.checkpoint)
                r.load_state({"accum": ck["accum"], "frame": int(ck["frame"])})
                print(f"resumed at frame {r.frame}", file=sys.stderr)
            except FileNotFoundError:
                pass
        t0 = time.time()
        for _ in range(frames):
            r.step()
            if args.profile and r.frame % 16 == 0:
                r.accum.block_until_ready()
                print(f"frame {r.frame}: {(time.time() - t0) / r.frame * 1000:.1f} ms/frame",
                      file=sys.stderr)
        img = np.asarray(r.postprocess())
        hdr_img = np.asarray(r.hdr())
        if args.checkpoint:
            np.savez(args.checkpoint, accum=hdr_img, frame=r.frame)

    R.write_png(args.output, img)
    if args.hdr_out:
        np.save(args.hdr_out, hdr_img)
    print(f"wrote {args.output} ({w}x{h}, {frames * cfg.max_samples} spp, "
          f"{time.time() - t_start:.1f}s total)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
