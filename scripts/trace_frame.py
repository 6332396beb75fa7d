"""Device-trace one production frame and aggregate leaf op costs.

Usage: python scripts/trace_frame.py [--scene atrium] [--out /tmp/vkrt_trace]

Prints the top device ops by total time (aggregated over the traced frame)
plus an hlo_category rollup — the round-2 methodology that found the
58%-gathers frame (docs/PERFORMANCE.md "trace-driven" section).
"""

from __future__ import annotations

import argparse
import glob
import gzip
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vk_raytrace_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


def build(scene_name: str, w: int, h: int, depth: int):
    from vk_raytrace_tpu.models import procedural
    from vk_raytrace_tpu.models.schema import PBR_GLTF, RenderConfig
    from vk_raytrace_tpu import render as R

    if scene_name == "atrium":
        geom, mats, lights, cam, atlas = procedural.atrium_scene()
        scene = R.build_scene(geom, mats, lights, cam, atlas=atlas)
        cfg = RenderConfig(
            width=w, height=h, max_depth=depth, max_samples=1,
            hdr_multiplier=1.0, pbr_mode=PBR_GLTF, firefly_clamp=10.0,
            use_sun_sky=True,
        )
    elif scene_name == "bistro":
        pool, inst, mats, lights, cam, atlas = procedural.bistro_scene()
        scene = R.build_instanced_scene(
            pool, inst, mats, lights, cam, atlas=atlas
        )
        cfg = RenderConfig(
            width=w, height=h, max_depth=depth, max_samples=1,
            hdr_multiplier=1.0, pbr_mode=PBR_GLTF, firefly_clamp=10.0,
            use_sun_sky=True,
        )
    elif scene_name == "cornell":
        geom, mats, lights, cam = procedural.cornell_box()
        scene = R.build_scene(geom, mats, lights, cam)
        cfg = RenderConfig(width=w, height=h, max_depth=depth, max_samples=1)
    else:
        raise SystemExit(f"unknown scene {scene_name}")
    return R.Renderer(scene, cfg)


def aggregate(log_dir: str, top: int = 40):
    """Parse the xplane protobuf and aggregate device events."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        print("no xplane.pb found under", log_dir)
        return
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m for m in plane.event_metadata.values()}
        st_meta = {m.id: m.name for m in plane.stat_metadata.values()}
        totals = defaultdict(float)
        counts = defaultdict(int)
        cat_totals = defaultdict(float)
        for line in plane.lines:
            lname = line.name.lower()
            # Only hardware op streams (skip host threads riding the plane).
            for ev in line.events:
                md = ev_meta.get(ev.metadata_id)
                if md is None:
                    continue
                dur_ms = ev.duration_ps / 1e9
                name = md.name
                totals[name] += dur_ms
                counts[name] += 1
                cat = ""
                for stat in list(ev.stats) + list(md.stats):
                    sname = st_meta.get(stat.metadata_id, "")
                    if sname == "hlo_category":
                        cat = (
                            stat.str_value
                            or st_meta.get(stat.ref_value, "")
                        )
                if cat:
                    cat_totals[cat] += dur_ms
        if not totals:
            continue
        grand = sum(totals.values())
        print(f"\n=== plane: {plane.name}  (total device ms {grand:.1f}) ===")
        if cat_totals:
            print("-- by hlo_category --")
            for cat, ms in sorted(cat_totals.items(), key=lambda kv: -kv[1]):
                print(f"  {ms:9.1f} ms  {100*ms/grand:5.1f}%  {cat}")
        print(f"-- top {top} ops --")
        for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {ms:9.1f} ms  x{counts[name]:<6d} {100*ms/grand:5.1f}%  {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="atrium")
    ap.add_argument("--size", nargs=2, type=int, default=[1920, 1080])
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--out", default="/tmp/vkrt_trace")
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()

    if args.parse_only:
        aggregate(args.out)
        return

    import jax

    os.makedirs(args.out, exist_ok=True)
    r = build(args.scene, args.size[0], args.size[1], args.depth)
    t0 = time.time()
    r.step()
    jax.block_until_ready(r.accum)
    print(f"warmup frame {time.time()-t0:.1f}s")
    t0 = time.time()
    with jax.profiler.trace(args.out):
        r.step()
        jax.block_until_ready(r.accum)
    print(f"traced frame {time.time()-t0:.2f}s")
    aggregate(args.out)


if __name__ == "__main__":
    main()
