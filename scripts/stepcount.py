"""Mean planar-row fetches per primary ray — the tree-quality metric.

On TPU the traversal cost is flat per ROW gathered (4B-512B rows cost the
same; docs/PERFORMANCE.md "row-packing principle"), so the only lever tree
construction has is the number of rows a ray touches. This tool traverses
the production 16-wide planar table in host numpy and reports mean/median/
p95 row fetches per ray for primary rays — CPU-exact, no TPU needed, which
is how the 32-wide layout was rejected (12.1 vs 12.3 rows/ray for +14%
per-gather cost; docs/PERFORMANCE.md lever notes).

Usage: python scripts/stepcount.py [--scene atrium] [--res 128x72]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# The axon TPU plugin ignores JAX_PLATFORMS=cpu and blocks on tunnel init;
# jax.config is the only reliable way to keep this host-only tool off it.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


from vk_raytrace_tpu.utils.stepcount import (  # noqa: E402
    count_rows,
    count_rows_anyhit,
    primary_rays,
    secondary_rays,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="atrium")
    ap.add_argument("--res", default="128x72")
    ap.add_argument("--secondary", action="store_true",
                    help="also measure diffuse bounce rays from hit points")
    args = ap.parse_args()
    res_w, res_h = (int(x) for x in args.res.split("x"))

    from vk_raytrace_tpu.models import procedural
    from vk_raytrace_tpu import render as R

    t0 = time.time()
    if args.scene == "atrium":
        geom, mats, lights, cam, atlas = procedural.atrium_scene()
        scene = R.build_scene(geom, mats, lights, cam, atlas=atlas)
        w, h = 1920, 1080
    elif args.scene == "cornell":
        geom, mats, lights, cam = procedural.cornell_box()
        scene = R.build_scene(geom, mats, lights, cam)
        w, h = 256, 256
    else:
        raise SystemExit(f"unknown scene {args.scene}")
    packed = R.pack_scene(scene.bvh, scene.geometry)
    print(f"scene build {time.time()-t0:.1f}s")

    for name in ("opaque_planar", "alpha_planar"):
        ps = getattr(packed, name, None)
        if ps is None:
            continue
        rows = np.asarray(ps.rows)
        o, d = primary_rays(scene, w, h, res_w, res_h)
        t0 = time.time()
        counts = count_rows(rows, ps.width, o, d)
        print(
            f"{name}: width={ps.width} rows={len(rows)} rays={len(o)} "
            f"mean={counts.mean():.2f} median={np.median(counts):.1f} "
            f"p95={np.percentile(counts, 95):.1f} max={counts.max()} "
            f"({time.time()-t0:.1f}s)"
        )
        if args.secondary and name == "opaque_planar":
            so, sd = secondary_rays(rows, ps.width, o, d)
            sc = count_rows(rows, ps.width, so, sd)
            print(
                f"{name} secondary: rays={len(so)} mean={sc.mean():.2f} "
                f"median={np.median(sc):.1f} p95={np.percentile(sc, 95):.1f}"
            )
            # Shadow model: any-hit toward the sun from the same hit points
            sun = np.array([0.35, 0.8, 0.45], np.float32)
            sun /= np.linalg.norm(sun)
            sdirs = np.broadcast_to(sun, so.shape).copy()
            ac, occ = count_rows_anyhit(rows, ps.width, so, sdirs)
            print(
                f"{name} shadow(any-hit, sun): mean={ac.mean():.2f} "
                f"median={np.median(ac):.1f} p95={np.percentile(ac, 95):.1f} "
                f"occluded={occ.mean():.2f}"
            )


if __name__ == "__main__":
    main()
