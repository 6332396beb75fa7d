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


def primary_rays(scene, width, height, res_w, res_h):
    """Camera rays on a res_w x res_h pixel subgrid of the full frame."""
    import jax.numpy as jnp
    from vk_raytrace_tpu.integrator.camera import generate_rays_for_pixels

    xs = (np.arange(res_w) * (width // res_w)).astype(np.uint32)
    ys = (np.arange(res_h) * (height // res_h)).astype(np.uint32)
    pix = (ys[:, None] * width + xs[None, :]).reshape(-1)
    seed = jnp.zeros((len(pix),), jnp.uint32)
    o, d, _ = generate_rays_for_pixels(
        scene.camera, width, height, jnp.asarray(pix), jnp.asarray(0), seed
    )
    return np.asarray(o), np.asarray(d)


def count_rows(rows: np.ndarray, width: int, o: np.ndarray, d: np.ndarray,
               return_t: bool = False):
    """Closest-hit traversal of one planar table; returns rows-fetched per
    ray. Matches the fused kernel's schedule: distance-ordered children,
    pop-time t_best pruning, Moller-Trumbore leaves."""
    W = width
    L = W // 2
    inv_all = np.where(np.abs(d) > 1e-12, 1.0 / np.where(d == 0, 1, d), 1e30)
    inv_all = np.where(d < 0, -np.abs(inv_all), np.abs(inv_all))
    n_rays = len(o)
    counts = np.zeros(n_rays, np.int32)
    t_out = np.full(n_rays, np.float32(3.0e38)) if return_t else None
    np.seterr(over="ignore")  # empty slots carry inverted 3e38 AABBs

    # Pre-split planes for speed.
    bmin = rows[:, 0 * W:3 * W].reshape(-1, 3, W)
    bmax = rows[:, 3 * W:6 * W].reshape(-1, 3, W)
    refs = rows[:, 6 * W:7 * W]

    for i in range(n_rays):
        oi = o[i]
        inv = inv_all[i]
        t_best = np.float32(3.0e38)
        stack = [(0.0, 0)]  # (entry_t, interior row)
        n_fetch = 0
        while stack:
            t_ent, ref = stack.pop()
            if t_ent >= t_best:
                continue
            r = int(ref)
            n_fetch += 1
            t0 = (bmin[r] - oi[:, None]) * inv[:, None]   # (3, W)
            t1 = (bmax[r] - oi[:, None]) * inv[:, None]
            tn = np.minimum(t0, t1).max(axis=0)
            tf = np.maximum(t0, t1).min(axis=0)
            tn = np.maximum(tn, 0.0)
            hit = (tn <= tf) & (tn < t_best)
            for c in np.argsort(-tn):  # far-to-near push => near pops first
                if not hit[c]:
                    continue
                cref = refs[r, c]
                if cref >= 0.5:  # interior (root is row 0; empty slots ref 0
                    stack.append((tn[c], int(cref)))  # and never slab-hit)
                elif cref < 0:
                    # leaf: fetch + intersect
                    code = int(-cref) - 1
                    lrow = code // L
                    cnt = code % L + 1
                    n_fetch += 1
                    lr = rows[lrow]
                    p = lr[: 9 * L].reshape(9, L)[:, :cnt]
                    p0 = p[0:3]
                    e1 = p[3:6] - p0
                    e2 = p[6:9] - p0
                    dv = d[i]
                    pv = np.cross(dv, e2.T).T
                    det = (e1 * pv).sum(0)
                    ok = np.abs(det) > 1e-12
                    invd = 1.0 / np.where(ok, det, 1.0)
                    tv = oi[:, None] - p0
                    u = (tv * pv).sum(0) * invd
                    qv = np.cross(tv.T, e1.T).T
                    v = (dv[:, None] * qv).sum(0) * invd
                    t = (e2 * qv).sum(0) * invd
                    good = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-4) & (t < t_best)
                    if good.any():
                        t_best = t[good].min()
        counts[i] = n_fetch
        if return_t:
            t_out[i] = t_best
    if return_t:
        return counts, t_out
    return counts


def secondary_rays(rows, width, o, d, rng_seed=7):
    """Diffuse bounce rays: trace primaries, spawn cosine-ish hemisphere
    directions from the hit points (rays that missed are dropped)."""
    _, t_best = count_rows(rows, width, o, d, return_t=True)
    hit = np.isfinite(t_best) & (t_best < 3.0e37)
    p = o[hit] + d[hit] * t_best[hit][:, None] * 0.999
    rng = np.random.default_rng(rng_seed)
    nd = rng.normal(size=(len(p), 3)).astype(np.float32)
    nd /= np.linalg.norm(nd, axis=1, keepdims=True)
    # flip to the hemisphere away from the incoming ray
    flip = (nd * d[hit]).sum(1) > 0
    nd[flip] *= -1.0
    return p.astype(np.float32), nd


def count_rows_anyhit(rows, width, o, d):
    """Early-exit occlusion traversal: rows fetched until ANY hit (or
    exhaustion) — models the NEE shadow pass."""
    W = width
    L = W // 2
    inv_all = np.where(np.abs(d) > 1e-12, 1.0 / np.where(d == 0, 1, d), 1e30)
    inv_all = np.where(d < 0, -np.abs(inv_all), np.abs(inv_all))
    counts = np.zeros(len(o), np.int32)
    occluded = np.zeros(len(o), bool)
    bmin = rows[:, 0 * W:3 * W].reshape(-1, 3, W)
    bmax = rows[:, 3 * W:6 * W].reshape(-1, 3, W)
    refs = rows[:, 6 * W:7 * W]
    for i in range(len(o)):
        oi = o[i]
        inv = inv_all[i]
        stack = [0]
        n_fetch = 0
        done = False
        while stack and not done:
            r = stack.pop()
            n_fetch += 1
            t0 = (bmin[r] - oi[:, None]) * inv[:, None]
            t1 = (bmax[r] - oi[:, None]) * inv[:, None]
            tn = np.maximum(np.minimum(t0, t1).max(axis=0), 0.0)
            tf = np.maximum(t0, t1).min(axis=0)
            hit = tn <= tf
            for c in np.where(hit)[0]:
                cref = refs[r, c]
                if cref >= 0.5:
                    stack.append(int(cref))
                elif cref < 0:
                    code = int(-cref) - 1
                    lrow = code // L
                    cnt = code % L + 1
                    n_fetch += 1
                    lr = rows[lrow]
                    p = lr[: 9 * L].reshape(9, L)[:, :cnt]
                    p0, e1, e2 = p[0:3], p[3:6] - p[0:3], p[6:9] - p[0:3]
                    dv = d[i]
                    pv = np.cross(dv, e2.T).T
                    det = (e1 * pv).sum(0)
                    ok = np.abs(det) > 1e-12
                    invd = 1.0 / np.where(ok, det, 1.0)
                    tv = oi[:, None] - p0
                    u = (tv * pv).sum(0) * invd
                    qv = np.cross(tv.T, e1.T).T
                    v = (dv[:, None] * qv).sum(0) * invd
                    t = (e2 * qv).sum(0) * invd
                    if (ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-4) & (t < 1e30)).any():
                        occluded[i] = True
                        done = True
                        break
        counts[i] = n_fetch
    return counts, occluded


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
