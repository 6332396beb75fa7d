"""Pooled-wavefront occupancy profile: active lanes per loop iteration.

The iteration schedule (regeneration, RR, depth kills) is deterministic and
platform-independent, so the tail-occupancy question — how many iterations
run nearly empty, i.e. how much a tiered/compacted dispatch could save — is
answerable on CPU at a scaled-down frame with the production pool:units
ratio (~1:4 at 1080p spp1).

Usage: python scripts/occupancy.py [--scene atrium] [--size 512 288]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="atrium")
    ap.add_argument("--size", nargs=2, type=int, default=[512, 288])
    ap.add_argument("--pool-ratio", type=float, default=3.955,
                    help="units per pool lane (1080p spp1 production: 2073600/524288)")
    args = ap.parse_args()

    from vk_raytrace_tpu.models import procedural
    from vk_raytrace_tpu.models.schema import PBR_GLTF, RenderConfig
    from vk_raytrace_tpu import render as R
    from vk_raytrace_tpu.integrator.wavefront import render_units_pooled

    w, h = args.size
    if args.scene == "atrium":
        geom, mats, lights, cam, atlas = procedural.atrium_scene()
        scene = R.build_scene(geom, mats, lights, cam, atlas=atlas)
        cfg = RenderConfig(
            width=w, height=h, max_depth=4, max_samples=1,
            hdr_multiplier=1.0, pbr_mode=PBR_GLTF, firefly_clamp=10.0,
            use_sun_sky=True,
        )
    else:
        geom, mats, lights, cam = procedural.cornell_box()
        scene = R.build_scene(geom, mats, lights, cam)
        cfg = RenderConfig(width=w, height=h, max_depth=4, max_samples=1)
    r = R.Renderer(scene, cfg)

    n_pix = w * h
    pool = max(1024, int(n_pix * cfg.max_samples / args.pool_ratio))
    fn = jax.jit(
        lambda frame: render_units_pooled(
            r.scene, r.packed, cfg, frame, r.has_alpha,
            jnp.asarray(0, jnp.int32), n_pix, pool,
            features=r.features, track_occupancy=True,
        )[3]
    )
    occ = np.asarray(fn(jnp.asarray(1, jnp.int32)))
    occ = occ[occ >= 0]
    frac = occ / pool
    full_equiv = frac.sum()
    print(f"pool={pool} units={n_pix * cfg.max_samples} iterations={len(occ)}")
    print("occupancy/iter:", " ".join(f"{f:.2f}" for f in frac))
    print(
        f"mean occupancy {frac.mean():.3f}; full-width iterations paid "
        f"{len(occ)}, full-occupancy-equivalent work {full_equiv:.1f} "
        f"-> tiered-dispatch ceiling {len(occ) / max(full_equiv, 1e-9):.2f}x"
    )


if __name__ == "__main__":
    main()
