"""Traversal-only microbench: time `closest_hit_fused` over the atrium
opaque planar table at production pool width.

Usage: python scripts/travbench.py [n_iters]
Env:   VKRT_NOALIAS=1   disable kernel output aliasing (attribution)

Isolates the fused traversal (row gather + Pallas step kernel + phase
compaction) from shading/NEE/scatter so kernel-level experiments (aliasing,
stack width, phase divisors) can be compared with ONE compile each instead
of a full-frame rebuild.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vk_raytrace_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vk_raytrace_tpu.models import procedural
    from vk_raytrace_tpu import render as R
    from vk_raytrace_tpu.models.schema import PBR_GLTF, RenderConfig
    from vk_raytrace_tpu.ops import traverse_fused as TF
    from vk_raytrace_tpu.integrator.camera import generate_rays_for_pixels

    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    geom, mats, lights, cam, atlas = procedural.atrium_scene()
    scene = R.build_scene(geom, mats, lights, cam, atlas=atlas)
    cfg = RenderConfig(
        width=1920, height=1080, max_depth=4, max_samples=1,
        hdr_multiplier=1.0, pbr_mode=PBR_GLTF, firefly_clamp=10.0,
        use_sun_sky=True,
    )
    r = R.Renderer(scene, cfg)
    planar = getattr(r.packed, "opaque_planar", None)
    if planar is None:
        raise SystemExit(
            "travbench requires the fused planar path (no opaque planar rows "
            "were built — unset VKRT_FUSED=0 / check the native builder)"
        )
    print(
        f"rows={planar.rows.shape} stack_depth={planar.stack_depth} "
        f"width={planar.width} noalias={os.environ.get('VKRT_NOALIAS')}",
        flush=True,
    )

    P = 524288
    pix = (np.arange(P, dtype=np.uint32) * 7919) % (1920 * 1080)
    seeds = jnp.asarray((pix.astype(np.uint64) * 2654435761) % (1 << 31), jnp.uint32)
    o, d, _ = generate_rays_for_pixels(
        r.scene.camera, 1920, 1080, jnp.asarray(pix),
        jnp.uint32(0), seeds,
    )

    anyhit = os.environ.get("VKRT_TRAVBENCH_ANYHIT") == "1"
    if anyhit:
        # Shadow-ray proxy: camera-origin rays toward the sun (production
        # shadows start at hit points, but the scheduling trade — any-hit
        # lanes terminate on first hit — is what this measures).
        sun = jnp.asarray(r.scene.sun_sky.sun_direction, jnp.float32)
        sun = sun / jnp.maximum(jnp.linalg.norm(sun), 1e-9)
        d_sh = jnp.broadcast_to(sun, o.shape)
        t_max = jnp.full((P,), 1e30, jnp.float32)

        @jax.jit
        def trace(o, d):
            occ = TF.any_hit_fused(planar, o, d_sh, t_max)
            return occ.sum(), occ.sum()
    else:
        @jax.jit
        def trace(o, d):
            hit = TF.closest_hit_fused(planar, o, d)
            return hit.t.sum(), hit.steps.sum()

    t, s = trace(o, d)
    jax.block_until_ready(t)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        t, s = trace(o, d)
        jax.block_until_ready(t)
    dt = (time.perf_counter() - t0) / n_iters
    name = "any_hit_fused" if anyhit else "closest_hit_fused"
    tail = (f"occ_frac={float(s)/P:.2f}" if anyhit
            else f"mean_steps={float(s)/P:.2f}")
    print(
        f"{name}({P} rays): {dt*1e3:.1f} ms  "
        f"({P/dt/1e6:.1f} Mrays/s)  {tail}",
        flush=True,
    )


if __name__ == "__main__":
    main()
