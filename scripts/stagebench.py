"""Shading-stage microbench: time the non-traversal stages of one pooled
bounce in isolation at production lane width.

Usage: python scripts/stagebench.py [pool]

Times (blocked, jitted separately — boundary layout copies OVERSTATE
in-frame cost, see docs/PERFORMANCE.md round-2 notes; use for ranking and
for before/after comparison of the same stage):

  shade     get_shade_state + resolve_material (gathers + elementwise)
  nee       light/env sampling + pbr_eval + MIS arithmetic
  sample    pbr_sample (+ combined eval when full_mis)
  envmiss   env_radiance on the miss direction
  all       one fused jit of everything between the two traversals
            (what the Pallas shading kernel would replace)
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
    from vk_raytrace_tpu.integrator.camera import generate_rays_for_pixels
    from vk_raytrace_tpu.integrator.shade import get_shade_state, resolve_material
    from vk_raytrace_tpu.integrator.path import env_bsdf_mis_weight, nee_strategy_pdf
    from vk_raytrace_tpu.ops import rng
    from vk_raytrace_tpu.ops.bsdf_gltf import pbr_eval, pbr_sample
    from vk_raytrace_tpu.ops.env import env_radiance, env_sample
    from vk_raytrace_tpu.ops.lights import sample_light
    from vk_raytrace_tpu.ops.math import dot, offset_ray, power_heuristic
    from vk_raytrace_tpu.ops import traverse_wide

    pool = int(sys.argv[1]) if len(sys.argv) > 1 else 524288
    geom, mats, lights, cam, atlas = procedural.atrium_scene()
    scene = R.build_scene(geom, mats, lights, cam, atlas=atlas)
    cfg = RenderConfig(
        width=1920, height=1080, max_depth=4, max_samples=1,
        hdr_multiplier=1.0, pbr_mode=PBR_GLTF, firefly_clamp=10.0,
        use_sun_sky=True,
    )
    r = R.Renderer(scene, cfg)
    scene, packed, cfg = r.scene, r.packed, r._run_cfg
    features = r.features

    P = pool
    pix = (np.arange(P, dtype=np.uint32) * 7919) % (1920 * 1080)
    seeds = jnp.asarray((pix.astype(np.uint64) * 2654435761) % (1 << 31), jnp.uint32)
    o, d, seeds = generate_rays_for_pixels(
        scene.camera, 1920, 1080, jnp.asarray(pix), jnp.uint32(0), seeds
    )

    @jax.jit
    def first_hit(o, d, s):
        hit, s = traverse_wide.closest_hit_bundle(
            packed, scene.geometry.tri_material, o, d, seed=s
        )
        return hit, s

    hit, seeds = first_hit(o, d, seeds)
    hit, seeds, o, d = jax.block_until_ready((hit, seeds, o, d))
    active = hit.tri >= 0
    print(f"pool={P} hit_frac={float(jnp.mean(active.astype(jnp.float32))):.2f}",
          flush=True)

    p_select_light = 0.5 if cfg.hdr_multiplier > 0.0 else 1.0
    hdr_mult = jnp.float32(cfg.hdr_multiplier)
    full_mis = cfg.full_mis and not cfg.use_sun_sky

    def stage_shade(hit, d):
        ss = get_shade_state(
            scene.geometry, hit.tri, hit.u, hit.v, shade_rows=scene.shade_rows
        )
        st = resolve_material(
            ss, scene.materials, scene.atlas, d, features=features,
            tap_rows=scene.tap_rows,
        )
        return st.position.sum() + st.mat.albedo.sum() + st.ffnormal.sum()

    def make_state(hit, d):
        ss = get_shade_state(
            scene.geometry, hit.tri, hit.u, hit.v, shade_rows=scene.shade_rows
        )
        return resolve_material(
            ss, scene.materials, scene.atlas, d, features=features,
            tap_rows=scene.tap_rows,
        )

    def stage_nee(hit, d, seed):
        state = make_state(hit, d)
        v_dir = -d
        seed, u_sel = rng.rand(seed)
        use_light = (scene.n_lights > 0) & (u_sel <= p_select_light)
        seed, u_li = rng.rand(seed)
        n_l = jnp.maximum(scene.n_lights, 1)
        li = jnp.minimum((u_li * n_l.astype(jnp.float32)).astype(jnp.int32), n_l - 1)
        l_int, l_dir, l_dist = sample_light(scene.lights, li, state.position)
        e_rad, e_dir, e_pdf, seed = env_sample(
            scene.env, scene.sun_sky, cfg.use_sun_sky, hdr_mult, seed
        )
        light_dir = jnp.where(use_light[..., None], l_dir, e_dir)
        light_pdf = nee_strategy_pdf(full_mis, scene, use_light, e_pdf, p_select_light)
        f_l, pdf_l = pbr_eval(state, v_dir, state.ffnormal, light_dir)
        mis = jnp.where(use_light, 1.0, jnp.maximum(0.0, power_heuristic(light_pdf, pdf_l)))
        nee = mis[..., None] * f_l * jnp.where(use_light[..., None], l_int, e_rad)
        return nee.sum() + light_dir.sum() + l_dist.sum()

    def stage_sample(hit, d, seed):
        state = make_state(hit, d)
        f, l, pdf, seed = pbr_sample(state, -d, state.ffnormal, seed,
                                     combined=cfg.full_mis)
        return f.sum() + l.sum() + pdf.sum()

    def stage_envmiss(d, bsdf_pdf):
        env = env_radiance(scene.env, scene.sun_sky, cfg.use_sun_sky, hdr_mult, d)
        if full_mis:
            w = env_bsdf_mis_weight(scene, bsdf_pdf, d, p_select_light)
            env = env * w[..., None]
        return env.sum()

    def stage_all(hit, d, seed, thr):
        state = make_state(hit, d)
        env = env_radiance(scene.env, scene.sun_sky, cfg.use_sun_sky, hdr_mult, d)
        v_dir = -d
        seed, u_sel = rng.rand(seed)
        use_light = (scene.n_lights > 0) & (u_sel <= p_select_light)
        seed, u_li = rng.rand(seed)
        n_l = jnp.maximum(scene.n_lights, 1)
        li = jnp.minimum((u_li * n_l.astype(jnp.float32)).astype(jnp.int32), n_l - 1)
        l_int, l_dir, l_dist = sample_light(scene.lights, li, state.position)
        e_rad, e_dir, e_pdf, seed = env_sample(
            scene.env, scene.sun_sky, cfg.use_sun_sky, hdr_mult, seed
        )
        light_contrib = jnp.where(use_light[..., None], l_int, e_rad)
        light_dir = jnp.where(use_light[..., None], l_dir, e_dir)
        light_pdf = nee_strategy_pdf(full_mis, scene, use_light, e_pdf, p_select_light)
        f_l, pdf_l = pbr_eval(state, v_dir, state.ffnormal, light_dir)
        mis = jnp.where(use_light, 1.0, jnp.maximum(0.0, power_heuristic(light_pdf, pdf_l)))
        nee = (mis[..., None] * f_l * jnp.abs(dot(light_dir, state.ffnormal))[..., None]
               * light_contrib)
        f_b, l_b, pdf_b, seed = pbr_sample(state, v_dir, state.ffnormal, seed,
                                           combined=cfg.full_mis)
        thr = thr * f_b * jnp.abs(dot(state.ffnormal, l_b))[..., None]
        going_out = dot(l_b, state.ffnormal) > 0.0
        off_n = jnp.where(going_out[..., None], state.ffnormal, -state.ffnormal)
        new_origin = offset_ray(state.position, off_n)
        return (env.sum() + nee.sum() + thr.sum() + new_origin.sum()
                + l_b.sum() + pdf_b.sum() + l_dist.sum())

    thr = jnp.ones((P, 3), jnp.float32)
    bsdf_pdf = jnp.full((P,), 0.3, jnp.float32)
    stages = {
        "shade": (stage_shade, (hit, d)),
        "nee": (stage_nee, (hit, d, seeds)),
        "sample": (stage_sample, (hit, d, seeds)),
        "envmiss": (stage_envmiss, (d, bsdf_pdf)),
        "all": (stage_all, (hit, d, seeds, thr)),
    }
    names = sys.argv[2:] or list(stages)
    for name in names:
        fn, args = stages[name]
        jf = jax.jit(fn)
        out = jax.block_until_ready(jf(*args))
        t0 = time.perf_counter()
        n = 6
        for _ in range(n):
            out = jax.block_until_ready(jf(*args))
        dt = (time.perf_counter() - t0) / n
        print(f"{name:8s} {dt*1e3:8.2f} ms / {P} lanes", flush=True)


if __name__ == "__main__":
    main()
