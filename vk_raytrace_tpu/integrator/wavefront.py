"""Pooled wavefront integrator with ray regeneration.

The production render loop: a fixed pool of lanes traces paths, and any lane
whose path terminates (environment miss, Russian roulette, zero pdf, max
depth) immediately *regenerates* into the next unprocessed (pixel, sample)
unit of the frame. The wavefront therefore stays dense for the whole frame
instead of decaying with bounce depth — the stream-compaction design the
reference reserved a binding for but never built (``S_WF`` "Wavefront extra
data", ``host_device.h:58``; SURVEY.md §7 step 9).

Integrator semantics are clause-for-clause those of
:mod:`vk_raytrace_tpu.integrator.path` (the unrolled reference
implementation, kept for debug modes and cross-checks — see
``tests/test_wavefront.py`` for the parity gate); the only differences are
scheduling:

* bounce depth is a per-lane counter, not a Python loop index (Russian
  roulette's ``depth >= rr_depth`` gate becomes a lane mask);
* per-path radiance is scatter-added into the output image when the path
  dies (one scatter per loop iteration, out-of-range indices dropped);
* lanes draw new (pixel, sample) units from a shared allocation counter via
  an exclusive prefix-sum of the dead mask.

Determinism: a path's RNG stream is ``tea(pixel, frame*spp + sample)``
exactly as in ``render.py::render_strip_impl`` — lane scheduling changes
only the floating-point accumulation order, never the estimator.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.schema import PBR_DISNEY, RenderConfig, SceneData
from ..ops import rng
from ..ops import traverse_wide
from ..ops.bsdf_disney import disney_eval, disney_sample
from ..ops.bsdf_gltf import pbr_eval, pbr_sample
from ..ops.bvh8 import AccelBundle
from ..ops.env import env_radiance, env_sample
from ..ops.lights import sample_light
from ..ops.math import dot, firefly_luminance, offset_ray, power_heuristic
from ..ops.traverse import AlphaCtx
from .camera import generate_rays_for_pixels
from .path import (
    cone_lod,
    env_bsdf_mis_weight,
    mip_lod_enabled,
    nee_strategy_pdf,
    pixel_spread,
)
from .shade import get_shade_state, resolve_material


class PoolState(NamedTuple):
    pix: jax.Array          # (P,) u32 absolute pixel id of the lane's unit
    unit: jax.Array         # (P,) i32 slice-local (pixel, sample) unit id
    origin: jax.Array       # (P, 3)
    direction: jax.Array    # (P, 3)
    radiance: jax.Array     # (P, 3) current path's accumulated radiance
    throughput: jax.Array   # (P, 3)
    absorption: jax.Array   # (P, 3)
    seed: jax.Array         # (P,) u32
    depth: jax.Array        # (P,) i32 bounces completed on current path
    active: jax.Array       # (P,) bool
    bsdf_pdf: jax.Array     # (P,) f32 pdf of the sample that produced this
                            #     ray (0 = camera ray; BSDF-side env MIS)
    tdist: jax.Array        # (P,) f32 accumulated hit distance (ray-cone
                            #     length for texture mip selection)
    next_unit: jax.Array    # ()  i32 units allocated so far
    out: jax.Array          # (U, 3) per-UNIT radiance. A unit is owned by
                            # exactly one lane and terminates exactly once
                            # per frame, so the per-iteration image write is
                            # a unique-index scatter-SET (no read-modify-add,
                            # no collision sort) — measured much cheaper than
                            # the per-pixel scatter-add it replaces.
    steps: jax.Array        # (N,) i32 traversal steps per pixel (heatmap/stats)
    rays: jax.Array         # ()  i32 total rays traced (honest bench count)
    it: jax.Array           # ()  i32 loop iterations executed
    occ: jax.Array          # (cap,) i32 active lanes per iteration when
                            # track_occupancy (else a (1,) dummy) — sizes the
                            # tail-occupancy case for tiered dispatch


def render_units_pooled(
    scene: SceneData,
    packed: AccelBundle,
    cfg: RenderConfig,
    frame: jax.Array,       # () i32
    has_alpha: bool,
    pix0: jax.Array,        # () i32 first pixel of the slice
    n_pix: int,             # static slice size
    pool: int,              # static lane-pool size
    features=None,          # static MatFeatures (see integrator/shade.py)
    stream=None,            # () i32 RNG stream id; defaults to ``frame``.
                            # Multi-chip sample shards pass a globally
                            # unique stream while keeping ``frame`` for the
                            # jitter gate (parallel/sharding.py)
    track_steps: bool = False,  # per-pixel traversal-step image (heatmap/
                            # stats); the scatter-add costs ~3.5ms/iteration
                            # at 524k lanes, so production frames skip it
    track_occupancy: bool = False,  # record active lanes per iteration;
                            # returns a 4th output (occ array, -1 padded)
):
    """Trace ``n_pix * cfg.max_samples`` paths; returns
    ``(radiance_mean (n_pix, 3), steps (n_pix,), rays ())``."""
    # Lift host-numpy scene tables for eager callers (no-op under jit).
    scene, packed = jax.tree.map(jnp.asarray, (scene, packed))
    w, h = cfg.width, cfg.height
    spp = cfg.max_samples
    if stream is None:
        stream = frame
    total_units = n_pix * spp

    alpha_ctx = (
        AlphaCtx(materials=scene.materials, atlas=scene.atlas)
        if (has_alpha and cfg.use_any_hit)
        else None
    )
    # Tiled (8x8) unit->pixel order (the reference's SWIZZLED workgroup
    # layout, pathtrace.comp:65-81): lanes that regenerate together claim
    # pixels of one 8x8 tile instead of one scanline run, so their primary
    # rays (and first bounces) traverse the same BVH nodes — duplicated row
    # indices raise the effective gather bandwidth (scripts/gatherprobe.py).
    # Estimator-invariant: seeds key on the absolute pixel id; only the
    # unit->pixel map changes, and the output fold inverts it exactly.
    tiled = (
        os.environ.get("VKRT_MORTON", "1") != "0"
        and w % 8 == 0
        and n_pix % (w * 8) == 0
    )
    tiles_x = w // 8

    def unit_to_local(p_rank):
        """Slice-local pixel index of pixel-rank ``p_rank`` (tiled order)."""
        t_id = p_rank // 64
        w_in = p_rank % 64
        lx = (t_id % tiles_x) * 8 + (w_in % 8)
        ly = (t_id // tiles_x) * 8 + (w_in // 8)
        return ly * w + lx

    def local_to_rank(local):
        """Inverse of :func:`unit_to_local` (closed form, no tables)."""
        y, x = local // w, local % w
        t_id = (y // 8) * tiles_x + (x // 8)
        w_in = (y % 8) * 8 + (x % 8)
        return t_id * 64 + w_in
    use_mips = mip_lod_enabled(scene, cfg)
    spread = pixel_spread(scene, h) if use_mips else None
    p_select_light = 0.5 if cfg.hdr_multiplier > 0.0 else 1.0
    hdr_mult = jnp.float32(cfg.hdr_multiplier)
    clamp = jnp.float32(cfg.firefly_clamp)
    full_mis = cfg.full_mis and not cfg.use_sun_sky  # see integrator/path.py

    def regenerate(st: PoolState) -> PoolState:
        """Dead lanes claim the next unclaimed (pixel, sample) units."""
        dead = ~st.active
        remaining = total_units - st.next_unit
        rank = jnp.cumsum(dead.astype(jnp.int32)) - dead.astype(jnp.int32)
        unit = st.next_unit + rank
        granted = dead & (unit < total_units)
        n_granted = jnp.minimum(jnp.sum(dead.astype(jnp.int32)), remaining)

        p_rank = unit // spp
        local = unit_to_local(p_rank) if tiled else p_rank
        upix = pix0.astype(jnp.uint32) + local.astype(jnp.uint32)
        usamp = (unit % spp).astype(jnp.uint32)
        seed_new = rng.tea(
            upix, stream.astype(jnp.uint32) * spp + usamp
        )
        o, d, seed_new = generate_rays_for_pixels(
            scene.camera, w, h, upix, frame, seed_new
        )
        g3 = granted[:, None]
        return st._replace(
            pix=jnp.where(granted, upix, st.pix),
            unit=jnp.where(granted, unit, st.unit),
            origin=jnp.where(g3, o, st.origin),
            direction=jnp.where(g3, d, st.direction),
            radiance=jnp.where(g3, 0.0, st.radiance),
            throughput=jnp.where(g3, 1.0, st.throughput),
            absorption=jnp.where(g3, 0.0, st.absorption),
            seed=jnp.where(granted, seed_new, st.seed),
            depth=jnp.where(granted, 0, st.depth),
            active=st.active | granted,
            next_unit=st.next_unit + n_granted,
            bsdf_pdf=jnp.where(granted, 0.0, st.bsdf_pdf),
            tdist=jnp.where(granted, 0.0, st.tdist),
        )

    from ..ops.tlas import InstancedAccel, any_hit_instanced, closest_hit_instanced

    is_instanced = isinstance(packed, InstancedAccel)

    def _closest(o, d, seed, active):
        if is_instanced:
            return closest_hit_instanced(
                packed, scene.geometry.tri_material, o, d,
                seed=seed, alpha_ctx=alpha_ctx, active=active,
            )
        return traverse_wide.closest_hit_bundle(
            packed, scene.geometry.tri_material, o, d,
            seed=seed, alpha_ctx=alpha_ctx, active=active,
        )

    def _occluded(o, d, t_max, seed, active):
        if is_instanced:
            return any_hit_instanced(
                packed, scene.geometry.tri_material, o, d, t_max,
                seed=seed, alpha_ctx=alpha_ctx, active=active,
            )
        return traverse_wide.any_hit_bundle(
            packed, scene.geometry.tri_material, o, d, t_max,
            seed=seed, alpha_ctx=alpha_ctx, active=active,
        )

    from . import shade_fused

    use_fused_shade = shade_fused.supported(cfg, scene, features, is_instanced)

    def shade_stage_fused(st: PoolState, hit, seed):
        """Pallas-fused shading (integrator/shade_fused.py): same clauses as
        :func:`shade_stage_xla`, one kernel instead of ~40 XLA ops."""
        if use_mips:
            tdist = st.tdist + jnp.where(
                hit.tri >= 0, jnp.minimum(hit.t, 1e30), 0.0
            )
            mip = (spread, tdist)
        else:
            mip = None
        out = shade_fused.shade_bounce_fused(
            scene, features, full_mis, p_select_light, hdr_mult,
            hit, st.origin, st.direction, seed, st.active,
            st.radiance, st.throughput, st.absorption, st.bsdf_pdf,
            instances=packed.inst if is_instanced else None,
            sun_disk=cfg.sun_disk,
            mip=mip,
        )
        return (
            out["radiance"], out["alive"], out["throughput"],
            out["absorption"], out["new_origin"], out["new_dir"],
            out["nee"], out["light_dir"], out["light_dist"], out["visible"],
            out["rr_pcont"], out["pdf_b"], out["seed"],
        )

    def shade_stage_xla(st: PoolState, hit, seed):
        """The reference XLA shading stage (unfused fallback + Disney)."""
        # ---- Environment miss (pathtrace.glsl:203-228) -------------------
        miss = st.active & (hit.tri < 0)
        env = env_radiance(
            scene.env, scene.sun_sky, cfg.use_sun_sky, hdr_mult, st.direction,
            sun_disk=cfg.sun_disk,
        )
        if full_mis:
            w_env = env_bsdf_mis_weight(
                scene, st.bsdf_pdf, st.direction, p_select_light,
                sun_disk=cfg.sun_disk,
            )
            env = env * w_env[..., None]
        radiance = st.radiance + jnp.where(
            miss[..., None], env * st.throughput, 0.0
        )
        alive = st.active & ~miss

        # ---- Shade state + material (pathtrace.glsl:231-252) -------------
        ss = get_shade_state(
            scene.geometry, hit.tri, hit.u, hit.v,
            instances=packed.inst if is_instanced else None,
            inst=hit.inst,
            shade_rows=scene.shade_rows,
        )
        if use_mips:
            tdist = st.tdist + jnp.where(
                hit.tri >= 0, jnp.minimum(hit.t, 1e30), 0.0
            )
            lod = cone_lod(ss, spread, tdist)
        else:
            lod = None
        state = resolve_material(
            ss, scene.materials, scene.atlas, st.direction, features=features,
            tap_rows=scene.tap_rows, lod=lod,
        )

        # ---- Unlit shortcut (pathtrace.glsl:258-262) ---------------------
        unlit = alive & state.mat.unlit
        radiance = radiance + jnp.where(
            unlit[..., None], state.mat.albedo * st.throughput, 0.0
        )
        alive = alive & ~unlit

        # ---- Absorption + emission (pathtrace.glsl:264-274) --------------
        exiting = dot(state.normal, state.ffnormal) > 0.0
        absorption = jnp.where(exiting[..., None], 0.0, st.absorption)
        radiance = radiance + jnp.where(
            alive[..., None], state.mat.emission * st.throughput, 0.0
        )
        throughput = st.throughput * jnp.where(
            alive[..., None],
            jnp.exp(-absorption * jnp.minimum(hit.t, 1e30)[..., None]),
            1.0,
        )

        # ---- Direct light (NEE) (pathtrace.glsl:97-188) ------------------
        v_dir = -st.direction
        seed, u_sel = rng.rand(seed)
        use_light = (scene.n_lights > 0) & (u_sel <= p_select_light)

        seed, u_li = rng.rand(seed)
        n_l = jnp.maximum(scene.n_lights, 1)
        light_index = jnp.minimum(
            (u_li * n_l.astype(jnp.float32)).astype(jnp.int32), n_l - 1
        )
        l_int, l_dir, l_dist = sample_light(
            scene.lights, light_index, state.position
        )
        e_rad, e_dir, e_pdf, seed = env_sample(
            scene.env, scene.sun_sky, cfg.use_sun_sky, hdr_mult, seed,
            sun_disk=cfg.sun_disk,
        )

        light_contrib = jnp.where(use_light[..., None], l_int, e_rad)
        light_dir = jnp.where(use_light[..., None], l_dir, e_dir)
        light_dist = jnp.where(use_light, l_dist, 1e32)
        light_pdf = nee_strategy_pdf(
            full_mis, scene, use_light, e_pdf, p_select_light
        )

        f_l, pdf_l = _eval_bsdf(cfg, state, v_dir, state.ffnormal, light_dir)
        mis = jnp.where(
            use_light, 1.0, jnp.maximum(0.0, power_heuristic(light_pdf, pdf_l))
        )
        nee = (
            mis[..., None]
            * f_l
            * jnp.abs(dot(light_dir, state.ffnormal))[..., None]
            * light_contrib
            / jnp.maximum(light_pdf, 1e-9)[..., None]
        )
        visible = alive & (dot(light_dir, state.ffnormal) > 0.0)
        nee = nee * throughput  # pre-BSDF-update throughput (:278)

        # ---- BSDF sampling (pathtrace.glsl:281-296) ----------------------
        f_b, l_b, pdf_b, seed = _sample_bsdf(
            cfg, state, v_dir, state.ffnormal, seed
        )

        entering = dot(state.ffnormal, l_b) < 0.0
        new_abs = -jnp.log(
            jnp.clip(state.mat.attenuation_color, 1e-6, 1.0)
        ) / jnp.maximum(state.mat.attenuation_distance, 1e-9)[..., None]
        absorption = jnp.where((alive & entering)[..., None], new_abs, absorption)

        pdf_ok = pdf_b > 0.0
        throughput = jnp.where(
            (alive & pdf_ok)[..., None],
            throughput
            * f_b
            * jnp.abs(dot(state.ffnormal, l_b))[..., None]
            / jnp.maximum(pdf_b, 1e-20)[..., None],
            throughput,
        )
        alive = alive & pdf_ok

        # ---- Russian roulette continuation prob (:309-314) ---------------
        max_thr = jnp.max(throughput, axis=-1)
        rr_pcont = jnp.minimum(max_thr * state.eta * state.eta + 0.001, 0.95)

        # ---- Next ray (:316-318) -----------------------------------------
        going_out = dot(l_b, state.ffnormal) > 0.0
        off_n = jnp.where(going_out[..., None], state.ffnormal, -state.ffnormal)
        new_origin = offset_ray(state.position, off_n)
        new_origin = jnp.where(alive[..., None], new_origin, st.origin)
        new_dir = jnp.where(alive[..., None], l_b, st.direction)
        return (
            radiance, alive, throughput, absorption, new_origin, new_dir,
            nee, light_dir, light_dist, visible, rr_pcont, pdf_b, seed,
        )

    def bounce(st: PoolState) -> PoolState:
        """One bounce for every active lane — semantics of
        ``integrator/path.py::trace_paths.bounce`` with a per-lane depth."""
        hit, seed = _closest(st.origin, st.direction, st.seed, st.active)
        rays = st.rays + jnp.sum(st.active.astype(jnp.int32))

        stage = shade_stage_fused if use_fused_shade else shade_stage_xla
        (
            radiance, alive, throughput, absorption, new_origin, new_dir,
            nee, light_dir, light_dist, visible, rr_pcont, pdf_b, seed,
        ) = stage(st, hit, seed)

        # Per-lane depth gate replaces the unrolled loop's static branch.
        rr_on = cfg.rr and True
        rr_gate = st.depth >= cfg.rr_depth if rr_on else jnp.zeros_like(alive)
        rr_pcont = jnp.where(rr_gate, rr_pcont, 1.0)

        # ---- Deferred shadow ray (:320-331) ------------------------------
        if os.environ.get("VKRT_ABLATE") == "noshadow":
            occluded = jnp.zeros_like(visible)
        else:
            occluded, seed = _occluded(new_origin, light_dir, light_dist, seed, visible)
        radiance = radiance + jnp.where(
            (visible & ~occluded)[..., None], nee, 0.0
        )
        rays = rays + jnp.sum(visible.astype(jnp.int32))

        # ---- Russian roulette termination (:334-338) ---------------------
        seed, u_rr = rng.rand(seed)
        if rr_on:
            rr_kill = rr_gate & (u_rr >= rr_pcont)
            alive = alive & ~rr_kill
            throughput = jnp.where(
                alive[..., None],
                throughput / jnp.maximum(rr_pcont, 1e-9)[..., None],
                throughput,
            )

        depth = st.depth + st.active.astype(jnp.int32)
        alive = alive & (depth < cfg.max_depth)

        # ---- Path termination: clamp + write the unit's radiance ---------
        died = st.active & ~alive
        lum = firefly_luminance(radiance)
        scale = jnp.where(lum > clamp, clamp / jnp.maximum(lum, 1e-20), 1.0)
        contrib = radiance * scale[..., None]
        # Unit ids are unique across lanes (a unit is granted to one lane and
        # dies once), so give surviving lanes DISTINCT out-of-range targets
        # and scatter with unique_indices — XLA skips the collision handling.
        lane = jax.lax.iota(jnp.int32, st.unit.shape[0])
        target = jnp.where(died, st.unit, total_units + lane)
        if os.environ.get("VKRT_ABLATE") == "noscatter":
            out = st.out
        else:
            out = st.out.at[target].set(
                contrib, mode="drop", unique_indices=True
            )
        # Traversal steps accumulate per pixel every bounce (stats/heatmap);
        # skipped in production (the pooled caller discards them).
        if track_steps:
            local = st.pix.astype(jnp.int32) - pix0
            step_target = jnp.where(st.active, local, n_pix)
            steps = st.steps.at[step_target].add(hit.steps, mode="drop")
        else:
            steps = st.steps
        if track_occupancy:
            n_act = jnp.sum(st.active.astype(jnp.int32))
            occ = jax.lax.dynamic_update_index_in_dim(
                st.occ, n_act, jnp.minimum(st.it, st.occ.shape[0] - 1), 0
            )
        else:
            occ = st.occ
        return st._replace(
            origin=new_origin,
            direction=new_dir,
            radiance=radiance,
            throughput=throughput,
            absorption=absorption,
            seed=seed,
            depth=depth,
            active=alive,
            out=out,
            steps=steps,
            rays=rays,
            it=st.it + 1,
            occ=occ,
            bsdf_pdf=jnp.where(alive, pdf_b, st.bsdf_pdf),
            tdist=st.tdist + jnp.where(
                st.active & (hit.tri >= 0), jnp.minimum(hit.t, 1e30), 0.0
            ),
        )

    def iteration(st: PoolState) -> PoolState:
        return bounce(regenerate(st))

    # ---- Tiered tail (measured: scripts/occupancy.py) ---------------------
    # While units remain, regeneration keeps the pool ~100% occupied; once
    # the frame's units are exhausted the survivors decay (atrium 1080p d4:
    # 1.00 1.00 1.00 1.00 0.67 0.12 0.03 0.01 per iteration). Every bounce
    # costs full pool width regardless of occupancy, so the tail's last
    # iterations waste ~1.6x of the whole frame. Fix: run full width while
    # the pool is dense, then COMPACT the survivors into a pool/4-wide
    # state and keep going, then pool/16 — one gather per field per tier
    # (not per iteration), static shapes throughout.
    def compact(st: PoolState, new_pool: int) -> PoolState:
        take = jnp.argsort(~st.active)[:new_pool]  # active lanes first
        g = lambda a: a[take]
        return st._replace(
            pix=g(st.pix), unit=g(st.unit), origin=g(st.origin),
            direction=g(st.direction), radiance=g(st.radiance),
            throughput=g(st.throughput), absorption=g(st.absorption),
            seed=g(st.seed), depth=g(st.depth), active=g(st.active),
            bsdf_pdf=g(st.bsdf_pdf), tdist=g(st.tdist),
        )

    def cond(st: PoolState) -> jax.Array:
        return (st.next_unit < total_units) | jnp.any(st.active)

    p = pool
    z3 = jnp.zeros((p, 3), jnp.float32)
    st0 = PoolState(
        pix=jnp.zeros((p,), jnp.uint32),
        unit=jnp.zeros((p,), jnp.int32),
        origin=z3,
        direction=z3.at[:, 2].set(1.0),
        radiance=z3,
        throughput=z3,
        absorption=z3,
        seed=jnp.zeros((p,), jnp.uint32),
        depth=jnp.zeros((p,), jnp.int32),
        active=jnp.zeros((p,), bool),
        bsdf_pdf=jnp.zeros((p,), jnp.float32),
        tdist=jnp.zeros((p,), jnp.float32),
        next_unit=jnp.asarray(0, jnp.int32),
        out=jnp.zeros((total_units, 3), jnp.float32),
        steps=jnp.zeros((n_pix,), jnp.int32),
        rays=jnp.asarray(0, jnp.int32),
        it=jnp.asarray(0, jnp.int32),
        occ=jnp.full((1024 if track_occupancy else 1,), -1, jnp.int32),
    )
    _tiers_env = os.environ.get("VKRT_TIERS", "1")
    tiers = _tiers_env == "force" or (_tiers_env != "0" and p >= 8192)
    tiers = tiers and p >= 64  # degenerate pools have no tail to tier
    if not tiers:
        st = jax.lax.while_loop(cond, iteration, st0)
    else:
        q, s = p // 4, p // 16

        def cond_hi(st: PoolState) -> jax.Array:
            return (st.next_unit < total_units) | (
                jnp.sum(st.active.astype(jnp.int32)) > q
            )

        def cond_mid(st: PoolState) -> jax.Array:
            return jnp.sum(st.active.astype(jnp.int32)) > s

        st = jax.lax.while_loop(cond_hi, iteration, st0)
        st = jax.lax.while_loop(cond_mid, iteration, compact(st, q))
        st = jax.lax.while_loop(cond, iteration, compact(st, s))
    # Fold per-unit radiance to per-pixel means (unit = rank*spp + sample);
    # tiled order un-swizzles with one closed-form gather.
    img = st.out.reshape(n_pix, spp, 3).sum(axis=1) / jnp.float32(spp)
    if tiled:
        img = img[local_to_rank(jnp.arange(n_pix, dtype=jnp.int32))]
    if track_occupancy:
        return img, st.steps, st.rays, st.occ
    return img, st.steps, st.rays


def _eval_bsdf(cfg: RenderConfig, state, v, n, l):
    if cfg.pbr_mode == PBR_DISNEY:
        return disney_eval(state, v, n, l)
    return pbr_eval(state, v, n, l)


def _sample_bsdf(cfg: RenderConfig, state, v, n, seed):
    # full_mis: sample the lobe-mixture direction but return the mixture
    # (f, pdf) from eval — sampling and NEE then share ONE pdf function, so
    # the power-heuristic weights sum to 1 (see ops/bsdf_gltf.py::pbr_sample).
    if cfg.pbr_mode == PBR_DISNEY:
        f, l, pdf, _is_ss, seed = disney_sample(
            state, v, n, seed, combined=cfg.full_mis
        )
        return f, l, pdf, seed
    f, l, pdf, seed = pbr_sample(state, v, n, seed, combined=cfg.full_mis)
    return f, l, pdf, seed
