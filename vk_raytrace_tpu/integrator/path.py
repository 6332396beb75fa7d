"""The wavefront path-tracing integrator.

TPU-native replacement for the reference's megakernel integrator
(``shaders/pathtrace.glsl`` ``PathTrace``/``DirectLight``/``samplePixel``
driven from ``pathtrace.rgen``/``pathtrace.comp``). Instead of one divergent
per-pixel loop, the bounce loop is a ``lax.scan`` over depth with the whole
ray batch as flat SoA state — each stage (traverse, shade, NEE, BSDF sample,
shadow, Russian roulette) runs as dense vectorized code over the wavefront,
with masks for terminated lanes (stream compaction lives one level up, in
``render.py``, for multi-sample batching).

Integrator semantics follow the reference exactly:

* env-miss termination adds sky/HDR radiance x throughput (pathtrace.glsl:203-228)
* emission + Beer-Lambert volume absorption (:264-274)
* NEE with 50/50 punctual-light vs environment selection, MIS power
  heuristic on the environment side only (:97-188)
* deferred shadow ray: contribution added after the bounce ray is set up (:320-331)
* Russian roulette with eta^2 boost from RR_DEPTH=0 (:309-338)
* firefly luminance clamp per sample (:378-384)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.schema import (
    DEBUG_ALPHA,
    DEBUG_BASECOLOR,
    DEBUG_EMISSIVE,
    DEBUG_HEATMAP,
    DEBUG_METALLIC,
    DEBUG_NONE,
    DEBUG_NORMAL,
    DEBUG_RADIANCE,
    DEBUG_RAYDIR,
    DEBUG_ROUGHNESS,
    DEBUG_TANGENT,
    DEBUG_TEXCOORD,
    DEBUG_WEIGHT,
    PBR_DISNEY,
    RenderConfig,
    SceneData,
)
from ..ops import rng
from ..ops import traverse
from ..ops import traverse_wide
from ..ops.bsdf_disney import disney_eval, disney_sample
from ..ops.bsdf_gltf import pbr_eval, pbr_sample
from ..ops.env import env_radiance, env_sample, environment_pdf
from ..ops.lights import sample_light
from ..ops.math import (
    dot,
    firefly_luminance,
    offset_ray,
    power_heuristic,
    temperature,
)
from ..ops.traverse import AlphaCtx
from ..ops.bvh8 import AccelBundle
from .shade import get_shade_state, resolve_material


class PathState(NamedTuple):
    """Per-ray live state across the bounce scan (kept deliberately small —
    the reference's 'minimize live state' notes, pathtrace.glsl:164-170,310)."""

    origin: jax.Array       # (R, 3)
    direction: jax.Array    # (R, 3)
    radiance: jax.Array     # (R, 3)
    throughput: jax.Array   # (R, 3)
    absorption: jax.Array   # (R, 3)
    seed: jax.Array         # (R,) u32
    alive: jax.Array        # (R,) bool
    debug: jax.Array        # (R, 3) debug-mode output (first hit)
    steps: jax.Array        # (R,) i32 accumulated traversal steps (heatmap)
    rays: jax.Array         # (R,) i32 rays traced per lane (primary+bounce+shadow)
    bsdf_pdf: jax.Array     # (R,) f32 pdf of the sample that produced this ray
                            #     (0 = camera ray; drives BSDF-side env MIS)
    tdist: jax.Array        # (R,) f32 accumulated hit distance — the ray-cone
                            #     length driving texture mip selection


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


def nee_strategy_pdf(
    full_mis: bool, scene, use_light, e_pdf, p_select_light: float
):
    """Effective pdf of the one-sample NEE strategy (shared by the unrolled
    and pooled integrators).

    full MIS: punctual pdf = P(pick lights)·(1/n_lights); environment pdf =
    P(pick env)·alias_pdf — the correct one-sample-MIS strategy density.
    Reference compat: 1 for punctual, raw alias pdf for env (the reference
    never divides by selection probabilities, pathtrace.glsl:113-179)."""
    if not full_mis:
        return jnp.where(use_light, 1.0, e_pdf)
    n_lf = jnp.maximum(scene.n_lights, 1).astype(jnp.float32)
    p_light_sel = jnp.where(scene.n_lights > 0, p_select_light, 0.0)
    return jnp.where(use_light, p_light_sel / n_lf, (1.0 - p_light_sel) * e_pdf)


def env_bsdf_mis_weight(
    scene, bsdf_pdf, direction, p_select_light: float, sun_disk: bool = False
):
    """Power-heuristic weight for a BSDF-sampled ray that escaped to the
    environment (full-MIS counterpart of the NEE env term; the reference
    adds this contribution unweighted, pathtrace.glsl:228). Camera rays
    (bsdf_pdf == 0) see the environment directly: weight 1."""
    p_light_sel = jnp.where(scene.n_lights > 0, p_select_light, 0.0)
    pdf_env = environment_pdf(
        scene.env, direction, scene.sun_sky, sun_disk
    ) * (1.0 - p_light_sel)
    return jnp.where(
        bsdf_pdf > 0.0,
        jnp.maximum(0.0, power_heuristic(bsdf_pdf, pdf_env)),
        1.0,
    )


def _debug_info(cfg: RenderConfig, state) -> jax.Array:
    """First-hit debug visualizations (``DebugInfo``, pathtrace.glsl:61-83)."""
    mode = cfg.debug_mode
    if mode == DEBUG_METALLIC:
        return state.mat.metallic[..., None] * jnp.ones(3)
    if mode == DEBUG_NORMAL:
        return (state.normal + 1.0) * 0.5
    if mode == DEBUG_BASECOLOR:
        return state.mat.albedo
    if mode == DEBUG_EMISSIVE:
        return state.mat.emission
    if mode == DEBUG_ALPHA:
        return state.mat.alpha[..., None] * jnp.ones(3)
    if mode == DEBUG_ROUGHNESS:
        return state.mat.roughness[..., None] * jnp.ones(3)
    if mode == DEBUG_TEXCOORD:
        return jnp.concatenate(
            [state.tex_coord, jnp.zeros_like(state.tex_coord[..., :1])], axis=-1
        )
    if mode == DEBUG_TANGENT:
        return (state.tangent + 1.0) * 0.5
    return jnp.full_like(state.normal, jnp.asarray([1000.0, 0.0, 0.0]))


def mip_lod_enabled(scene, cfg) -> bool:
    """Static: ray-cone mip sampling is on when the atlas carries mip
    chains (models/textures.py, VKRT_MIPS), cfg.mip_sample is set, and
    VKRT_MIP_SAMPLE != 0 (env read at trace time — a flipped env var needs
    a fresh process; cfg.mip_sample is the cache-safe switch)."""
    import os

    return (
        scene.atlas.mip_x is not None
        and cfg.mip_sample
        and os.environ.get("VKRT_MIP_SAMPLE", "1") != "0"
    )


def pixel_spread(scene, height: int):
    """Angular radius of one pixel's ray cone (Moller ray cones): the
    vertical fov divided by the image height. proj_inverse[1][1] is
    tan(fov/2) up to sign (integrator/camera.py)."""
    import os

    tan_half = jnp.abs(scene.camera.proj_inverse[1, 1])
    bias = float(os.environ.get("VKRT_MIP_BIAS", "0.0"))
    return 2.0 * tan_half / jnp.float32(max(height, 1)) * jnp.exp2(bias)


def cone_lod(ss, spread, tdist):
    """Per-lane texture lod (texture-size-independent half): triangle uv
    density + log2(cone width at the hit). resolve_material adds the
    per-texture 0.5*log2(w*h) term (integrator/shade.py::_mip_lanes)."""
    return ss["uv_density"] + jnp.log2(
        jnp.maximum(spread * tdist, 1e-20)
    )


def trace_paths(
    scene: SceneData,
    packed: AccelBundle,
    cfg: RenderConfig,
    origin: jax.Array,
    direction: jax.Array,
    seed: jax.Array,
    has_alpha: bool,
    tracer=None,
    features=None,
) -> PathState:
    """Run the full bounce loop for a batch of primary rays.

    Returns the final :class:`PathState`; ``radiance`` is the per-ray
    estimate (pre firefly clamp).

    ``tracer``: optional traversal back end override with ``closest(o, d,
    seed, active)`` / ``occluded(o, d, t_max, seed, active)`` — used by the
    BVH-free correctness anchor (:mod:`integrator.brute`); None = the
    production wide-BVH bundle.
    """
    r = origin.shape[0]
    zero3 = jnp.zeros((r, 3), jnp.float32)
    st = PathState(
        origin=origin,
        direction=direction,
        radiance=zero3,
        throughput=jnp.ones((r, 3), jnp.float32),
        absorption=zero3,
        seed=seed,
        alive=jnp.ones((r,), bool),
        debug=zero3,
        steps=jnp.zeros((r,), jnp.int32),
        rays=jnp.zeros((r,), jnp.int32),
        bsdf_pdf=jnp.zeros((r,), jnp.float32),
        tdist=jnp.zeros((r,), jnp.float32),
    )

    alpha_ctx = (
        AlphaCtx(materials=scene.materials, atlas=scene.atlas)
        if (has_alpha and cfg.use_any_hit)
        else None
    )
    use_mips = mip_lod_enabled(scene, cfg)
    spread = pixel_spread(scene, cfg.height) if use_mips else None
    p_select_light = 0.5 if cfg.hdr_multiplier > 0.0 else 1.0
    hdr_mult = jnp.float32(cfg.hdr_multiplier)
    want_first_hit_debug = DEBUG_NONE < cfg.debug_mode < DEBUG_RADIANCE
    # Analytic sun&sky has no direction-pdf lookup (sun-cone sampling);
    # production always bakes it to an HDR env (render.py::prepare_sun_sky),
    # so full MIS falls back to reference weighting only in the analytic path.
    full_mis = cfg.full_mis and not cfg.use_sun_sky

    from ..ops.tlas import InstancedAccel, any_hit_instanced, closest_hit_instanced

    is_instanced = isinstance(packed, InstancedAccel)
    if tracer is not None:
        _closest, _occluded = tracer.closest, tracer.occluded
    elif is_instanced:
        def _closest(o, d, seed, active):
            return closest_hit_instanced(
                packed, scene.geometry.tri_material, o, d,
                seed=seed, alpha_ctx=alpha_ctx, active=active,
            )

        def _occluded(o, d, t_max, seed, active):
            return any_hit_instanced(
                packed, scene.geometry.tri_material, o, d, t_max,
                seed=seed, alpha_ctx=alpha_ctx, active=active,
            )
    else:
        def _closest(o, d, seed, active):
            return traverse_wide.closest_hit_bundle(
                packed, scene.geometry.tri_material, o, d,
                seed=seed, alpha_ctx=alpha_ctx, active=active,
            )

        def _occluded(o, d, t_max, seed, active):
            return traverse_wide.any_hit_bundle(
                packed, scene.geometry.tri_material, o, d, t_max,
                seed=seed, alpha_ctx=alpha_ctx, active=active,
            )

    def bounce(st: PathState, depth: int) -> PathState:
        hit, seed = _closest(st.origin, st.direction, st.seed, st.alive)
        steps = st.steps + hit.steps
        rays = st.rays + st.alive.astype(jnp.int32)

        # ---- Environment miss (pathtrace.glsl:203-228) -------------------
        miss = st.alive & (hit.tri < 0)
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
        alive = st.alive & ~miss

        # ---- Shade state + material (pathtrace.glsl:231-252) -------------
        ss = get_shade_state(
            scene.geometry, hit.tri, hit.u, hit.v,
            instances=packed.inst if is_instanced else None,
            inst=hit.inst,
            shade_rows=scene.shade_rows,
        )
        tdist = st.tdist + jnp.where(hit.tri >= 0, jnp.minimum(hit.t, 1e30), 0.0)
        lod = cone_lod(ss, spread, tdist) if use_mips else None
        state = resolve_material(
            ss, scene.materials, scene.atlas, st.direction, features=features,
            tap_rows=scene.tap_rows, lod=lod,
        )

        debug = st.debug
        if want_first_hit_debug and depth == 0:
            dbg = _debug_info(cfg, state)
            debug = jnp.where(alive[..., None], dbg, debug)

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
        l_int, l_dir, l_dist = sample_light(scene.lights, light_index, state.position)

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
        f_b, l_b, pdf_b, seed = _sample_bsdf(cfg, state, v_dir, state.ffnormal, seed)

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
        rr_pcont = jnp.minimum(
            max_thr * state.eta * state.eta + 0.001, 0.95
        )
        if not cfg.rr or depth < cfg.rr_depth:
            rr_pcont = jnp.ones_like(rr_pcont)

        # ---- Next ray (:316-318) -----------------------------------------
        going_out = dot(l_b, state.ffnormal) > 0.0
        off_n = jnp.where(going_out[..., None], state.ffnormal, -state.ffnormal)
        new_origin = offset_ray(state.position, off_n)
        new_origin = jnp.where(alive[..., None], new_origin, st.origin)
        new_dir = jnp.where(alive[..., None], l_b, st.direction)

        # ---- Deferred shadow ray (:320-331) ------------------------------
        occluded, seed = _occluded(new_origin, light_dir, light_dist, seed, visible)
        radiance = radiance + jnp.where(
            (visible & ~occluded)[..., None], nee, 0.0
        )
        rays = rays + visible.astype(jnp.int32)

        # ---- Russian roulette termination (:334-338) ---------------------
        seed, u_rr = rng.rand(seed)
        rr_kill = u_rr >= rr_pcont
        if cfg.rr:
            alive = alive & ~rr_kill
            throughput = jnp.where(
                alive[..., None], throughput / jnp.maximum(rr_pcont, 1e-9)[..., None], throughput
            )

        if cfg.debug_mode != DEBUG_NONE and depth == cfg.max_depth - 1:
            if cfg.debug_mode == DEBUG_WEIGHT:
                debug = throughput
            elif cfg.debug_mode == DEBUG_RAYDIR:
                debug = (new_dir + 1.0) * 0.5

        return PathState(
            origin=new_origin,
            direction=new_dir,
            radiance=radiance,
            throughput=throughput,
            absorption=absorption,
            seed=seed,
            alive=alive,
            debug=debug,
            steps=steps,
            rays=rays,
            bsdf_pdf=jnp.where(alive, pdf_b, st.bsdf_pdf),
            tdist=tdist,
        )

    # Python loop over static depth -> fully unrolled scan (each depth can
    # have slightly different static behavior: rr_depth, first-hit debug).
    for depth in range(cfg.max_depth):
        st = bounce(st, depth)
    return st


def sample_pixels(
    scene: SceneData,
    packed: AccelBundle,
    cfg: RenderConfig,
    origin: jax.Array,
    direction: jax.Array,
    seed: jax.Array,
    has_alpha: bool,
    tracer=None,
    features=None,
):
    """One sample per pixel: path trace + firefly clamp
    (``samplePixel``, pathtrace.glsl:348-387). Returns (radiance, seed, aux).
    """
    # Lift host-numpy scene tables for eager callers (no-op under jit —
    # scene construction stays host-side, models/builder.py).
    scene, packed = jax.tree.map(jnp.asarray, (scene, packed))
    st = trace_paths(
        scene, packed, cfg, origin, direction, seed, has_alpha,
        tracer=tracer, features=features,
    )
    radiance = st.radiance

    lum = firefly_luminance(radiance)
    clamp = jnp.float32(cfg.firefly_clamp)
    scale = jnp.where(lum > clamp, clamp / jnp.maximum(lum, 1e-20), 1.0)
    radiance = radiance * scale[..., None]

    if cfg.debug_mode == DEBUG_HEATMAP:
        t = (st.steps.astype(jnp.float32) - cfg.min_heatmap) / max(
            cfg.max_heatmap - cfg.min_heatmap, 1e-9
        )
        radiance = temperature(jnp.clip(t, 0.0, 1.0))
    elif cfg.debug_mode == DEBUG_RADIANCE:
        pass  # radiance accumulates normally; reference shows it raw
    elif cfg.debug_mode not in (DEBUG_NONE, DEBUG_WEIGHT, DEBUG_RAYDIR):
        if cfg.debug_mode < DEBUG_RADIANCE:
            radiance = st.debug
    elif cfg.debug_mode in (DEBUG_WEIGHT, DEBUG_RAYDIR):
        radiance = st.debug

    return radiance, st.seed, st
