"""BVH traversal: vectorized closest-hit / any-hit over flat ray batches.

TPU-native replacement for the reference's hardware traversal
(``vkCmdTraceRaysKHR`` megakernel / ``rayQueryProceedEXT`` loops,
``shaders/traceray_rtx.glsl`` and ``shaders/traceray_rq.glsl``). Exposes the
same two entry points the integrator uses: :func:`closest_hit` and
:func:`any_hit` (shadow, with max distance), including the reference's
stochastic alpha-cutout/blend test during traversal
(``traceray_rq.glsl:32-102`` ``HitTest``).

Design (see ``ops/bvh.py`` for the build):

* **Stackless skip-pointer walk.** Per-ray state is a single node register;
  each `while_loop` iteration tests one node per ray: descend (`left`) on
  AABB hit of an internal node, otherwise follow `skip`. No per-ray stack
  means no scatter traffic — the loop body is two row gathers
  (node 8 floats, triangle 16 floats) + pure VPU math.
* **Packed rows.** Node and triangle records are stored as contiguous f32
  rows with child/skip/material indices bit-cast into float lanes, so each
  iteration issues 2 dense row gathers instead of ~8 dependent scalar ones.
* **Rays never early-exit individually** — lanes that finish set node=-1 and
  idle until the batch drains; between bounces the wavefront integrator
  compacts batches to keep lanes busy (SURVEY.md §7 step 9).

Backface culling matches the reference: cull unless the material is
double-sided (``accelstruct.cpp:144-149`` sets the TLAS no-cull flag from
``doubleSided``; primary rays use CullBackFacingTriangles,
traceray_rtx.glsl:36 / traceray_rq.glsl:113).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.schema import ALPHA_MASK, BVH, Geometry, Materials, TextureAtlas
from . import rng
from .texture import sample_atlas

# Plain Python float, NOT jnp.float32: a jnp scalar here would commit to
# the default device AT IMPORT TIME, forcing TPU-backend init (a ~2-minute
# tunnel handshake on remote TPUs) into every host-side scene build that
# merely imports this module. jnp ops weak-type it back to f32 on use.
INF = 1e32
_EPS_DET = 1e-12  # python float: no device commit at import
# Traversal steps executed per while-loop condition check (see _traverse).
_CHUNK_STEPS = 64


class PackedScene(NamedTuple):
    """Traversal-ready packed arrays (built once per scene/BVH refit)."""

    nodes: jax.Array  # (2T-1, 8) f32: bmin(3) bmax(3) leftq skipq
                      # leftq: integer VALUE stored as exact f32 (|v| < 2^24 —
                      # TPU float lanes flush denormal/NaN bit patterns, so
                      # bitcasting raw int32 bits through f32 corrupts them);
                      # >= 0 internal child id, < 0 => leaf with tri = -leftq-1
    tris: jax.Array   # (T, 16) f32: p0 p1 p2 (9), uv0 uv1 uv2 (6), meta = mat*4+flags


class Hit(NamedTuple):
    t: jax.Array      # (R,) f32, INF on miss
    tri: jax.Array    # (R,) i32 original triangle id, -1 on miss
    u: jax.Array      # (R,) f32 barycentric of vertex 1
    v: jax.Array      # (R,) f32 barycentric of vertex 2
    steps: jax.Array  # (R,) i32 visited-node count (heatmap/profiling; the
                      # analog of the reference's shader-clock heatmap,
                      # pathtrace.rgen:66-93)
    inst: Optional[jax.Array] = None  # (R,) i32 instance id (two-level
                      # traversal only, ops/tlas.py; the analog of
                      # gl_InstanceID/instanceCustomIndex, pathtrace.rchit)


def _i2f(x: jax.Array) -> jax.Array:
    """Encode an int32 index as an exact f32 VALUE (not a bitcast: TPU float
    datapaths flush denormals and canonicalize NaNs, which destroys raw bit
    patterns). Exact for |v| < 2**24 => supports BVHs up to ~8M triangles."""
    return x.astype(jnp.int32).astype(jnp.float32)


def _f2i(x: jax.Array) -> jax.Array:
    return x.astype(jnp.int32)


def pack_scene(bvh: BVH, geom: Geometry) -> PackedScene:
    """Pack BVH nodes + triangles into gather-friendly contiguous rows."""
    leftq = jnp.where(bvh.left >= 0, bvh.left, -(bvh.node_tri + 1))
    nodes = jnp.concatenate(
        [
            bvh.aabb_min,
            bvh.aabb_max,
            _i2f(leftq)[:, None],
            _i2f(bvh.skip)[:, None],
        ],
        axis=1,
    )

    idx = geom.indices
    p0 = geom.positions[idx[:, 0]]
    p1 = geom.positions[idx[:, 1]]
    p2 = geom.positions[idx[:, 2]]
    uv0 = geom.uv[idx[:, 0]]
    uv1 = geom.uv[idx[:, 1]]
    uv2 = geom.uv[idx[:, 2]]
    meta = geom.tri_material * 4 + geom.tri_flags  # exact below 2^24
    tris = jnp.concatenate(
        [p0, p1, p2, uv0, uv1, uv2, _i2f(meta)[:, None]],
        axis=1,
    )
    return PackedScene(nodes=nodes, tris=tris)


class AlphaCtx(NamedTuple):
    """Material/texture context for the in-traversal stochastic alpha test."""

    materials: Materials
    atlas: TextureAtlas


def _alpha_opacity(
    ctx: AlphaCtx, mat_id: jax.Array, uvh: jax.Array
) -> jax.Array:
    """Opacity at a candidate hit (traceray_rq.glsl:55-100)."""
    m = ctx.materials
    a = m.base_color_factor[mat_id, 3]
    btex = m.base_color_texture[mat_id]
    # uvTransform as [u, v, 1] @ T
    t = m.uv_transform[mat_id]
    uv1 = jnp.concatenate([uvh, jnp.ones_like(uvh[..., :1])], axis=-1)
    uvt = jnp.einsum("...i,...ij->...j", uv1, t)[..., :2]
    texa = sample_atlas(ctx.atlas, btex, uvt)[..., 3]
    a = a * jnp.where(btex >= 0, texa, 1.0)
    is_mask = m.alpha_mode[mat_id] == ALPHA_MASK
    cutoff = m.alpha_cutoff[mat_id]
    return jnp.where(is_mask, (a > cutoff).astype(jnp.float32), a)


def _traverse(
    packed: PackedScene,
    origin: jax.Array,     # (R, 3)
    direction: jax.Array,  # (R, 3)
    t_max: jax.Array,      # (R,)
    seed: Optional[jax.Array],
    alpha_ctx: Optional[AlphaCtx],
    cull_backface: bool,
    any_hit_mode: bool,
    active_in: Optional[jax.Array],
):
    r = origin.shape[0]
    inv_d = 1.0 / jnp.where(jnp.abs(direction) < 1e-20,
                            jnp.where(direction < 0, -1e-20, 1e-20), direction)

    node0 = jnp.zeros((r,), jnp.int32)
    if active_in is not None:
        node0 = jnp.where(active_in, node0, -1)

    t_best = t_max
    tri_best = jnp.full((r,), -1, jnp.int32)
    u_best = jnp.zeros((r,), jnp.float32)
    v_best = jnp.zeros((r,), jnp.float32)
    if seed is None:
        seed = jnp.zeros((r,), jnp.uint32)

    with_alpha = alpha_ctx is not None

    # The data-dependent while_loop condition is evaluated once per
    # _CHUNK traversal steps (an inner fixed-trip scan): per-iteration
    # loop/cond overhead is substantial on TPU relative to the ~0.1 ms body,
    # and nearly all rays finish within a few chunks anyway.
    def cond(state):
        node = state[0]
        return jnp.any(node >= 0)

    def body(state):
        node, t_best, tri_best, u_best, v_best, seed, steps = state
        active = node >= 0
        nc = jnp.maximum(node, 0)

        row = packed.nodes[nc]                      # (R, 8) one dense gather
        bmin, bmax = row[:, 0:3], row[:, 3:6]
        leftq = _f2i(row[:, 6])
        skip = _f2i(row[:, 7])
        is_leaf = leftq < 0
        tri = -leftq - 1

        # Slab test
        tlo = (bmin - origin) * inv_d
        thi = (bmax - origin) * inv_d
        tn = jnp.max(jnp.minimum(tlo, thi), axis=1)
        tf = jnp.min(jnp.maximum(tlo, thi), axis=1)
        aabb_hit = (tn <= tf) & (tf >= 0.0) & (tn < t_best)

        # Leaf: Moller-Trumbore against the packed triangle row
        trow = packed.tris[jnp.maximum(tri, 0)]     # (R, 16) one dense gather
        p0, p1, p2 = trow[:, 0:3], trow[:, 3:6], trow[:, 6:9]
        meta = _f2i(trow[:, 15])
        mat_id = meta >> 2
        flags = meta & 0x3

        e1 = p1 - p0
        e2 = p2 - p0
        pvec = jnp.cross(direction, e2)
        det = jnp.sum(e1 * pvec, axis=1)
        double_sided = (flags & 1) != 0
        if cull_backface:
            facing_ok = double_sided | (det > _EPS_DET)
        else:
            facing_ok = jnp.abs(det) > _EPS_DET
        det_ok = jnp.abs(det) > _EPS_DET
        inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
        tvec = origin - p0
        uu = jnp.sum(tvec * pvec, axis=1) * inv_det
        qvec = jnp.cross(tvec, e1)
        vv = jnp.sum(direction * qvec, axis=1) * inv_det
        tt = jnp.sum(e2 * qvec, axis=1) * inv_det
        geo_hit = (
            active
            & is_leaf
            & aabb_hit
            & det_ok
            & facing_ok
            & (uu >= 0.0)
            & (vv >= 0.0)
            & (uu + vv <= 1.0)
            & (tt > 0.0)
            & (tt < t_best)
        )

        if with_alpha:
            needs_alpha = geo_hit & ((flags & 2) != 0)
            uvh = (
                trow[:, 9:11] * (1.0 - uu - vv)[:, None]
                + trow[:, 11:13] * uu[:, None]
                + trow[:, 13:15] * vv[:, None]
            )
            opacity = _alpha_opacity(alpha_ctx, mat_id, uvh)
            seed2, rnd = rng.rand(seed)
            seed = jnp.where(needs_alpha, seed2, seed)
            geo_hit = geo_hit & (~needs_alpha | (rnd <= opacity))

        t_best = jnp.where(geo_hit, tt, t_best)
        tri_best = jnp.where(geo_hit, tri, tri_best)
        u_best = jnp.where(geo_hit, uu, u_best)
        v_best = jnp.where(geo_hit, vv, v_best)

        next_node = jnp.where(aabb_hit & ~is_leaf, leftq, skip)
        next_node = jnp.where(active, next_node, -1)
        if any_hit_mode:
            # Shadow rays terminate on first accepted hit.
            next_node = jnp.where(geo_hit, -1, next_node)

        steps = steps + active.astype(jnp.int32)
        return (next_node, t_best, tri_best, u_best, v_best, seed, steps)

    def chunk(state):
        def sbody(s, _):
            return body(s), None

        state, _ = jax.lax.scan(sbody, state, None, length=_CHUNK_STEPS)
        return state

    steps0 = jnp.zeros((r,), jnp.int32)
    state = (node0, t_best, tri_best, u_best, v_best, seed, steps0)
    node, t_best, tri_best, u_best, v_best, seed, steps = jax.lax.while_loop(
        cond, chunk, state
    )
    t_out = jnp.where(tri_best >= 0, t_best, INF)
    return Hit(t=t_out, tri=tri_best, u=u_best, v=v_best, steps=steps), seed


def closest_hit(
    packed: PackedScene,
    origin: jax.Array,
    direction: jax.Array,
    seed: Optional[jax.Array] = None,
    alpha_ctx: Optional[AlphaCtx] = None,
    active: Optional[jax.Array] = None,
    t_max: Optional[jax.Array] = None,
) -> tuple[Hit, jax.Array]:
    """Closest-hit query (``ClosestHit``, traceray_rq.glsl:108-147).

    Backface culling is on (disabled per-triangle by the double-sided flag).
    """
    if t_max is None:
        t_max = jnp.full(origin.shape[:1], INF)
    return _traverse(
        packed, origin, direction, t_max, seed, alpha_ctx,
        cull_backface=True, any_hit_mode=False, active_in=active,
    )


def any_hit(
    packed: PackedScene,
    origin: jax.Array,
    direction: jax.Array,
    t_max: jax.Array,
    seed: Optional[jax.Array] = None,
    alpha_ctx: Optional[AlphaCtx] = None,
    active: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """Shadow query: returns ``(occluded (R,) bool, seed')``.

    Matches ``AnyHit`` (traceray_rtx.glsl:52-73 / traceray_rq.glsl:153-185):
    terminate on first accepted hit closer than ``t_max``; no backface cull
    (shadow rays must be blocked from either side).
    """
    hit, seed = _traverse(
        packed, origin, direction, t_max, seed, alpha_ctx,
        cull_backface=False, any_hit_mode=True, active_in=active,
    )
    return hit.tri >= 0, seed


def brute_force_closest(
    geom: Geometry,
    origin: jax.Array,
    direction: jax.Array,
    cull_backface: bool = True,
) -> Hit:
    """O(T) reference intersector for correctness tests (SURVEY.md §4.2)."""
    idx = geom.indices
    p0 = geom.positions[idx[:, 0]]
    p1 = geom.positions[idx[:, 1]]
    p2 = geom.positions[idx[:, 2]]

    def one(o, d):
        e1 = p1 - p0
        e2 = p2 - p0
        pvec = jnp.cross(d[None, :], e2)
        det = jnp.sum(e1 * pvec, axis=1)
        ds = (geom.tri_flags & 1) != 0
        if cull_backface:
            facing_ok = ds | (det > _EPS_DET)
        else:
            facing_ok = jnp.abs(det) > _EPS_DET
        det_ok = jnp.abs(det) > _EPS_DET
        inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
        tvec = o[None, :] - p0
        uu = jnp.sum(tvec * pvec, axis=1) * inv_det
        qvec = jnp.cross(tvec, e1)
        vv = jnp.sum(d[None, :] * qvec, axis=1) * inv_det
        tt = jnp.sum(e2 * qvec, axis=1) * inv_det
        ok = (
            det_ok & facing_ok
            & (uu >= 0) & (vv >= 0) & (uu + vv <= 1.0) & (tt > 0)
        )
        tt = jnp.where(ok, tt, INF)
        best = jnp.argmin(tt)
        return (
            tt[best],
            jnp.where(tt[best] < INF, best, -1).astype(jnp.int32),
            uu[best],
            vv[best],
        )

    t, tri, u, v = jax.vmap(one)(origin, direction)
    return Hit(t=t, tri=tri, u=u, v=v, steps=jnp.zeros_like(tri))
