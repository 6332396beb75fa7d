"""8-wide BVH traversal: the production closest-hit / any-hit path.

One unified row gather per iteration (see ``ops/bvh8.py`` for the layout):
an interior visit tests 8 child AABBs and descends into the nearest hit
child, pushing the remaining hit children (far-to-near) onto a small
in-register stack; a leaf visit intersects 4 packed triangles at once.
Per-ray state is a handful of scalars plus a (R, D) ref stack updated with
one-hot selects — no scatters anywhere in the loop.

Semantics match ``ops/traverse.py`` (and the reference's ``ClosestHit`` /
``AnyHit``, traceray_rq.glsl:108-185): backface culling controlled by the
per-triangle double-sided flag, stochastic alpha-cutout/blend during
traversal, shadow rays terminating on first accepted hit.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.schema import ALPHA_MASK
from . import rng
from .bvh8 import WideScene
from .traverse import INF, AlphaCtx, Hit


class AlphaPack(NamedTuple):
    """Gather-minimal alpha-test tables (built by :func:`make_alpha_pack`).

    The naive in-traversal alpha test costs ~36 in-loop gathers per
    iteration (material fields + bilinear atlas taps per candidate
    triangle); packing every per-material quantity into one 16-lane row and
    using nearest-neighbor alpha taps cuts that to 3 gathers.
    """

    rows: jax.Array         # (M, 16): a_factor, mode, cutoff, tex_id,
                            # uvT 3x2 (6), atlas x/y/w/h, wrap_s/t
    alpha_plane: jax.Array  # (H*W,) u8 — atlas alpha channel, flat
    atlas_width: int


def make_alpha_pack(ctx: AlphaCtx) -> AlphaPack:
    m = ctx.materials
    t = m.uv_transform  # (M, 3, 3), applied as [u, v, 1] @ T
    rows = jnp.stack(
        [
            m.base_color_factor[:, 3],
            m.alpha_mode.astype(jnp.float32),
            m.alpha_cutoff,
            m.base_color_texture.astype(jnp.float32),
            t[:, 0, 0], t[:, 0, 1], t[:, 1, 0], t[:, 1, 1], t[:, 2, 0], t[:, 2, 1],
            ctx.atlas.x[jnp.clip(m.base_color_texture, 0, ctx.atlas.x.shape[0] - 1)].astype(jnp.float32),
            ctx.atlas.y[jnp.clip(m.base_color_texture, 0, ctx.atlas.x.shape[0] - 1)].astype(jnp.float32),
            ctx.atlas.width[jnp.clip(m.base_color_texture, 0, ctx.atlas.x.shape[0] - 1)].astype(jnp.float32),
            ctx.atlas.height[jnp.clip(m.base_color_texture, 0, ctx.atlas.x.shape[0] - 1)].astype(jnp.float32),
            ctx.atlas.wrap_s[jnp.clip(m.base_color_texture, 0, ctx.atlas.x.shape[0] - 1)].astype(jnp.float32),
            ctx.atlas.wrap_t[jnp.clip(m.base_color_texture, 0, ctx.atlas.x.shape[0] - 1)].astype(jnp.float32),
        ],
        axis=1,
    )
    return AlphaPack(
        rows=rows,
        alpha_plane=ctx.atlas.data[:, :, 3].reshape(-1),
        atlas_width=int(ctx.atlas.data.shape[1]),
    )

_EPS_DET = jnp.float32(1e-12)
TERM = jnp.int32(-(2**30))
STACK_DEPTH = 32
_CHUNK = 16


def _traverse_wide(
    wide: WideScene,
    tri_material: jax.Array,   # (T,) i32 — for the alpha path
    origin: jax.Array,         # (R, 3)
    direction: jax.Array,      # (R, 3)
    t_max: jax.Array,          # (R,)
    seed: Optional[jax.Array],
    alpha_ctx: Optional[AlphaCtx],
    cull_backface: bool,
    any_hit_mode: bool,
    active_in: Optional[jax.Array],
):
    rows = wide.rows
    n_rows = rows.shape[0]
    r = origin.shape[0]
    inv_d = 1.0 / jnp.where(
        jnp.abs(direction) < 1e-20,
        jnp.where(direction < 0, -1e-20, 1e-20),
        direction,
    )

    cur0 = jnp.zeros((r,), jnp.int32)  # root is interior row 0
    if active_in is not None:
        cur0 = jnp.where(active_in, cur0, TERM)
    if seed is None:
        seed = jnp.zeros((r,), jnp.uint32)

    with_alpha = alpha_ctx is not None
    alpha_pack = make_alpha_pack(alpha_ctx) if with_alpha else None
    lane_d = jax.lax.broadcasted_iota(jnp.int32, (1, STACK_DEPTH), 1)

    def body(state):
        cur, depth, stack, t_best, tri_best, u_best, v_best, seed, steps = state
        active = cur != TERM
        is_wide = active & (cur >= 0)
        is_leaf = active & (cur < 0)

        vleaf = -cur - 1
        leaf_row = vleaf >> 2
        leaf_cnt = (vleaf & 3) + 1
        row_id = jnp.clip(jnp.where(is_wide, cur, leaf_row), 0, n_rows - 1)
        row = rows[row_id]                              # (R, 64): THE gather

        # ---------------- interior: 8-way slab test -----------------------
        rr = row[:, 0:48].reshape(r, 8, 6)
        bmin = rr[:, :, 0:3]
        bmax = rr[:, :, 3:6]
        tlo = (bmin - origin[:, None, :]) * inv_d[:, None, :]
        thi = (bmax - origin[:, None, :]) * inv_d[:, None, :]
        tn = jnp.max(jnp.minimum(tlo, thi), axis=2)     # (R, 8)
        tf = jnp.min(jnp.maximum(tlo, thi), axis=2)
        child_ref = row[:, 48:56].astype(jnp.int32)     # (R, 8)
        # Empty slots carry inverted AABBs; the per-axis min/max of the slab
        # test would "repair" them, so validity needs its own lane check.
        slot_valid = rr[:, :, 0] <= rr[:, :, 3]
        hit_c = slot_valid & (tn <= tf) & (tf >= 0.0) & (tn < t_best[:, None])
        key = jnp.where(hit_c, tn, INF)

        # NOTE: every indexed extraction below is one-hot arithmetic, NOT
        # take_along_axis — each take_along_axis lowers to an HLO gather,
        # and in-loop gathers cost ~ms each on TPU (the row fetch above is
        # the only real gather this loop performs).
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (r, 8), 1)
        near_i = jnp.argmin(key, axis=1)
        near_key = jnp.min(key, axis=1)
        has_child = near_key < INF
        oh_near = lane8 == near_i[:, None]
        near_ref = jnp.sum(jnp.where(oh_near, child_ref, 0), axis=1)

        # Push the other hit children far-to-near so pops come near-first.
        push_key = jnp.where(oh_near, INF, key)
        new_depth = depth
        new_stack = stack
        for _ in range(7):
            pk = jnp.max(jnp.where(push_key < INF, push_key, -INF), axis=1)
            pi = jnp.argmax(jnp.where(push_key < INF, push_key, -INF), axis=1)
            oh_p = lane8 == pi[:, None]
            do = is_wide & (pk > -INF) & (new_depth < STACK_DEPTH)
            pref = jnp.sum(jnp.where(oh_p, child_ref, 0), axis=1)
            sel = (lane_d == new_depth[:, None]) & do[:, None]
            new_stack = jnp.where(sel, pref[:, None], new_stack)
            new_depth = new_depth + do.astype(jnp.int32)
            push_key = jnp.where(oh_p, INF, push_key)

        # ---------------- leaf: 4-triangle intersection -------------------
        tris4 = row.reshape(r, 4, 16)
        p0 = tris4[:, :, 0:3]
        p1 = tris4[:, :, 3:6]
        p2 = tris4[:, :, 6:9]
        meta = tris4[:, :, 15].astype(jnp.int32)        # orig*4 + flags
        orig = meta >> 2
        flags = meta & 0x3

        e1 = p1 - p0
        e2 = p2 - p0
        dbc = direction[:, None, :]
        pvec = jnp.cross(dbc, e2)
        det = jnp.sum(e1 * pvec, axis=2)                # (R, 4)
        double_sided = (flags & 1) != 0
        if cull_backface:
            facing_ok = double_sided | (det > _EPS_DET)
        else:
            facing_ok = jnp.abs(det) > _EPS_DET
        det_ok = jnp.abs(det) > _EPS_DET
        inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
        tvec = origin[:, None, :] - p0
        uu = jnp.sum(tvec * pvec, axis=2) * inv_det
        qvec = jnp.cross(tvec, e1)
        vv = jnp.sum(dbc * qvec, axis=2) * inv_det
        tt = jnp.sum(e2 * qvec, axis=2) * inv_det
        in_cnt = jax.lax.broadcasted_iota(jnp.int32, (r, 4), 1) < leaf_cnt[:, None]
        geo_hit = (
            is_leaf[:, None]
            & in_cnt
            & det_ok
            & facing_ok
            & (uu >= 0.0)
            & (vv >= 0.0)
            & (uu + vv <= 1.0)
            & (tt > 0.0)
            & (tt < t_best[:, None])
        )

        if with_alpha:
            # 3 in-loop gathers total: material ids, packed alpha rows,
            # nearest-neighbor alpha texels (traceray_rq.glsl:55-100
            # semantics; nearest instead of bilinear for the stochastic
            # test — the per-sample randomization dominates any filtering
            # difference).
            has_alpha_tri = geo_hit & ((flags & 2) != 0)
            mat_ids = tri_material[jnp.clip(orig, 0, tri_material.shape[0] - 1)]
            arow = alpha_pack.rows[jnp.clip(mat_ids, 0, alpha_pack.rows.shape[0] - 1)]
            wbar = (1.0 - uu - vv)
            uvu = (
                tris4[:, :, 9] * wbar + tris4[:, :, 11] * uu + tris4[:, :, 13] * vv
            )
            uvv = (
                tris4[:, :, 10] * wbar + tris4[:, :, 12] * uu + tris4[:, :, 14] * vv
            )
            ut = uvu * arow[:, :, 4] + uvv * arow[:, :, 6] + arow[:, :, 8]
            vt = uvu * arow[:, :, 5] + uvv * arow[:, :, 7] + arow[:, :, 9]
            tw = jnp.maximum(arow[:, :, 12].astype(jnp.int32), 1)
            th = jnp.maximum(arow[:, :, 13].astype(jnp.int32), 1)
            xi = jnp.floor(ut * tw.astype(jnp.float32)).astype(jnp.int32)
            yi = jnp.floor(vt * th.astype(jnp.float32)).astype(jnp.int32)

            def wrap(c, size, mode):
                rep = jnp.remainder(c, size)
                clm = jnp.clip(c, 0, size - 1)
                mm = jnp.remainder(c, 2 * size)
                mir = jnp.where(mm >= size, 2 * size - 1 - mm, mm)
                return jnp.where(mode == 0, rep, jnp.where(mode == 1, clm, mir))

            xw = wrap(xi, tw, arow[:, :, 14].astype(jnp.int32)) + arow[:, :, 10].astype(jnp.int32)
            yw = wrap(yi, th, arow[:, :, 15].astype(jnp.int32)) + arow[:, :, 11].astype(jnp.int32)
            flat = jnp.clip(
                yw * alpha_pack.atlas_width + xw, 0, alpha_pack.alpha_plane.shape[0] - 1
            )
            texel_a = alpha_pack.alpha_plane[flat].astype(jnp.float32) * (1.0 / 255.0)
            a = arow[:, :, 0] * jnp.where(arow[:, :, 3] >= 0.0, texel_a, 1.0)
            is_mask = arow[:, :, 1] == float(ALPHA_MASK)
            opacity = jnp.where(is_mask, (a > arow[:, :, 2]).astype(jnp.float32), a)

            # One rand per candidate, consumed only where needed (keeps the
            # per-lane stream semantics of the sequential reference).
            for k in range(4):
                needs = has_alpha_tri[:, k]
                seed2, rnd = rng.rand(seed)
                seed = jnp.where(needs, seed2, seed)
                keep = ~needs | (rnd <= opacity[:, k])
                col = jax.lax.broadcasted_iota(jnp.int32, (r, 4), 1) == k
                geo_hit = geo_hit & (~col | keep[:, None])

        t_cand = jnp.where(geo_hit, tt, INF)
        bi = jnp.argmin(t_cand, axis=1)
        bt = jnp.min(t_cand, axis=1)
        oh_b = jax.lax.broadcasted_iota(jnp.int32, (r, 4), 1) == bi[:, None]
        upd = bt < t_best
        t_best = jnp.where(upd, bt, t_best)
        tri_best = jnp.where(upd, jnp.sum(jnp.where(oh_b, orig, 0), axis=1), tri_best)
        u_best = jnp.where(upd, jnp.sum(jnp.where(oh_b, uu, 0.0), axis=1), u_best)
        v_best = jnp.where(upd, jnp.sum(jnp.where(oh_b, vv, 0.0), axis=1), v_best)

        # ---------------- next node --------------------------------------
        next_cur = jnp.where(is_wide & has_child, near_ref, TERM)
        need_pop = active & ((is_wide & ~has_child) | is_leaf)
        if any_hit_mode:
            found = upd
            need_pop = need_pop & ~found
            next_cur = jnp.where(found, TERM, next_cur)

        can_pop = need_pop & (new_depth > 0)
        top = jnp.sum(
            jnp.where(lane_d == (new_depth - 1)[:, None], new_stack, 0), axis=1
        )
        next_cur = jnp.where(can_pop, top, next_cur)
        new_depth = new_depth - can_pop.astype(jnp.int32)

        steps = steps + active.astype(jnp.int32)
        return (
            next_cur, new_depth, new_stack, t_best, tri_best,
            u_best, v_best, seed, steps,
        )

    def cond(state):
        return jnp.any(state[0] != TERM)

    def chunk(state):
        def sbody(s, _):
            return body(s), None

        state, _ = jax.lax.scan(sbody, state, None, length=_CHUNK)
        return state

    state = (
        cur0,
        jnp.zeros((r,), jnp.int32),
        jnp.zeros((r, STACK_DEPTH), jnp.int32),
        t_max,
        jnp.full((r,), -1, jnp.int32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), jnp.float32),
        seed,
        jnp.zeros((r,), jnp.int32),
    )
    out = jax.lax.while_loop(cond, chunk, state)
    _, _, _, t_best, tri_best, u_best, v_best, seed, steps = out
    t_out = jnp.where(tri_best >= 0, t_best, INF)
    return Hit(t=t_out, tri=tri_best, u=u_best, v=v_best, steps=steps), seed


def closest_hit_bundle(
    bundle,
    tri_material: jax.Array,
    origin: jax.Array,
    direction: jax.Array,
    seed: Optional[jax.Array] = None,
    alpha_ctx: Optional[AlphaCtx] = None,
    active: Optional[jax.Array] = None,
) -> tuple[Hit, jax.Array]:
    """Closest hit over an :class:`~vk_raytrace_tpu.ops.bvh8.AccelBundle`:
    opaque pass without alpha machinery, then the alpha BVH pruned by the
    opaque hit distance (each alpha surface closer than the nearest opaque
    hit gets its stochastic test, matching HitTest semantics)."""
    hit_o, seed = closest_hit_wide(
        bundle.opaque, tri_material, origin, direction,
        seed=seed, alpha_ctx=None, active=active,
    )
    if bundle.alpha is None:
        return hit_o, seed
    hit_a, seed = _traverse_wide(
        bundle.alpha, tri_material, origin, direction, hit_o.t, seed, alpha_ctx,
        cull_backface=True, any_hit_mode=False, active_in=active,
    )
    take_a = hit_a.tri >= 0  # already < opaque t via t_max
    return Hit(
        t=jnp.where(take_a, hit_a.t, hit_o.t),
        tri=jnp.where(take_a, hit_a.tri, hit_o.tri),
        u=jnp.where(take_a, hit_a.u, hit_o.u),
        v=jnp.where(take_a, hit_a.v, hit_o.v),
        steps=hit_o.steps + hit_a.steps,
    ), seed


def any_hit_bundle(
    bundle,
    tri_material: jax.Array,
    origin: jax.Array,
    direction: jax.Array,
    t_max: jax.Array,
    seed: Optional[jax.Array] = None,
    alpha_ctx: Optional[AlphaCtx] = None,
    active: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    occ, seed = any_hit_wide(
        bundle.opaque, tri_material, origin, direction, t_max,
        seed=seed, alpha_ctx=None, active=active,
    )
    if bundle.alpha is None:
        return occ, seed
    still = active & ~occ if active is not None else ~occ
    occ_a, seed = any_hit_wide(
        bundle.alpha, tri_material, origin, direction, t_max,
        seed=seed, alpha_ctx=alpha_ctx, active=still,
    )
    return occ | occ_a, seed


def closest_hit_wide(
    wide: WideScene,
    tri_material: jax.Array,
    origin: jax.Array,
    direction: jax.Array,
    seed: Optional[jax.Array] = None,
    alpha_ctx: Optional[AlphaCtx] = None,
    active: Optional[jax.Array] = None,
    t_max: Optional[jax.Array] = None,
) -> tuple[Hit, jax.Array]:
    if t_max is None:
        t_max = jnp.full(origin.shape[:1], INF)
    return _traverse_wide(
        wide, tri_material, origin, direction, t_max, seed, alpha_ctx,
        cull_backface=True, any_hit_mode=False, active_in=active,
    )


def any_hit_wide(
    wide: WideScene,
    tri_material: jax.Array,
    origin: jax.Array,
    direction: jax.Array,
    t_max: jax.Array,
    seed: Optional[jax.Array] = None,
    alpha_ctx: Optional[AlphaCtx] = None,
    active: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    hit, seed = _traverse_wide(
        wide, tri_material, origin, direction, t_max, seed, alpha_ctx,
        cull_backface=False, any_hit_mode=True, active_in=active,
    )
    return hit.tri >= 0, seed
