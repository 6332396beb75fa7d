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


def make_alpha_pack(ctx: AlphaCtx, tri_material=None) -> AlphaPack:
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
    if tri_material is not None:
        # Prebake tri -> material row: the in-loop lookup becomes ONE gather
        # (was tri_material[orig] then rows[mat] — two 4R-row gathers/step).
        rows = rows[jnp.clip(tri_material, 0, rows.shape[0] - 1)]
    return AlphaPack(
        rows=rows,
        # jnp.asarray: lifts host-numpy atlases for eager callers
        alpha_plane=jnp.asarray(ctx.atlas.data)[:, :, 3].reshape(-1),
        atlas_width=int(ctx.atlas.data.shape[1]),
    )

_EPS_DET = jnp.float32(1e-12)
_ROOT_INF = 3.0e38
TERM = jnp.int32(-(2**30))
STACK_DEPTH = 32
_CHUNK = 16

# Batcher odd-even mergesort network for 8 inputs (19 comparators). Used to
# order the 8 child-AABB hits by entry distance in pure elementwise code:
# XLA reductions (argmin/argmax/sum-over-axis) are fusion barriers that each
# materialize their (R, 8) inputs to HBM, while a comparator network fuses
# into a single pass over the batch (measured ~10x less traffic per step).
_SORT8_NETWORK = (
    (0, 1), (2, 3), (4, 5), (6, 7),
    (0, 2), (1, 3), (4, 6), (5, 7),
    (1, 2), (5, 6),
    (0, 4), (1, 5), (2, 6), (3, 7),
    (2, 4), (3, 5),
    (1, 2), (3, 4), (5, 6),
)


def _sort8(keys: list, payloads: list) -> tuple[list, list]:
    """Sort 8 (R,) key columns ascending, moving payload columns with them.
    Not stable on ties (irrelevant for traversal: equal-distance children
    may be visited in any order). Everything is elementwise compare/select —
    no reductions, fully fusable."""
    keys = list(keys)
    payloads = [list(p) for p in payloads]
    for i, j in _SORT8_NETWORK:
        swap = keys[i] > keys[j]
        ki, kj = keys[i], keys[j]
        keys[i] = jnp.where(swap, kj, ki)
        keys[j] = jnp.where(swap, ki, kj)
        for p in payloads:
            pi, pj = p[i], p[j]
            p[i] = jnp.where(swap, pj, pi)
            p[j] = jnp.where(swap, pi, pj)
    return keys, payloads


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
    root0: Optional[jax.Array] = None,
):
    # jnp.asarray: no-op under jit; lifts host-numpy row tables (scene
    # build keeps everything host-side) for eager callers like tests/pick.
    rows = jnp.asarray(wide.rows)
    n_rows = rows.shape[0]
    r = origin.shape[0]
    inv_d = 1.0 / jnp.where(
        jnp.abs(direction) < 1e-20,
        jnp.where(direction < 0, -1e-20, 1e-20),
        direction,
    )

    if root0 is None:
        cur0 = jnp.zeros((r,), jnp.int32)  # root is interior row 0
        # Root-AABB prefilter: one elementwise slab test against the union
        # of the root row's child boxes kills lanes whose whole segment
        # misses the tree BEFORE the loop, so the phased while_loop can skip
        # its full-batch chunks entirely. This is what makes the pruned
        # alpha pass (closest_hit_bundle) and short shadow segments cheap:
        # measured 77 ms -> ~15 ms for the atrium alpha pass at 512k rays.
        rb = rows[0, 0:48].reshape(8, 6)
        valid = rb[:, 0] <= rb[:, 3]
        big = jnp.float32(_ROOT_INF)
        rmin = jnp.min(jnp.where(valid[:, None], rb[:, 0:3], big), axis=0)
        rmax = jnp.max(jnp.where(valid[:, None], rb[:, 3:6], -big), axis=0)
        lo = (rmin[None, :] - origin) * inv_d
        hi = (rmax[None, :] - origin) * inv_d
        tn0 = jnp.max(jnp.minimum(lo, hi), axis=1)
        tf0 = jnp.min(jnp.maximum(lo, hi), axis=1)
        hit_root = (tn0 <= tf0) & (tf0 >= 0.0) & (tn0 < t_max)
        cur0 = jnp.where(hit_root, cur0, TERM)
    else:
        # Per-lane roots: the two-level path (ops/tlas.py) starts each lane
        # at its instance's BLAS root inside the concatenated row table.
        cur0 = jnp.broadcast_to(root0, (r,)).astype(jnp.int32)
    if active_in is not None:
        cur0 = jnp.where(active_in, cur0, TERM)
    if seed is None:
        seed = jnp.zeros((r,), jnp.uint32)

    with_alpha = alpha_ctx is not None
    alpha_pack = (
        make_alpha_pack(alpha_ctx, tri_material) if with_alpha else None
    )
    # Stack sized to THIS tree's exact worst case (ops/bvh8.py::_stack_bound)
    # — the (R, D) stack is the loop's dominant elementwise traffic.
    stack_depth = min(getattr(wide, "stack_depth", STACK_DEPTH), 2 * STACK_DEPTH)
    lane_d = jax.lax.broadcasted_iota(jnp.int32, (1, stack_depth), 1)

    def body(state, origin, direction, inv_d):
        cur, depth, stack, t_best, tri_best, u_best, v_best, seed, steps = state
        r = origin.shape[0]
        active = cur != TERM
        is_wide = active & (cur >= 0)
        is_leaf = active & (cur < 0)

        vleaf = -cur - 1
        leaf_row = vleaf >> 2
        leaf_cnt = (vleaf & 3) + 1
        row_id = jnp.clip(jnp.where(is_wide, cur, leaf_row), 0, n_rows - 1)
        row = rows[row_id]                              # (R, 64): THE gather

        # Everything below is deliberately elementwise (componentwise vector
        # math, comparator networks, tournaments) — no axis reductions, no
        # take_along_axis. Reductions are XLA fusion barriers: each one
        # materializes its (R, k) operands to HBM, and at 10^6 rays the body
        # cost is pure memory traffic. The fused form runs as a handful of
        # kernels per step instead of dozens.

        ox, oy, oz = origin[:, 0], origin[:, 1], origin[:, 2]
        dx, dy, dz = direction[:, 0], direction[:, 1], direction[:, 2]
        ix, iy, iz = inv_d[:, 0], inv_d[:, 1], inv_d[:, 2]

        # ---------------- interior: 8-way slab test -----------------------
        rr = row[:, 0:48].reshape(r, 8, 6)
        bmin_x, bmin_y, bmin_z = rr[:, :, 0], rr[:, :, 1], rr[:, :, 2]
        bmax_x, bmax_y, bmax_z = rr[:, :, 3], rr[:, :, 4], rr[:, :, 5]
        lx = (bmin_x - ox[:, None]) * ix[:, None]
        hx = (bmax_x - ox[:, None]) * ix[:, None]
        ly = (bmin_y - oy[:, None]) * iy[:, None]
        hy = (bmax_y - oy[:, None]) * iy[:, None]
        lz = (bmin_z - oz[:, None]) * iz[:, None]
        hz = (bmax_z - oz[:, None]) * iz[:, None]
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(lx, hx), jnp.minimum(ly, hy)),
            jnp.minimum(lz, hz),
        )                                               # (R, 8)
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(lx, hx), jnp.maximum(ly, hy)),
            jnp.maximum(lz, hz),
        )
        child_ref = row[:, 48:56]                       # (R, 8) f32 exact ints
        # Empty slots carry inverted AABBs; the per-axis min/max of the slab
        # test would "repair" them, so validity needs its own lane check.
        slot_valid = bmin_x <= bmax_x
        hit_c = slot_valid & (tn <= tf) & (tf >= 0.0) & (tn < t_best[:, None])
        key = jnp.where(hit_c, tn, INF)

        # Sort the 8 (entry-distance, child-ref) pairs ascending with the
        # comparator network: column 0 is the nearest hit child (descend),
        # columns 1.. are pushed far-to-near in ONE fused stack update.
        skey, (sref,) = _sort8(
            [key[:, c] for c in range(8)],
            [[child_ref[:, c] for c in range(8)]],
        )
        near_ref = sref[0].astype(jnp.int32)
        has_child = skey[0] < INF
        n_valid = has_child.astype(jnp.int32)
        for c in range(1, 8):
            n_valid = n_valid + (skey[c] < INF).astype(jnp.int32)

        # Stack lane p receives sorted child (n_valid - 1 - (p - depth)):
        # farthest lands deepest so pops come near-first. Lanes past
        # the stack simply don't exist (with the exact bound this cannot
        # drop pushes; the clamp is belt-and-braces).
        j = lane_d - depth[:, None]                     # (R, D)
        k = (n_valid - 1)[:, None] - j
        val = jnp.zeros_like(stack, dtype=jnp.float32)
        for c in range(1, 8):
            val = val + sref[c][:, None] * (k == c)
        do_push = is_wide & has_child
        push_sel = do_push[:, None] & (j >= 0) & (k >= 1)
        new_stack = jnp.where(push_sel, val.astype(jnp.int32), stack)
        n_push = jnp.where(do_push, n_valid - 1, 0)
        new_depth = jnp.minimum(depth + n_push, stack_depth)

        # ---------------- leaf: 4-triangle intersection -------------------
        # Componentwise Möller–Trumbore over the 4 packed triangles; all
        # arrays are (R, 4) planes sliced from the row.
        tris4 = row.reshape(r, 4, 16)
        p0x, p0y, p0z = tris4[:, :, 0], tris4[:, :, 1], tris4[:, :, 2]
        p1x, p1y, p1z = tris4[:, :, 3], tris4[:, :, 4], tris4[:, :, 5]
        p2x, p2y, p2z = tris4[:, :, 6], tris4[:, :, 7], tris4[:, :, 8]
        meta = tris4[:, :, 15].astype(jnp.int32)        # orig*4 + flags
        orig = meta >> 2
        flags = meta & 0x3

        e1x, e1y, e1z = p1x - p0x, p1y - p0y, p1z - p0z
        e2x, e2y, e2z = p2x - p0x, p2y - p0y, p2z - p0z
        dxb, dyb, dzb = dx[:, None], dy[:, None], dz[:, None]
        pvx = dyb * e2z - dzb * e2y
        pvy = dzb * e2x - dxb * e2z
        pvz = dxb * e2y - dyb * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz         # (R, 4)
        double_sided = (flags & 1) != 0
        if cull_backface:
            facing_ok = double_sided | (det > _EPS_DET)
        else:
            facing_ok = jnp.abs(det) > _EPS_DET
        det_ok = jnp.abs(det) > _EPS_DET
        inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
        tvx = ox[:, None] - p0x
        tvy = oy[:, None] - p0y
        tvz = oz[:, None] - p0z
        uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        vv = (dxb * qvx + dyb * qvy + dzb * qvz) * inv_det
        tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
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
            arow = alpha_pack.rows[jnp.clip(orig, 0, alpha_pack.rows.shape[0] - 1)]
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

        # Best-of-4 via an elementwise tournament (payloads ride along).
        t_cand = jnp.where(geo_hit, tt, INF)

        def _combine(a, b):
            ta, oa, ua, va = a
            tb, ob, ub, vb = b
            take = tb < ta
            return (
                jnp.where(take, tb, ta),
                jnp.where(take, ob, oa),
                jnp.where(take, ub, ua),
                jnp.where(take, vb, va),
            )

        cols = [(t_cand[:, c], orig[:, c], uu[:, c], vv[:, c]) for c in range(4)]
        bt, b_orig, b_u, b_v = _combine(
            _combine(cols[0], cols[1]), _combine(cols[2], cols[3])
        )
        upd = bt < t_best
        t_best = jnp.where(upd, bt, t_best)
        tri_best = jnp.where(upd, b_orig, tri_best)
        u_best = jnp.where(upd, b_u, u_best)
        v_best = jnp.where(upd, b_v, v_best)

        # ---------------- next node --------------------------------------
        # A lane either pushed (interior with a hit child) or may pop
        # (childless interior / leaf) — never both, so the pop can read the
        # PRE-push stack at the pre-push depth: one pass over the stack
        # array serves both the push-write and the pop-read.
        next_cur = jnp.where(is_wide & has_child, near_ref, TERM)
        need_pop = active & ((is_wide & ~has_child) | is_leaf)
        if any_hit_mode:
            found = upd
            need_pop = need_pop & ~found
            next_cur = jnp.where(found, TERM, next_cur)

        can_pop = need_pop & (depth > 0)
        top = jnp.sum(
            jnp.where(lane_d == (depth - 1)[:, None], stack, 0), axis=1
        )
        next_cur = jnp.where(can_pop, top, next_cur)
        new_depth = new_depth - can_pop.astype(jnp.int32)

        steps = steps + active.astype(jnp.int32)
        return (
            next_cur, new_depth, new_stack, t_best, tri_best,
            u_best, v_best, seed, steps,
        )

    # Small chunks bound the minimum work per while-loop pass: shallow trees
    # (the alpha BVH is often ~100 rows) finish in a few steps and must not
    # be forced through a long unrolled scan; deep batches amortize the
    # per-chunk cond reduction over more steps. The alpha body is ~10x the
    # opaque body per step (texture taps + rng), and most lanes die on the
    # root-prefiltered first step - chunk 1 lets the loop bail immediately.
    if with_alpha:
        chunk_len = 1
    else:
        chunk_len = 4 if n_rows < 1024 else 8

    def run_phase(state, o, d, invd, live_floor):
        """Run chunk_len-step chunks until fewer than ``live_floor`` rays
        remain unfinished (0 = drain completely)."""

        def chunk(s):
            def sbody(ss, _):
                return body(ss, o, d, invd), None

            s, _ = jax.lax.scan(sbody, s, None, length=chunk_len)
            return s

        if live_floor <= 0:
            cond = lambda s: jnp.any(s[0] != TERM)
        else:
            cond = lambda s: jnp.sum(s[0] != TERM) > live_floor

        return jax.lax.while_loop(cond, chunk, state)

    def compact(state, o, d, invd, size):
        """Pack the unfinished lanes into the first ``size`` lanes of a new
        buffer (static size; fill lanes are TERM). Returns the sub-state, the
        sub ray params, and the source indices for scattering results back.

        Gather count matters more than gathered bytes (flat cost per ROW up
        to 512B): the 8 scalar state columns ride as ONE (R, 8) i32 row
        (f32/u32 fields bitcast — integer arrays never flush bit patterns)
        and the 9 ray-param columns as ONE (R, 9) row, so a boundary costs
        3 gathers (scalars, stack, rays) instead of 12."""
        full = state[0].shape[0]
        (idx,) = jnp.nonzero(state[0] != TERM, size=size, fill_value=full)
        safe = jnp.minimum(idx, full - 1)
        valid = idx < full
        cur, depth, stack, t_best, tri, u, v, sd, steps = state
        bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
        packed_scalars = jnp.stack(
            [cur, depth, bc(t_best), tri, bc(u), bc(v), bc(sd), steps], axis=1
        )[safe]
        fb = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
        sub = (
            jnp.where(valid, packed_scalars[:, 0], TERM),
            packed_scalars[:, 1],
            stack[safe],
            fb(packed_scalars[:, 2]),
            packed_scalars[:, 3],
            fb(packed_scalars[:, 4]),
            fb(packed_scalars[:, 5]),
            jax.lax.bitcast_convert_type(packed_scalars[:, 6], jnp.uint32),
            packed_scalars[:, 7],
        )
        rays = jnp.concatenate([o, d, invd], axis=1)[safe]  # (size, 9)
        return sub, rays[:, 0:3], rays[:, 3:6], rays[:, 6:9], idx

    def merge(state, sub, idx):
        """Scatter a compacted phase's results back (out-of-range fill
        indices are dropped by XLA scatter). Only the fields consumed after
        the loop are merged; cur/depth/stack of drained lanes are dead.
        The six result columns ride as ONE packed (r', 6) i32 scatter
        (scatter cost is per ROW, like gathers)."""
        bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
        fb = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
        pack = lambda s: jnp.stack(
            [bc(s[3]), s[4], bc(s[5]), bc(s[6]), bc(s[7]), s[8]], axis=1
        )
        merged = pack(state).at[idx].set(pack(sub), mode="drop")
        out = list(state)
        out[3] = fb(merged[:, 0])
        out[4] = merged[:, 1]
        out[5] = fb(merged[:, 2])
        out[6] = fb(merged[:, 3])
        out[7] = jax.lax.bitcast_convert_type(merged[:, 4], jnp.uint32)
        out[8] = merged[:, 5]
        return tuple(out)

    state = (
        cur0,
        jnp.zeros((r,), jnp.int32),
        jnp.zeros((r, stack_depth), jnp.int32),
        t_max,
        jnp.full((r,), -1, jnp.int32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), jnp.float32),
        seed,
        jnp.zeros((r,), jnp.int32),
    )

    # Traversal step counts are long-tailed (measured mean ~14 vs max ~27 on
    # the SAH tree): running the whole batch until the LAST ray finishes
    # wastes most lanes. Phase the loop: full batch until <=1/4 survive,
    # compact survivors into a 4x smaller buffer, and repeat down to 1/64,
    # then drain. Each phase boundary costs one cumsum + a dozen small
    # gathers; each avoided full-batch chunk saves chunk_len row-gather +
    # stack passes.
    if r >= 1 << 15:
        o_c, d_c, i_c = origin, direction, inv_d
        merges = []
        cur_state = state
        for div in (4, 16, 64):
            size = max(1 << 10, (r // div + 127) & ~127)
            cur_state = run_phase(cur_state, o_c, d_c, i_c, size)
            sub, o_c, d_c, i_c, idx = compact(cur_state, o_c, d_c, i_c, size)
            merges.append((cur_state, idx))
            cur_state = sub
        cur_state = run_phase(cur_state, o_c, d_c, i_c, 0)
        for outer, idx in reversed(merges):
            cur_state = merge(outer, cur_state, idx)
        state = cur_state
    else:
        state = run_phase(state, origin, direction, inv_d, 0)

    _, _, _, t_best, tri_best, u_best, v_best, seed, steps = state
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
    from . import traverse_fused as tf

    if bundle.opaque_planar is not None and tf.enabled():
        hit_o = tf.closest_hit_fused(
            bundle.opaque_planar, origin, direction, active=active
        )
        if seed is None:
            seed = jnp.zeros(origin.shape[:1], jnp.uint32)
    else:
        hit_o, seed = closest_hit_wide(
            bundle.opaque, tri_material, origin, direction,
            seed=seed, alpha_ctx=None, active=active,
        )
    if bundle.alpha is None:
        return hit_o, seed
    from . import traverse_alpha as ta

    if (
        getattr(bundle, "alpha_planar", None) is not None
        and tf.enabled() and ta.enabled()
    ):
        hit_a, seed = ta.closest_hit_alpha(
            bundle.alpha_planar, alpha_ctx, tri_material,
            origin, direction, hit_o.t, seed=seed, active=active,
        )
    else:
        hit_a, seed = _traverse_wide(
            bundle.alpha, tri_material, origin, direction, hit_o.t, seed,
            alpha_ctx, cull_backface=True, any_hit_mode=False, active_in=active,
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
    from . import traverse_fused as tf

    if bundle.opaque_planar is not None and tf.enabled():
        occ = tf.any_hit_fused(
            bundle.opaque_planar, origin, direction, t_max, active=active
        )
        if seed is None:
            seed = jnp.zeros(origin.shape[:1], jnp.uint32)
    else:
        occ, seed = any_hit_wide(
            bundle.opaque, tri_material, origin, direction, t_max,
            seed=seed, alpha_ctx=None, active=active,
        )
    if bundle.alpha is None:
        return occ, seed
    still = active & ~occ if active is not None else ~occ
    from . import traverse_alpha as ta

    if (
        getattr(bundle, "alpha_planar", None) is not None
        and tf.enabled() and ta.enabled()
    ):
        occ_a, seed = ta.any_hit_alpha(
            bundle.alpha_planar, alpha_ctx, tri_material,
            origin, direction, t_max, seed=seed, active=still,
        )
    else:
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
