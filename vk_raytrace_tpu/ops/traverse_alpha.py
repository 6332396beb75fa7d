"""Fused alpha traversal: candidate rounds over the alpha BVH.

The reference evaluates alpha-cutout/blend surfaces *inside* traversal (the
any-hit shader ``pathtrace.rahit:53-114`` / the inline ``HitTest`` of
``traceray_rq.glsl:32-147``). Round 2 routed alpha geometry through the
8-wide XLA traversal body with an in-loop stochastic test — correct, but
~2.5x the per-ray cost of the fused Pallas path and 43% of the atrium
frame (measured by ablation, scripts/ablate.py).

This module replaces that with a TPU-native *candidate rounds* scheme on
the fused kernel:

1. run the fused closest-hit kernel over the (small) alpha tree in the
   parametric window ``(t_lo, t_limit)`` — the kernel also interpolates the
   texture UV at the hit (``_M_UVU/_M_UVV`` meta channels), so the test
   needs no per-triangle UV gather;
2. stochastically test the ONE nearest candidate per lane in plain XLA
   (one prebaked material-row gather + one atlas alpha tap + one rand —
   the round-2 AlphaPack tables, ops/traverse_wide.py);
3. lanes that rejected their candidate advance ``t_lo`` just past it and
   re-enter; everyone else is done.

Testing candidates in strict t-order is distribution-identical to the
reference's encounter-order testing: surfaces pass independently with
probability ``opacity``, so "nearest accepted" does not depend on test
order. Rounds after the first run nearly empty and cost only the fused
path's phase-compaction overhead.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.schema import ALPHA_MASK
from . import rng
from .traverse import INF, AlphaCtx, Hit
from .traverse_fused import _traverse_fused
from .traverse_wide import AlphaPack, make_alpha_pack

def enabled() -> bool:
    """Candidate-rounds alpha policy: on wherever the fused kernel runs;
    VKRT_FUSED_ALPHA=0 falls back to the XLA alpha pass (attribution)."""
    return os.environ.get("VKRT_FUSED_ALPHA", "1") != "0"


_MAX_ROUNDS = 24          # bound on rejected candidates along one ray
_ADV_REL = 1e-4           # window advance past a rejected candidate:
_ADV_ABS = 1e-5           # must exceed the f32 re-intersection error of the
                          # shifted-origin ray, and stay far below surface
                          # spacing. 1e-4 relative is ~1000x f32 eps.


def _alpha_accept(
    pack: AlphaPack,
    tri: jax.Array,        # (R,) i32 global triangle id (alpha-tree hits)
    uvu: jax.Array,        # (R,) f32 interpolated texture UV (pre-transform)
    uvv: jax.Array,
    seed: jax.Array,       # (R,) u32
    cand: jax.Array,       # (R,) bool — lanes with a candidate to test
) -> tuple[jax.Array, jax.Array]:
    """One stochastic alpha test per candidate lane; rand consumed only on
    candidate lanes (per-lane stream semantics of ops/traverse_wide.py)."""
    arow = pack.rows[jnp.clip(tri, 0, pack.rows.shape[0] - 1)]   # (R, 16)
    ut = uvu * arow[:, 4] + uvv * arow[:, 6] + arow[:, 8]
    vt = uvu * arow[:, 5] + uvv * arow[:, 7] + arow[:, 9]
    tw = jnp.maximum(arow[:, 12].astype(jnp.int32), 1)
    th = jnp.maximum(arow[:, 13].astype(jnp.int32), 1)
    xi = jnp.floor(ut * tw.astype(jnp.float32)).astype(jnp.int32)
    yi = jnp.floor(vt * th.astype(jnp.float32)).astype(jnp.int32)

    def wrap(c, size, mode):
        rep = jnp.remainder(c, size)
        clm = jnp.clip(c, 0, size - 1)
        mm = jnp.remainder(c, 2 * size)
        mir = jnp.where(mm >= size, 2 * size - 1 - mm, mm)
        return jnp.where(mode == 0, rep, jnp.where(mode == 1, clm, mir))

    xw = wrap(xi, tw, arow[:, 14].astype(jnp.int32)) + arow[:, 10].astype(jnp.int32)
    yw = wrap(yi, th, arow[:, 15].astype(jnp.int32)) + arow[:, 11].astype(jnp.int32)
    flat = jnp.clip(
        yw * pack.atlas_width + xw, 0, pack.alpha_plane.shape[0] - 1
    )
    texel_a = pack.alpha_plane[flat].astype(jnp.float32) * (1.0 / 255.0)
    a = arow[:, 0] * jnp.where(arow[:, 3] >= 0.0, texel_a, 1.0)
    is_mask = arow[:, 1] == float(ALPHA_MASK)
    opacity = jnp.where(is_mask, (a > arow[:, 2]).astype(jnp.float32), a)

    seed2, rnd = rng.rand(seed)
    seed = jnp.where(cand, seed2, seed)
    return rnd <= opacity, seed


def _rounds_core(
    planar,
    pack: Optional[AlphaPack],
    origin: jax.Array,          # (W, 3)
    direction: jax.Array,       # (W, 3)
    t_limit: jax.Array,         # (W,)
    seed: jax.Array,            # (W,)
    need0: jax.Array,           # (W,) bool
    cull_backface: bool,
):
    """The candidate-rounds while loop at a fixed lane width."""
    r = origin.shape[0]
    st0 = (
        jnp.int32(0),                       # round counter
        jnp.zeros((r,), jnp.float32),       # t_lo
        need0,                              # need another candidate
        jnp.full((r,), INF, jnp.float32),   # accepted t
        jnp.full((r,), -1, jnp.int32),      # accepted tri
        jnp.zeros((r,), jnp.float32),       # accepted u
        jnp.zeros((r,), jnp.float32),       # accepted v
        seed,
        jnp.zeros((r,), jnp.int32),         # steps
    )

    def cond(st):
        return jnp.any(st[2]) & (st[0] < _MAX_ROUNDS)

    def body(st):
        rounds, t_lo, need, bt, btri, bu, bv, seed, steps = st
        o2 = origin + direction * t_lo[:, None]
        win = jnp.maximum(t_limit - t_lo, 0.0)
        hit, uvu, uvv = _traverse_fused(
            planar, o2, direction, win,
            cull_backface=cull_backface, any_hit_mode=False,
            active_in=need, return_uvt=True,
            # Alpha trees are small (tree-depth steps); the phase-boundary
            # compact/merge gathers would dominate, and the caller already
            # compacted the batch.
            phase_compact=False,
        )
        cand = need & (hit.tri >= 0)
        if pack is not None:
            passed, seed = _alpha_accept(pack, hit.tri, uvu, uvv, seed, cand)
        else:
            passed = jnp.ones((r,), bool)
        accept = cand & passed
        t_abs = t_lo + hit.t
        bt = jnp.where(accept, t_abs, bt)
        btri = jnp.where(accept, hit.tri, btri)
        bu = jnp.where(accept, hit.u, bu)
        bv = jnp.where(accept, hit.v, bv)
        need = cand & ~passed
        t_lo = jnp.where(need, t_abs * (1.0 + _ADV_REL) + _ADV_ABS, t_lo)
        steps = steps + hit.steps
        return (rounds + 1, t_lo, need, bt, btri, bu, bv, seed, steps)

    st = jax.lax.while_loop(cond, body, st0)
    _, _, _, bt, btri, bu, bv, seed, steps = st
    return bt, btri, bu, bv, seed, steps


def _alpha_rounds(
    planar,                     # PlanarScene of the alpha tree
    pack: Optional[AlphaPack],  # None -> no stochastic test (accept all)
    origin: jax.Array,          # (R, 3)
    direction: jax.Array,       # (R, 3)
    t_limit: jax.Array,         # (R,) window end (opaque hit / shadow dist)
    seed: Optional[jax.Array],
    active: Optional[jax.Array],
    cull_backface: bool,
):
    """Compact-first candidate rounds.

    The alpha set is sparse and its per-child root prefilter narrow, but
    the survivor count is data-dependent, so the rounds loop runs at the
    smallest adequate of three static widths (r/16, r/4, r) picked by a
    nested ``lax.cond`` — fused-call cost is ~linear in lane width, and
    on the atrium the r/16 tier is the one that executes."""
    from .traverse_fused import root_prefilter

    r = origin.shape[0]
    if seed is None:
        seed = jnp.zeros((r,), jnp.uint32)
    need0 = jnp.ones((r,), bool) if active is None else active
    need0 = need0 & (t_limit > 0.0) & root_prefilter(
        planar, origin, direction, t_limit
    )

    def direct(args):
        origin, direction, t_limit, seed, need0 = args
        return _rounds_core(
            planar, pack, origin, direction, t_limit, seed, need0,
            cull_backface,
        )

    def tier(size):
        def branch(args):
            origin, direction, t_limit, seed, need0 = args
            (idx,) = jnp.nonzero(need0, size=size, fill_value=r)
            safe = jnp.minimum(idx, r - 1)
            valid = idx < r
            bt_s, btri_s, bu_s, bv_s, seed_s, steps_s = _rounds_core(
                planar, pack, origin[safe], direction[safe], t_limit[safe],
                seed[safe], valid, cull_backface,
            )
            # Scatter back to full width (fill lanes drop at index r).
            bt = jnp.full((r,), INF, jnp.float32).at[idx].set(bt_s, mode="drop")
            btri = jnp.full((r,), -1, jnp.int32).at[idx].set(btri_s, mode="drop")
            bu = jnp.zeros((r,)).at[idx].set(bu_s, mode="drop")
            bv = jnp.zeros((r,)).at[idx].set(bv_s, mode="drop")
            seed_out = seed.at[idx].set(seed_s, mode="drop")
            steps = jnp.zeros((r,), jnp.int32).at[idx].set(steps_s, mode="drop")
            return bt, btri, bu, bv, seed_out, steps

        return branch

    args = (origin, direction, t_limit, seed, need0)
    tiers = [s for s in (max(4096, r // 16), max(4096, r // 4)) if s < r]
    tiers = sorted(set(tiers))
    if not tiers:
        bt, btri, bu, bv, seed, steps = direct(args)
    else:
        n_live = jnp.sum(need0.astype(jnp.int32))

        def select(i):
            if i == len(tiers):
                return direct
            return lambda a: jax.lax.cond(
                n_live <= tiers[i], tier(tiers[i]), select(i + 1), a
            )

        bt, btri, bu, bv, seed, steps = select(0)(args)
    hit = Hit(
        t=jnp.where(btri >= 0, bt, INF), tri=btri, u=bu, v=bv, steps=steps
    )
    return hit, seed


def _pack_for(alpha_ctx: Optional[AlphaCtx], tri_material):
    if alpha_ctx is None:
        return None
    return make_alpha_pack(alpha_ctx, tri_material)


def closest_hit_alpha(
    planar,
    alpha_ctx: Optional[AlphaCtx],
    tri_material: jax.Array,
    origin: jax.Array,
    direction: jax.Array,
    t_limit: jax.Array,        # opaque closest-hit distance (prunes the tree)
    seed: Optional[jax.Array] = None,
    active: Optional[jax.Array] = None,
) -> tuple[Hit, jax.Array]:
    """Nearest alpha surface that PASSES its stochastic test, within
    (0, t_limit). Matches the XLA alpha pass of closest_hit_bundle."""
    pack = _pack_for(alpha_ctx, tri_material)
    return _alpha_rounds(
        planar, pack, origin, direction, t_limit, seed, active,
        cull_backface=True,
    )


def any_hit_alpha(
    planar,
    alpha_ctx: Optional[AlphaCtx],
    tri_material: jax.Array,
    origin: jax.Array,
    direction: jax.Array,
    t_max: jax.Array,
    seed: Optional[jax.Array] = None,
    active: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """Shadow-ray occlusion by the alpha set: occluded iff ANY alpha surface
    within t_max accepts (no backface culling, matching any_hit_wide)."""
    pack = _pack_for(alpha_ctx, tri_material)
    hit, seed = _alpha_rounds(
        planar, pack, origin, direction, t_max, seed, active,
        cull_backface=False,
    )
    return hit.tri >= 0, seed
