"""Fused 8-wide traversal: the Pallas/Mosaic production step kernel.

The XLA elementwise body of ``ops/traverse_wide.py`` is correct but pays a
materialization tax: comparator passes and one-hot stack updates each cost
an (R, k) HBM round trip, measured ~20 ms per (step x 1M rays) against
~7.7 ms for the row gather itself. The gather is a hardware path Pallas
cannot beat — it STAYS in XLA; this module fuses everything else about a
traversal step — 8-way slab test, child ordering, stack push/pop,
4-triangle Moller-Trumbore, best-hit update — into ONE VMEM-resident
kernel, so the per-step HBM traffic drops to the gathered row plus one
read+write of the traversal state.

Design points (all dictated by Mosaic/TPU lowering):

* **Attr-major layout**: inside the kernel children/attributes live on
  SUBLANES and rays on LANES, so every op runs full-width on the VPU. The
  persistent state is kept transposed in HBM between steps ((C, R) meta,
  (D, R) stack); only ``cur`` stays ray-major to feed the XLA gather.
* **Planar rows**: the unified row table is lane-permuted once per scene
  (:func:`planarize`) so the kernel reads contiguous sublane slices —
  Mosaic has no cheap strided sublane gather. Interior rows become
  [bmin.x x8 | bmin.y x8 | ... | bmax.z x8 | refs x8]; leaf rows become
  attribute-planar [attr0 of tris 0..3 | attr1 ... ].
* **Bitonic child ordering on sublanes**: the (size, stride) network with
  ``pltpu.roll`` partner exchange replaces 19 materialized comparator
  passes of the XLA body.

Semantics match ``_traverse_wide`` for OPAQUE trees (``alpha_ctx=None``):
backface culling by the double-sided flag, any-hit early termination.
Alpha-cutout geometry (the AccelBundle alpha tree, ops/bvh8.py) ALSO runs
on this kernel since round 3: ``candidates=True`` kernels track the
nearest ALPHA-flagged triangle in a separate meta slot (plus its in-kernel
interpolated texture UV) without letting it prune t_best, and
ops/traverse_alpha.py resolves the stochastic test in XLA between
candidate rounds (pathtrace.rahit:53-114 / traceray_rq.glsl:32-147
semantics).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .traverse import INF, Hit

# Must match ops/traverse_wide.py (not imported: bvh8 -> this module ->
# traverse_wide -> bvh8 would be a cycle). Plain Python scalars: pallas
# kernels may not capture traced (jnp) constants.
TERM = -(2**30)
_INF = float(INF)
_ROOT_INF = 3.0e38

# Rays per kernel block: row 1 MB + stack ~0.9 MB in VMEM. Env-overridable
# for tuning sweeps. Note: env toggles in this module (including
# VKRT_NOALIAS / VKRT_UNROLL, read at trace time) only take effect in a
# fresh process — a warm jit cache keeps the previously traced setting.


def _env_int(name: str, default: int, minimum: int = 1) -> int:
    raw = os.environ.get(name, "").strip()
    if not raw:
        return default
    try:
        v = int(raw)
    except ValueError:
        raise ValueError(f"{name} must be an integer, got {raw!r}") from None
    if v < minimum:
        raise ValueError(f"{name} must be >= {minimum}, got {v}")
    return v


BLK = _env_int("VKRT_BLK", 4096)
if BLK % 128 or BLK & (BLK - 1):
    raise ValueError(f"VKRT_BLK must be a power of two multiple of 128, got {BLK}")
# Phase schedule: compact survivors to r/div at each boundary. Read at
# TRACE time (so in-process A/B sweeps through VKRT_PHASE_DIVS genuinely
# retrace — it rides render.py's traced-env jit key); it was an
# import-time constant before, which made ab_frame sweeps of it silently
# vacuous. Default "8,64" from the round-5 travbench sweep: two LAZY
# tiers beat the round-3 "4,16,64" by 4.4% (62.3 vs 65.2 ms closest-hit
# at 524k) — compaction gathers cost more than the tail occupancy they
# recover when applied early.


def phase_divs() -> tuple:
    raw = os.environ.get("VKRT_PHASE_DIVS", "8,64")
    try:
        divs = tuple(int(x) for x in raw.split(",") if x.strip())
    except ValueError:
        raise ValueError(
            f"VKRT_PHASE_DIVS must be a comma-separated int list, got {raw!r}"
        ) from None
    if not divs or any(d < 1 for d in divs):
        raise ValueError(f"VKRT_PHASE_DIVS must be positive ints, got {raw!r}")
    return divs
# Chunk 4 beats 8 on the atrium (83 vs 98-130 ms closest-hit at 524k rays):
# phases end nearer the live-fraction thresholds instead of overshooting by
# up to 7 full-batch steps; the extra cond reductions are cheap on (1, R).
CHUNK_LEN = 4
# Runtime stack rows streamed per step (the SHORT stack). The builder's
# worst-case bound (sum of (children-1) along the deepest path) is ~61 on
# the atrium, but the bound is realized only by adversarial near-orderings;
# real rays stay shallow. Streaming the full bound costs 2 x depth x 4 B
# per lane per step — at 61 deep that is ~490 B/lane/step, MORE than the
# 512 B row gather itself (round-4 device trace: per-step state copies
# rival the gather). The kernel therefore runs with a K-row stack and a
# sticky overflow flag; lanes that would have pushed past K re-run at a
# narrow tier with the full-depth kernel (exact — the short-stack pass is
# discarded for them).
STACK_ROWS = _env_int("VKRT_STACK", 16)
# Persistent per-lane meta rows.
#   0..5: depth, t_best, tri_best, u, v, steps   — the opaque hit
#   6:    sticky stack-overflow flag (short-stack pass invalid for lane)
# Candidate-mode kernels (``candidates=True``, the alpha-tree path of
# ops/traverse_alpha.py) extend this to 16 rows:
#   7..12: candidate slot — nearest ALPHA-flagged triangle seen (not a
#          t_best update: its acceptance is stochastic and resolved by the
#          caller): t, tri, bary u, bary v, and the texture UV interpolated
#          in-kernel from the leaf uv planes.
# Opaque kernels keep 8 rows so the hot path pays no extra state traffic.
_META = 8
_META_CAND = 16
_M_DEPTH, _M_T, _M_TRI, _M_U, _M_V, _M_STEPS, _M_OVF = 0, 1, 2, 3, 4, 5, 6
_M_CT, _M_CTRI, _M_CU, _M_CV, _M_CUVU, _M_CUVV = 7, 8, 9, 10, 11, 12


@jax.tree_util.register_pytree_node_class
class PlanarScene:
    """Lane-permuted row table for the fused kernel (see module docstring).
    ``stack_depth`` and ``width`` are static pytree aux data (they shape the
    kernel). width=8: 64-lane/256B rows, 4-tri leaves (re-permuted from the
    XLA 8-wide table); width=16: 128-lane/512B rows, 8-tri leaves (built
    natively — same flat per-row gather cost, ~half the rows per ray)."""

    def __init__(self, rows: jax.Array, stack_depth: int, width: int = 8):
        self.rows = rows            # (X, width*8) f32, planar layout
        self.stack_depth = int(stack_depth)
        self.width = int(width)

    def tree_flatten(self):
        return (self.rows,), (self.stack_depth, self.width)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], stack_depth=aux[0], width=aux[1])


def _interior_mask(rows: np.ndarray, roots=None) -> np.ndarray:
    """BFS from the root(s) over child refs: which unified rows are interior.
    (The unified table interleaves interior and leaf rows; only the refs
    distinguish them. Concatenated multi-mesh tables — ops/tlas.py — pass
    every mesh root.)"""
    n = len(rows)
    interior = np.zeros(n, bool)
    frontier = np.unique(np.asarray(roots if roots is not None else [0], np.int64))
    interior[frontier] = True
    while len(frontier):
        r = rows[frontier]                      # (F, 64)
        valid = r[:, 0:48:6] <= r[:, 3:48:6]    # (F, 8) slot occupied
        refs = r[:, 48:56]
        kid_int = refs[valid & (refs >= 0.5)].astype(np.int64)
        kid_int = np.unique(kid_int)
        new = kid_int[~interior[kid_int]]
        interior[new] = True
        frontier = new
    return interior


_PERM_INT = np.empty(64, np.int64)
for _c in range(8):
    for _k in range(6):
        _PERM_INT[_k * 8 + _c] = _c * 6 + _k    # new lane k*8+c <- old c*6+k
    _PERM_INT[48 + _c] = 48 + _c
    _PERM_INT[56 + _c] = 56 + _c
_PERM_LEAF = np.empty(64, np.int64)
for _t in range(4):
    for _a in range(16):
        _PERM_LEAF[_a * 4 + _t] = _t * 16 + _a  # new lane a*4+t <- old t*16+a


def planarize(wide, roots=None) -> PlanarScene:
    """One-time lane permutation of a :class:`~.bvh8.WideScene` row table
    into the fused kernel's planar layout (host numpy, O(rows))."""
    rows = np.asarray(wide.rows)
    interior = _interior_mask(rows, roots=roots)
    out = np.empty_like(rows)
    out[interior] = rows[interior][:, _PERM_INT]
    out[~interior] = rows[~interior][:, _PERM_LEAF]
    return PlanarScene(rows=out, stack_depth=int(wide.stack_depth))


def planar_width() -> int:
    """Fused-row width policy: 16 (512B rows, default) or 32 (1024B rows,
    ``VKRT_WIDE=32`` — half the per-ray row gathers for +14% per gather)."""
    return 32 if os.environ.get("VKRT_WIDE") == "32" else 16


def planar_native(geom, tri_ids=None, width: int | None = None) -> "PlanarScene | None":
    """Native binned-SAH planar build (runtime/native.cpp ``build_bvh16``/
    ``build_bvh32``); None when the native library is unavailable."""
    from .. import runtime

    if width is None:
        width = planar_width()
    out = runtime.build_planar_rows(
        np.asarray(geom.positions),
        np.asarray(geom.indices),
        np.asarray(geom.uv),
        np.asarray(geom.tri_flags),
        tri_ids=tri_ids,
        width=width,
    )
    if out is None:
        return None
    rows, depth = out
    return PlanarScene(rows=rows, stack_depth=depth, width=width)


def planar16_native(geom, tri_ids=None) -> "PlanarScene | None":
    return planar_native(geom, tri_ids=tri_ids, width=16)


_STAGES = {
    8: ((2, 1), (4, 2), (4, 1), (8, 4), (8, 2), (8, 1)),
    16: ((2, 1), (4, 2), (4, 1), (8, 4), (8, 2), (8, 1),
         (16, 8), (16, 4), (16, 2), (16, 1)),
    32: ((2, 1), (4, 2), (4, 1), (8, 4), (8, 2), (8, 1),
         (16, 8), (16, 4), (16, 2), (16, 1),
         (32, 16), (32, 8), (32, 4), (32, 2), (32, 1)),
}


def _bitonic(key, ref, sub, width):
    """Ascending bitonic sort of ``width`` sublanes, payload rides along."""
    for size, stride in _STAGES[width]:
        is_low = (sub & stride) == 0
        down_k = (width - stride) % width
        pk = jnp.where(is_low, pltpu.roll(key, down_k, 0), pltpu.roll(key, stride, 0))
        pr = jnp.where(is_low, pltpu.roll(ref, down_k, 0), pltpu.roll(ref, stride, 0))
        asc = (sub & size) == 0 if size < width else sub >= 0
        keep_min = is_low == asc
        take = (keep_min & (pk < key)) | (jnp.logical_not(keep_min) & (pk > key))
        key = jnp.where(take, pk, key)
        ref = jnp.where(take, pr, ref)
    return key, ref


def _make_step_kernel(cull_backface: bool, any_hit_mode: bool,
                      stack_depth: int, width: int = 8,
                      candidates: bool = False, n_rows: int = 1,
                      pre_transposed: bool = False,
                      _ablate: tuple = ()):
    """``pre_transposed``: the row block arrives attr-major (lanes, B) —
    the transpose happened in XLA, where it is a memory-speed tiled copy.
    The round-5 kernel ablation showed the in-kernel (B, 128) -> (128, B)
    Mosaic transpose dominating the step (~4 of 5.1 ms at 524k lanes).

    ``_ablate`` is for scripts/stepbench.py TIMING ATTRIBUTION ONLY —
    each entry replaces one kernel stage with same-shape garbage of ~zero
    cost ('notrans', 'nosort', 'noslab', 'nomt'); traversal results are
    wrong with any of them set."""
    W = width
    LT = W // 2                 # leaf triangles per row
    CB = LT.bit_length() - 1    # leaf-count bits: 4 tris -> 2, 8 tris -> 3

    def kern(row_ref, o_ref, d_ref, cur_ref, rowid_ref, meta_ref,
             stack_ref, ncur_ref, nrowid_ref, nmeta_ref, nstack_ref):
        del rowid_ref  # consumed by the XLA row gather, carried through here
        if pre_transposed:
            rowT = row_ref[:]                   # already (lanes, B)
        elif "notrans" in _ablate:
            # Keep the data dependency on the streamed row block but
            # replace the full (B, 128) transpose with a one-sublane
            # transpose + lane broadcast (~free).
            rowT = jnp.broadcast_to(
                row_ref[0:1, :].T, (row_ref.shape[1], row_ref.shape[0])
            )
        else:
            rowT = row_ref[:].T                 # one in-VMEM transpose
        cur = cur_ref[:]                        # (1, B) i32
        depth = meta_ref[_M_DEPTH:_M_DEPTH + 1, :].astype(jnp.int32)
        t_best = meta_ref[_M_T:_M_T + 1, :]
        if candidates:
            # Candidate updates only ever lower c_t, so pruning interior
            # visits by min(t_best, c_t) is exact for the nearest-candidate
            # query (the alpha tree never updates t_best).
            c_t = meta_ref[_M_CT:_M_CT + 1, :]
            t_prune = jnp.minimum(t_best, c_t)
        else:
            t_prune = t_best

        active = cur != TERM
        is_wide = active & (cur >= 0)
        is_leaf = active & (cur < 0)

        ox, oy, oz = o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :]
        dx, dy, dz = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]
        # inv_d in-kernel (3 VPU divides) instead of streaming a third
        # (4, R) operand every step — same guarded formula as the XLA
        # prologue, so slab arithmetic is bitwise unchanged.
        def _inv(c):
            return 1.0 / jnp.where(
                jnp.abs(c) < 1e-20, jnp.where(c < 0, -1e-20, 1e-20), c
            )
        ix, iy, iz = _inv(dx), _inv(dy), _inv(dz)

        # ---- interior: W-way slab test (children on sublanes) ------------
        bxm, bym, bzm = rowT[0:W], rowT[W:2 * W], rowT[2 * W:3 * W]
        bxM, byM, bzM = rowT[3 * W:4 * W], rowT[4 * W:5 * W], rowT[5 * W:6 * W]
        child_ref = rowT[6 * W:7 * W]
        if "noslab" in _ablate:
            tn = tf = jnp.broadcast_to(dx, bxm.shape)
        else:
            lx = (bxm - ox) * ix
            hx = (bxM - ox) * ix
            ly = (bym - oy) * iy
            hy = (byM - oy) * iy
            lz = (bzm - oz) * iz
            hz = (bzM - oz) * iz
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(lx, hx), jnp.minimum(ly, hy)),
                jnp.minimum(lz, hz),
            )
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(lx, hx), jnp.maximum(ly, hy)),
                jnp.maximum(lz, hz),
            )
        hit_c = (bxm <= bxM) & (tn <= tf) & (tf >= 0.0) & (tn < t_prune)
        key = jnp.where(hit_c, tn, _INF)

        subw = jax.lax.broadcasted_iota(jnp.int32, key.shape, 0)
        if "nosort" in _ablate:
            skey, sref = key, child_ref
        else:
            skey, sref = _bitonic(key, child_ref, subw, W)
        near_ref = sref[0:1, :].astype(jnp.int32)
        has_child = skey[0:1, :] < _INF
        n_valid = jnp.sum((skey < _INF).astype(jnp.int32), axis=0, keepdims=True)

        # ---- stack push: ONE fused (D, B) pass ---------------------------
        lane_d = jax.lax.broadcasted_iota(jnp.int32, (stack_depth, cur.shape[1]), 0)
        jj = lane_d - depth
        kk = (n_valid - 1) - jj
        do_push = is_wide & has_child
        push_sel = do_push & (jj >= 0) & (kk >= 1)
        stack_old = stack_ref[:]
        if "nopush" in _ablate:
            new_stack = stack_old
        else:
            val = jnp.zeros((stack_depth, cur.shape[1]), jnp.float32)
            for c in range(1, W):
                val = val + sref[c:c + 1, :] * (kk == c)
            new_stack = jnp.where(push_sel, val.astype(jnp.int32), stack_old)
        n_push = jnp.where(do_push, n_valid - 1, 0)
        new_depth = jnp.minimum(depth + n_push, stack_depth)
        # Short-stack overflow: pushes past the streamed K rows are DROPPED
        # (the lane's result is invalid from here on); the sticky flag sends
        # the lane to the full-depth re-run tier (_traverse_fused).
        dropped = (do_push & (depth + n_push > stack_depth)).astype(jnp.float32)

        # ---- leaf: LT-triangle Moller-Trumbore (triangles on sublanes) ---
        vleaf = -cur - 1
        leaf_cnt = (vleaf & (LT - 1)) + 1

        def attr(a):
            return rowT[a * LT:(a + 1) * LT]

        p0x, p0y, p0z = attr(0), attr(1), attr(2)
        p1x, p1y, p1z = attr(3), attr(4), attr(5)
        p2x, p2y, p2z = attr(6), attr(7), attr(8)
        tmeta = attr(15).astype(jnp.int32)
        orig = tmeta >> 2
        flags = tmeta & 0x3

        if "nomt" in _ablate:
            uu = vv = tt = jnp.broadcast_to(dx, p0x.shape)
            det_ok = uu > 0.0
            facing_ok = det_ok
        else:
            e1x, e1y, e1z = p1x - p0x, p1y - p0y, p1z - p0z
            e2x, e2y, e2z = p2x - p0x, p2y - p0y, p2z - p0z
            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            det_ok = jnp.abs(det) > 1e-12
            if cull_backface:
                facing_ok = ((flags & 1) != 0) | (det > 1e-12)
            else:
                facing_ok = det_ok
            inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
            tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
            uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            vv = (dx * qvx + dy * qvy + dz * qvz) * inv_det
            tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        tri_lane = jax.lax.broadcasted_iota(jnp.int32, tt.shape, 0)
        geo_ok = (
            is_leaf
            & (tri_lane < leaf_cnt)
            & det_ok
            & facing_ok
            & (uu >= 0.0)
            & (vv >= 0.0)
            & (uu + vv <= 1.0)
            & (tt > 0.0)
        )
        if candidates:
            # Opaque hits update t_best; ALPHA-flagged hits never prune —
            # they go to the candidate slot (nearest seen), resolved
            # stochastically by the caller (pathtrace.rahit semantics,
            # deferred to XLA in ops/traverse_alpha.py).
            is_alpha = (flags & 2) != 0
            opq_hit = geo_ok & jnp.logical_not(is_alpha) & (tt < t_best)
            alp_hit = geo_ok & is_alpha & (tt < t_best) & (tt < c_t)
        else:
            opq_hit = geo_ok & (tt < t_best)

        def fold(k, cols):
            dk = (LT - k) % LT
            rolled = [pltpu.roll(c, dk, 0) for c in cols]
            take = rolled[0] < cols[0]
            return [jnp.where(take, r, c) for r, c in zip(rolled, cols)]

        def minfold(cols):
            k = LT // 2
            while k >= 1:
                cols = fold(k, cols)
                k //= 2
            return cols

        o_f = orig.astype(jnp.float32)
        t_cand, o_cand, u_cand, v_cand = minfold(
            [jnp.where(opq_hit, tt, _INF), o_f, uu, vv]
        )
        bt = t_cand[0:1, :]
        upd = bt < t_best
        new_t = jnp.where(upd, bt, t_best)
        new_tri = jnp.where(upd, o_cand[0:1, :], meta_ref[_M_TRI:_M_TRI + 1, :])
        new_u = jnp.where(upd, u_cand[0:1, :], meta_ref[_M_U:_M_U + 1, :])
        new_v = jnp.where(upd, v_cand[0:1, :], meta_ref[_M_V:_M_V + 1, :])

        if candidates:
            # Candidate slot: texture UV interpolated from the leaf uv
            # planes rides the fold (free VPU work next to the row gather).
            wbar = 1.0 - uu - vv
            tu = attr(9) * wbar + attr(11) * uu + attr(13) * vv
            tv = attr(10) * wbar + attr(12) * uu + attr(14) * vv
            ct_c, co_c, cu_c, cv_c, ctu_c, ctv_c = minfold(
                [jnp.where(alp_hit, tt, _INF), o_f, uu, vv, tu, tv]
            )
            cbt = ct_c[0:1, :]
            cupd = cbt < c_t
            new_ct = jnp.where(cupd, cbt, c_t)
            new_ctri = jnp.where(cupd, co_c[0:1, :], meta_ref[_M_CTRI:_M_CTRI + 1, :])
            new_cu = jnp.where(cupd, cu_c[0:1, :], meta_ref[_M_CU:_M_CU + 1, :])
            new_cv = jnp.where(cupd, cv_c[0:1, :], meta_ref[_M_CV:_M_CV + 1, :])
            new_ctu = jnp.where(cupd, ctu_c[0:1, :], meta_ref[_M_CUVU:_M_CUVU + 1, :])
            new_ctv = jnp.where(cupd, ctv_c[0:1, :], meta_ref[_M_CUVV:_M_CUVV + 1, :])

        # ---- next node ---------------------------------------------------
        next_cur = jnp.where(is_wide & has_child, near_ref, TERM)
        need_pop = active & ((is_wide & ~has_child) | is_leaf)
        if any_hit_mode:
            found = upd
            need_pop = need_pop & ~found
            next_cur = jnp.where(found, TERM, next_cur)
        can_pop = need_pop & (depth > 0)
        top = jnp.sum(
            jnp.where(lane_d == depth - 1, stack_old, 0), axis=0, keepdims=True
        )
        next_cur = jnp.where(can_pop, top, next_cur)
        new_depth = new_depth - can_pop.astype(jnp.int32)

        # Next step's row index, emitted HERE so ``cur`` has exactly ONE
        # consumer (this kernel): when the XLA row gather read ``cur`` too,
        # the in-place aliasing forced a defensive copy of the whole carry
        # every step (~half the traversal cost in the round-4 trace).
        nvleaf = -next_cur - 1
        nrow = jnp.where(next_cur >= 0, next_cur, nvleaf >> CB)
        nrow = jnp.clip(jnp.where(next_cur == TERM, 0, nrow), 0, n_rows - 1)

        ncur_ref[:] = next_cur
        nrowid_ref[:] = nrow
        nstack_ref[:] = new_stack
        nmeta_ref[_M_DEPTH:_M_DEPTH + 1, :] = new_depth.astype(jnp.float32)
        nmeta_ref[_M_T:_M_T + 1, :] = new_t
        nmeta_ref[_M_TRI:_M_TRI + 1, :] = new_tri
        nmeta_ref[_M_U:_M_U + 1, :] = new_u
        nmeta_ref[_M_V:_M_V + 1, :] = new_v
        nmeta_ref[_M_STEPS:_M_STEPS + 1, :] = (
            meta_ref[_M_STEPS:_M_STEPS + 1, :] + active.astype(jnp.float32)
        )
        nmeta_ref[_M_OVF:_M_OVF + 1, :] = jnp.maximum(
            meta_ref[_M_OVF:_M_OVF + 1, :], dropped
        )
        if candidates:
            nmeta_ref[_M_CT:_M_CT + 1, :] = new_ct
            nmeta_ref[_M_CTRI:_M_CTRI + 1, :] = new_ctri
            nmeta_ref[_M_CU:_M_CU + 1, :] = new_cu
            nmeta_ref[_M_CV:_M_CV + 1, :] = new_cv
            nmeta_ref[_M_CUVU:_M_CUVU + 1, :] = new_ctu
            nmeta_ref[_M_CUVV:_M_CUVV + 1, :] = new_ctv
            nmeta_ref[13:16, :] = meta_ref[13:16, :]
        else:
            nmeta_ref[7:8, :] = meta_ref[7:8, :]

    return kern


def _pad_to_block(r: int) -> int:
    return max(BLK, (r + BLK - 1) // BLK * BLK)


def _root_descend(rows, W, k_rows, origin_p, inv_d, t_max_p, cur0, meta0):
    """XLA prologue replacing the scan's FIRST kernel step.

    Every lane's step 0 processes row 0 (the root) — a gather that is a
    pure broadcast plus a full-width kernel dispatch (~5 ms at 524k
    lanes). The same work in XLA against the ONE broadcast root row fuses
    into the ray-setup elementwise chain: slab-test the W children, order
    by entry distance, enter the scan at the nearest child with the rest
    pre-pushed far-to-near on the stack. Exactly reproduces the kernel's
    step semantics (key = where(hit, tn, INF); push far-to-near;
    depth/overflow bookkeeping; steps counter +1 for active lanes), so
    traversal results are identical; only tie ORDER among equal-tn
    children may differ (jax.lax.sort is stable, the kernel's bitonic
    network is not), which cannot change any best-hit outcome.

    Returns post-root (cur, stack, meta); ``cur0`` keeps TERM lanes
    (prefilter/active-mask) terminal.
    """
    rb = rows[0]                                     # (W*8,) planar root row
    valid = rb[0:W] <= rb[3 * W:4 * W]               # (W,)
    bmin = jnp.stack([rb[0:W], rb[W:2 * W], rb[2 * W:3 * W]], axis=-1)
    bmax = jnp.stack([rb[3 * W:4 * W], rb[4 * W:5 * W], rb[5 * W:6 * W]], -1)
    refs = rb[6 * W:7 * W]                           # (W,) f32 child refs
    lo = (bmin[None] - origin_p[:, None, :]) * inv_d[:, None, :]  # (R, W, 3)
    hi = (bmax[None] - origin_p[:, None, :]) * inv_d[:, None, :]
    tn = jnp.max(jnp.minimum(lo, hi), axis=-1)       # (R, W)
    tf = jnp.min(jnp.maximum(lo, hi), axis=-1)
    hit = valid[None] & (tn <= tf) & (tf >= 0.0) & (tn < t_max_p[:, None])
    key = jnp.where(hit, tn, _INF)
    ref_b = jnp.broadcast_to(refs[None, :], key.shape)
    skey, sref = jax.lax.sort((key, ref_b), dimension=1, num_keys=1)
    sref = sref.astype(jnp.int32)
    n_valid = jnp.sum(hit.astype(jnp.int32), axis=1)             # (R,)
    active = cur0 != TERM
    has_child = n_valid > 0
    new_cur = jnp.where(active & has_child, sref[:, 0], TERM)
    # Stack rows [0, n_valid-2] = children far-to-near (kernel push order).
    lane_d = jnp.arange(k_rows, dtype=jnp.int32)
    kk = (n_valid[:, None] - 1) - lane_d[None, :]                # (R, K)
    sel = active[:, None] & (kk >= 1)
    val = jnp.take_along_axis(sref, jnp.clip(kk, 0, W - 1), axis=1)
    stack = jnp.where(sel, val, 0).T.astype(jnp.int32)           # (K, R)
    n_push = jnp.where(active & has_child, n_valid - 1, 0)
    depth = jnp.minimum(n_push, k_rows)
    ovf = (active & (n_push > k_rows)).astype(jnp.float32)
    meta = meta0.at[_M_DEPTH].set(depth.astype(jnp.float32))
    meta = meta.at[_M_STEPS].set(active.astype(jnp.float32))
    meta = meta.at[_M_OVF].set(ovf)
    return new_cur, stack, meta


def root_prefilter(
    planar: "PlanarScene",
    origin: jax.Array,      # (R, 3)
    direction: jax.Array,   # (R, 3)
    t_max: jax.Array,       # (R,)
) -> jax.Array:
    """PER-CHILD slab test against the root row: which lanes can possibly
    hit the tree within (0, t_max). One level deeper than the union-AABB
    test the traversal itself starts with — on sparse trees (the atrium
    alpha set) the union box covers most of the scene while the children
    hug the actual geometry, so this prefilter is what makes pre-compacted
    candidate rounds (ops/traverse_alpha.py) narrow."""
    rows = jnp.asarray(planar.rows)
    W = planar.width
    inv_d = 1.0 / jnp.where(
        jnp.abs(direction) < 1e-20,
        jnp.where(direction < 0, -1e-20, 1e-20),
        direction,
    )
    rb = rows[0]
    valid = rb[0:W] <= rb[3 * W:4 * W]                     # (W,)
    bmin = jnp.stack([rb[0:W], rb[W:2 * W], rb[2 * W:3 * W]], axis=-1)
    bmax = jnp.stack([rb[3 * W:4 * W], rb[4 * W:5 * W], rb[5 * W:6 * W]], -1)
    lo = (bmin[None] - origin[:, None, :]) * inv_d[:, None, :]   # (R, W, 3)
    hi = (bmax[None] - origin[:, None, :]) * inv_d[:, None, :]
    tn = jnp.max(jnp.minimum(lo, hi), axis=-1)             # (R, W)
    tf = jnp.min(jnp.maximum(lo, hi), axis=-1)
    hit = valid[None] & (tn <= tf) & (tf >= 0.0) & (tn < t_max[:, None])
    return jnp.any(hit, axis=1)


def _interpret_mode() -> bool:
    """Compiled Mosaic on TPU; Pallas interpreter everywhere else (CPU tests
    exercise the same kernel code path)."""
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:
        return True


def xla_transpose_rows() -> bool:
    """Row-block orientation policy (VKRT_XLAT=1, DEFAULT OFF): transpose
    the gathered (R, 128) block to attr-major in XLA instead of inside the
    Mosaic kernel. MEASURED WORSE: 6.18 vs 4.91 ms/step — the XLA
    transpose materializes an extra 268 MB/step, and the same-session
    `nogather` control (4.87 ms on pre-transposed blocks) shows the
    kernel is VPU-op-bound with or without its in-kernel transpose (the
    earlier `notrans` 0.01 ms reading was a Mosaic DCE artifact, not a
    real cost). Kept for attribution."""
    return os.environ.get("VKRT_XLAT") == "1"


def _step(rows, kern, stack_rows, width, n_meta, o4, d4,
          cur, rowid, meta, stack):
    r = cur.shape[1]
    lanes = width * 8
    row = rows[rowid[0]]                        # THE gather (XLA hardware path)
    pre_t = xla_transpose_rows()
    if pre_t:
        row = row.T                             # attr-major in XLA

    def cmaj(nr):
        return pl.BlockSpec((nr, BLK), lambda i: (0, i), memory_space=pltpu.VMEM)

    row_spec = (
        cmaj(lanes)
        if pre_t
        else pl.BlockSpec((BLK, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM)
    )
    return pl.pallas_call(
        kern,
        grid=(r // BLK,),
        in_specs=[
            row_spec,
            cmaj(4), cmaj(4), cmaj(1), cmaj(1), cmaj(n_meta),
            cmaj(stack_rows),
        ],
        out_specs=[cmaj(1), cmaj(1), cmaj(n_meta), cmaj(stack_rows)],
        out_shape=[
            jax.ShapeDtypeStruct((1, r), jnp.int32),
            jax.ShapeDtypeStruct((1, r), jnp.int32),
            jax.ShapeDtypeStruct((n_meta, r), jnp.float32),
            jax.ShapeDtypeStruct((stack_rows, r), jnp.int32),
        ],
        # In-place state update: cur/rowid/meta/stack alias their outputs
        # (grid blocks are disjoint and each block writes only what it
        # read), so the while-loop carry needs no fresh allocations. The
        # row index for the NEXT gather is emitted by the kernel itself so
        # ``cur`` has a single consumer — computing it in XLA from ``cur``
        # forced a defensive copy of the aliased carry every step.
        # Round-5 correction to the round-4 reading: the remaining trace
        # copy-starts are ASYNC and overlap the kernel (a carry-free
        # `noloop` variant measured SLOWER than the scan); the step is
        # VPU-op-bound in the kernel itself (~4.2 of 4.9 ms at 524k
        # lanes), not copy-bound. VKRT_NOALIAS=1 disables aliasing for
        # attribution experiments (measured: aliasing saves ~4%).
        input_output_aliases=(
            {}
            if os.environ.get("VKRT_NOALIAS") == "1"
            else {3: 0, 4: 1, 5: 2, 6: 3}
        ),
        interpret=_interpret_mode(),
    )(row, o4, d4, cur, rowid, meta, stack)


def _traverse_fused(
    planar: PlanarScene,
    origin: jax.Array,        # (R, 3)
    direction: jax.Array,     # (R, 3)
    t_max: jax.Array,         # (R,)
    cull_backface: bool,
    any_hit_mode: bool,
    active_in: Optional[jax.Array],
    root0: Optional[jax.Array] = None,   # per-lane BLAS roots (ops/tlas.py)
    return_uvt: bool = False,  # candidate mode: nearest alpha-flagged hit
                               # + its texture UV (ops/traverse_alpha.py)
    phase_compact: bool = True,  # False: skip the phase machinery (small
                               # trees finish in ~tree-depth steps; the
                               # compact/merge gathers would dominate)
) -> Hit:
    rows = jnp.asarray(planar.rows)   # no-op under jit; lifts host tables
    stack_depth = planar.stack_depth
    r_in = origin.shape[0]
    r = _pad_to_block(r_in)

    def pad_rm(a, fill=0.0):
        if a.shape[0] == r:
            return a
        pw = [(0, r - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, pw, constant_values=fill)

    origin_p = pad_rm(origin)
    direction_p = pad_rm(direction, 1.0)
    t_max_p = pad_rm(t_max)
    inv_d = 1.0 / jnp.where(
        jnp.abs(direction_p) < 1e-20,
        jnp.where(direction_p < 0, -1e-20, 1e-20),
        direction_p,
    )

    # Transposed (4, R) ray params; row 3 is padding for the (8,128) tile.
    # inv_d is NOT streamed — the kernel recomputes it from d (identical
    # guarded formula), saving an 8 MB/step operand at 524k lanes.
    def t4(a):
        return jnp.concatenate([a.T, jnp.zeros((1, r), a.dtype)], axis=0)

    o4, d4 = t4(origin_p), t4(direction_p)

    W = planar.width
    if root0 is not None:
        # Two-level mode: each lane starts at its instance's BLAS root; the
        # single-root prefilter does not apply (the TLAS round already
        # slab-tested the instance AABB).
        cur0 = pad_rm(
            jnp.broadcast_to(root0, (r_in,)).astype(jnp.int32), 0
        )
    else:
        cur0 = jnp.zeros((r,), jnp.int32)
    # Root-AABB prefilter (same as ops/traverse_wide.py): planar interior
    # layout keeps bmin planes in lanes [0, 3W), bmax planes in [3W, 6W).
    rb = rows[0]
    valid = rb[0:W] <= rb[3 * W:4 * W]
    big = jnp.float32(_ROOT_INF)
    rmin = jnp.stack([
        jnp.min(jnp.where(valid, rb[k * W:(k + 1) * W], big)) for k in range(3)
    ])
    rmax = jnp.stack([
        jnp.max(jnp.where(valid, rb[(3 + k) * W:(4 + k) * W], -big))
        for k in range(3)
    ])
    lo = (rmin[None, :] - origin_p) * inv_d
    hi = (rmax[None, :] - origin_p) * inv_d
    tn0 = jnp.max(jnp.minimum(lo, hi), axis=1)
    tf0 = jnp.min(jnp.maximum(lo, hi), axis=1)
    hit_root = (tn0 <= tf0) & (tf0 >= 0.0) & (tn0 < t_max_p)
    if root0 is None:
        cur0 = jnp.where(hit_root, cur0, TERM)
    if active_in is not None:
        cur0 = jnp.where(pad_rm(active_in, False), cur0, TERM)
    if r != r_in:
        lane = jnp.arange(r)
        cur0 = jnp.where(lane < r_in, cur0, TERM)

    n_meta = _META_CAND if return_uvt else _META
    meta0 = jnp.zeros((n_meta, r), jnp.float32)
    meta0 = meta0.at[_M_T].set(t_max_p)
    meta0 = meta0.at[_M_TRI].set(-1.0)
    if return_uvt:
        meta0 = meta0.at[_M_CT].set(t_max_p)
        meta0 = meta0.at[_M_CTRI].set(-1.0)

    # Short stack: stream only K rows per step (see STACK_ROWS). Lanes that
    # overflow K re-run below with the full-depth kernel.
    k_stack = min(stack_depth, STACK_ROWS)

    # Root-descent prologue (VKRT_ROOTPRO=1 enables, DEFAULT OFF): the
    # first kernel step is identical for every lane (row 0), so it can run
    # as XLA on the broadcast root row instead of a full-width kernel
    # dispatch. MEASURED A 2.8x REGRESSION on the atrium (3111 vs 1092
    # ms/frame, round-5 A/B): lax.sort on (R, W) plus the (R, W) slab/
    # stack materializations cost ~125 ms/dispatch in XLA against the
    # ~5 ms VMEM-resident kernel step they replace — the same
    # materialization tax that sank the fused shading stage. Kept behind
    # the flag (with its parity tests) as the documented negative result;
    # see docs/PERFORMANCE.md round 5.
    use_rootpro = root0 is None and os.environ.get("VKRT_ROOTPRO") == "1"
    cur_base, meta_base = cur0, meta0

    def restart_state(k_rows):
        """Traversal start state at stack size ``k_rows`` (the overflow
        re-run tiers restart from scratch with the full-depth stack)."""
        if use_rootpro:
            return _root_descend(
                rows, W, k_rows, origin_p, inv_d, t_max_p, cur_base, meta_base
            )
        return cur_base, jnp.zeros((k_rows, r), jnp.int32), meta_base

    cur0, stack0, meta0 = restart_state(k_stack)

    kern = _make_step_kernel(
        cull_backface, any_hit_mode, k_stack, W, candidates=return_uvt,
        n_rows=int(rows.shape[0]), pre_transposed=xla_transpose_rows(),
    )
    step = functools.partial(_step, rows, kern, k_stack, W, n_meta)

    leaf_bits = (W // 2).bit_length() - 1

    def rowid_of(cur):
        vleaf = -cur - 1
        rowid = jnp.where(cur >= 0, cur, vleaf >> leaf_bits)
        return jnp.clip(jnp.where(cur == TERM, 0, rowid), 0, rows.shape[0] - 1)

    rowid0 = rowid_of(cur0)

    chunk_len = 4 if rows.shape[0] < 1024 else CHUNK_LEN

    def run_phase(state, o4, d4, live_floor, step_fn=step):
        if os.environ.get("VKRT_UNROLL") == "1":
            # Attribution experiment: unrolled chunk body (no lax.scan
            # bufferization between steps).
            def chunk(s):
                for _ in range(chunk_len):
                    s = step_fn(o4, d4, *s)
                return s
        else:
            def chunk(s):
                def sbody(ss, _):
                    return step_fn(o4, d4, *ss), None
                s, _ = jax.lax.scan(sbody, s, None, length=chunk_len)
                return s

        if live_floor <= 0:
            cond = lambda s: jnp.any(s[0] != TERM)
        else:
            cond = lambda s: jnp.sum(s[0] != TERM) > live_floor
        return jax.lax.while_loop(cond, chunk, state)

    def compact(state, o4, d4, size):
        """Phase-boundary compaction. Gathers are flat-cost per ROW, so the
        attr-major state is packed to ray-major rows first: ONE (R, 7+M)
        gather covers cur+meta+rays, plus one for the stack — 2 gathers
        instead of 5 (and XLA inserts the transposes it would have needed
        for the axis-1 gathers anyway)."""
        cur, _rowid, meta, stack = state
        full = cur.shape[1]
        (idx,) = jnp.nonzero(cur[0] != TERM, size=size, fill_value=full)
        safe = jnp.minimum(idx, full - 1)
        valid = idx < full
        bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
        packed = jnp.concatenate(
            [cur, bc(meta), bc(o4[0:3]), bc(d4[0:3])], axis=0
        ).T[safe]                                   # (size, 1+M+6) i32
        sub_cur = jnp.where(valid, packed[:, 0], TERM)[None, :]
        # Recompute the row index at the (once-per-phase) boundary.
        sub_rowid = rowid_of(sub_cur)
        fb = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
        m = meta.shape[0]
        sub_meta = fb(packed[:, 1:1 + m].T)
        pad1 = jnp.zeros((1, packed.shape[0]), jnp.float32)
        o4c = jnp.concatenate([fb(packed[:, 1 + m:4 + m].T), pad1], axis=0)
        d4c = jnp.concatenate([fb(packed[:, 4 + m:7 + m].T), pad1], axis=0)
        sub = (sub_cur, sub_rowid, sub_meta, stack[:, safe])
        return sub, o4c, d4c, idx

    def merge(state, sub, idx):
        cur, rowid, meta, stack = state
        meta = meta.T.at[idx].set(sub[2].T, mode="drop").T
        return (cur, rowid, meta, stack)

    state = (cur0[None, :], rowid0[None, :], meta0, stack0)
    if phase_compact and r >= 1 << 15:
        oc, dc = o4, d4
        merges = []
        cur_state = state
        for div in phase_divs():
            size = max(1 << 12, (r // div + BLK - 1) // BLK * BLK)
            cur_state = run_phase(cur_state, oc, dc, size)
            sub, oc, dc, idx = compact(cur_state, oc, dc, size)
            merges.append((cur_state, idx))
            cur_state = sub
        cur_state = run_phase(cur_state, oc, dc, 0)
        for outer, idx in reversed(merges):
            cur_state = merge(outer, cur_state, idx)
        state = cur_state
    else:
        state = run_phase(state, o4, d4, 0)

    if k_stack < stack_depth:
        # ---- full-depth re-run of short-stack overflow lanes -------------
        # Exact fallback: any lane whose sticky _M_OVF flag is set gets its
        # ENTIRE traversal re-run with the full builder-bound stack. The
        # expected overflow fraction is ~0 (the bound is realized only by
        # adversarial near-orderings); both branches below exist for
        # correctness, not speed.
        kern_full = _make_step_kernel(
            cull_backface, any_hit_mode, stack_depth, W,
            candidates=return_uvt, n_rows=int(rows.shape[0]),
            pre_transposed=xla_transpose_rows(),
        )
        step_full = functools.partial(
            _step, rows, kern_full, stack_depth, W, n_meta
        )
        cur_m, rowid_m, meta_m, _stack_m = state
        ovf = meta_m[_M_OVF] > 0.0
        n_ovf = jnp.sum(ovf.astype(jnp.int32))

        def full_rerun(meta_m):
            cur_f, stack_f, meta_f = restart_state(stack_depth)
            cur_s = jnp.where(ovf, cur_f, TERM)[None, :]
            st = (cur_s, rowid_of(cur_s), meta_f, stack_f)
            st = run_phase(st, o4, d4, 0, step_fn=step_full)
            return jnp.where(ovf[None, :], st[2], meta_m)

        size = min(r, max(BLK, (r // 16 + BLK - 1) // BLK * BLK))

        def tier_rerun(meta_m):
            cur_f, stack_f, meta_f = restart_state(stack_depth)
            (idx,) = jnp.nonzero(ovf, size=size, fill_value=r)
            safe = jnp.minimum(idx, r - 1)
            valid = idx < r
            cur_s = jnp.where(valid, cur_f[safe], TERM)[None, :]
            st = (
                cur_s, rowid_of(cur_s), meta_f[:, safe], stack_f[:, safe],
            )
            st = run_phase(
                st, o4[:, safe], d4[:, safe], 0, step_fn=step_full
            )
            return meta_m.T.at[idx].set(st[2].T, mode="drop").T

        if size < r:
            meta_m = jax.lax.cond(
                n_ovf == 0,
                lambda m: m,
                lambda m: jax.lax.cond(
                    n_ovf <= size, tier_rerun, full_rerun, m
                ),
                meta_m,
            )
        else:
            meta_m = jax.lax.cond(
                n_ovf == 0, lambda m: m, full_rerun, meta_m
            )
        state = (cur_m, rowid_m, meta_m, _stack_m)

    _, _, meta, _ = state
    steps = meta[_M_STEPS, :r_in].astype(jnp.int32)
    if return_uvt:
        # Candidate mode: the result is the CANDIDATE slot (nearest
        # alpha-flagged triangle in the window) plus its in-kernel
        # interpolated texture UV; the opaque slot is unused (an alpha tree
        # carries no opaque triangles).
        c_t = meta[_M_CT, :r_in]
        c_tri = meta[_M_CTRI, :r_in].astype(jnp.int32)
        hit = Hit(
            t=jnp.where(c_tri >= 0, c_t, INF),
            tri=c_tri,
            u=meta[_M_CU, :r_in],
            v=meta[_M_CV, :r_in],
            steps=steps,
        )
        return hit, meta[_M_CUVU, :r_in], meta[_M_CUVV, :r_in]
    t_best = meta[_M_T, :r_in]
    tri = meta[_M_TRI, :r_in].astype(jnp.int32)
    return Hit(
        t=jnp.where(tri >= 0, t_best, INF),
        tri=tri,
        u=meta[_M_U, :r_in],
        v=meta[_M_V, :r_in],
        steps=steps,
    )


def closest_hit_fused(
    planar: PlanarScene,
    origin: jax.Array,
    direction: jax.Array,
    active: Optional[jax.Array] = None,
    t_max: Optional[jax.Array] = None,
) -> Hit:
    if t_max is None:
        t_max = jnp.full(origin.shape[:1], INF)
    return _traverse_fused(
        planar, origin, direction, t_max,
        cull_backface=True, any_hit_mode=False, active_in=active,
    )


def any_hit_fused(
    planar: PlanarScene,
    origin: jax.Array,
    direction: jax.Array,
    t_max: jax.Array,
    active: Optional[jax.Array] = None,
) -> jax.Array:
    hit = _traverse_fused(
        planar, origin, direction, t_max,
        cull_backface=False, any_hit_mode=True, active_in=active,
    )
    return hit.tri >= 0


def enabled() -> bool:
    """Fused path policy: TPU by default, off via VKRT_FUSED=0, forced on
    (interpret mode, for tests) via VKRT_FUSED=1."""
    v = os.environ.get("VKRT_FUSED", "")
    if v == "0":
        return False
    if v == "1":
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
