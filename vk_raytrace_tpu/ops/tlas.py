"""Two-level acceleration: instance table over shared per-mesh wide BVHs.

The analog of the reference's TLAS/BLAS split (``accelstruct.cpp:132-162``):
each mesh keeps ONE object-space 8-wide BVH (``ops/bvh8.py`` layout, all
meshes concatenated into a single row table), and instances are {3×4
transform, mesh id} rows. N instances of a mesh cost N table rows + the
shared BLAS — not N× geometry, as the round-1 world-space baking did.

TPU-native traversal shape: instead of interleaving TLAS nodes into the
per-ray stack (which would force a space-tag on every stack entry), the top
level runs as **candidate rounds**: per round, every ray picks its nearest
not-yet-processed instance whose world AABB it enters closer than its
current best hit (a fused slab test over the whole instance table — the
instance count is small next to the triangle count), transforms into object
space, and runs the normal wide-BVH traversal from that instance's BLAS
root with ``t_max = t_best``. Rounds repeat until no ray has a candidate;
ray-overlap counts are tiny (1-3) in practice, so this costs one or two
extra traversal passes, each masked to the lanes that still need it.

World-space ``t`` is preserved exactly by NOT renormalizing the
object-space direction (t parametrization is invariant under the affine
map), so hits from different instances compare directly.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.instances import InstanceTable, MeshPool
from .bvh8 import WideScene, _stack_bound
from .traverse import INF, AlphaCtx, Hit
from .traverse_wide import _traverse_wide

_NEG = jnp.float32(-3.0e38)


class InstancedAccel(NamedTuple):
    """Traversal-ready two-level structure (a pytree; all static info lives
    in ``blas.stack_depth``)."""

    blas: WideScene          # concatenated per-mesh row tables
    mesh_root: jax.Array     # (M,) i32 absolute root row of each mesh
    inst: InstanceTable
    # Planar table for the fused Pallas BLAS traversal (per-lane roots);
    # used for the opaque path when no alpha machinery is needed. Built
    # natively at the production width (16/32-wide — ops/traverse_fused.py
    # ``planar_width``) with its own root table when the native builder is
    # available; falls back to a planarized copy of the 8-wide table.
    blas_planar: object | None = None
    # (M,) i32 root rows of ``blas_planar`` (differs from ``mesh_root``
    # when the planar table is the native wide build).
    mesh_root_planar: jax.Array | None = None
    # (I,) bool: instance's mesh contains >=1 alpha-flagged triangle. With
    # an alpha_ctx the traversal splits: all-opaque instances ride the
    # fused kernel, alpha-carrying ones the XLA body in a window pruned by
    # the opaque result (the two-level analog of the opaque/alpha tree
    # split of ops/bvh8.py::split_scene).
    inst_alpha: jax.Array | None = None


def _classify_interior(rows: np.ndarray) -> np.ndarray:
    """Mark interior rows by walking refs from the root (row layout
    interleaves interior/leaf rows in build order)."""
    n = len(rows)
    interior = np.zeros(n, bool)
    stack = [0]
    while stack:
        rid = stack.pop()
        if interior[rid]:
            continue
        interior[rid] = True
        row = rows[rid]
        for c in range(8):
            if row[c * 6] <= row[c * 6 + 3]:
                ref = int(row[48 + c])
                if ref >= 0:
                    stack.append(ref)
    return interior


def _classify_interior_planar(rows: np.ndarray, width: int) -> np.ndarray:
    """Interior-row mask for the native planar layout (bounds at lanes
    ``[k*width + c]``, refs at ``[6*width + c]``; runtime/native.cpp).
    Vectorized frontier BFS (the planar-layout analog of
    ``traverse_fused._interior_mask``)."""
    n = len(rows)
    valid = rows[:, 0:width] <= rows[:, 3 * width : 4 * width]
    refs = rows[:, 6 * width : 7 * width]
    interior = np.zeros(n, bool)
    frontier = np.asarray([0], np.int64)
    while frontier.size:
        interior[frontier] = True
        r = refs[frontier]
        kids = r[valid[frontier] & (r >= 0.5)].astype(np.int64)
        kids = np.unique(kids)
        frontier = kids[~interior[kids]]
    return interior


def build_instanced_accel(pool: MeshPool, inst: InstanceTable) -> InstancedAccel:
    """Build each mesh's wide BVH (object space, pool-global triangle ids)
    and concatenate with ref fixups."""
    from .bvh8 import collapse_bvh8
    from .bvh import build_bvh
    from .. import runtime

    geom = pool.geometry
    pos = np.asarray(geom.positions)
    idx = np.asarray(geom.indices)
    uvs = np.asarray(geom.uv)
    flg = np.asarray(geom.tri_flags)

    tables = []
    roots = []
    base = 0
    depth = 1
    n_mesh = len(pool.tri_start)
    for m in range(n_mesh):
        lo = int(pool.tri_start[m])
        cnt = int(pool.tri_count[m])
        sl = slice(lo, lo + cnt)
        ids = np.arange(lo, lo + cnt, dtype=np.int32)  # pool-global tri ids
        rows = runtime.build_bvh8_rows(pos, idx[sl], uvs, flg[sl], tri_ids=ids)
        if rows is None:
            sub = geom._replace(
                indices=idx[sl],
                tri_material=np.asarray(geom.tri_material)[sl],
                tri_flags=flg[sl],
            )
            bvh = build_bvh(sub.positions, sub.indices)
            rows = np.asarray(collapse_bvh8(bvh, sub, tri_ids=ids).rows)
        else:
            rows = np.asarray(rows)
        depth = max(depth, _stack_bound(rows))
        if base:
            interior = _classify_interior(rows)
            valid = rows[:, 0:48:6] <= rows[:, 3:48:6]        # (n, 8)
            refs = rows[:, 48:56]
            fixed = np.where(refs >= 0, refs + base, refs - 4 * base)
            rows[:, 48:56] = np.where(interior[:, None] & valid, fixed, refs)
        roots.append(base)
        base += len(rows)
        tables.append(rows)
    runtime._check_ref_ceiling(base, 4)  # combined table shares one ref space
    all_rows = np.concatenate(tables, axis=0)
    from .traverse_fused import PlanarScene, planar_width, planarize

    mesh_alpha = np.zeros(n_mesh, bool)
    for m in range(n_mesh):
        lo = int(pool.tri_start[m])
        cnt = int(pool.tri_count[m])
        mesh_alpha[m] = bool(np.any(flg[lo:lo + cnt] & 2))
    blas = WideScene(rows=all_rows, stack_depth=depth)

    # Fused-path BLAS at the production width (16-wide 512B rows trace ~1.4x
    # fewer steps than 8-wide for the same flat per-row gather cost): native
    # per-mesh planar builds concatenated with planar-layout ref fixups.
    # Interior refs are row ids (+pbase); leaf refs encode
    # -(leaf_row*8 + cnt) (native.cpp build_bvh16), so they shift by 8*pbase.
    pw = planar_width()
    ptables, proots = [], []
    pbase, pdepth = 0, 1
    for m in range(n_mesh):
        lo = int(pool.tri_start[m])
        cnt = int(pool.tri_count[m])
        sl = slice(lo, lo + cnt)
        ids = np.arange(lo, lo + cnt, dtype=np.int32)
        out = runtime.build_planar_rows(
            pos, idx[sl], uvs, flg[sl], tri_ids=ids, width=pw
        )
        if out is None:
            ptables = None
            break
        prow, pd = out
        prow = np.asarray(prow)
        pdepth = max(pdepth, pd)
        if pbase:
            p_int = _classify_interior_planar(prow, pw)
            valid = prow[:, 0:pw] <= prow[:, 3 * pw : 4 * pw]
            refs = prow[:, 6 * pw : 7 * pw]
            # Leaf refs encode -(row*kLeafMax + cnt-1 + 1) with
            # kLeafMax = width/2 (native.cpp make_leaf), so shifting the
            # leaf row by pbase shifts the ref by pbase*(width/2).
            fixed = np.where(refs >= 0, refs + pbase, refs - (pw // 2) * pbase)
            prow[:, 6 * pw : 7 * pw] = np.where(
                p_int[:, None] & valid, fixed, refs
            )
        proots.append(pbase)
        pbase += len(prow)
        ptables.append(prow)
    if ptables is not None:
        runtime._check_ref_ceiling(pbase, pw // 2)
        planar = PlanarScene(
            rows=np.concatenate(ptables, axis=0),
            stack_depth=pdepth,
            width=pw,
        )
        planar_roots = np.asarray(proots, np.int32)
    else:  # no native builder: planarized copy of the 8-wide table
        planar = planarize(blas, roots=roots)
        planar_roots = np.asarray(roots, np.int32)
    return InstancedAccel(
        blas=blas,
        mesh_root=np.asarray(roots, np.int32),
        inst=inst,
        blas_planar=planar,
        mesh_root_planar=planar_roots,
        inst_alpha=mesh_alpha[np.asarray(inst.mesh_id)],
    )


def _instance_slab(inst: InstanceTable, origin, direction, t_best, mask=None):
    """Entry distance of each ray into each instance AABB: (R, I) f32,
    INF where missed, not closer than the ray's best hit, or outside the
    optional (I,) instance ``mask``."""
    inv_d = 1.0 / jnp.where(
        jnp.abs(direction) < 1e-20,
        jnp.where(direction < 0, -1e-20, 1e-20),
        direction,
    )
    o = origin[:, None, :]       # (R, 1, 3)
    i = inv_d[:, None, :]
    lo = (inst.aabb_min[None, :, :] - o) * i   # (R, I, 3)
    hi = (inst.aabb_max[None, :, :] - o) * i
    tn = jnp.max(jnp.minimum(lo, hi), axis=-1)
    tf = jnp.min(jnp.maximum(lo, hi), axis=-1)
    hit = (tn <= tf) & (tf >= 0.0) & (tn < t_best[:, None])
    if mask is not None:
        hit = hit & mask[None, :]
    return jnp.where(hit, tn, INF)


# Above this instance count the top level stops materializing the (R, I)
# entry table (1 GB at R=512k, I=512) and scans the instance table in
# chunks instead: slab math is VPU-cheap next to HBM traffic (the measured
# machine model, docs/PERFORMANCE.md), so recomputing per round costs ~ms
# while the working set stays (R, chunk). VKRT_TLAS_SCAN=1 forces the scan
# path (tests).
_DENSE_I_MAX = 512
_SCAN_CHUNK = 128


def _scan_candidate(
    inst: InstanceTable, origin, direction, t_best, last_t, last_id, mask
):
    """Per ray: the lexicographically smallest (entry_t, id) strictly after
    (last_t, last_id) with entry_t < t_best — computed by a chunked
    ``lax.scan`` over the instance table, never materializing (R, I).
    Semantics identical to ``_next_candidate`` over ``_instance_slab``."""
    n = inst.aabb_min.shape[0]
    chunk = min(_SCAN_CHUNK, max(int(np.rint(2 ** np.ceil(np.log2(max(n, 1))))), 1))
    pad = (-n) % chunk
    # Padded entries carry an empty AABB (min > max): slab test always misses.
    amin = jnp.concatenate(
        [inst.aabb_min, jnp.ones((pad, 3), inst.aabb_min.dtype)], axis=0
    )
    amax = jnp.concatenate(
        [inst.aabb_max, jnp.zeros((pad, 3), inst.aabb_max.dtype)], axis=0
    )
    m = jnp.ones((n,), bool) if mask is None else mask
    m = jnp.concatenate([m, jnp.zeros((pad,), bool)], axis=0)
    n_chunks = (n + pad) // chunk

    inv_d = 1.0 / jnp.where(
        jnp.abs(direction) < 1e-20,
        jnp.where(direction < 0, -1e-20, 1e-20),
        direction,
    )
    r = origin.shape[0]

    def body(carry, xs):
        bt, bi = carry
        cmin, cmax, cm, base = xs
        lo = (cmin[None, :, :] - origin[:, None, :]) * inv_d[:, None, :]
        hi = (cmax[None, :, :] - origin[:, None, :]) * inv_d[:, None, :]
        tn = jnp.max(jnp.minimum(lo, hi), axis=-1)       # (R, chunk)
        tf = jnp.min(jnp.maximum(lo, hi), axis=-1)
        ids = base + jax.lax.broadcasted_iota(jnp.int32, tn.shape, 1)
        ok = (tn <= tf) & (tf >= 0.0) & (tn < t_best[:, None]) & cm[None, :]
        after = (tn > last_t[:, None]) | (
            (tn == last_t[:, None]) & (ids > last_id[:, None])
        )
        key = jnp.where(ok & after, tn, INF)
        ct = jnp.min(key, axis=1)
        ci = base + jnp.argmin(key, axis=1).astype(jnp.int32)
        better = (ct < bt) | ((ct == bt) & (ci < bi))
        return (jnp.where(better, ct, bt), jnp.where(better, ci, bi)), None

    init = (jnp.full((r,), INF), jnp.full((r,), 2**30, jnp.int32))
    xs = (
        amin.reshape(n_chunks, chunk, 3),
        amax.reshape(n_chunks, chunk, 3),
        m.reshape(n_chunks, chunk),
        jnp.arange(n_chunks, dtype=jnp.int32) * chunk,
    )
    (nt, ni), _ = jax.lax.scan(body, init, xs)
    return nt, jnp.where(nt < INF, ni, -1)


def _next_candidate(entry, last_t, last_id):
    """Per ray: the lexicographically smallest (entry_t, id) strictly after
    (last_t, last_id) — rays inside several AABBs see equal entry times, so
    the id breaks ties to enumerate every overlap exactly once."""
    ids = jax.lax.broadcasted_iota(jnp.int32, entry.shape, 1)
    after = (entry > last_t[:, None]) | (
        (entry == last_t[:, None]) & (ids > last_id[:, None])
    )
    key = jnp.where(after & (entry < INF), entry, INF)
    nt = jnp.min(key, axis=1)
    ni = jnp.argmin(key, axis=1).astype(jnp.int32)
    return nt, jnp.where(nt < INF, ni, -1)


def _transform_rays(inst: InstanceTable, iid, origin, direction):
    w2o = inst.world_to_object[jnp.maximum(iid, 0)]     # (R, 3, 4)
    m = w2o[:, :, :3]
    o_obj = jnp.einsum("rij,rj->ri", m, origin) + w2o[:, :, 3]
    d_obj = jnp.einsum("rij,rj->ri", m, direction)      # NOT normalized
    return o_obj, d_obj


def _two_level_pass(
    accel: InstancedAccel,
    tri_material,
    origin,
    direction,
    t_max,
    seed,
    alpha_ctx: Optional[AlphaCtx],
    cull_backface: bool,
    any_hit_mode: bool,
    act: jax.Array,
    inst_mask: Optional[jax.Array],
    use_fused: bool,
):
    """Candidate rounds over the instances selected by ``inst_mask``.

    The (R, I) slab test runs ONCE per traversal (hoisted out of the round
    loop as an XLA loop constant): ``t_best`` only ever decreases, so every
    later round's candidate set is the initial entry table masked by the
    current best hit — no recompute. Above ``_DENSE_I_MAX`` instances the
    hoisted (R, I) table would not fit; candidate selection switches to the
    chunked ``_scan_candidate`` (same semantics, (R, chunk) working set)."""
    r = origin.shape[0]
    n_inst = accel.inst.aabb_min.shape[0]
    use_scan = (
        n_inst > _DENSE_I_MAX or os.environ.get("VKRT_TLAS_SCAN") == "1"
    )

    def make_loop(origin_l, direction_l, act_l, entry0_l):
        """Candidate-rounds loop closed over a lane set (full width or a
        compacted survivor tier — the per-lane math is width-invariant)."""

        def _candidate(t_best, last_t, last_id):
            if use_scan:
                return _scan_candidate(
                    accel.inst, origin_l, direction_l, t_best, last_t,
                    last_id, inst_mask,
                )
            entry = jnp.where(entry0_l < t_best[:, None], entry0_l, INF)
            return _next_candidate(entry, last_t, last_id)

        def _has_mask(tri, nid):
            has = act_l & (nid >= 0)
            if any_hit_mode:
                has = has & (tri < 0)  # stop after any accepted hit
            return has

        # The candidate for round k is computed at the END of round k-1
        # (and once before the loop), so each round runs candidate
        # selection once — the loop condition inspects the carried result.
        def round_body(carry):
            t_best, tri, u, v, ibest, seed, last_t, last_id, steps, nt, nid = carry
            has = _has_mask(tri, nid)
            o_obj, d_obj = _transform_rays(accel.inst, nid, origin_l, direction_l)
            mesh = accel.inst.mesh_id[jnp.maximum(nid, 0)]
            from . import traverse_fused as tf_

            if use_fused:
                roots_tbl = (
                    accel.mesh_root_planar
                    if accel.mesh_root_planar is not None
                    else accel.mesh_root
                )
                hit = tf_._traverse_fused(
                    accel.blas_planar, o_obj, d_obj, t_best,
                    cull_backface=cull_backface, any_hit_mode=any_hit_mode,
                    active_in=has, root0=roots_tbl[mesh],
                )
            else:
                hit, seed = _traverse_wide(
                    accel.blas, tri_material, o_obj, d_obj, t_best, seed,
                    alpha_ctx, cull_backface=cull_backface,
                    any_hit_mode=any_hit_mode, active_in=has,
                    root0=accel.mesh_root[mesh],
                )
            upd = has & (hit.tri >= 0)
            t_best = jnp.where(upd, hit.t, t_best)
            tri = jnp.where(upd, hit.tri, tri)
            u = jnp.where(upd, hit.u, u)
            v = jnp.where(upd, hit.v, v)
            ibest = jnp.where(upd, nid, ibest)
            last_t = jnp.where(has, nt, last_t)
            last_id = jnp.where(has, nid, last_id)
            steps = steps + hit.steps + has.astype(jnp.int32)
            nt2, nid2 = _candidate(t_best, last_t, last_id)
            return t_best, tri, u, v, ibest, seed, last_t, last_id, steps, nt2, nid2

        return _candidate, _has_mask, round_body

    entry0 = (
        None if use_scan
        else _instance_slab(accel.inst, origin, direction, t_max, inst_mask)
    )
    cand_f, has_f, body_f = make_loop(origin, direction, act, entry0)
    nt0, nid0 = cand_f(
        t_max, jnp.full((r,), _NEG), jnp.full((r,), -1, jnp.int32)
    )
    init = (
        t_max,
        jnp.full((r,), -1, jnp.int32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), jnp.int32),
        seed,
        jnp.full((r,), _NEG),
        jnp.full((r,), -1, jnp.int32),
        jnp.zeros((r,), jnp.int32),
        nt0,
        nid0,
    )

    # Tiered rounds (VKRT_TLAS_TIERS=0 disables): instance-overlap counts
    # are heavy-tailed — most lanes process 1-3 candidates, but one ray
    # down an instance-lined axis (bistro's tree rows) can cross 10+
    # AABBs, and every round costs a FULL-WIDTH BLAS traversal while only
    # the tail lanes still need it (measured 0.141 Mrays/s on bistro,
    # 27x below the flat path — docs/PERFORMANCE.md round 5). Run rounds
    # at full width only while the live set is dense, then compact the
    # survivors to r/8 (one gather per carry, exact per-lane results) and
    # finish narrow — the tiered-tail pattern of integrator/wavefront.py.
    tiers_on = (
        os.environ.get("VKRT_TLAS_TIERS", "1") != "0" and r >= (1 << 14)
    )
    if not tiers_on:
        out = jax.lax.while_loop(
            lambda c: jnp.any(has_f(c[1], c[10])), body_f, init
        )
        t_best, tri, u, v, ibest, seed, _, _, steps = out[:9]
        return t_best, tri, u, v, ibest, seed, steps

    sub = max(4096, r // 8)
    out = jax.lax.while_loop(
        lambda c: jnp.sum(has_f(c[1], c[10])) > sub, body_f, init
    )
    live = has_f(out[1], out[10])
    (idx,) = jnp.nonzero(live, size=sub, fill_value=r)
    safe = jnp.minimum(idx, r - 1)
    valid = idx < r
    sub_init = tuple(x[safe] for x in out)
    entry0_s = None if use_scan else entry0[safe]
    cand_s, has_s, body_s = make_loop(
        origin[safe], direction[safe], valid, entry0_s
    )
    sub_out = jax.lax.while_loop(
        lambda c: jnp.any(has_s(c[1], c[10])), body_s, sub_init
    )
    sc = lambda full_a, sub_a: full_a.at[idx].set(sub_a, mode="drop")
    t_best = sc(out[0], sub_out[0])
    tri = sc(out[1], sub_out[1])
    u = sc(out[2], sub_out[2])
    v = sc(out[3], sub_out[3])
    ibest = sc(out[4], sub_out[4])
    seed = sc(out[5], sub_out[5])
    steps = sc(out[8], sub_out[8])
    return t_best, tri, u, v, ibest, seed, steps


def _two_level(
    accel: InstancedAccel,
    tri_material,
    origin,
    direction,
    t_max,
    seed,
    alpha_ctx: Optional[AlphaCtx],
    cull_backface: bool,
    any_hit_mode: bool,
    active: Optional[jax.Array],
):
    r = origin.shape[0]
    # Lift host-numpy tables for eager callers (no-op under jit).
    accel = jax.tree.map(jnp.asarray, accel)
    if seed is None:
        seed = jnp.zeros((r,), jnp.uint32)
    act = jnp.ones((r,), bool) if active is None else active
    from . import traverse_fused as tf_

    fused_ok = accel.blas_planar is not None and tf_.enabled()

    if alpha_ctx is None or accel.inst_alpha is None:
        # One pass over ALL instances: pick()/no-alpha scenes (fused), or a
        # pre-split accel with an alpha_ctx (XLA inline test, round-2 path).
        t_best, tri, u, v, ibest, seed, steps = _two_level_pass(
            accel, tri_material, origin, direction, t_max, seed, alpha_ctx,
            cull_backface, any_hit_mode, act, None,
            fused_ok and alpha_ctx is None,
        )
        t_out = jnp.where(tri >= 0, t_best, INF)
        return Hit(t=t_out, tri=tri, u=u, v=v, steps=steps, inst=ibest), seed

    # Opaque/alpha instance split (the two-level analog of bvh8.split_scene):
    # all-opaque instances ride the fused kernel; alpha-carrying instances
    # run the XLA body with the stochastic test, windowed by the opaque
    # result so the slow path only covers the remaining interval.
    t_o, tri_o, u_o, v_o, i_o, seed, st_o = _two_level_pass(
        accel, tri_material, origin, direction, t_max, seed, None,
        cull_backface, any_hit_mode, act, ~accel.inst_alpha, fused_ok,
    )
    if any_hit_mode:
        # Occluded by the opaque set already? Alpha pass only for the rest.
        act_a = act & (tri_o < 0)
        t_a, tri_a, u_a, v_a, i_a, seed, st_a = _two_level_pass(
            accel, tri_material, origin, direction, t_max, seed, alpha_ctx,
            cull_backface, any_hit_mode, act_a, accel.inst_alpha, False,
        )
        tri = jnp.where(tri_o >= 0, tri_o, tri_a)
        t_best = jnp.where(tri_o >= 0, t_o, t_a)
        return (
            Hit(
                t=jnp.where(tri >= 0, t_best, INF), tri=tri,
                u=jnp.where(tri_o >= 0, u_o, u_a),
                v=jnp.where(tri_o >= 0, v_o, v_a),
                steps=st_o + st_a,
                inst=jnp.where(tri_o >= 0, i_o, i_a),
            ),
            seed,
        )
    t_a, tri_a, u_a, v_a, i_a, seed, st_a = _two_level_pass(
        accel, tri_material, origin, direction, t_o, seed, alpha_ctx,
        cull_backface, any_hit_mode, act, accel.inst_alpha, False,
    )
    nearer = (tri_a >= 0) & (t_a < t_o)
    tri = jnp.where(nearer, tri_a, tri_o)
    t_best = jnp.where(nearer, t_a, t_o)
    return (
        Hit(
            t=jnp.where(tri >= 0, t_best, INF), tri=tri,
            u=jnp.where(nearer, u_a, u_o),
            v=jnp.where(nearer, v_a, v_o),
            steps=st_o + st_a,
            inst=jnp.where(nearer, i_a, i_o),
        ),
        seed,
    )


def closest_hit_instanced(
    accel: InstancedAccel,
    tri_material,
    origin,
    direction,
    seed=None,
    alpha_ctx: Optional[AlphaCtx] = None,
    active=None,
    t_max=None,
):
    if t_max is None:
        t_max = jnp.full(origin.shape[:1], INF)
    return _two_level(
        accel, tri_material, origin, direction, t_max, seed, alpha_ctx,
        cull_backface=True, any_hit_mode=False, active=active,
    )


def any_hit_instanced(
    accel: InstancedAccel,
    tri_material,
    origin,
    direction,
    t_max,
    seed=None,
    alpha_ctx: Optional[AlphaCtx] = None,
    active=None,
):
    hit, seed = _two_level(
        accel, tri_material, origin, direction, t_max, seed, alpha_ctx,
        cull_backface=False, any_hit_mode=True, active=active,
    )
    return hit.tri >= 0, seed
