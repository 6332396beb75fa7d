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
    # Per-mesh opaque-only / alpha-only planar tables (the BLAS-level
    # analog of bvh8.split_scene): with these present the alpha-ctx
    # traversal runs the fused kernel over the OPAQUE SUBSET of every
    # instance (tree trunks no longer ride the slow XLA body with the
    # canopies) and a fused candidate-rounds alpha pass over only the
    # alpha subsets (``_two_level_alpha_pass``). Meshes with no triangle
    # in a subset carry root -1 in the corresponding root table.
    blas_planar_opq: object | None = None
    mesh_root_opq: jax.Array | None = None
    blas_planar_alp: object | None = None
    mesh_root_alp: jax.Array | None = None
    # (I,) bool: instance's mesh contains >=1 opaque triangle.
    inst_opaque: jax.Array | None = None
    # (I, 3) world AABBs of each instance's opaque / alpha triangle
    # subset (tighter than the full-mesh ``inst.aabb_*`` — a bistro
    # tree's canopy box excludes the trunk): candidate rounds over a
    # subset table use the matching subset boxes.
    inst_aabb_opq_min: jax.Array | None = None
    inst_aabb_opq_max: jax.Array | None = None
    inst_aabb_alp_min: jax.Array | None = None
    inst_aabb_alp_max: jax.Array | None = None


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

    def planar_concat(sel):
        """Concatenated per-mesh native planar tables over the triangles
        selected by the pool-global mask ``sel`` (None = all). Meshes with
        no selected triangle get root -1. Returns (None, None) when the
        native builder is unavailable.

        Leaf refs encode -(row*kLeafMax + cnt-1 + 1) with kLeafMax =
        width/2 (native.cpp make_leaf), so shifting the leaf row by the
        concat base shifts the ref by base*(width/2)."""
        ptables, proots = [], []
        pbase, pdepth = 0, 1
        for m in range(n_mesh):
            lo = int(pool.tri_start[m])
            cnt = int(pool.tri_count[m])
            ids = np.arange(lo, lo + cnt, dtype=np.int32)
            if sel is not None:
                ids = ids[sel[lo : lo + cnt]]
            if ids.size == 0:
                proots.append(-1)
                continue
            out = runtime.build_planar_rows(
                pos, idx[ids], uvs, flg[ids], tri_ids=ids, width=pw
            )
            if out is None:
                return None, None
            prow, pd = out
            prow = np.asarray(prow)
            pdepth = max(pdepth, pd)
            if pbase:
                p_int = _classify_interior_planar(prow, pw)
                valid = prow[:, 0:pw] <= prow[:, 3 * pw : 4 * pw]
                refs = prow[:, 6 * pw : 7 * pw]
                fixed = np.where(
                    refs >= 0, refs + pbase, refs - (pw // 2) * pbase
                )
                prow[:, 6 * pw : 7 * pw] = np.where(
                    p_int[:, None] & valid, fixed, refs
                )
            proots.append(pbase)
            pbase += len(prow)
            ptables.append(prow)
        runtime._check_ref_ceiling(pbase, pw // 2)
        scene = PlanarScene(
            rows=np.concatenate(ptables, axis=0),
            stack_depth=pdepth,
            width=pw,
        )
        return scene, np.asarray(proots, np.int32)

    planar, planar_roots = planar_concat(None)
    if planar is None:  # no native builder: planarized copy of the 8-wide table
        planar = planarize(blas, roots=roots)
        planar_roots = np.asarray(roots, np.int32)

    # Opaque/alpha SUBSET tables (the BLAS-level split_scene analog) — only
    # worth building when the scene mixes the two (native builder required;
    # without it the traversal keeps the instance-level split).
    alpha_sel = (flg & 2) != 0
    split = dict(
        blas_planar_opq=None, mesh_root_opq=None,
        blas_planar_alp=None, mesh_root_alp=None, inst_opaque=None,
        inst_aabb_opq_min=None, inst_aabb_opq_max=None,
        inst_aabb_alp_min=None, inst_aabb_alp_max=None,
    )
    if bool(alpha_sel.any()) and bool((~alpha_sel).any()):
        opq_planar, opq_roots = planar_concat(~alpha_sel)
        alp_planar, alp_roots = planar_concat(alpha_sel)
        if opq_planar is not None and alp_planar is not None:
            mesh_opq = np.zeros(n_mesh, bool)
            for m in range(n_mesh):
                lo = int(pool.tri_start[m])
                cnt = int(pool.tri_count[m])
                mesh_opq[m] = bool(np.any(~alpha_sel[lo : lo + cnt]))
            mid = np.asarray(inst.mesh_id)
            omin_o, omax_o = _subset_obj_aabb(pos, idx, pool, ~alpha_sel)
            omin_a, omax_a = _subset_obj_aabb(pos, idx, pool, alpha_sel)
            io_min, io_max = _inst_world_aabb(inst, omin_o, omax_o)
            ia_min, ia_max = _inst_world_aabb(inst, omin_a, omax_a)
            split = dict(
                blas_planar_opq=opq_planar, mesh_root_opq=opq_roots,
                blas_planar_alp=alp_planar, mesh_root_alp=alp_roots,
                inst_opaque=mesh_opq[mid],
                inst_aabb_opq_min=io_min, inst_aabb_opq_max=io_max,
                inst_aabb_alp_min=ia_min, inst_aabb_alp_max=ia_max,
            )

    return InstancedAccel(
        blas=blas,
        mesh_root=np.asarray(roots, np.int32),
        inst=inst,
        blas_planar=planar,
        mesh_root_planar=planar_roots,
        inst_alpha=mesh_alpha[np.asarray(inst.mesh_id)],
        **split,
    )


def _subset_obj_aabb(pos, idx, pool, sel):
    """Object-space AABB of each mesh's selected triangle subset; meshes
    whose subset is empty or complete keep the full-mesh bounds (empty ones
    are masked out of every pass that uses these boxes)."""
    n_mesh = len(pool.tri_start)
    mn = np.array(pool.aabb_min, np.float32, copy=True)
    mx = np.array(pool.aabb_max, np.float32, copy=True)
    for m in range(n_mesh):
        lo = int(pool.tri_start[m])
        cnt = int(pool.tri_count[m])
        s = sel[lo : lo + cnt]
        if not s.any() or s.all():
            continue
        v = pos[np.asarray(idx[lo : lo + cnt][s]).ravel()]
        mn[m] = v.min(axis=0)
        mx[m] = v.max(axis=0)
    return mn, mx


def _inst_world_aabb(inst: InstanceTable, omin: np.ndarray, omax: np.ndarray):
    """World AABB of each instance for the given per-mesh object-space
    bounds (8 transformed corners — same construction as the full-mesh
    ``inst.aabb_*`` of models/instances.py)."""
    o2w = np.asarray(inst.object_to_world, np.float32)
    mid = np.asarray(inst.mesh_id)
    mn, mx = omin[mid], omax[mid]                      # (I, 3)
    bmin = np.full_like(mn, np.inf)
    bmax = np.full_like(mn, -np.inf)
    for k in range(8):
        pick = np.asarray([(k >> a) & 1 for a in range(3)], bool)
        c = np.where(pick, mx, mn)
        w = np.einsum("iab,ib->ia", o2w[:, :, :3], c) + o2w[:, :, 3]
        bmin = np.minimum(bmin, w)
        bmax = np.maximum(bmax, w)
    return bmin.astype(np.float32), bmax.astype(np.float32)


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


# Bound on state-machine rounds in the fused two-level alpha pass: worst
# case is (instances overlapped along one ray) + (stochastic rejections,
# flat-path bound 24) — the loop exits as soon as no lane has a candidate.
_A_MAX_ROUNDS = 64


def _two_level_alpha_pass(
    accel: InstancedAccel,
    pack,
    origin,
    direction,
    t_max,
    seed,
    act,
    any_hit_mode: bool,
    cull_backface: bool,
):
    """Fused candidate rounds over the alpha-carrying instances — the
    two-level analog of ops/traverse_alpha.py, with instance enumeration
    and stochastic-rejection window advance folded into ONE state machine:

    each live lane holds a current candidate instance (entry-t order, the
    ``_next_candidate`` enumeration) and a window start ``t_lo`` inside it.
    A round traverses the instance's alpha-only BLAS (fused kernel,
    candidate mode) in ``(t_lo, t_best)``; the nearest alpha surface takes
    one stochastic test (``_alpha_accept``): pass -> record the hit, move
    to the next instance; reject -> advance ``t_lo`` just past it and stay;
    miss -> next instance. Testing in strict t-order per instance and
    entry-order across instances is distribution-identical to the
    reference's encounter-order any-hit shader (surfaces pass independently
    with probability ``opacity`` — see traverse_alpha's module docstring).

    The live set decays fast (most lanes carry one candidate and retire in
    1-2 rounds), so the machine runs STAGED WIDTHS — full width only while
    the live count exceeds r/4, then argsort-compacts the survivors and
    continues at r/4, then r/16 (the tiered-tail pattern of
    integrator/wavefront.py; exact per-lane results). A bistro frame trace
    with a single-width machine showed it at full 262k-lane width for
    every round — per-round carry copies and the (R, I) candidate argmin
    were the top device costs of the 16.3 s frame.

    Returns full-width ``(t, tri, u, v, inst_id, seed, steps)``; ``tri`` is
    -1 (t = window end) where no alpha surface accepted.
    """
    from . import traverse_fused as tf_
    from .traverse_alpha import _ADV_ABS, _ADV_REL, _alpha_accept

    r = origin.shape[0]
    n_inst = accel.inst.aabb_min.shape[0]
    use_scan = (
        n_inst > _DENSE_I_MAX or os.environ.get("VKRT_TLAS_SCAN") == "1"
    )
    inst_view = accel.inst._replace(
        aabb_min=accel.inst_aabb_alp_min, aabb_max=accel.inst_aabb_alp_max
    )
    roots = jnp.maximum(accel.mesh_root_alp, 0)
    mask = accel.inst_alpha

    def machine(origin_l, direction_l, t_lim_l, seed_l, act_l, entry0_l):
        rl = origin_l.shape[0]

        def _candidate(t_best, last_t, last_id):
            if use_scan:
                return _scan_candidate(
                    inst_view, origin_l, direction_l, t_best, last_t,
                    last_id, mask,
                )
            entry = jnp.where(entry0_l < t_best[:, None], entry0_l, INF)
            return _next_candidate(entry, last_t, last_id)

        def has_f(tri, nid):
            h = act_l & (nid >= 0)
            if any_hit_mode:
                h = h & (tri < 0)      # first accepted surface occludes
            return h

        nt0, nid0 = _candidate(
            t_lim_l, jnp.full((rl,), _NEG), jnp.full((rl,), -1, jnp.int32)
        )
        init = (
            t_lim_l,                              # 0: t_best (window end)
            jnp.full((rl,), -1, jnp.int32),       # 1: accepted tri
            jnp.zeros((rl,), jnp.float32),        # 2: u
            jnp.zeros((rl,), jnp.float32),        # 3: v
            jnp.zeros((rl,), jnp.int32),          # 4: accepted instance
            seed_l,                               # 5
            jnp.full((rl,), _NEG),                # 6: last_t (enumeration)
            jnp.full((rl,), -1, jnp.int32),       # 7: last_id
            jnp.zeros((rl,), jnp.int32),          # 8: steps
            nt0,                                  # 9: candidate entry t
            nid0,                                 # 10: candidate instance
            jnp.zeros((rl,), jnp.float32),        # 11: t_lo within candidate
            jnp.int32(0),                         # 12: round counter
        )

        def cond(c):
            return jnp.any(has_f(c[1], c[10])) & (c[12] < _A_MAX_ROUNDS)

        def body(c):
            (t_best, tri, u, v, ibest, seed, last_t, last_id, steps,
             nt, nid, t_lo, rounds) = c
            has = has_f(tri, nid)
            o2 = origin_l + direction_l * t_lo[:, None]
            o_obj, d_obj = _transform_rays(accel.inst, nid, o2, direction_l)
            mesh = accel.inst.mesh_id[jnp.maximum(nid, 0)]
            win = jnp.maximum(t_best - t_lo, 0.0)
            hit, uvu, uvv = tf_._traverse_fused(
                accel.blas_planar_alp, o_obj, d_obj, win,
                cull_backface=cull_backface, any_hit_mode=False,
                active_in=has, root0=roots[mesh], return_uvt=True,
                phase_compact=False,
            )
            cand = has & (hit.tri >= 0)
            passed, seed = _alpha_accept(pack, hit.tri, uvu, uvv, seed, cand)
            t_abs = t_lo + hit.t
            accept = cand & passed
            t_best = jnp.where(accept, t_abs, t_best)
            tri = jnp.where(accept, hit.tri, tri)
            u = jnp.where(accept, hit.u, u)
            v = jnp.where(accept, hit.v, v)
            ibest = jnp.where(accept, nid, ibest)
            reject = cand & ~passed
            advance = has & ~reject    # accepted or exhausted: next instance
            last_t = jnp.where(advance, nt, last_t)
            last_id = jnp.where(advance, nid, last_id)
            t_lo = jnp.where(
                reject,
                t_abs * (1.0 + _ADV_REL) + _ADV_ABS,
                jnp.where(advance, 0.0, t_lo),
            )
            steps = steps + hit.steps + has.astype(jnp.int32)
            nt2, nid2 = _candidate(t_best, last_t, last_id)
            nt = jnp.where(advance, nt2, nt)
            nid = jnp.where(advance, nid2, nid)
            return (t_best, tri, u, v, ibest, seed, last_t, last_id, steps,
                    nt, nid, t_lo, rounds + 1)

        out = jax.lax.while_loop(cond, body, init)
        return out[0], out[1], out[2], out[3], out[4], out[5], out[8]

    if use_scan:
        entry0 = None
        nt0, nid0 = _scan_candidate(
            inst_view, origin, direction, t_max,
            jnp.full((r,), _NEG), jnp.full((r,), -1, jnp.int32), mask,
        )
        need0 = act & (nid0 >= 0)
    else:
        entry0 = _instance_slab(inst_view, origin, direction, t_max, mask)
        need0 = act & jnp.any(entry0 < INF, axis=1)

    def direct(args):
        origin_, direction_, t_max_, seed_, need_ = args
        return machine(origin_, direction_, t_max_, seed_, need_, entry0)

    def tier(size):
        def branch(args):
            origin_, direction_, t_max_, seed_, need_ = args
            (idx,) = jnp.nonzero(need_, size=size, fill_value=r)
            safe = jnp.minimum(idx, r - 1)
            valid = idx < r
            e0 = None if entry0 is None else entry0[safe]
            bt_s, btri_s, bu_s, bv_s, bi_s, seed_s, st_s = machine(
                origin_[safe], direction_[safe], t_max_[safe], seed_[safe],
                valid, e0,
            )
            sc = lambda init, sub: init.at[idx].set(sub, mode="drop")
            return (
                sc(t_max_, bt_s),
                sc(jnp.full((r,), -1, jnp.int32), btri_s),
                sc(jnp.zeros((r,)), bu_s),
                sc(jnp.zeros((r,)), bv_s),
                sc(jnp.zeros((r,), jnp.int32), bi_s),
                sc(seed_, seed_s),
                sc(jnp.zeros((r,), jnp.int32), st_s),
            )

        return branch

    args = (origin, direction, t_max, seed, need0)
    tiers = [s for s in (max(4096, r // 16), max(4096, r // 4)) if s < r]
    tiers = sorted(set(tiers))
    if not tiers:
        return direct(args)
    n_live = jnp.sum(need0.astype(jnp.int32))

    def select(i):
        if i == len(tiers):
            return direct
        return lambda a: jax.lax.cond(
            n_live <= tiers[i], tier(tiers[i]), select(i + 1), a
        )

    return select(0)(args)


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

    # BLAS-level opaque/alpha split (the two-level analog of
    # bvh8.split_scene, default where the subset tables exist): the opaque
    # pass runs the fused kernel over the OPAQUE SUBSET of EVERY instance
    # — an alpha-carrying mesh's opaque triangles (tree trunks, window
    # frames) no longer drag through the XLA body — and the alpha pass is
    # fused candidate rounds over only the alpha subsets.
    # VKRT_TLAS_SPLIT=0 keeps the instance-level split for attribution.
    from . import traverse_alpha as ta_

    split_ok = (
        fused_ok
        and accel.blas_planar_opq is not None
        and accel.blas_planar_alp is not None
        and ta_.enabled()
        and os.environ.get("VKRT_TLAS_SPLIT", "1") != "0"
    )
    if split_ok:
        from .traverse_wide import make_alpha_pack

        opq_view = accel._replace(
            blas_planar=accel.blas_planar_opq,
            mesh_root_planar=jnp.maximum(accel.mesh_root_opq, 0),
            inst=accel.inst._replace(
                aabb_min=accel.inst_aabb_opq_min,
                aabb_max=accel.inst_aabb_opq_max,
            ),
        )
        t_o, tri_o, u_o, v_o, i_o, seed, st_o = _two_level_pass(
            opq_view, tri_material, origin, direction, t_max, seed, None,
            cull_backface, any_hit_mode, act, accel.inst_opaque, True,
        )
        pack = make_alpha_pack(alpha_ctx, tri_material)
        act_a = act & (tri_o < 0) if any_hit_mode else act
        t_a, tri_a, u_a, v_a, i_a, seed, st_a = _two_level_alpha_pass(
            accel, pack, origin, direction, t_o, seed, act_a,
            any_hit_mode, cull_backface,
        )
        if any_hit_mode:
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

    # Instance-level opaque/alpha split (fallback: no native subset tables
    # or VKRT_TLAS_SPLIT=0): all-opaque instances ride the fused kernel;
    # alpha-carrying instances run the XLA body with the stochastic test,
    # windowed by the opaque result so the slow path only covers the
    # remaining interval.
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
