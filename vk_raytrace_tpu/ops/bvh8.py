"""8-wide BVH: collapse of the binary LBVH into gather-efficient 256-byte rows.

Motivation (measured on TPU v5e): XLA row-gathers cost ~flat time per ROW
almost independent of row size up to 512B. The binary skip-pointer walk does
~300 sequential 32B gathers per ray; this module re-packs the same tree so a
ray needs ~10x fewer, fatter gathers:

* **Interior rows** hold 8 children: 8 AABBs (48 lanes) + 8 child refs
  (8 lanes) + padding = one (64,) f32 row = 256B. One gather tests 8 subtrees.
* **Leaf rows** hold 4 whole triangles (4 x 16-lane packed entries = exactly
  64 lanes): positions, UVs, and id/flag metadata. One gather intersects 4
  triangles. Karras subtrees cover contiguous sorted-triangle ranges, so leaf
  bundles are just ranges of the Morton-sorted triangle list.
* Both kinds live in ONE unified `rows` array, so the traversal loop issues
  exactly one dense row gather per iteration (`ops/traverse_wide.py`).

The collapse runs on host (numpy) at scene build: expansion of each binary
node to <= 8 frontier slots (largest-subtree-first), closure marking of the
wide-node set, then row packing. Integer refs are stored as exact f32 values
(TPU float lanes flush denormal bit patterns — see ops/traverse.py).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models.schema import BVH, Geometry

LEAF_MAX = 4
_INVALID_AABB = 3.0e38


@jax.tree_util.register_pytree_node_class
class WideScene:
    """Traversal-ready unified row table (see module docstring).

    Row lanes for interior rows:
      [c*6 .. c*6+5] for child c in 0..7: bmin.xyz, bmax.xyz
      [48+c]: child ref — >= 0: interior row id; < 0: -(leaf_code+1) with
              leaf_code = leaf_row_id*4 + (count-1); empty slots have
              inverted AABBs (never hit).
      [56..63]: unused (zero)
    Leaf rows: 4 x 16-lane packed triangles:
      [t*16 .. t*16+8]: p0, p1, p2
      [t*16+9 .. t*16+14]: uv0, uv1, uv2
      [t*16+15]: orig_tri_id*4 + flags (bit0 double-sided, bit1 alpha)

    ``stack_depth`` is the exact worst-case per-ray traversal stack need of
    THIS tree (static pytree aux data): the (R, stack_depth) stack array is
    the traversal loop's largest memory-traffic item, so it is sized to the
    tree instead of a universal worst case.
    """

    def __init__(self, rows: jax.Array, stack_depth: int = 32):
        self.rows = rows  # (X, 64) f32
        self.stack_depth = int(stack_depth)

    def tree_flatten(self):
        return (self.rows,), (self.stack_depth,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], stack_depth=aux[0])

    def _replace(self, **kw):  # NamedTuple-compat helper
        return WideScene(
            kw.get("rows", self.rows), kw.get("stack_depth", self.stack_depth)
        )


def _stack_bound(rows: np.ndarray) -> int:
    """Exact worst-case stack need: pushing a node's other hit children
    costs (n_children - 1) entries that stay live while the deepest child
    subtree runs, so need(node) = (n_children-1) + max(child needs)."""
    n = len(rows)
    need = np.zeros(n, np.int32)
    # Iterative post-order; children always need computing before parents.
    todo = [(0, False)]
    while todo:
        ref, ready = todo.pop()
        if ref < 0:
            continue  # leaf: need 0
        row = rows[ref]
        kids = [
            int(row[48 + c]) for c in range(8) if row[c * 6] <= row[c * 6 + 3]
        ]
        if not ready:
            todo.append((ref, True))
            todo.extend((k, False) for k in kids if k >= 0)
        else:
            child_need = max((need[k] for k in kids if k >= 0), default=0)
            need[ref] = max(len(kids) - 1, 0) + child_need
    return max(int(need[0]), 1)


def collapse_bvh8(
    bvh: BVH,
    geom: Geometry,
    leaf_max: int = LEAF_MAX,
    tri_ids: np.ndarray | None = None,
) -> WideScene:
    """``tri_ids`` maps this geometry's triangle indices to ORIGINAL scene
    triangle ids (used when collapsing a subset — see :func:`split_scene`)."""
    left = np.asarray(bvh.left).astype(np.int64)
    right = np.asarray(bvh.right).astype(np.int64)
    lo = np.asarray(bvh.range_lo).astype(np.int64)
    hi = np.asarray(bvh.range_hi).astype(np.int64)
    amin = np.asarray(bvh.aabb_min)
    amax = np.asarray(bvh.aabb_max)
    order = np.asarray(bvh.order).astype(np.int64)

    n_nodes = len(left)
    t = (n_nodes + 1) // 2
    n_int = t - 1
    size = hi - lo + 1

    # --- expand each internal node to <= 8 frontier slots -----------------
    slots = np.full((n_int, 8), -1, np.int64)
    slots[:, 0] = left[:n_int]
    slots[:, 1] = right[:n_int]
    nfill = np.full(n_int, 2, np.int64)
    rows_idx = np.arange(n_int)
    for _ in range(6):
        sz = np.where(slots >= 0, size[np.maximum(slots, 0)], -1)
        expandable = sz > leaf_max
        can = expandable.any(axis=1) & (nfill < 8)
        pick = np.argmax(np.where(expandable, sz, -1), axis=1)
        chosen = slots[rows_idx, pick]
        rs = np.where(can)[0]
        slots[rs, pick[rs]] = left[chosen[rs]]
        slots[rs, nfill[rs]] = right[chosen[rs]]
        nfill[rs] += 1

    # --- wide-node closure ------------------------------------------------
    interior_slot = (slots >= 0) & (size[np.maximum(slots, 0)] > leaf_max)
    wide = np.zeros(n_int, bool)
    wide[0] = True
    while True:
        targets = slots[wide[:, None] & interior_slot]
        before = wide.copy()
        wide[targets] = True
        if (wide == before).all():
            break
    widx = np.where(wide)[0]            # wide row -> binary node id
    n_wide = len(widx)
    # Sized over ALL binary nodes: slots may hold leaf ids (>= n_int).
    wide_id = np.full(n_nodes, -1, np.int64)
    wide_id[widx] = np.arange(n_wide)

    # --- leaf blocks ------------------------------------------------------
    wslots = slots[widx]                              # (W, 8)
    wvalid = wslots >= 0
    winter = interior_slot[widx]
    wleaf = wvalid & ~winter
    leaf_nodes = wslots[wleaf]                        # binary node ids
    leaf_start = lo[leaf_nodes]
    leaf_count = size[leaf_nodes]
    n_leaf = len(leaf_nodes)
    assert leaf_count.max(initial=1) <= leaf_max

    n_rows = n_wide + n_leaf
    from ..runtime import SceneScaleError, _check_ref_ceiling

    _check_ref_ceiling(n_rows, 4)
    if t * 4 >= 2**23:
        raise SceneScaleError(
            f"{t} triangles exceed the LBVH-collapse id ceiling; instance "
            "repeated geometry (models/instances.py) or split the scene"
        )

    # --- packed sorted triangle entries (16 lanes each) -------------------
    idx = np.asarray(geom.indices).astype(np.int64)[order]     # sorted tris
    pos = np.asarray(geom.positions)
    uv = np.asarray(geom.uv)
    # Lane 15 carries the ORIGINAL triangle id (shade state gathers vertex
    # attributes by it) plus the cull/alpha flags; the material id for the
    # alpha test is fetched via tri_material[orig] on the rare alpha path.
    orig_ids = order if tri_ids is None else np.asarray(tri_ids, np.int64)[order]
    tmat_flags = orig_ids * 4 + np.asarray(geom.tri_flags).astype(np.int64)[order]
    entries = np.zeros((t, 16), np.float32)
    entries[:, 0:3] = pos[idx[:, 0]]
    entries[:, 3:6] = pos[idx[:, 1]]
    entries[:, 6:9] = pos[idx[:, 2]]
    entries[:, 9:11] = uv[idx[:, 0]]
    entries[:, 11:13] = uv[idx[:, 1]]
    entries[:, 13:15] = uv[idx[:, 2]]
    entries[:, 15] = tmat_flags.astype(np.float32)

    rows = np.zeros((n_rows, 64), np.float32)

    # Leaf rows: 4 consecutive sorted entries (padded with degenerate zeros).
    leaf_rows = np.zeros((n_leaf, 4, 16), np.float32)
    for k in range(leaf_max):
        has = leaf_count > k
        src = np.minimum(leaf_start + k, t - 1)
        leaf_rows[has, k] = entries[src[has]]
    rows[n_wide:] = leaf_rows.reshape(n_leaf, 64)

    # Interior rows.
    leaf_code = (n_wide + np.arange(n_leaf)) * 4 + (leaf_count - 1)
    ref = np.zeros((n_wide, 8), np.float32)
    ref[wleaf] = -(leaf_code + 1)
    ref[winter] = wide_id[np.maximum(wslots, 0)][winter]

    aabb = np.zeros((n_wide, 8, 6), np.float32)
    aabb[..., 0:3] = _INVALID_AABB
    aabb[..., 3:6] = -_INVALID_AABB
    sn = np.maximum(wslots, 0)
    aabb[wvalid, 0:3] = amin[sn][wvalid]
    aabb[wvalid, 3:6] = amax[sn][wvalid]
    rows[:n_wide, 0:48] = aabb.reshape(n_wide, 48)
    rows[:n_wide, 48:56] = ref

    return WideScene(rows=rows, stack_depth=_stack_bound(rows))


class AccelBundle(NamedTuple):
    """Dual acceleration structures: the analog of the reference's
    FORCE_OPAQUE TLAS-instance optimization (accelstruct.cpp:140-149, which
    lets RTX hardware skip any-hit shaders for opaque geometry).

    Opaque triangles traverse without any alpha machinery (the in-traversal
    alpha test costs ~7x); the usually-small alpha set gets its own BVH,
    traversed with the opaque hit distance as t_max so it is doubly pruned.
    ``alpha`` is None for fully opaque scenes.

    ``opaque_planar`` is the lane-permuted copy of the opaque rows consumed
    by the fused Pallas traversal (ops/traverse_fused.py); None falls back
    to the XLA body everywhere. ``alpha_planar`` is the same for the alpha
    tree (candidate-rounds fused alpha, ops/traverse_alpha.py).
    """

    opaque: WideScene
    alpha: WideScene | None
    opaque_planar: object | None = None
    alpha_planar: object | None = None


def _wide_native(
    geom: Geometry, tri_ids: np.ndarray | None = None
) -> WideScene | None:
    """Try the native (C++) binned-SAH builder; None -> caller falls back."""
    from .. import runtime

    rows = runtime.build_bvh8_rows(
        np.asarray(geom.positions),
        np.asarray(geom.indices),
        np.asarray(geom.uv),
        np.asarray(geom.tri_flags),
        tri_ids=tri_ids,
    )
    if rows is None:
        return None
    return WideScene(rows=rows, stack_depth=_stack_bound(rows))


def _with_planar(
    bundle: AccelBundle, geom_o: Geometry | None = None,
    ids_o: np.ndarray | None = None,
) -> AccelBundle:
    """Attach the fused-kernel planar structure for the opaque set. Prefers
    a native 16-wide 512-byte-row SAH build (same flat per-row gather cost
    as 256B on v5e => ~half the gathers per ray); falls back to a lane
    permutation of the existing 8-wide table."""
    from .traverse_fused import planar_native, planarize

    planar = None
    if geom_o is not None:
        try:
            planar = planar_native(geom_o, tri_ids=ids_o)
        except Exception:
            planar = None
    if planar is None:
        planar = planarize(bundle.opaque)
    return bundle._replace(opaque_planar=planar)


_BUILDER_DIGEST = None


def _builder_digest() -> str:
    """Content hash of the native builder source, so accel caches miss when
    the builder changes (split policy, presplitting, row format)."""
    global _BUILDER_DIGEST
    if _BUILDER_DIGEST is None:
        import hashlib
        import os

        src = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "runtime", "native.cpp",
        )
        try:
            with open(src, "rb") as f:
                _BUILDER_DIGEST = hashlib.blake2b(
                    f.read(), digest_size=10
                ).hexdigest()
        except OSError:
            _BUILDER_DIGEST = "nosrc"
    return _BUILDER_DIGEST


def build_accel_bundle(geom: Geometry, bvh_full: BVH | None = None) -> AccelBundle:
    """Split the scene by the per-triangle alpha flag and build the wide
    structure(s). Prefers the native SAH builder; falls back to the device
    LBVH + host collapse (reusing ``bvh_full`` when there is nothing to
    split). Results are disk-cached by geometry content hash
    (utils/cache.py) — the reference gets millisecond driver BLAS builds
    (accelstruct.cpp:110-127); repeat runs here get an ``np.load``."""
    from ..utils import cache as _cache
    from .traverse_fused import planar_width

    key = _cache.content_key(
        # Keyed by the fused-row width policy too: a cached 16-wide bundle
        # must not serve a VKRT_WIDE=32 run (see traverse_fused.planar_width).
        # And by the builder source digest: a builder change (split policy,
        # row format) must invalidate every cached tree.
        "accel-v2", geom.positions, geom.indices, geom.uv, geom.tri_flags,
        f"w{planar_width()}", _builder_digest(),
        f"ps{os.environ.get('VKRT_PRESPLIT', '0')}",
    )
    hit = _cache.load(key)
    if hit is not None:
        try:
            return _bundle_from_cache(hit)
        except Exception:
            pass
    bundle = _build_accel_bundle_impl(geom, bvh_full)
    _bundle_to_cache(key, bundle, _cache)
    return bundle


def _bundle_from_cache(z: dict) -> AccelBundle:
    from .traverse_fused import PlanarScene

    alpha = None
    if "alpha_rows" in z:
        alpha = WideScene(z["alpha_rows"], stack_depth=int(z["alpha_depth"]))
    planar = None
    if "planar_rows" in z:
        planar = PlanarScene(
            z["planar_rows"],
            stack_depth=int(z["planar_depth"]),
            width=int(z["planar_width"]),
        )
    alpha_planar = None
    if "aplanar_rows" in z:
        alpha_planar = PlanarScene(
            z["aplanar_rows"],
            stack_depth=int(z["aplanar_depth"]),
            width=int(z["aplanar_width"]),
        )
    return AccelBundle(
        opaque=WideScene(z["opaque_rows"], stack_depth=int(z["opaque_depth"])),
        alpha=alpha,
        opaque_planar=planar,
        alpha_planar=alpha_planar,
    )


def _bundle_to_cache(key: str, b: AccelBundle, _cache) -> None:
    arrays = dict(
        opaque_rows=b.opaque.rows,
        opaque_depth=b.opaque.stack_depth,
    )
    if b.alpha is not None:
        arrays.update(alpha_rows=b.alpha.rows, alpha_depth=b.alpha.stack_depth)
    if b.opaque_planar is not None:
        arrays.update(
            planar_rows=b.opaque_planar.rows,
            planar_depth=b.opaque_planar.stack_depth,
            planar_width=b.opaque_planar.width,
        )
    if b.alpha_planar is not None:
        arrays.update(
            aplanar_rows=b.alpha_planar.rows,
            aplanar_depth=b.alpha_planar.stack_depth,
            aplanar_width=b.alpha_planar.width,
        )
    _cache.save(key, **arrays)


def _build_accel_bundle_impl(
    geom: Geometry, bvh_full: BVH | None = None
) -> AccelBundle:
    from .bvh import build_bvh

    flags = np.asarray(geom.tri_flags)
    alpha_mask = (flags & 2) != 0
    if not alpha_mask.any():
        wide = _wide_native(geom)
        if wide is not None:
            return _with_planar(AccelBundle(opaque=wide, alpha=None), geom)
        if bvh_full is None:
            bvh_full = build_bvh(geom.positions, geom.indices)
        return _with_planar(
            AccelBundle(opaque=collapse_bvh8(bvh_full, geom), alpha=None), geom
        )

    def subset(mask: np.ndarray) -> tuple[Geometry, np.ndarray]:
        ids = np.where(mask)[0]
        sub_ids = ids
        idx = np.asarray(geom.indices)[ids]
        tm = np.asarray(geom.tri_material)[ids]
        tf = np.asarray(geom.tri_flags)[ids]
        if len(ids) < 2:  # LBVH needs >= 2 triangles; pad with a degenerate
            idx = np.concatenate([idx, np.zeros((2 - len(ids), 3), idx.dtype)])
            tm = np.concatenate([tm, np.zeros(2 - len(ids), tm.dtype)])
            tf = np.concatenate([tf, np.zeros(2 - len(ids), tf.dtype)])
            sub_ids = np.concatenate([ids, np.zeros(2 - len(ids), ids.dtype)])
        sub = geom._replace(
            indices=idx, tri_material=tm, tri_flags=tf
        )
        return sub, sub_ids

    geo_o, ids_o = subset(~alpha_mask)
    geo_a, ids_a = subset(alpha_mask)
    wide_o = _wide_native(geo_o, tri_ids=ids_o)
    wide_a = _wide_native(geo_a, tri_ids=ids_a)
    if wide_o is not None and wide_a is not None:
        bundle = _with_planar(
            AccelBundle(opaque=wide_o, alpha=wide_a), geo_o, ids_o
        )
        return _with_alpha_planar(bundle, geo_a, ids_a)
    bvh_o = build_bvh(geo_o.positions, geo_o.indices)
    bvh_a = build_bvh(geo_a.positions, geo_a.indices)
    bundle = _with_planar(AccelBundle(
        opaque=collapse_bvh8(bvh_o, geo_o, tri_ids=ids_o),
        alpha=collapse_bvh8(bvh_a, geo_a, tri_ids=ids_a),
    ), geo_o, ids_o)
    return _with_alpha_planar(bundle, geo_a, ids_a)


def _with_alpha_planar(
    bundle: AccelBundle, geo_a: Geometry, ids_a: np.ndarray
) -> AccelBundle:
    """Attach the fused-kernel planar structure for the alpha set (the
    candidate-rounds alpha path, ops/traverse_alpha.py). Same preference
    order as the opaque planar: native wide SAH (width per VKRT_WIDE),
    else lane permutation of the 8-wide table."""
    from .traverse_fused import planar_native, planarize

    planar = None
    try:
        planar = planar_native(geo_a, tri_ids=ids_a)
    except Exception:
        planar = None
    if planar is None and bundle.alpha is not None:
        planar = planarize(bundle.alpha)
    return bundle._replace(alpha_planar=planar)
