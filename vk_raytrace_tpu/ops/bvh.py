"""On-device LBVH build over the world-space triangle pool.

TPU-native replacement for the reference's hardware acceleration structures
(``src/accelstruct.cpp``: one BLAS per mesh built by the Vulkan driver +
a TLAS over instances). Design decisions:

* **Single-level, world space** — instance transforms are baked into the
  vertex pool at scene build (see ``models/schema.py``), so there is one BVH
  and no per-instance ray transformation in the hot loop.
* **Fully parallel Karras-2012 construction** — Morton codes on triangle
  centroids, one radix sort (``jnp.argsort``), then every internal node's
  range/split found independently by binary search over common-prefix
  lengths (``jax.lax.clz``). Everything is fixed-trip-count vectorized code:
  no data-dependent shapes, jit-compatible, runs on device at scene load or
  per-frame for dynamic geometry.
* **Skip-pointer threading** — after structure build, each node gets a
  ``skip`` pointer (next node in DFS order when its subtree is culled or
  done). Traversal (``ops/traverse.py``) then needs one node register per
  ray and zero stack traffic.

Duplicate Morton codes are handled with the standard index-augmentation
tiebreak, which also bounds tree depth: prefix lengths along any root-leaf
path strictly increase and live in [0, 62], so 64 bottom-up passes always
suffice for AABB fitting and skip propagation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.schema import BVH

# Prefix lengths are < 30 (morton) + 33 (index tiebreak) => depth <= 63.
_MAX_DEPTH = 64


def _expand_bits(v: jax.Array) -> jax.Array:
    """Spread the low 10 bits of ``v`` so there are 2 zero bits between each."""
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(p: jax.Array) -> jax.Array:
    """30-bit Morton code for points ``(..., 3)`` in [0, 1]^3."""
    q = jnp.clip(p * 1024.0, 0.0, 1023.0).astype(jnp.uint32)
    return (
        (_expand_bits(q[..., 0]) << 2)
        | (_expand_bits(q[..., 1]) << 1)
        | _expand_bits(q[..., 2])
    )


def _clz32(x: jax.Array) -> jax.Array:
    return jax.lax.clz(x.astype(jnp.int32))


def _make_delta(codes: jax.Array, n: int):
    """Common-prefix length delta(i, j) with index tiebreak; -1 out of range."""

    idx = jnp.arange(n, dtype=jnp.int32)

    def delta(i: jax.Array, j: jax.Array) -> jax.Array:
        valid = (j >= 0) & (j < n)
        jc = jnp.clip(j, 0, n - 1)
        x = codes[i] ^ codes[jc]
        # Equal codes: continue the prefix into the index bits.
        d = jnp.where(x == 0, 32 + _clz32(idx[i] ^ idx[jc]), _clz32(x.astype(jnp.int32)))
        return jnp.where(valid, d, -1)

    return delta


def _pow2_descending(n: int):
    """Powers of two >= covering n, descending to 1 (python ints, static)."""
    p = 1
    while p < n:
        p *= 2
    out = []
    while p >= 1:
        out.append(p)
        p //= 2
    return out


def build_bvh(positions: jax.Array, indices: jax.Array) -> BVH:
    """Build a threaded LBVH. ``positions`` (V,3) f32, ``indices`` (T,3) i32.

    Requires T >= 2 (scene build pads degenerate scenes).
    Returns a :class:`BVH` with 2T-1 nodes, root at index 0.
    """
    v0 = positions[indices[:, 0]]
    v1 = positions[indices[:, 1]]
    v2 = positions[indices[:, 2]]
    tri_min = jnp.minimum(jnp.minimum(v0, v1), v2)
    tri_max = jnp.maximum(jnp.maximum(v0, v1), v2)
    centroid = (tri_min + tri_max) * 0.5

    t = int(indices.shape[0])
    assert t >= 2, "build_bvh requires at least 2 triangles (pad the scene)"
    n_int = t - 1

    # --- Morton sort ---------------------------------------------------
    scene_min = jnp.min(tri_min, axis=0)
    scene_max = jnp.max(tri_max, axis=0)
    extent = jnp.maximum(scene_max - scene_min, 1e-9)
    codes_u = morton3d((centroid - scene_min) / extent)
    order = jnp.argsort(codes_u).astype(jnp.int32)
    codes = codes_u[order]

    delta = _make_delta(codes, t)

    # --- Karras: per-internal-node range + split ------------------------
    i = jnp.arange(n_int, dtype=jnp.int32)
    d = jnp.where(delta(i, i + 1) >= delta(i, i - 1), 1, -1).astype(jnp.int32)
    delta_min = delta(i, i - d)

    # Range length via binary search: delta(i, i + l*d) > delta_min is a
    # monotone predicate in l (sorted codes), so descending powers of two work.
    length = jnp.zeros_like(i)
    for step in _pow2_descending(t):
        cand = length + step
        ok = delta(i, i + cand * d) > delta_min
        length = jnp.where(ok, cand, length)
    j = i + length * d

    # Split position: largest s <= l-1 with delta(i, i+s*d) > delta(i, j);
    # the boundary gamma then separates prefix-bit 0/1 halves of the range.
    delta_node = delta(i, j)
    s = jnp.zeros_like(i)
    for step in _pow2_descending(t):
        cand = s + step
        ok = (cand <= length - 1) & (delta(i, i + cand * d) > delta_node)
        s = jnp.where(ok, cand, s)
    gamma = i + s * d + jnp.minimum(d, 0)

    lo = jnp.minimum(i, j)
    hi = jnp.maximum(i, j)
    # Child node ids: leaves live at [T-1, 2T-2].
    left_child = jnp.where(lo == gamma, n_int + gamma, gamma)
    right_child = jnp.where(hi == gamma + 1, n_int + gamma + 1, gamma + 1)

    # --- AABB fit (bottom-up, fixed passes) -----------------------------
    n_nodes = 2 * t - 1
    leaf_min = tri_min[order]
    leaf_max = tri_max[order]
    big = jnp.float32(3.0e38)
    aabb_min = jnp.concatenate([jnp.full((n_int, 3), big), leaf_min], axis=0)
    aabb_max = jnp.concatenate([jnp.full((n_int, 3), -big), leaf_max], axis=0)

    def fit(_, mm):
        amin, amax = mm
        new_min = jnp.minimum(amin[left_child], amin[right_child])
        new_max = jnp.maximum(amax[left_child], amax[right_child])
        amin = amin.at[:n_int].set(new_min)
        amax = amax.at[:n_int].set(new_max)
        return amin, amax

    aabb_min, aabb_max = jax.lax.fori_loop(0, _MAX_DEPTH, fit, (aabb_min, aabb_max))

    # --- Skip-pointer threading ----------------------------------------
    # skip[left_child]  = right sibling          (structural, one scatter)
    # skip[right_child] = skip[parent]           (propagates down right chains)
    skip = jnp.full((n_nodes,), -1, dtype=jnp.int32)
    skip = skip.at[left_child].set(right_child)

    def thread(_, sk):
        return sk.at[right_child].set(sk[i])

    skip = jax.lax.fori_loop(0, _MAX_DEPTH, thread, skip)

    left = jnp.concatenate([left_child, jnp.full((t,), -1, jnp.int32)])
    right = jnp.concatenate([right_child, jnp.full((t,), -1, jnp.int32)])
    node_tri = jnp.concatenate([jnp.full((n_int,), -1, jnp.int32), order])
    leaf_pos = jnp.arange(t, dtype=jnp.int32)
    range_lo = jnp.concatenate([lo, leaf_pos])
    range_hi = jnp.concatenate([hi, leaf_pos])

    return BVH(
        aabb_min=aabb_min,
        aabb_max=aabb_max,
        left=left,
        right=right,
        skip=skip,
        node_tri=node_tri,
        range_lo=range_lo,
        range_hi=range_hi,
        order=order,
    )


def validate_bvh_host(bvh: BVH, n_tris: int) -> None:
    """Host-side structural check (tests only): every triangle appears in
    exactly one leaf reachable from the root, and child AABBs nest."""
    import numpy as np

    left = np.asarray(bvh.left)
    skip = np.asarray(bvh.skip)
    node_tri = np.asarray(bvh.node_tri)
    amin = np.asarray(bvh.aabb_min)
    amax = np.asarray(bvh.aabb_max)

    seen = []
    node = 0
    steps = 0
    limit = 4 * len(left) + 8
    while node != -1:
        steps += 1
        assert steps < limit, "skip threading loops"
        if left[node] == -1:
            assert node_tri[node] >= 0
            seen.append(node_tri[node])
        else:
            c = left[node]
            assert (amin[c] >= amin[node] - 1e-5).all()
            assert (amax[c] <= amax[node] + 1e-5).all()
            node = c
            continue
        node = skip[node]
    assert sorted(seen) == list(range(n_tris)), (
        f"leaves cover {len(seen)} of {n_tris} triangles"
    )
