"""Native (C++) binned-SAH wide-BVH builder tests: row-format structural
validation, brute-force traversal parity, and the Batcher sort network used
by the traversal loop (SURVEY.md §4.2)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vk_raytrace_tpu import runtime
from vk_raytrace_tpu.models import procedural
from vk_raytrace_tpu.ops.bvh8 import AccelBundle, _wide_native
from vk_raytrace_tpu.ops.traverse_wide import _sort8, closest_hit_bundle

needs_native = pytest.mark.skipif(
    not runtime.available(), reason="native library unavailable"
)


def _walk_rows(rows: np.ndarray):
    """Host DFS over the row table; returns the set of leaf-entry original
    triangle ids and checks child AABB containment."""
    seen = []
    stack = [(0, None)]
    visited = 0
    while stack:
        ref, parent_box = stack.pop()
        visited += 1
        assert visited < 4 * len(rows) + 8, "row graph loops"
        if ref >= 0:  # interior
            row = rows[ref]
            for c in range(8):
                bmin = row[c * 6 : c * 6 + 3]
                bmax = row[c * 6 + 3 : c * 6 + 6]
                if bmin[0] > bmax[0]:
                    continue  # empty slot
                if parent_box is not None:
                    pmin, pmax = parent_box
                    assert (bmin >= pmin - 1e-4).all()
                    assert (bmax <= pmax + 1e-4).all()
                stack.append((int(row[48 + c]), (bmin, bmax)))
        else:  # leaf
            code = -ref - 1
            leaf_row, cnt = code >> 2, (code & 3) + 1
            row = rows[leaf_row].reshape(4, 16)
            for j in range(cnt):
                seen.append(int(row[j, 15]) >> 2)
    return seen


@needs_native
class TestNativeBuilder:
    def test_structure_covers_all_triangles(self):
        geom, *_ = procedural.city_scene(n_blocks=8)
        wide = _wide_native(geom)
        rows = np.asarray(wide.rows)
        seen = _walk_rows(rows)
        n = int(geom.indices.shape[0])
        assert sorted(seen) == list(range(n))

    def test_leaf_triangles_inside_aabbs(self):
        geom, *_ = procedural.cornell_box()
        wide = _wide_native(geom)
        rows = np.asarray(wide.rows)
        # Root AABB must contain every vertex used by a triangle.
        pos = np.asarray(geom.positions)
        idx = np.asarray(geom.indices)
        used = pos[idx.reshape(-1)]
        root = rows[0]
        mins = np.stack([root[c * 6 : c * 6 + 3] for c in range(8)])
        maxs = np.stack([root[c * 6 + 3 : c * 6 + 6] for c in range(8)])
        valid = mins[:, 0] <= maxs[:, 0]
        assert (mins[valid].min(0) <= used.min(0) + 1e-4).all()
        assert (maxs[valid].max(0) >= used.max(0) - 1e-4).all()

    def test_brute_force_parity(self):
        geom, *_ = procedural.city_scene(n_blocks=8)
        pos = np.asarray(geom.positions)
        idx = np.asarray(geom.indices)
        flags = np.asarray(geom.tri_flags)
        rng = np.random.default_rng(7)
        r = 256
        lo, hi = pos.min(0), pos.max(0)
        c = (lo + hi) / 2
        rad = float(np.linalg.norm(hi - lo))
        o = (c + rng.normal(size=(r, 3)) * rad * 0.6).astype(np.float32)
        d = rng.normal(size=(r, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)

        wide = _wide_native(geom)
        bundle = AccelBundle(opaque=wide, alpha=None)
        hit, _ = closest_hit_bundle(
            bundle, geom.tri_material, jnp.asarray(o), jnp.asarray(d)
        )
        hit_t = np.asarray(hit.t)

        v0, v1, v2 = pos[idx[:, 0]], pos[idx[:, 1]], pos[idx[:, 2]]
        e1, e2 = v1 - v0, v2 - v0
        ds = (flags & 1) != 0
        for i in range(r):
            pv = np.cross(d[i], e2)
            det = (e1 * pv).sum(1)
            ok = (np.abs(det) > 1e-12) & (ds | (det > 1e-12))
            inv = 1.0 / np.where(det == 0, 1.0, det)
            tv = o[i] - v0
            u = (tv * pv).sum(1) * inv
            qv = np.cross(tv, e1)
            v = (d[i] * qv).sum(1) * inv
            t = (e2 * qv).sum(1) * inv
            good = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0)
            t_ref = np.where(good, t, 1e32).min()
            if t_ref >= 1e31:
                assert hit_t[i] >= 1e31, f"ray {i}: false hit {hit_t[i]}"
            else:
                assert np.isclose(hit_t[i], t_ref, rtol=1e-4, atol=1e-5), (
                    f"ray {i}: {hit_t[i]} vs brute {t_ref}"
                )

    def test_tiny_scenes(self):
        # 1-2 triangle scenes still produce a valid interior root.
        pos = np.asarray(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [2, 2, 2], [3, 2, 2], [2, 3, 2]],
            np.float32,
        )
        for n_tri in (1, 2):
            idx = np.asarray([[0, 1, 2], [3, 4, 5]][:n_tri], np.int32)
            uv = np.zeros((6, 2), np.float32)
            tf = np.asarray([1, 1][:n_tri], np.int32)  # double-sided
            rows = runtime.build_bvh8_rows(pos, idx, uv, tf)
            assert rows is not None
            seen = _walk_rows(rows)
            assert sorted(seen) == list(range(n_tri))


class TestSort8:
    def test_matches_argsort(self):
        rng = np.random.default_rng(3)
        keys = rng.uniform(0, 1, size=(64, 8)).astype(np.float32)
        # inject ties and infinities
        keys[10, :4] = 0.5
        keys[11, :] = np.float32(1e32)
        payload = rng.integers(0, 100, size=(64, 8)).astype(np.float32)
        skey, (spay,) = _sort8(
            [jnp.asarray(keys[:, c]) for c in range(8)],
            [[jnp.asarray(payload[:, c]) for c in range(8)]],
        )
        skey = np.stack([np.asarray(k) for k in skey], axis=1)
        spay = np.stack([np.asarray(p) for p in spay], axis=1)
        # Keys must be exactly sorted; payloads must stay paired with their
        # key (the network is not stable on ties, which traversal doesn't
        # need — any order among equal-distance children is valid).
        np.testing.assert_allclose(skey, np.sort(keys, axis=1))
        for r in range(len(keys)):
            got = sorted(zip(skey[r], spay[r]))
            ref = sorted(zip(keys[r], payload[r]))
            assert got == ref
