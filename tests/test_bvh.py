"""BVH build + traversal tests vs brute-force intersection (SURVEY.md §4.2)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vk_raytrace_tpu.models import procedural
from vk_raytrace_tpu.models.schema import ALPHA_OPAQUE
from vk_raytrace_tpu.models.builder import GeometryBuilder
from vk_raytrace_tpu.ops import bvh as bvh_ops
from vk_raytrace_tpu.ops import traverse


def _random_tri_soup(n_tris, seed=0, spread=10.0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-spread, spread, size=(n_tris, 1, 3))
    tri = base + rng.normal(scale=0.7, size=(n_tris, 3, 3))
    g = GeometryBuilder()
    verts = tri.reshape(-1, 3)
    idx = np.arange(n_tris * 3).reshape(-1, 3)
    g.add_mesh(verts, idx, 0, double_sided=True)
    return g.build()


def _random_rays(n, seed=1, spread=25.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3))
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d)


class TestBuild:
    @pytest.mark.parametrize("n_tris", [2, 3, 17, 256, 1000])
    def test_structure(self, n_tris):
        geom = _random_tri_soup(n_tris)
        b = bvh_ops.build_bvh(geom.positions, geom.indices)
        bvh_ops.validate_bvh_host(b, n_tris)

    def test_duplicate_centroids(self):
        # All triangles at the same location -> all Morton codes equal.
        g = GeometryBuilder()
        tri = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float64)
        verts = np.concatenate([tri + 1e-7 * k for k in range(16)])
        idx = np.arange(16 * 3).reshape(-1, 3)
        g.add_mesh(verts, idx, 0, double_sided=True)
        geom = g.build()
        b = bvh_ops.build_bvh(geom.positions, geom.indices)
        bvh_ops.validate_bvh_host(b, 16)


class TestTraversalVsBruteForce:
    @pytest.mark.parametrize("n_tris,n_rays", [(2, 64), (57, 256), (512, 512)])
    def test_closest_hit_matches(self, n_tris, n_rays):
        geom = _random_tri_soup(n_tris, seed=n_tris)
        b = bvh_ops.build_bvh(geom.positions, geom.indices)
        packed = traverse.pack_scene(b, geom)
        o, d = _random_rays(n_rays, seed=n_tris + 1)

        hit, _ = traverse.closest_hit(packed, o, d)
        ref = traverse.brute_force_closest(geom, o, d)

        hit_t = np.asarray(hit.t)
        ref_t = np.asarray(ref.t)
        # Same hit distance everywhere (identical tri indices can differ only
        # on exact ties, so compare t).
        assert np.allclose(hit_t, ref_t, rtol=1e-4, atol=1e-4), (
            np.abs(hit_t - ref_t).max()
        )
        assert np.array_equal(np.asarray(hit.tri) >= 0, np.asarray(ref.tri) >= 0)

    def test_cornell_box(self):
        geom, mats, lights, cam = procedural.cornell_box()
        b = bvh_ops.build_bvh(geom.positions, geom.indices)
        packed = traverse.pack_scene(b, geom)
        o, d = _random_rays(512, seed=3, spread=4.0)
        hit, _ = traverse.closest_hit(packed, o, d)
        ref = traverse.brute_force_closest(geom, o, d)
        assert np.allclose(np.asarray(hit.t), np.asarray(ref.t), rtol=1e-4, atol=1e-4)
        # Rays starting inside the closed box must all hit something.
        inside = np.abs(np.asarray(o)) < 3.0
        inside = inside.all(axis=1) & (np.asarray(o)[:, 1] > 0)

    def test_backface_culling(self):
        # Single-sided floor quad: from above it hits, from below it doesn't.
        g = GeometryBuilder()
        v, i = procedural._quad([-1, 0, -1], [-1, 0, 1], [1, 0, 1], [1, 0, -1])
        g.add_mesh(v, i, 0, double_sided=False)
        geom = g.build()
        b = bvh_ops.build_bvh(geom.positions, geom.indices)
        packed = traverse.pack_scene(b, geom)
        o = jnp.asarray([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0]], jnp.float32)
        d = jnp.asarray([[0.0, -1.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
        hit, _ = traverse.closest_hit(packed, o, d)
        assert int(hit.tri[0]) >= 0      # from above: front face
        assert int(hit.tri[1]) == -1     # from below: culled

    def test_any_hit_distance_limit(self):
        g = GeometryBuilder()
        v, i = procedural._quad([-1, 0, -1], [-1, 0, 1], [1, 0, 1], [1, 0, -1])
        g.add_mesh(v, i, 0, double_sided=True)
        geom = g.build()
        b = bvh_ops.build_bvh(geom.positions, geom.indices)
        packed = traverse.pack_scene(b, geom)
        o = jnp.asarray([[0.0, 2.0, 0.0], [0.0, 2.0, 0.0]], jnp.float32)
        d = jnp.asarray([[0.0, -1.0, 0.0], [0.0, -1.0, 0.0]], jnp.float32)
        t_max = jnp.asarray([3.0, 1.0], jnp.float32)
        occ, _ = traverse.any_hit(packed, o, d, t_max)
        assert bool(occ[0]) is True     # plane at distance 2 < 3
        assert bool(occ[1]) is False    # beyond the 1.0 limit

    def test_active_mask(self):
        geom = _random_tri_soup(64, seed=9)
        b = bvh_ops.build_bvh(geom.positions, geom.indices)
        packed = traverse.pack_scene(b, geom)
        o, d = _random_rays(32, seed=10)
        active = jnp.zeros((32,), bool)
        hit, _ = traverse.closest_hit(packed, o, d, active=active)
        assert np.all(np.asarray(hit.tri) == -1)
