"""Two-level (TLAS/BLAS) acceleration structure tests (ops/tlas.py).

The reference builds one BLAS per mesh and a TLAS over instance transforms
(accelstruct.cpp:132-162); these tests pin the instanced path against the
round-1 baked world-space path: same scene expressed both ways must hit the
same surfaces and render the same image, while the instanced representation
stores the mesh once.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vk_raytrace_tpu import render as R
from vk_raytrace_tpu.integrator.camera import generate_rays_for_pixels, with_aspect
from vk_raytrace_tpu.models.builder import GeometryBuilder
from vk_raytrace_tpu.models.instances import InstancedSceneBuilder
from vk_raytrace_tpu.models.procedural import _box, _uv_sphere, look_at_camera
from vk_raytrace_tpu.models.schema import (
    LIGHT_POINT,
    PBR_GLTF,
    RenderConfig,
    make_lights,
    make_materials,
)
from vk_raytrace_tpu.ops import rng
from vk_raytrace_tpu.ops.tlas import (
    any_hit_instanced,
    build_instanced_accel,
    closest_hit_instanced,
)


def _transforms():
    """A few instances with rotation+scale+translation."""
    out = []
    rng_ = np.random.default_rng(3)
    for i in range(6):
        th = rng_.uniform(0, 2 * np.pi)
        c, s = np.cos(th), np.sin(th)
        scale = rng_.uniform(0.5, 1.6)
        m = np.eye(4)
        m[:3, :3] = scale * np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        m[:3, 3] = [(i % 3 - 1) * 3.0, rng_.uniform(0.0, 1.0), (i // 3 - 0.5) * 3.0]
        out.append(m)
    return out


def _build_both():
    """Same scene as (a) instanced two-level and (b) baked world-space."""
    sv, si, sn, suv = _uv_sphere(8, 16)
    bv, bi = _box([0, 0, 0], [1.2, 1.2, 1.2])
    xs = _transforms()

    ib = InstancedSceneBuilder()
    m_sphere = ib.add_mesh(sv, si, 0, normals=sn, uv=suv)
    m_box = ib.add_mesh(bv, bi, 1)
    for i, m in enumerate(xs):
        ib.add_instance(m_sphere if i % 2 == 0 else m_box, m)
    pool, inst = ib.build()

    gb = GeometryBuilder()
    for i, m in enumerate(xs):
        if i % 2 == 0:
            gb.add_mesh(sv, si, 0, normals=sn, uv=suv, transform=m)
        else:
            gb.add_mesh(bv, bi, 1, transform=m)
    baked = gb.build()
    return pool, inst, baked


def _rays(n=2048, seed=0):
    g = np.random.default_rng(seed)
    o = g.uniform(-6, 6, (n, 3)).astype(np.float32)
    o[:, 1] = g.uniform(2.5, 8.0, n)
    d = g.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


class TestInstancedTraversal:
    def test_closest_matches_baked(self):
        pool, inst, baked = _build_both()
        accel = build_instanced_accel(pool, inst)
        o, d = _rays()
        hit_i, _ = closest_hit_instanced(
            accel, pool.geometry.tri_material, o, d
        )
        from vk_raytrace_tpu.ops.bvh8 import build_accel_bundle
        from vk_raytrace_tpu.ops.traverse_wide import closest_hit_bundle

        bundle = build_accel_bundle(baked)
        hit_b, _ = closest_hit_bundle(bundle, baked.tri_material, o, d)

        ti = np.asarray(hit_i.t)
        tb = np.asarray(hit_b.t)
        hit_mask_same = (ti < 1e30) == (tb < 1e30)
        # object-space intersection vs baked world-space differs by fp
        # rounding of the transform; a tiny fraction of grazing rays may
        # flip hit/miss
        assert hit_mask_same.mean() > 0.995, hit_mask_same.mean()
        both = (ti < 1e30) & (tb < 1e30)
        # world t is preserved through the object-space parametrization
        rel = np.abs(ti[both] - tb[both]) / np.maximum(tb[both], 1e-3)
        assert np.percentile(rel, 99) < 1e-3
        # material identity preserved (pool-global vs baked tri ids differ,
        # but the material of the hit surface must match)
        mi = np.asarray(pool.geometry.tri_material)[
            np.maximum(np.asarray(hit_i.tri), 0)
        ]
        mb = np.asarray(baked.tri_material)[np.maximum(np.asarray(hit_b.tri), 0)]
        same_surface = both & hit_mask_same
        assert (mi[same_surface] == mb[same_surface]).mean() > 0.99

    def test_any_hit_matches_baked(self):
        pool, inst, baked = _build_both()
        accel = build_instanced_accel(pool, inst)
        o, d = _rays(seed=5)
        t_max = jnp.full((o.shape[0],), 4.0)
        occ_i, _ = any_hit_instanced(accel, pool.geometry.tri_material, o, d, t_max)
        from vk_raytrace_tpu.ops.bvh8 import build_accel_bundle
        from vk_raytrace_tpu.ops.traverse_wide import any_hit_bundle

        bundle = build_accel_bundle(baked)
        occ_b, _ = any_hit_bundle(bundle, baked.tri_material, o, d, t_max)
        agree = np.asarray(occ_i) == np.asarray(occ_b)
        assert agree.mean() > 0.995, agree.mean()

    def test_memory_dedup(self):
        """N instances of a mesh cost one BLAS + N table rows — not N× rows
        (the round-1 gap: accelstruct.cpp TLAS instancing)."""
        sv, si, sn, suv = _uv_sphere(12, 24)
        ib = InstancedSceneBuilder()
        mid = ib.add_mesh(sv, si, 0, normals=sn, uv=suv)
        n_inst = 16
        for i in range(n_inst):
            m = np.eye(4)
            m[:3, 3] = [i * 3.0, 0, 0]
            ib.add_instance(mid, m)
        pool, inst = ib.build()
        accel = build_instanced_accel(pool, inst)

        gb = GeometryBuilder()
        for i in range(n_inst):
            m = np.eye(4)
            m[:3, 3] = [i * 3.0, 0, 0]
            gb.add_mesh(sv, si, 0, normals=sn, uv=suv, transform=m)
        from vk_raytrace_tpu.ops.bvh8 import build_accel_bundle

        baked = build_accel_bundle(gb.build())
        assert accel.blas.rows.shape[0] * 4 < baked.opaque.rows.shape[0]


class TestInstancedRender:
    def test_image_matches_baked_scene(self):
        pool, inst, baked = _build_both()
        mats = make_materials([
            dict(base_color_factor=[0.7, 0.3, 0.3, 1.0], roughness_factor=0.8,
                 metallic_factor=0.0),
            dict(base_color_factor=[0.3, 0.5, 0.8, 1.0], roughness_factor=0.4,
                 metallic_factor=0.5),
        ])
        lights = make_lights([
            dict(type=LIGHT_POINT, position=[0.0, 10.0, 4.0], intensity=300.0),
        ])
        cam = look_at_camera(eye=[0, 6, 12], center=[0, 0.5, 0], up=[0, 1, 0],
                             fov_deg=45.0, aspect=1.0)
        cfg = RenderConfig(width=48, height=48, max_depth=3, max_samples=2,
                           pbr_mode=PBR_GLTF, hdr_multiplier=0.0, rr=False)

        scene_i = R.build_instanced_scene(pool, inst, mats, lights, cam)
        r_i = R.Renderer(scene_i, cfg)
        r_i.step()
        img_i = np.asarray(r_i.hdr())

        scene_b = R.build_scene(baked, mats, lights, cam)
        r_b = R.Renderer(scene_b, cfg)
        r_b.step()
        img_b = np.asarray(r_b.hdr())

        diff = np.abs(img_i - img_b).max(axis=-1)
        scale = max(float(img_b.mean()), 1e-6)
        # identical RNG streams; only fp transform rounding differs (plus
        # rare shared-edge tie-breaks, see tests/test_anchor.py)
        assert float((diff < 0.05 * scale).mean()) > 0.97


class TestInstancedAlphaSplit:
    """Two-level opaque/alpha instance split (ops/tlas.py::_two_level):
    all-opaque instances ride the fused kernel; alpha-carrying instances
    run the XLA body windowed by the opaque result."""

    def _scene(self):
        from vk_raytrace_tpu.models.procedural import bistro_scene

        pool, inst, mats, lights, cam, atlas = bistro_scene(detail=0.05)
        from vk_raytrace_tpu.ops.tlas import build_instanced_accel

        return pool, inst, mats, atlas, build_instanced_accel(pool, inst)

    def test_mask_matches_mesh_flags(self):
        pool, inst, mats, atlas, accel = self._scene()
        flags = np.asarray(pool.geometry.tri_flags)
        for i, mid in enumerate(np.asarray(inst.mesh_id)):
            lo = int(pool.tri_start[mid])
            cnt = int(pool.tri_count[mid])
            expect = bool(np.any(flags[lo:lo + cnt] & 2))
            assert bool(np.asarray(accel.inst_alpha)[i]) == expect
        assert bool(np.asarray(accel.inst_alpha).any())       # foliage
        assert not bool(np.asarray(accel.inst_alpha).all())   # street etc.

    def test_opaque_hits_unchanged_by_alpha_ctx(self):
        """Rays that hit opaque geometry in front of any alpha surface must
        return the identical hit with and without the alpha machinery."""
        from vk_raytrace_tpu.ops.traverse import AlphaCtx
        from vk_raytrace_tpu.ops.tlas import closest_hit_instanced
        from vk_raytrace_tpu.models.schema import SceneData  # noqa: F401

        pool, inst, mats, atlas, accel = self._scene()
        tm = pool.geometry.tri_material
        # straight down onto the street from above the tree line
        n = 256
        g = np.random.default_rng(1)
        o = np.stack([
            g.uniform(-40, 40, n), np.full(n, 25.0), g.uniform(-9, 9, n)
        ], -1).astype(np.float32)
        d = np.tile(np.asarray([[0.001, -1.0, 0.0]], np.float32), (n, 1))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        seed = jnp.arange(n, dtype=jnp.uint32)

        import jax

        ctx = jax.tree.map(jnp.asarray, AlphaCtx(materials=mats, atlas=atlas))
        hit_a, _ = closest_hit_instanced(
            accel, tm, jnp.asarray(o), jnp.asarray(d), seed=seed, alpha_ctx=ctx
        )
        hit_o, _ = closest_hit_instanced(
            accel, tm, jnp.asarray(o), jnp.asarray(d)
        )
        flags = np.asarray(pool.geometry.tri_flags)
        ta, to = np.asarray(hit_a.t), np.asarray(hit_o.t)
        tri_a, tri_o = np.asarray(hit_a.tri), np.asarray(hit_o.tri)
        # Lanes whose all-opaque result is NOT an alpha triangle and whose
        # alpha-split result picked the same surface class: t must agree.
        opaque_hit = (tri_o >= 0) & ((flags[np.maximum(tri_o, 0)] & 2) == 0)
        same = opaque_hit & (tri_a == tri_o)
        assert same.mean() > 0.5  # most street rays see no foliage
        np.testing.assert_allclose(ta[same], to[same], rtol=1e-5)
        # Every alpha-split hit is never FARTHER than the opaque-only hit
        # (alpha surfaces can only add nearer hits).
        both = (tri_a >= 0) & (tri_o >= 0)
        assert np.all(ta[both] <= to[both] * (1 + 1e-5))


class TestScanCandidate:
    """The chunked large-I candidate selector must match the dense path
    bit-for-bit: same hits, same instance ids, same t."""

    def test_scan_matches_dense(self, monkeypatch):
        pool, inst, baked = _build_both()
        accel = build_instanced_accel(pool, inst)
        o, d = _rays(n=1024, seed=11)
        hit_dense, _ = closest_hit_instanced(
            accel, pool.geometry.tri_material, o, d
        )
        monkeypatch.setenv("VKRT_TLAS_SCAN", "1")
        hit_scan, _ = closest_hit_instanced(
            accel, pool.geometry.tri_material, o, d
        )
        np.testing.assert_array_equal(
            np.asarray(hit_dense.tri), np.asarray(hit_scan.tri)
        )
        np.testing.assert_array_equal(
            np.asarray(hit_dense.inst), np.asarray(hit_scan.inst)
        )
        np.testing.assert_array_equal(
            np.asarray(hit_dense.t), np.asarray(hit_scan.t)
        )

    def test_scan_any_hit_matches_dense(self, monkeypatch):
        pool, inst, baked = _build_both()
        accel = build_instanced_accel(pool, inst)
        o, d = _rays(n=1024, seed=12)
        t_max = jnp.full((1024,), 4.0)
        occ_dense, _ = any_hit_instanced(
            accel, pool.geometry.tri_material, o, d, t_max
        )
        monkeypatch.setenv("VKRT_TLAS_SCAN", "1")
        occ_scan, _ = any_hit_instanced(
            accel, pool.geometry.tri_material, o, d, t_max
        )
        np.testing.assert_array_equal(
            np.asarray(occ_dense), np.asarray(occ_scan)
        )

    def test_many_instances_scan_auto(self):
        """>512 instances trip the scan path automatically and still
        enumerate overlaps correctly (grid of boxes, axis-aligned rays that
        pierce a whole row of instances)."""
        from vk_raytrace_tpu.ops import tlas as T

        bv, bi = _box([0, 0, 0], [0.8, 0.8, 0.8])
        ib = InstancedSceneBuilder()
        mid = ib.add_mesh(bv, bi, 0)
        side = 9  # 9^3 = 729 > _DENSE_I_MAX
        for ix in range(side):
            for iy in range(side):
                for iz in range(side):
                    m = np.eye(4)
                    m[:3, 3] = [ix * 2.0, iy * 2.0, iz * 2.0]
                    ib.add_instance(mid, m)
        pool, inst = ib.build()
        assert inst.aabb_min.shape[0] > T._DENSE_I_MAX
        accel = build_instanced_accel(pool, inst)
        # Rays along +x through the middle of each row of boxes: nearest
        # hit must be the first box of the row (instance id = ix 0).
        n = side * side
        ys, zs = np.meshgrid(np.arange(side), np.arange(side))
        o = np.stack(
            [np.full(n, -5.0), ys.ravel() * 2.0, zs.ravel() * 2.0], axis=1
        ).astype(np.float32)
        d = np.tile(np.asarray([[1.0, 0.0, 0.0]], np.float32), (n, 1))
        hit, _ = closest_hit_instanced(
            accel, pool.geometry.tri_material, jnp.asarray(o), jnp.asarray(d)
        )
        t = np.asarray(hit.t)
        assert (t < 1e30).all()
        np.testing.assert_allclose(t, 5.0 - 0.4, rtol=1e-5)
        # the hit instance is the ix=0 box of each (iy, iz) row
        inst_ids = np.asarray(hit.inst)
        want = ys.ravel() * side + zs.ravel()  # add_instance order: ix major
        np.testing.assert_array_equal(inst_ids, want)


def test_width32_instanced_matches_width16(monkeypatch):
    """VKRT_WIDE=32 instanced BLAS: the planar leaf-ref fixup factor is
    width/2 (native.cpp make_leaf leaf_code = row*kLeafMax + cnt-1), so a
    multi-mesh pool at width 32 must produce identical hits to width 16
    (regression: the fixup once hard-coded the width-16 factor 8)."""
    pool, inst, baked = _build_both()
    o, d = _rays(n=1024, seed=21)

    accel16 = build_instanced_accel(pool, inst)
    hit16, _ = closest_hit_instanced(accel16, pool.geometry.tri_material, o, d)

    monkeypatch.setenv("VKRT_WIDE", "32")
    accel32 = build_instanced_accel(pool, inst)
    assert accel32.blas_planar.width == 32
    hit32, _ = closest_hit_instanced(accel32, pool.geometry.tri_material, o, d)

    np.testing.assert_array_equal(np.asarray(hit16.tri), np.asarray(hit32.tri))
    np.testing.assert_array_equal(
        np.asarray(hit16.inst), np.asarray(hit32.inst)
    )
    np.testing.assert_allclose(
        np.asarray(hit16.t), np.asarray(hit32.t), rtol=1e-6
    )


class TestBlasLevelAlphaSplit:
    """BLAS-level opaque/alpha subset split (ops/tlas.py
    ``_two_level_alpha_pass``): every instance's opaque triangle subset
    rides the fused kernel, and the alpha subsets run fused candidate
    rounds with the stochastic test — replacing the XLA body that used to
    carry whole alpha-flagged meshes. Deterministic gates use BLEND
    materials at alpha factor 1.0 (every candidate accepts) and 0.0
    (every candidate rejects); the reference's encounter-order any-hit
    testing (pathtrace.rahit:53-114) is distribution-identical."""

    def _panels(self, alpha, mixed=False):
        from vk_raytrace_tpu.models.schema import ALPHA_BLEND

        quad_i = np.asarray([[0, 1, 2], [0, 2, 3]])
        ib = InstancedSceneBuilder()
        bs_v = np.asarray(
            [[-10, -10, 0], [10, -10, 0], [10, 10, 0], [-10, 10, 0]], float
        )
        m_bs = ib.add_mesh(bs_v, quad_i, 0)
        p_v = np.asarray(
            [[-2, -2, 0], [2, -2, 0], [2, 2, 0], [-2, 2, 0]], float
        )
        m_p = ib.add_mesh(p_v, quad_i, 1, alpha_mode=ALPHA_BLEND)
        eye = np.eye(4)
        ib.add_instance(m_bs, eye)
        for z in (2.0, 4.0, 6.0):
            m = np.eye(4)
            m[2, 3] = z
            ib.add_instance(m_p, m)
        pool, inst = ib.build()
        if mixed:
            # Hand-flag only the panel mesh's FIRST triangle as alpha: a
            # mixed mesh (the tree-trunk-plus-canopy case) whose opaque
            # triangle must ride the opaque-subset pass.
            flags = np.asarray(pool.geometry.tri_flags).copy()
            lo = int(pool.tri_start[m_p])
            flags[lo + 1] &= ~2
            pool = pool._replace(
                geometry=pool.geometry._replace(tri_flags=flags)
            )
        mats = make_materials([
            dict(base_color_factor=[0.5, 0.5, 0.5, 1.0]),
            dict(base_color_factor=[1.0, 1.0, 1.0, alpha],
                 alpha_mode=ALPHA_BLEND),
        ])
        return pool, inst, mats

    def _ctx(self, mats):
        import jax
        from vk_raytrace_tpu.models.schema import dummy_atlas
        from vk_raytrace_tpu.ops.traverse import AlphaCtx

        return jax.tree.map(
            jnp.asarray, AlphaCtx(materials=mats, atlas=dummy_atlas())
        )

    def _rays(self, n=64):
        g = np.random.default_rng(7)
        o = np.stack([
            g.uniform(-1.5, 1.5, n), g.uniform(-1.5, 1.5, n), np.full(n, 10.0)
        ], -1).astype(np.float32)
        d = np.tile(np.asarray([[0, 0, -1.0]], np.float32), (n, 1))
        return jnp.asarray(o), jnp.asarray(d)

    def _hit(self, alpha, split, mixed=False, monkeypatch=None):
        monkeypatch.setenv("VKRT_TLAS_SPLIT", "1" if split else "0")
        pool, inst, mats = self._panels(alpha, mixed=mixed)
        accel = build_instanced_accel(pool, inst)
        if split and accel.blas_planar_alp is None:
            pytest.skip("native planar builder unavailable")
        o, d = self._rays()
        seed = jnp.arange(o.shape[0], dtype=jnp.uint32)
        hit, _ = closest_hit_instanced(
            accel, pool.geometry.tri_material, o, d,
            seed=seed, alpha_ctx=self._ctx(mats),
        )
        return pool, accel, hit

    def test_opaque_alpha1_exact(self, monkeypatch):
        """alpha=1.0: every panel accepts -> nearest panel (t=4) exactly,
        identical to the instance-level split path."""
        _, _, hs = self._hit(1.0, split=True, monkeypatch=monkeypatch)
        _, _, hl = self._hit(1.0, split=False, monkeypatch=monkeypatch)
        np.testing.assert_allclose(np.asarray(hs.t), 4.0, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(hs.tri), np.asarray(hl.tri))
        np.testing.assert_allclose(
            np.asarray(hs.t), np.asarray(hl.t), rtol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(hs.inst), np.asarray(hl.inst)
        )

    def test_transparent_alpha0_exact(self, monkeypatch):
        """alpha=0.0: every panel rejects -> backstop (t=10) exactly."""
        pool, _, hs = self._hit(0.0, split=True, monkeypatch=monkeypatch)
        _, _, hl = self._hit(0.0, split=False, monkeypatch=monkeypatch)
        np.testing.assert_allclose(np.asarray(hs.t), 10.0, rtol=1e-5)
        tm = np.asarray(pool.geometry.tri_material)
        assert (tm[np.asarray(hs.tri)] == 0).all()
        np.testing.assert_array_equal(np.asarray(hs.tri), np.asarray(hl.tri))

    def test_mixed_mesh_opaque_subset(self, monkeypatch):
        """A mesh mixing opaque and alpha triangles: with alpha=0.0 the
        opaque triangle still blocks, the alpha one passes through."""
        pool, accel, hs = self._hit(
            0.0, split=True, mixed=True, monkeypatch=monkeypatch
        )
        assert bool(np.asarray(accel.inst_opaque)[1])   # mixed panel
        assert bool(np.asarray(accel.inst_alpha)[1])
        assert int(np.asarray(accel.mesh_root_alp)[0]) == -1  # backstop
        _, _, hl = self._hit(
            0.0, split=False, mixed=True, monkeypatch=monkeypatch
        )
        t = np.asarray(hs.t)
        assert set(np.round(t, 3)).issubset({4.0, 10.0})
        assert (t == 4.0).any() and (t == 10.0).any()
        np.testing.assert_array_equal(np.asarray(hs.tri), np.asarray(hl.tri))
        np.testing.assert_allclose(t, np.asarray(hl.t), rtol=1e-6)

    def test_any_hit_windows(self, monkeypatch):
        """Occlusion: alpha=1 panels occlude, alpha=0 panels never do
        (window short of the backstop)."""
        for alpha, want in ((1.0, True), (0.0, False)):
            monkeypatch.setenv("VKRT_TLAS_SPLIT", "1")
            pool, inst, mats = self._panels(alpha)
            accel = build_instanced_accel(pool, inst)
            if accel.blas_planar_alp is None:
                pytest.skip("native planar builder unavailable")
            o, d = self._rays(n=32)
            seed = jnp.arange(o.shape[0], dtype=jnp.uint32)
            occ, _ = any_hit_instanced(
                accel, pool.geometry.tri_material, o, d,
                t_max=jnp.full((32,), 9.0),
                seed=seed, alpha_ctx=self._ctx(mats),
            )
            assert bool(np.asarray(occ).all()) == want
            assert bool(np.asarray(occ).any()) == want

    def test_stochastic_distribution(self, monkeypatch):
        """alpha=0.5 through three panels: closest-hit lands t=4 w.p. 1/2,
        6 w.p. 1/4, 8 w.p. 1/8, backstop 1/8 — check the split path's
        empirical mean against the exact expectation."""
        monkeypatch.setenv("VKRT_TLAS_SPLIT", "1")
        pool, inst, mats = self._panels(0.5)
        accel = build_instanced_accel(pool, inst)
        if accel.blas_planar_alp is None:
            pytest.skip("native planar builder unavailable")
        n = 4096
        g = np.random.default_rng(3)
        o = np.stack([
            g.uniform(-1.5, 1.5, n), g.uniform(-1.5, 1.5, n),
            np.full(n, 10.0),
        ], -1).astype(np.float32)
        d = np.tile(np.asarray([[0, 0, -1.0]], np.float32), (n, 1))
        seed = rng.tea(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(11))
        hit, _ = closest_hit_instanced(
            accel, pool.geometry.tri_material, jnp.asarray(o),
            jnp.asarray(d), seed=seed, alpha_ctx=self._ctx(mats),
        )
        t = np.asarray(hit.t)
        expect = 0.5 * 4 + 0.25 * 6 + 0.125 * 8 + 0.125 * 10
        assert abs(t.mean() - expect) < 0.12, t.mean()
