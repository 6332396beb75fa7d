"""Texture mip chain (VERDICT r3 item 6).

The atlas packs each texture's mip pyramid as a strip with closed-form
level placement (ops/texture.py::mip_placement; models/textures.py), and
the integrators select a level per lane from a ray-cone footprint
(integrator/path.py::cone_lod, shade.py::_mip_lanes) — the reference
generates mips (scene.cpp:447-580) but its RT integrator samples LOD 0
everywhere (gltf_material.glsl), so this is a quality extension gated by
cfg.mip_sample / VKRT_MIPS.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from vk_raytrace_tpu.models.textures import AtlasBuilder
from vk_raytrace_tpu.ops.texture import downsample_2x2, n_mip_levels


def _checker(n=128, cell=2):
    img = np.zeros((n, n, 4), np.uint8)
    xx, yy = np.meshgrid(np.arange(n), np.arange(n))
    img[..., :3] = np.where(
        ((xx // cell + yy // cell) % 2 == 0)[..., None], 255, 0
    ).astype(np.uint8)
    img[..., 3] = 255
    return img


class TestAtlasMips:
    def test_strip_placement_and_content(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (64, 48, 4), np.uint8)
        b = AtlasBuilder()
        b.add(img, {})
        b.add(np.full((1, 1, 4), 200, np.uint8), {})  # 1x1: no chain
        atlas = b.build()
        assert atlas.mip_x[0] >= 0 and atlas.mip_x[1] == -1
        data = np.asarray(atlas.data)
        lvl_img = img
        w0, h0 = 48, 64
        for lvl in range(1, int(n_mip_levels(w0, h0)) + 1):
            lvl_img = downsample_2x2(lvl_img)
            ox = int(atlas.mip_x[0]) + w0 - (w0 >> (lvl - 1))
            oy = int(atlas.mip_y[0])
            got = data[oy : oy + lvl_img.shape[0], ox : ox + lvl_img.shape[1]]
            np.testing.assert_array_equal(got, lvl_img)

    def test_levels_no_overlap(self):
        """Strip placements never overlap for awkward (odd) sizes."""
        for w0, h0 in ((48, 64), (5, 9), (300, 200), (127, 33)):
            spans = []
            for lvl in range(1, int(n_mip_levels(w0, h0)) + 1):
                ox = w0 - (w0 >> (lvl - 1))
                wl = max(w0 >> lvl, 1)
                spans.append((ox, ox + wl))
            for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
                assert a1 <= b0, (w0, h0, spans)
            if spans:
                assert spans[-1][1] <= w0

    def test_mips_disabled(self):
        b = AtlasBuilder()
        b.add(_checker(), {})
        atlas = b.build(mips=False)
        assert atlas.mip_x is None or np.all(np.asarray(atlas.mip_x) < 0)


class TestLevelSelection:
    def _setup(self):
        from vk_raytrace_tpu.integrator.shade import pack_material_rows
        from vk_raytrace_tpu.models.schema import make_materials
        from vk_raytrace_tpu.ops.texture import build_tap_rows

        b = AtlasBuilder()
        tid = b.add(_checker(), {})
        atlas = b.build()
        mats = make_materials([dict(base_color_texture=tid)])
        prow = jnp.asarray(
            np.repeat(np.asarray(pack_material_rows(mats, atlas)), 4, axis=0)
        )
        tap_rows = jnp.asarray(build_tap_rows(atlas))
        return atlas, prow, tap_rows

    def test_level_zero_matches_lodless(self):
        from vk_raytrace_tpu.integrator.shade import _tap_footprint, _tap_packed

        atlas, prow, tap_rows = self._setup()
        uv = jnp.asarray([[0.13, 0.71], [0.5, 0.5], [0.98, 0.02], [0.25, 0.25]])
        lod0 = jnp.full((4,), -30.0)  # clamps to level 0
        for fn, args in (
            (_tap_footprint, (atlas, tap_rows, prow, "base_tex", uv)),
            (_tap_packed, (atlas, prow, "base_tex", uv)),
        ):
            a = np.asarray(fn(*args))
            b = np.asarray(fn(*args, lod=lod0))
            np.testing.assert_array_equal(a, b)

    def test_top_level_is_average(self):
        from vk_raytrace_tpu.integrator.shade import _tap_footprint

        atlas, prow, tap_rows = self._setup()
        uv = jnp.asarray([[0.5, 0.5]] * 4)
        out = np.asarray(
            _tap_footprint(
                atlas, tap_rows, prow, "base_tex", uv,
                lod=jnp.full((4,), 30.0),
            )
        )
        # 50/50 checker averages to ~0.5 at the 1-2 texel top level
        assert np.all(np.abs(out[:, :3] - 0.5) < 0.02), out

    def test_footprint_matches_packed_at_level(self):
        """The one-gather footprint tap and the 4-gather packed tap agree
        at every mip level (same wrap semantics per level rect)."""
        from vk_raytrace_tpu.integrator.shade import _tap_footprint, _tap_packed

        atlas, prow, tap_rows = self._setup()
        rng = np.random.default_rng(3)
        uv = jnp.asarray(rng.uniform(-1, 2, (64, 2)), jnp.float32)
        prow64 = jnp.asarray(np.repeat(np.asarray(prow[:1]), 64, axis=0))
        for lvl in (0.0, 1.0, 3.0, 6.0):
            lod = jnp.full((64,), lvl - 7.0)  # tap adds 0.5*log2(128*128)=7
            a = np.asarray(
                _tap_footprint(atlas, tap_rows, prow64, "base_tex", uv, lod=lod)
            )
            c = np.asarray(
                _tap_packed(atlas, prow64, "base_tex", uv, lod=lod)
            )
            np.testing.assert_allclose(a, c, atol=3e-6)


class TestMinification:
    def test_distant_checker_stable(self):
        """Grazing-distance checkerboard: per-jitter variance collapses with
        ray-cone mip selection (~10x measured) — the aliasing test from
        VERDICT r3 item 6."""
        from vk_raytrace_tpu import render as R
        from vk_raytrace_tpu.models.hdr import build_environment
        from vk_raytrace_tpu.models.procedural import (
            GeometryBuilder, _quad, look_at_camera,
        )
        from vk_raytrace_tpu.models.schema import (
            DEBUG_BASECOLOR, PBR_GLTF, RenderConfig, make_lights,
            make_materials,
        )

        b = AtlasBuilder()
        tid = b.add(_checker(), {})
        atlas = b.build()
        g = GeometryBuilder()
        fv, fi = _quad([-200, 0, 0], [-200, 0, 400], [200, 0, 400], [200, 0, 0])
        g.add_mesh(fv, fi, 0, uv=[[0, 0], [0, 200], [200, 200], [200, 0]])
        geom = g.build()
        mats = make_materials(
            [dict(base_color_factor=[1, 1, 1, 1], base_color_texture=tid,
                  metallic_factor=0.0, roughness_factor=1.0)]
        )
        cam = look_at_camera(
            eye=[0, 2.0, -3], center=[0, 0, 40], up=[0, 1, 0],
            fov_deg=45, aspect=1.0,
        )
        env = build_environment(np.ones((8, 16, 3), np.float32))
        cfg0 = RenderConfig(
            width=64, height=64, max_depth=1, max_samples=1,
            hdr_multiplier=1.0, pbr_mode=PBR_GLTF, rr=False,
            debug_mode=DEBUG_BASECOLOR,
        )
        var = {}
        for mips in (True, False):
            cfg = dataclasses.replace(cfg0, mip_sample=mips)
            scene = R.build_scene(
                geom, mats, make_lights([]), cam, env=env, atlas=atlas
            )
            frames = []
            for f in range(4):
                r = R.Renderer(scene, cfg)
                r.frame = f
                r.step()
                frames.append(np.asarray(r.accum).copy())
            band = np.stack(frames)[:, 28:36]
            var[mips] = float(band.var(axis=0).mean())
        assert var[True] < var[False] * 0.35, var
