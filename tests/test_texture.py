"""Texture sampling: footprint-row taps vs the 4-gather reference path.

``build_tap_rows`` + ``_tap_footprint`` must reproduce ``sample_atlas``
(level-0 bilinear, per-texture wrap modes — scene.cpp:447-580 semantics)
for every wrap mode and across texture-region boundaries in the atlas.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vk_raytrace_tpu.models.schema import TextureAtlas
from vk_raytrace_tpu.integrator import shade
from vk_raytrace_tpu.ops import texture


def _make_atlas(wrap_s, wrap_t, seed=0):
    """Two textures side by side in one atlas so footprints must not leak
    across region boundaries: 8x6 at (0,0) and 4x4 at (8,0)."""
    rng = np.random.default_rng(seed)
    data = np.zeros((8, 16, 4), np.uint8)
    data[:6, :8] = rng.integers(0, 256, (6, 8, 4), dtype=np.uint8)
    data[:4, 8:12] = rng.integers(0, 256, (4, 4, 4), dtype=np.uint8)
    return TextureAtlas(
        data=data,
        x=np.asarray([0, 8], np.int32),
        y=np.asarray([0, 0], np.int32),
        width=np.asarray([8, 4], np.int32),
        height=np.asarray([6, 4], np.int32),
        wrap_s=np.asarray([wrap_s] * 2, np.int32),
        wrap_t=np.asarray([wrap_t] * 2, np.int32),
    )


def _prow_for(atlas, tex_id, n):
    """A minimal packed material row carrying only base_tex placement."""
    prow = np.zeros((n, shade._PACK_LANES), np.float32)
    o = shade._OFFS["base_tex"]
    t = max(tex_id, 0)
    prow[:, o] = tex_id
    prow[:, o + 1] = atlas.x[t]
    prow[:, o + 2] = atlas.y[t]
    prow[:, o + 3] = atlas.width[t]
    prow[:, o + 4] = atlas.height[t]
    prow[:, o + 5] = atlas.wrap_s[t] * 3 + atlas.wrap_t[t]
    return jnp.asarray(prow)


@pytest.mark.parametrize("wrap", [0, 1, 2], ids=["repeat", "clamp", "mirror"])
@pytest.mark.parametrize("tex", [0, 1])
def test_footprint_matches_sample_atlas(wrap, tex):
    atlas = _make_atlas(wrap, wrap, seed=wrap * 2 + tex)
    rows = jnp.asarray(texture.build_tap_rows(atlas))
    rng = np.random.default_rng(99)
    # Spread uv well outside [0,1] to exercise wrap branches and hit texel
    # centers/edges exactly (integer and half-integer uv grid points).
    uv_rand = rng.uniform(-2.3, 3.1, (256, 2)).astype(np.float32)
    grid = np.stack(
        np.meshgrid(np.linspace(-1, 2, 13), np.linspace(-1, 2, 13)), -1
    ).reshape(-1, 2).astype(np.float32)
    uv = jnp.asarray(np.concatenate([uv_rand, grid]))
    n = uv.shape[0]
    tid = jnp.full((n,), tex, jnp.int32)

    want = texture.sample_atlas(atlas, tid, uv)
    prow = _prow_for(atlas, tex, n)
    got = shade._tap_footprint(atlas, rows, prow, "base_tex", uv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_footprint_invalid_texture_is_white():
    atlas = _make_atlas(0, 0)
    rows = jnp.asarray(texture.build_tap_rows(atlas))
    uv = jnp.asarray([[0.3, 0.7]], jnp.float32)
    prow = _prow_for(atlas, -1, 1)
    got = shade._tap_footprint(atlas, rows, prow, "base_tex", uv)
    np.testing.assert_array_equal(np.asarray(got), 1.0)


def test_mixed_wrap_modes():
    atlas = _make_atlas(0, 2)  # repeat in s, mirror in t
    rows = jnp.asarray(texture.build_tap_rows(atlas))
    rng = np.random.default_rng(7)
    uv = jnp.asarray(rng.uniform(-2, 3, (512, 2)).astype(np.float32))
    tid = jnp.zeros((512,), jnp.int32)
    want = texture.sample_atlas(atlas, tid, uv)
    got = shade._tap_footprint(
        atlas, rows, _prow_for(atlas, 0, 512), "base_tex", uv
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_resolve_material_tap_rows_parity():
    """End-to-end: resolve_material with tap_rows == without (same scene)."""
    from vk_raytrace_tpu.models import procedural
    from vk_raytrace_tpu import render as R

    geom, mats, lights, cam, atlas = procedural.helmet_scene(
        n_lat=24, n_lon=48
    )
    scene = R.build_scene(geom, mats, lights, cam, atlas=atlas)
    n = 64
    rng = np.random.default_rng(3)
    tri = jnp.asarray(
        rng.integers(0, len(np.asarray(geom.indices)), n, dtype=np.int32)
    )
    u = jnp.asarray(rng.uniform(0, 0.5, n).astype(np.float32))
    v = jnp.asarray(rng.uniform(0, 0.5, n).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ss = shade.get_shade_state(
        scene.geometry, tri, u, v, shade_rows=scene.shade_rows
    )
    a = shade.resolve_material(ss, scene.materials, scene.atlas, d)
    b = shade.resolve_material(
        ss, scene.materials, scene.atlas, d, tap_rows=scene.tap_rows
    )
    for name in ("albedo", "roughness", "metallic", "emission"):
        np.testing.assert_allclose(
            np.asarray(getattr(a.mat, name)),
            np.asarray(getattr(b.mat, name)),
            atol=3e-6,
            err_msg=name,
        )
    np.testing.assert_allclose(
        np.asarray(a.normal), np.asarray(b.normal), atol=3e-6
    )
