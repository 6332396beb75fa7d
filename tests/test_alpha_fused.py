"""Fused alpha traversal (ops/traverse_alpha.py) vs the XLA alpha path.

The candidate-rounds scheme tests alpha surfaces in strict t-order while
the XLA body tests them in encounter order; both accept each surface
independently with probability ``opacity``, so:

* deterministic opacities (MASK mode, or BLEND with alpha 0/1) must give
  EXACT hit parity with the XLA path;
* fractional opacities must match in distribution (checked statistically).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vk_raytrace_tpu.models import procedural
from vk_raytrace_tpu.models.builder import GeometryBuilder
from vk_raytrace_tpu.models.schema import (
    ALPHA_BLEND, ALPHA_MASK, TextureAtlas, dummy_atlas, make_materials,
)
from vk_raytrace_tpu.ops import bvh8, rng as rngmod, traverse_wide as tw
from vk_raytrace_tpu.ops.traverse import AlphaCtx


def _checker_atlas(n: int = 8) -> TextureAtlas:
    """One n x n checkerboard alpha texture at atlas slot 0 (opaque white
    RGB; alpha alternates 255/0 per texel)."""
    data = np.full((8, 128, 4), 255, np.uint8)
    yy, xx = np.mgrid[0:n, 0:n]
    data[0:n, 0:n, 3] = np.where((xx + yy) % 2 == 0, 255, 0)
    return TextureAtlas(
        data=data,
        x=np.zeros((1,), np.int32),
        y=np.zeros((1,), np.int32),
        width=np.full((1,), n, np.int32),
        height=np.full((1,), n, np.int32),
        wrap_s=np.zeros((1,), np.int32),
        wrap_t=np.zeros((1,), np.int32),
    )


_QUAD_UV = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)


def _wall_and_quads(quad_mats, quad_z):
    """Axis-aligned +z-facing unit quads at given z depths (unit UVs), plus
    an opaque backstop wall at z=-5 (material index len(quad_mats))."""
    g = GeometryBuilder()
    for mat, z in zip(quad_mats, quad_z):
        v, i = procedural._quad([-5, -5, z], [5, -5, z], [5, 5, z], [-5, 5, z])
        g.add_mesh(v, i, mat["_idx"], uv=_QUAD_UV, double_sided=True,
                   alpha_mode=mat.get("alpha_mode", ALPHA_BLEND))
    v, i = procedural._quad([-9, -9, -5], [9, -9, -5], [9, 9, -5], [-9, 9, -5])
    g.add_mesh(v, i, len(quad_mats), uv=_QUAD_UV, double_sided=True)
    return g.build()


def _front_rays(n, seed=3, spread=4.5):
    """Rays from z=+8 aimed -z, jittered across the quads."""
    r = np.random.default_rng(seed)
    o = np.stack([
        r.uniform(-spread, spread, n), r.uniform(-spread, spread, n),
        np.full(n, 8.0),
    ], axis=1).astype(np.float32)
    d = np.broadcast_to(np.asarray([0, 0, -1], np.float32), (n, 3))
    return jnp.asarray(o), jnp.asarray(np.ascontiguousarray(d))


def _both_paths(fn, monkeypatch):
    monkeypatch.setenv("VKRT_FUSED", "1")
    out_fused = fn()
    monkeypatch.setenv("VKRT_FUSED", "0")
    out_xla = fn()
    return out_fused, out_xla


@pytest.fixture(scope="module")
def mask_checker():
    """MASK-mode checkerboard quad + opaque backstop: opacity is a
    deterministic function of the hit point."""
    mats = make_materials([
        dict(base_color_texture=0, alpha_mode=ALPHA_MASK, alpha_cutoff=0.5,
             double_sided=1),
        dict(base_color_factor=[0.5, 0.5, 0.5, 1.0], double_sided=1),
    ])
    geom = _wall_and_quads(
        [dict(_idx=0, alpha_mode=ALPHA_MASK)], [0.0]
    )
    bundle = bvh8.build_accel_bundle(geom)
    ctx = AlphaCtx(materials=mats, atlas=_checker_atlas())
    return geom, bundle, ctx


def test_bundle_carries_alpha_planar(mask_checker):
    _, bundle, _ = mask_checker
    assert bundle.alpha is not None
    assert bundle.alpha_planar is not None


def test_mask_closest_hit_exact_parity(mask_checker, monkeypatch):
    geom, bundle, ctx = mask_checker
    o, d = _front_rays(2049)
    seed = rngmod.tea(jnp.arange(2049, dtype=jnp.uint32), jnp.uint32(9))

    def run():
        hit, _ = tw.closest_hit_bundle(
            bundle, geom.tri_material, o, d, seed=seed, alpha_ctx=ctx
        )
        return hit

    hit_f, hit_x = _both_paths(run, monkeypatch)
    np.testing.assert_array_equal(np.asarray(hit_f.tri), np.asarray(hit_x.tri))
    np.testing.assert_allclose(
        np.asarray(hit_f.t), np.asarray(hit_x.t), rtol=1e-5, atol=1e-5
    )
    # Both surface classes must actually occur for the parity to mean much.
    tris = np.asarray(hit_f.tri)
    assert (geom.tri_flags[tris] & 2 != 0).any(), "no alpha-quad hits"
    assert (geom.tri_flags[tris] & 2 == 0).any(), "no backstop hits"


def test_mask_any_hit_exact_parity(mask_checker, monkeypatch):
    geom, bundle, ctx = mask_checker
    o, d = _front_rays(2048, seed=5)
    seed = rngmod.tea(jnp.arange(2048, dtype=jnp.uint32), jnp.uint32(11))
    t_max = jnp.full((2048,), 10.0)  # reaches the quad, not the backstop

    def run():
        occ, _ = tw.any_hit_bundle(
            bundle, geom.tri_material, o, d, t_max, seed=seed, alpha_ctx=ctx
        )
        return occ

    occ_f, occ_x = _both_paths(run, monkeypatch)
    np.testing.assert_array_equal(np.asarray(occ_f), np.asarray(occ_x))
    assert 0.2 < float(np.asarray(occ_f).mean()) < 0.8


def test_blend_opacity_distribution(monkeypatch):
    """Untextured BLEND quad, alpha 0.3: the fused path must hit with
    probability ~0.3 (the rest reach the backstop)."""
    mats = make_materials([
        dict(base_color_factor=[1, 1, 1, 0.3], alpha_mode=ALPHA_BLEND,
             double_sided=1),
        dict(double_sided=1),
    ])
    geom = _wall_and_quads([dict(_idx=0)], [0.0])
    bundle = bvh8.build_accel_bundle(geom)
    ctx = AlphaCtx(materials=mats, atlas=dummy_atlas())
    n = 1 << 14
    o, d = _front_rays(n, seed=7)
    seed = rngmod.tea(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(3))

    monkeypatch.setenv("VKRT_FUSED", "1")
    hit, _ = tw.closest_hit_bundle(
        bundle, geom.tri_material, o, d, seed=seed, alpha_ctx=ctx
    )
    on_quad = np.asarray(geom.tri_flags)[np.asarray(hit.tri)] & 2 != 0
    assert abs(float(on_quad.mean()) - 0.3) < 0.02


def test_blend_layers_transmission(monkeypatch):
    """Four stacked 0.5-alpha layers: candidate rounds must re-enter after
    each rejection; transmission to the backstop is 0.5^4."""
    mats = make_materials(
        [dict(base_color_factor=[1, 1, 1, 0.5], alpha_mode=ALPHA_BLEND,
              double_sided=1)] * 4
        + [dict(double_sided=1)]
    )
    geom = _wall_and_quads(
        [dict(_idx=k) for k in range(4)], [0.0, -1.0, -2.0, -3.0]
    )
    bundle = bvh8.build_accel_bundle(geom)
    ctx = AlphaCtx(materials=mats, atlas=dummy_atlas())
    n = 1 << 14
    o, d = _front_rays(n, seed=13)
    seed = rngmod.tea(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(21))

    monkeypatch.setenv("VKRT_FUSED", "1")
    occ, _ = tw.any_hit_bundle(
        bundle, geom.tri_material, o, d, jnp.full((n,), 12.0),
        seed=seed, alpha_ctx=ctx,
    )
    # t_max=12 stops short of the backstop: occlusion = any layer accepts.
    p_free = 1.0 - float(np.asarray(occ).mean())
    assert abs(p_free - 0.5 ** 4) < 0.012, p_free

    # Closest-hit layer distribution: P(layer k nearest-accepted) = 0.5^(k+1).
    hit, _ = tw.closest_hit_bundle(
        bundle, geom.tri_material, o, d, seed=seed, alpha_ctx=ctx
    )
    z_hit = 8.0 - np.asarray(hit.t)  # quads at z = 0,-1,-2,-3; wall at -5
    for k, z in enumerate([0.0, -1.0, -2.0, -3.0]):
        frac = float((np.abs(z_hit - z) < 1e-3).mean())
        assert abs(frac - 0.5 ** (k + 1)) < 0.02, (k, frac)


def test_fully_transparent_never_hits(monkeypatch):
    """BLEND alpha=0 must be invisible to both hit kinds through the fused
    path (every candidate rejected; rounds loop must terminate)."""
    mats = make_materials([
        dict(base_color_factor=[1, 1, 1, 0.0], alpha_mode=ALPHA_BLEND,
             double_sided=1),
        dict(double_sided=1),
    ])
    geom = _wall_and_quads([dict(_idx=0)], [0.0])
    bundle = bvh8.build_accel_bundle(geom)
    ctx = AlphaCtx(materials=mats, atlas=dummy_atlas())
    o, d = _front_rays(512, seed=2)
    seed = rngmod.tea(jnp.arange(512, dtype=jnp.uint32), jnp.uint32(1))

    monkeypatch.setenv("VKRT_FUSED", "1")
    hit, _ = tw.closest_hit_bundle(
        bundle, geom.tri_material, o, d, seed=seed, alpha_ctx=ctx
    )
    # Everyone lands on the backstop at t = 13.
    np.testing.assert_allclose(np.asarray(hit.t), 13.0, rtol=1e-5)
    occ, _ = tw.any_hit_bundle(
        bundle, geom.tri_material, o, d, jnp.full((512,), 12.0),
        seed=seed, alpha_ctx=ctx,
    )
    assert not np.asarray(occ).any()
