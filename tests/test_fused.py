"""Fused Pallas traversal (ops/traverse_fused.py) vs the XLA body.

Runs the kernel in Pallas interpret mode (automatic on CPU); semantics must
match ops/traverse_wide.py exactly on opaque trees: same hits, same t/u/v.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vk_raytrace_tpu.models import procedural
from vk_raytrace_tpu.ops import bvh8, traverse_fused as tf, traverse_wide as tw
from vk_raytrace_tpu.ops.traverse import INF


def _rays(n, key, center, radius):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    o = center + radius * (jax.random.uniform(k1, (n, 3)) * 2.0 - 1.0)
    d = jax.random.normal(k2, (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    return o, d


@pytest.fixture(scope="module")
def cornell():
    geom = procedural.cornell_box()[0]
    bundle = bvh8.build_accel_bundle(geom)
    return geom, bundle


def test_default_planar_is_16_wide(cornell):
    # With the native library present the bundle carries the 512B-row
    # 16-wide planar structure (native.cpp::build_bvh16).
    geom, bundle = cornell
    assert bundle.opaque_planar is not None
    assert bundle.opaque_planar.width == 16
    assert bundle.opaque_planar.rows.shape[1] == 128


@pytest.mark.parametrize("width", [8, 16, 32])
def test_closest_hit_both_widths(width, cornell):
    geom, bundle = cornell
    planar = (tf.planarize(bundle.opaque) if width == 8
              else tf.planar_native(geom, width=width))
    assert planar is not None and planar.width == width
    o, d = _rays(257, 7, jnp.array([0.0, 1.0, 0.0]), 0.9)
    hit_x, _ = tw.closest_hit_wide(bundle.opaque, geom.tri_material, o, d)
    hit_f = tf.closest_hit_fused(planar, o, d)
    np.testing.assert_array_equal(np.asarray(hit_f.tri), np.asarray(hit_x.tri))
    np.testing.assert_allclose(
        np.asarray(hit_f.t), np.asarray(hit_x.t), rtol=1e-5, atol=1e-6
    )


def test_planarize_roundtrip(cornell):
    geom, bundle = cornell
    rows = np.asarray(bundle.opaque.rows)
    planar = np.asarray(tf.planarize(bundle.opaque).rows)
    interior = tf._interior_mask(rows)
    assert interior[0]
    # Interior: bmin.x of child c moved from lane c*6 to lane c.
    ii = np.where(interior)[0]
    np.testing.assert_array_equal(planar[ii][:, 0:8], rows[ii][:, 0:48:6])
    np.testing.assert_array_equal(planar[ii][:, 48:56], rows[ii][:, 48:56])
    # Leaf: attr a of tri t moved from lane t*16+a to lane a*4+t.
    ll = np.where(~interior)[0]
    if len(ll):
        np.testing.assert_array_equal(
            planar[ll][:, 0:4], rows[ll][:, 0:64:16]
        )


def test_bitonic8_sorts():
    key = jax.random.normal(jax.random.PRNGKey(0), (8, 256))
    ref = jnp.arange(8, dtype=jnp.float32)[:, None] * jnp.ones((8, 256))

    # Interpret-mode kernel wrapping the sort helper.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(k_ref, r_ref, ok_ref, or_ref):
        sub = jax.lax.broadcasted_iota(jnp.int32, k_ref.shape, 0)
        k, r = tf._bitonic(k_ref[:], r_ref[:], sub, 8)
        ok_ref[:] = k
        or_ref[:] = r

    ks, rs = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct(key.shape, jnp.float32),
            jax.ShapeDtypeStruct(key.shape, jnp.float32),
        ],
        interpret=True,
    )(key, ref)
    expect = jnp.sort(key, axis=0)
    np.testing.assert_allclose(np.asarray(ks), np.asarray(expect), rtol=0, atol=0)
    # Payload followed its key.
    order = jnp.argsort(key, axis=0)
    np.testing.assert_allclose(
        np.asarray(rs), np.asarray(jnp.take_along_axis(ref, order, axis=0))
    )


@pytest.mark.parametrize("scene_key", ["cornell", "city"])
def test_closest_hit_matches_xla(scene_key, cornell):
    if scene_key == "cornell":
        geom, bundle = cornell
        center, radius = jnp.array([0.0, 1.0, 0.0]), 0.9
    else:
        geom = procedural.city_scene()[0]
        bundle = bvh8.build_accel_bundle(geom)
        center, radius = jnp.array([0.0, 5.0, 0.0]), 8.0
    o, d = _rays(257, 1, center, radius)  # odd count exercises padding
    tm = geom.tri_material

    hit_x, _ = tw.closest_hit_wide(bundle.opaque, tm, o, d)
    hit_f = tf.closest_hit_fused(bundle.opaque_planar, o, d)

    np.testing.assert_array_equal(np.asarray(hit_f.tri), np.asarray(hit_x.tri))
    np.testing.assert_allclose(
        np.asarray(hit_f.t), np.asarray(hit_x.t), rtol=1e-5, atol=1e-6
    )
    m = np.asarray(hit_x.tri) >= 0
    np.testing.assert_allclose(
        np.asarray(hit_f.u)[m], np.asarray(hit_x.u)[m], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(hit_f.v)[m], np.asarray(hit_x.v)[m], rtol=1e-4, atol=1e-5
    )


def test_any_hit_matches_xla(cornell):
    geom, bundle = cornell
    o, d = _rays(257, 2, jnp.array([0.0, 1.0, 0.0]), 0.9)
    tm = geom.tri_material
    t_max = jnp.full((257,), 0.7)
    occ_x, _ = tw.any_hit_wide(bundle.opaque, tm, o, d, t_max)
    occ_f = tf.any_hit_fused(bundle.opaque_planar, o, d, t_max)
    np.testing.assert_array_equal(np.asarray(occ_f), np.asarray(occ_x))


def test_active_mask_respected(cornell):
    geom, bundle = cornell
    o, d = _rays(128, 3, jnp.array([0.0, 1.0, 0.0]), 0.9)
    act = jnp.arange(128) % 2 == 0
    hit = tf.closest_hit_fused(bundle.opaque_planar, o, d, active=act)
    assert np.all(np.asarray(hit.tri)[1::2] == -1)
    assert np.all(np.asarray(hit.t)[1::2] >= INF)


def test_bundle_routes_to_fused(cornell, monkeypatch):
    geom, bundle = cornell
    monkeypatch.setenv("VKRT_FUSED", "1")
    o, d = _rays(64, 4, jnp.array([0.0, 1.0, 0.0]), 0.9)
    seed = jnp.arange(64, dtype=jnp.uint32)
    hit_b, seed_b = tw.closest_hit_bundle(bundle, geom.tri_material, o, d, seed=seed)
    monkeypatch.setenv("VKRT_FUSED", "0")
    hit_x, seed_x = tw.closest_hit_bundle(bundle, geom.tri_material, o, d, seed=seed)
    np.testing.assert_array_equal(np.asarray(hit_b.tri), np.asarray(hit_x.tri))
    np.testing.assert_allclose(
        np.asarray(hit_b.t), np.asarray(hit_x.t), rtol=1e-5, atol=1e-6
    )


def test_instanced_fused_matches_xla(monkeypatch):
    """Two-level traversal with the fused BLAS kernel (per-lane roots) vs
    the XLA body — identical hits (ops/tlas.py round structure is shared;
    only the inner BLAS traversal differs)."""
    from tests.test_instancing import _build_both, _rays
    from vk_raytrace_tpu.ops import tlas

    pool, inst_table, _ = _build_both()
    accel = tlas.build_instanced_accel(pool, inst_table)
    tm_pool = pool.geometry.tri_material
    o, d = _rays(512, 5)
    monkeypatch.setenv("VKRT_FUSED", "0")
    hit_x, _ = tlas.closest_hit_instanced(accel, tm_pool, o, d)
    monkeypatch.setenv("VKRT_FUSED", "1")
    hit_f, _ = tlas.closest_hit_instanced(accel, tm_pool, o, d)
    np.testing.assert_array_equal(np.asarray(hit_f.tri), np.asarray(hit_x.tri))
    np.testing.assert_allclose(
        np.asarray(hit_f.t), np.asarray(hit_x.t), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(hit_f.inst), np.asarray(hit_x.inst))


def test_width32_policy_full_bundle(monkeypatch):
    """VKRT_WIDE=32 routes the whole accel bundle (opaque + alpha trees)
    through 1024-byte 32-wide rows; hits must match the 8-wide XLA body
    exactly — including the stochastic alpha path, which consumes the SAME
    RNG sequence regardless of row width."""
    monkeypatch.setenv("VKRT_WIDE", "32")
    monkeypatch.setenv("VKRT_FUSED", "1")
    geom = procedural.city_scene(n_blocks=6)[0]  # includes alpha panels
    bundle = bvh8.build_accel_bundle(geom)
    assert bundle.opaque_planar is not None
    assert bundle.opaque_planar.width == 32
    assert bundle.opaque_planar.rows.shape[1] == 256
    if bundle.alpha_planar is not None:
        assert bundle.alpha_planar.width == 32

    o, d = _rays(512, 11, jnp.array([0.0, 4.0, 0.0]), 20.0)
    seed = jnp.arange(512, dtype=jnp.uint32)
    hit_f, _ = tw.closest_hit_bundle(bundle, geom.tri_material, o, d, seed=seed)
    monkeypatch.setenv("VKRT_FUSED", "0")
    hit_x, _ = tw.closest_hit_bundle(bundle, geom.tri_material, o, d, seed=seed)
    np.testing.assert_array_equal(np.asarray(hit_f.tri), np.asarray(hit_x.tri))
    np.testing.assert_allclose(
        np.asarray(hit_f.t), np.asarray(hit_x.t), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("k_rows", [3, 5])
def test_short_stack_overflow_rerun(k_rows, cornell, monkeypatch):
    """Short-stack overflow path: with STACK_ROWS forced below the tree's
    builder bound (cornell: 7), lanes that would push past K rows must be
    re-run at full depth and end bit-identical to the XLA body. k=3
    overflows most lanes (full-width re-run branch); k=5 only some."""
    geom, bundle = cornell
    planar = bundle.opaque_planar
    assert planar.stack_depth > k_rows
    o, d = _rays(513, 3, jnp.array([0.0, 1.0, 0.0]), 0.9)
    hit_x, _ = tw.closest_hit_wide(bundle.opaque, geom.tri_material, o, d)
    monkeypatch.setattr(tf, "STACK_ROWS", k_rows)
    hit_f = tf.closest_hit_fused(planar, o, d)
    np.testing.assert_array_equal(np.asarray(hit_f.tri), np.asarray(hit_x.tri))
    np.testing.assert_allclose(
        np.asarray(hit_f.t), np.asarray(hit_x.t), rtol=1e-5, atol=1e-6
    )


def test_short_stack_overflow_tier_rerun(cornell, monkeypatch):
    """Wide batch (r > BLK) with a slightly-short stack exercises the
    NARROW-tier re-run branch (overflow lanes gathered to r/16)."""
    geom, bundle = cornell
    planar = bundle.opaque_planar
    monkeypatch.setattr(tf, "STACK_ROWS", planar.stack_depth - 1)
    o, d = _rays(2 * tf.BLK + 17, 9, jnp.array([0.0, 1.0, 0.0]), 0.9)
    hit_x, _ = tw.closest_hit_wide(bundle.opaque, geom.tri_material, o, d)
    hit_f = tf.closest_hit_fused(planar, o, d)
    np.testing.assert_array_equal(np.asarray(hit_f.tri), np.asarray(hit_x.tri))
    np.testing.assert_allclose(
        np.asarray(hit_f.t), np.asarray(hit_x.t), rtol=1e-5, atol=1e-6
    )


def test_root_descent_prologue_parity(cornell, monkeypatch):
    """VKRT_ROOTPRO=1 (the XLA root-descent prologue — OPT-IN: measured a
    2.8x regression on TPU, kept as a documented negative result) must be
    traversal-exact vs the default all-kernel path."""
    geom, bundle = cornell
    o, d = _rays(257, 3, jnp.array([0.0, 1.0, 0.0]), 0.9)

    monkeypatch.delenv("VKRT_ROOTPRO", raising=False)
    hit_off = tf.closest_hit_fused(bundle.opaque_planar, o, d)
    monkeypatch.setenv("VKRT_ROOTPRO", "1")
    hit_on = tf.closest_hit_fused(bundle.opaque_planar, o, d)

    np.testing.assert_array_equal(np.asarray(hit_on.tri), np.asarray(hit_off.tri))
    np.testing.assert_allclose(
        np.asarray(hit_on.t), np.asarray(hit_off.t), rtol=1e-6, atol=1e-7
    )
    t_max = jnp.full((257,), 0.7)
    monkeypatch.delenv("VKRT_ROOTPRO", raising=False)
    occ_off = tf.any_hit_fused(bundle.opaque_planar, o, d, t_max)
    monkeypatch.setenv("VKRT_ROOTPRO", "1")
    occ_on = tf.any_hit_fused(bundle.opaque_planar, o, d, t_max)
    np.testing.assert_array_equal(np.asarray(occ_on), np.asarray(occ_off))
