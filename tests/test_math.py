"""Unit tests for the shared math kernels (SURVEY.md §4.1)."""

import numpy as np
import jax.numpy as jnp

from vk_raytrace_tpu.ops import math as vmath


def _rand_unit(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)


class TestOctCompression:
    def test_roundtrip_accuracy(self):
        v = _rand_unit(4096)
        packed = vmath.oct_encode(jnp.asarray(v))
        out = np.asarray(vmath.oct_decode(packed)).astype(np.float64)
        out /= np.linalg.norm(out, axis=1, keepdims=True)
        dots = np.sum(out * v.astype(np.float64), axis=1)
        # 2x16-bit octahedral worst-case error is ~1e-4 radians => dot > 1-1e-8,
        # but the encode path rounds in f32, so allow a small extra margin.
        assert np.all(dots > 1.0 - 5e-7), float(dots.min())

    def test_axes_exact(self):
        axes = np.array(
            [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
            np.float32,
        )
        out = np.asarray(vmath.oct_decode(vmath.oct_encode(jnp.asarray(axes))))
        assert np.allclose(out, axes, atol=1e-6)

    def test_lower_hemisphere_fold(self):
        v = _rand_unit(4096, seed=1)
        v[:, 2] = -np.abs(v[:, 2])  # force lower hemisphere
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        out = np.asarray(vmath.oct_decode(vmath.oct_encode(jnp.asarray(v)))).astype(np.float64)
        out /= np.linalg.norm(out, axis=1, keepdims=True)
        assert np.all(np.sum(out * v.astype(np.float64), axis=1) > 1.0 - 5e-7)

    def test_unit_output(self):
        v = _rand_unit(512, seed=2)
        out = np.asarray(vmath.oct_decode(vmath.oct_encode(jnp.asarray(v))))
        assert np.allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-6)


class TestOffsetRay:
    def test_moves_off_surface(self):
        """Property from Ray Tracing Gems ch.6: the offset point must be
        strictly on the normal side (common.glsl:98-113)."""
        rng = np.random.default_rng(3)
        p = rng.uniform(-100, 100, size=(4096, 3)).astype(np.float32)
        n = _rand_unit(4096, seed=4)
        q = np.asarray(vmath.offset_ray(jnp.asarray(p), jnp.asarray(n)))
        d = np.sum((q - p) * n, axis=1)
        assert np.all(d > 0.0)

    def test_small_magnitude(self):
        p = np.asarray([[1.0, 2.0, 3.0]], np.float32)
        n = np.asarray([[0.0, 1.0, 0.0]], np.float32)
        q = np.asarray(vmath.offset_ray(jnp.asarray(p), jnp.asarray(n)))
        assert np.linalg.norm(q - p) < 1e-3


class TestFrames:
    def test_coordinate_system_orthonormal(self):
        n = jnp.asarray(_rand_unit(1024, seed=5))
        t, b = vmath.make_coordinate_system(n)
        t, b, n = map(np.asarray, (t, b, n))
        assert np.allclose(np.sum(t * n, axis=1), 0, atol=1e-5)
        assert np.allclose(np.sum(b * n, axis=1), 0, atol=1e-5)
        assert np.allclose(np.sum(t * b, axis=1), 0, atol=1e-5)
        assert np.allclose(np.linalg.norm(b, axis=1), 1, atol=1e-5)

    def test_local_roundtrip(self):
        n = jnp.asarray(_rand_unit(256, seed=6))
        t, b = vmath.make_coordinate_system(n)
        v = jnp.asarray(_rand_unit(256, seed=7))
        loc = vmath.to_local(v, t, b, n)
        back = vmath.from_local(loc, t, b, n)
        assert np.allclose(np.asarray(back), np.asarray(v), atol=1e-5)


class TestSphericalUv:
    def test_ranges(self):
        v = jnp.asarray(_rand_unit(2048, seed=8))
        uv = np.asarray(vmath.spherical_uv(v))
        assert uv[:, 0].min() >= 0 and uv[:, 0].max() <= 1
        assert uv[:, 1].min() >= 0 and uv[:, 1].max() <= 1

    def test_cardinal_directions(self):
        # -y (down) maps to v=1 edge region; +x maps to u=0.5.
        uv = np.asarray(vmath.spherical_uv(jnp.asarray([[1.0, 0, 0]], jnp.float32)))
        assert abs(uv[0, 0] - 0.5) < 1e-6 and abs(uv[0, 1] - 0.5) < 1e-6
        uv = np.asarray(vmath.spherical_uv(jnp.asarray([[0.0, -1.0, 0]], jnp.float32)))
        assert abs(uv[0, 1] - 1.0) < 1e-6


class TestGlslHelpers:
    def test_reflect(self):
        i = jnp.asarray([[1.0, -1.0, 0.0]], jnp.float32) / np.sqrt(2)
        n = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
        r = np.asarray(vmath.reflect(i, n))
        assert np.allclose(r, [[1 / np.sqrt(2), 1 / np.sqrt(2), 0]], atol=1e-6)

    def test_refract_tir(self):
        # Shallow ray from dense medium: total internal reflection -> zero.
        i = jnp.asarray([[0.9, -np.sqrt(1 - 0.81), 0.0]], jnp.float32)
        n = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
        r = np.asarray(vmath.refract(i, n, jnp.asarray([1.5], jnp.float32)))
        assert np.allclose(r, 0.0)

    def test_power_heuristic(self):
        out = float(vmath.power_heuristic(jnp.float32(2.0), jnp.float32(1.0)))
        assert abs(out - 4.0 / 5.0) < 1e-6
