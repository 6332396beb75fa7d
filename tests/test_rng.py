"""RNG parity tests against the GLSL reference algorithms (random.glsl)."""

import numpy as np
import jax.numpy as jnp

from vk_raytrace_tpu.ops import rng


def _tea_ref(v0, v1):
    """Plain-python TEA-16 (random.glsl:34-48) for cross-checking."""
    mask = 0xFFFFFFFF
    s0 = 0
    for _ in range(16):
        s0 = (s0 + 0x9E3779B9) & mask
        v0 = (v0 + ((((v1 << 4) & mask) + 0xA341316C) ^ ((v1 + s0) & mask) ^ ((v1 >> 5) + 0xC8013EA4))) & mask
        v1 = (v1 + ((((v0 << 4) & mask) + 0xAD90777D) ^ ((v0 + s0) & mask) ^ ((v0 >> 5) + 0x7E95761E))) & mask
    return v0


def _pcg_ref(state):
    mask = 0xFFFFFFFF
    prev = (state * 747796405 + 2891336453) & mask
    word = (((prev >> ((prev >> 28) + 4)) ^ prev) * 277803737) & mask
    return prev, (word >> 22) ^ word


class TestTea:
    def test_matches_reference(self):
        pairs = [(0, 0), (1, 0), (0, 1), (123456, 789), (0xFFFFFFFF, 0xFFFFFFFF)]
        v0 = jnp.asarray([p[0] for p in pairs], jnp.uint32)
        v1 = jnp.asarray([p[1] for p in pairs], jnp.uint32)
        got = np.asarray(rng.tea(v0, v1))
        want = np.asarray([_tea_ref(*p) for p in pairs], np.uint32)
        assert np.array_equal(got, want)

    def test_decorrelates(self):
        n = 1 << 14
        seeds = np.asarray(rng.tea(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(0)))
        assert len(np.unique(seeds)) == n


class TestPcg:
    def test_matches_reference(self):
        states = [0, 1, 42, 0xDEADBEEF]
        s = jnp.asarray(states, jnp.uint32)
        s2, bits = rng.pcg(s)
        for i, st in enumerate(states):
            ref_s, ref_b = _pcg_ref(st)
            assert int(s2[i]) == ref_s
            assert int(bits[i]) == ref_b

    def test_rand_range_and_mean(self):
        seed = rng.tea(jnp.arange(1 << 16, dtype=jnp.uint32), jnp.uint32(7))
        _, u = rng.rand(seed)
        u = np.asarray(u)
        assert u.min() >= 0.0 and u.max() < 1.0
        assert abs(u.mean() - 0.5) < 0.01
        assert abs(u.var() - 1.0 / 12.0) < 0.01

    def test_stream_advances(self):
        seed = jnp.full((4,), 99, jnp.uint32)
        seed, a = rng.rand(seed)
        seed, b = rng.rand(seed)
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_bits_to_unit_float_exact(self):
        # (r >> 9) / 2^23 must equal the GLSL mantissa-bit trick exactly.
        bits = jnp.asarray([0, 511, 512, 0xFFFFFFFF], jnp.uint32)
        f = np.asarray(rng.bits_to_unit_float(bits))
        expect = (np.asarray([0, 511, 512, 0xFFFFFFFF], np.uint64) >> 9) / 2.0**23
        assert np.allclose(f, expect.astype(np.float32), rtol=0, atol=0)


class TestPcgNd:
    def test_pcg3d_changes_all_lanes(self):
        v = jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.uint32)
        out = np.asarray(rng.pcg3d(v))
        assert out.shape == (2, 3)
        assert len(np.unique(out)) == 6
