"""Environment importance sampling tests (SURVEY.md §4.1: alias-map
invariants + sampling distribution)."""

import numpy as np
import jax
import jax.numpy as jnp

from vk_raytrace_tpu.models import hdr as hdr_mod
from vk_raytrace_tpu.ops import env as env_ops
from vk_raytrace_tpu.ops import rng
from vk_raytrace_tpu.ops.math import spherical_uv


def _alias_table_ref(importance):
    """Sequential reference implementation (hdr_sampling.cpp:107-176)."""
    data = np.asarray(importance, np.float64)
    size = len(data)
    total = data.sum()
    q = data * size / total
    alias = np.arange(size)
    part = np.zeros(size, np.int64)
    s, large = 0, size
    for i in range(size):
        if q[i] < 1.0:
            part[s] = i
            s += 1
        else:
            large -= 1
            part[large] = i
    s = 0
    while s < large and large < size:
        small_i = part[s]
        high_i = part[large]
        alias[small_i] = high_i
        q[high_i] -= 1.0 - q[small_i]
        if q[high_i] < 1.0:
            large += 1
        s += 1
    return q, alias, total


def _effective_mass(q, alias):
    """Selection mass per texel under the sampler's semantics
    (env_sampling.glsl:55-73): accept with prob min(q,1), else take alias."""
    q = np.clip(np.asarray(q, np.float64), 0.0, 1.0)
    mass = q.copy()
    np.add.at(mass, np.asarray(alias), 1.0 - q)
    return mass


class TestAliasTable:
    def test_mass_distribution(self):
        """The effective selection distribution must closely match the target
        p_i (total-variation distance). The single-alias scheme (ours AND the
        sequential reference) has small per-texel boundary errors, so we test
        in aggregate."""
        r = np.random.default_rng(0)
        imp = r.exponential(size=512).astype(np.float32)
        imp[7] *= 100  # a "sun" texel
        q, alias, total = hdr_mod.build_alias_table(jnp.asarray(imp))
        n = len(imp)
        mass = _effective_mass(q, alias)
        target = imp / imp.sum() * n
        assert abs(mass.sum() - n) < 1e-3 * n
        tv = 0.5 * np.abs(mass - target).sum() / n
        assert tv < 0.01, tv

    def test_q_in_range(self):
        r = np.random.default_rng(1)
        imp = r.exponential(size=256).astype(np.float32)
        q, alias, _ = hdr_mod.build_alias_table(jnp.asarray(imp))
        q = np.asarray(q)
        assert (q > -1e-4).all() and (q < 1.0 + 1e-4 + np.asarray(q).max()).all()
        # aliases of small texels must point at (originally) large texels
        n = len(imp)
        q0 = imp * n / imp.sum()
        small = q0 < 1.0
        assert np.all(q0[np.asarray(alias)[small]] >= 1.0)

    def test_uniform_importance_identity(self):
        imp = jnp.ones((64,), jnp.float32)
        q, alias, total = hdr_mod.build_alias_table(imp)
        assert np.allclose(np.asarray(q), 1.0)
        assert np.array_equal(np.asarray(alias), np.arange(64))

    def test_matches_sequential_quality(self):
        """Parallel construction pairs texels differently than the sequential
        reference, but both must approximate the target distribution equally
        well (TV distance within 2x of the sequential builder's)."""
        r = np.random.default_rng(2)
        imp = r.exponential(size=128).astype(np.float32)
        q_ref, alias_ref, _ = _alias_table_ref(imp)
        q_par, alias_par, _ = hdr_mod.build_alias_table(jnp.asarray(imp))
        n = len(imp)
        target = imp / imp.sum() * n
        tv_ref = 0.5 * np.abs(_effective_mass(q_ref, alias_ref) - target).sum() / n
        tv_par = 0.5 * np.abs(_effective_mass(q_par, alias_par) - target).sum() / n
        assert tv_par <= max(2.0 * tv_ref, 5e-3), (tv_par, tv_ref)


class TestEnvironmentSampling:
    def _env(self):
        img = hdr_mod.procedural_sky_hdr(h=16, w=32)
        return hdr_mod.build_environment(img)

    def test_pdf_integrates_to_one(self):
        """Sum over texels of pdf * solid_angle == 1 (SURVEY.md §4.1)."""
        env = self._env()
        h, w = env.image.shape[:2]
        ys = np.arange(h)
        st = np.pi / h
        omega = (np.cos(ys * st) - np.cos((ys + 1) * st)) * (2 * np.pi / w)
        pdf = np.asarray(env.accel.pdf).reshape(h, w)
        total = (pdf * omega[:, None]).sum()
        assert abs(total - 1.0) < 1e-3, total

    def test_sampled_directions_unit_and_distributed(self):
        env = self._env()
        n = 1 << 14
        seed = rng.tea(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(3))
        _, xi = rng.rand3(seed)
        rad, dirs, pdf = env_ops.environment_sample(env, xi)
        dirs = np.asarray(dirs)
        assert np.allclose(np.linalg.norm(dirs, axis=1), 1.0, atol=1e-4)
        assert (np.asarray(pdf) > 0).all()
        # Importance sampling favors the sun: mean sampled radiance should be
        # much higher than the image average radiance.
        mean_sampled = float(np.asarray(rad).max(-1).mean())
        mean_img = float(np.asarray(env.image).max(-1).mean())
        assert mean_sampled > 2.0 * mean_img

    def test_estimator_unbiased(self):
        """MC estimate of the env integral via importance sampling must match
        the direct sum: E[maxc(L)/pdf] = integral."""
        env = self._env()
        n = 1 << 16
        seed = rng.tea(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(5))
        _, xi = rng.rand3(seed)
        rad, dirs, pdf = env_ops.environment_sample(env, xi)
        est = float(jnp.mean(jnp.max(rad, axis=-1) / pdf))
        ref = float(env.integral)
        assert abs(est - ref) / ref < 0.05, (est, ref)

    def test_direction_uv_roundtrip(self):
        """Sampled direction must map back to the sampled texel's uv
        (consistency between Environment_sample and GetSphericalUv)."""
        env = self._env()
        n = 4096
        seed = rng.tea(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(9))
        _, xi = rng.rand3(seed)
        rad, dirs, pdf = env_ops.environment_sample(env, xi)
        uv = np.asarray(spherical_uv(dirs))
        rad2 = np.asarray(env_ops.sample_env(env.image, jnp.asarray(uv)))
        # Bilinear lookups at the same uv: radiances must match
        assert np.allclose(rad2, np.asarray(rad), rtol=1e-3, atol=1e-3)

    def test_env_pdf_matches_sample_pdf(self):
        env = self._env()
        n = 4096
        seed = rng.tea(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(13))
        _, xi = rng.rand3(seed)
        _, dirs, pdf = env_ops.environment_sample(env, xi)
        pdf2 = np.asarray(env_ops.environment_pdf(env, dirs))
        ok = np.isclose(pdf2, np.asarray(pdf), rtol=1e-3)
        # Boundary texels can disagree due to uv quantization; vast majority match
        assert ok.mean() > 0.97, ok.mean()


class TestHdrIO:
    def test_rgbe_roundtrip(self, tmp_path):
        """Write a flat (non-RLE) .hdr and read it back."""
        img = hdr_mod.procedural_sky_hdr(h=8, w=16)
        path = tmp_path / "t.hdr"
        # Minimal flat RGBE writer
        h, w = img.shape[:2]
        maxc = img.max(-1)
        e = np.where(maxc > 1e-32, np.floor(np.log2(np.maximum(maxc, 1e-32))) + 1, 0)
        scale = np.where(maxc > 1e-32, 2.0 ** (8 - e), 0.0)
        rgbe = np.zeros((h, w, 4), np.uint8)
        rgbe[..., :3] = np.clip(img * scale[..., None], 0, 255).astype(np.uint8)
        rgbe[..., 3] = np.where(maxc > 1e-32, e + 128, 0).astype(np.uint8)
        with open(path, "wb") as f:
            f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
            f.write(f"-Y {h} +X {w}\n".encode())
            f.write(rgbe.tobytes())
        out = hdr_mod.load_hdr(str(path))
        assert out.shape == (h, w, 3)
        rel = np.abs(out - img) / np.maximum(img, 1e-3)
        assert np.median(rel) < 0.01


class TestPackedEnvRows:
    """models/hdr.py::pack_env_rows — one-gather bilinear + alias data."""

    def test_bilinear_matches_sample_env(self):
        import jax

        from vk_raytrace_tpu.models.hdr import build_environment, procedural_sky_hdr
        from vk_raytrace_tpu.ops.env import _bilinear_packed
        from vk_raytrace_tpu.ops.texture import sample_env

        env = build_environment(procedural_sky_hdr(32, 64))
        uv = jax.random.uniform(jax.random.PRNGKey(0), (4096, 2))
        # include exact edges
        uv = jnp.concatenate(
            [uv, jnp.array([[0.0, 0.0], [0.999, 0.999], [0.5, 0.0], [0.5, 1.0]])]
        )
        ref = sample_env(env.image, uv)
        got = _bilinear_packed(env.rows, env.image.shape[0], env.image.shape[1], uv)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6)

    def test_alias_sample_matches_unpacked(self):
        import jax

        from vk_raytrace_tpu.models.hdr import build_environment, procedural_sky_hdr
        from vk_raytrace_tpu.ops.env import environment_sample

        env = build_environment(procedural_sky_hdr(32, 64))
        xi = jax.random.uniform(jax.random.PRNGKey(1), (8192, 3))
        rad_p, dir_p, pdf_p = environment_sample(env, xi)
        env_u = env._replace(rows=None)
        rad_u, dir_u, pdf_u = environment_sample(env_u, xi)
        np.testing.assert_allclose(np.asarray(rad_p), np.asarray(rad_u), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(dir_p), np.asarray(dir_u), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(pdf_p), np.asarray(pdf_u), rtol=1e-6)
