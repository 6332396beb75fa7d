"""Hybrid analytic sun disk (VERDICT r3 item 5).

The production sun&sky path bakes the sky WITHOUT the sub-texel disk core
(ops/sunsky.py::bake_environment(disk=False)) and re-adds it analytically:
per miss ray (ops/env.py::env_radiance(sun_disk=True)) and as the cone half
of the NEE mixture (ops/env.py::env_sample(sun_disk=True)) — the semantics
of the reference's per-ray disk (sun_and_sky.glsl:543-548) and sun-cone NEE
(env_sampling.glsl:105-135) with a PROPER mixture pdf.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vk_raytrace_tpu.models.schema import default_sun_sky
from vk_raytrace_tpu.ops.sunsky import (
    sun_and_sky,
    sun_disk_cone,
    sun_disk_radiance,
)


def _dirs_near_sun(ss, n=4000, spread=0.2, seed=0):
    rng = np.random.default_rng(seed)
    axis = np.asarray(ss.sun_direction, np.float64)
    axis /= np.linalg.norm(axis)
    d = axis[None, :] + rng.normal(scale=spread, size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(d, jnp.float32)


class TestDiskSplit:
    def test_split_identity(self):
        """sun_and_sky == sun_and_sky(disk=False) + sun_disk_radiance —
        exact (night floor disabled; the floor is the only nonlinearity the
        split crosses)."""
        ss = default_sun_sky(in_use=True)._replace(
            night_color=jnp.zeros(3, jnp.float32)
        )
        for spread in (0.005, 0.02, 0.5, 2.0):  # disk core ... full sphere
            d = _dirs_near_sun(ss, spread=spread, seed=int(spread * 100))
            full = np.asarray(sun_and_sky(ss, d))
            nodisk = np.asarray(sun_and_sky(ss, d, disk=False))
            delta = np.asarray(sun_disk_radiance(ss, d))
            np.testing.assert_allclose(nodisk + delta, full, rtol=2e-5,
                                       atol=1e-7 * full.max())

    def test_split_identity_night_floor_bound(self):
        """With the night floor on, the split error is bounded by the floor
        itself (default luminance ~0.008 vs disk ~1e4)."""
        ss = default_sun_sky(in_use=True)
        d = _dirs_near_sun(ss, spread=0.02, seed=7)
        full = np.asarray(sun_and_sky(ss, d))
        approx = np.asarray(sun_and_sky(ss, d, disk=False)) + np.asarray(
            sun_disk_radiance(ss, d)
        )
        night = float(np.max(np.asarray(ss.night_color))) * np.pi
        assert np.abs(approx - full).max() <= night + 1e-6

    def test_disk_positive_and_local(self):
        """The delta is nonzero inside the core cone and zero outside."""
        ss = default_sun_sky(in_use=True)
        present, axis, cos_theta = jax.tree.map(
            np.asarray, sun_disk_cone(ss)
        )
        assert bool(present)
        d = _dirs_near_sun(ss, spread=0.05, seed=3)
        delta = np.asarray(sun_disk_radiance(ss, d))
        cosang = np.asarray(d) @ axis
        outside = cosang < cos_theta
        assert np.all(delta[outside] == 0.0)
        # on-axis direction is inside and bright
        on_axis = np.asarray(sun_disk_radiance(ss, jnp.asarray(axis[None, :])))
        assert on_axis.max() > 1.0

    def test_bake_drops_only_the_core(self):
        """bake(disk=False) differs from bake(disk=True) only near the sun."""
        from vk_raytrace_tpu.ops.sunsky import bake_environment

        ss = default_sun_sky(in_use=True)
        a = np.asarray(bake_environment(ss, height=64, width=128))
        b = np.asarray(bake_environment(ss, height=64, width=128, disk=False))
        diff = np.abs(a - b).sum(-1)
        assert (diff > 0).sum() <= 8  # a handful of texels at 64x128
        assert diff.max() > 0  # but the disk IS in the full bake


class TestMixtureSampling:
    def _env(self, ss):
        from vk_raytrace_tpu.models.hdr import build_environment
        from vk_raytrace_tpu.ops.sunsky import bake_environment

        img = bake_environment(ss, height=64, width=128, disk=False)
        return build_environment(img)

    def test_mixture_pdf_is_a_density(self):
        """The mixture pdf integrates to 1 over the sphere: MC check with
        uniform sphere samples of environment_pdf(sun_disk=True)."""
        from vk_raytrace_tpu.ops.env import environment_pdf

        ss = default_sun_sky(in_use=True)
        env = self._env(ss)
        rng = np.random.default_rng(11)
        d = rng.normal(size=(200_000, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        pdf = np.asarray(
            environment_pdf(env, jnp.asarray(d, jnp.float32), ss, True)
        )
        integral = pdf.mean() * 4.0 * np.pi
        assert abs(integral - 1.0) < 0.05, integral

    def test_disk_flux_estimator(self):
        """E[disk_delta/pdf] over the mixture recovers the analytic disk
        flux (the alias table alone cannot see the sub-texel core — this is
        the whole point of the cone half)."""
        from vk_raytrace_tpu.ops import rng as rngmod
        from vk_raytrace_tpu.ops.env import env_sample
        from vk_raytrace_tpu.ops.sunsky import sun_disk_radiance

        ss = default_sun_sky(in_use=True)
        env = self._env(ss)
        n = 1 << 17
        seed = rngmod.tea(
            jnp.arange(n, dtype=jnp.uint32), jnp.uint32(5)
        )
        _rad, d, pdf, _ = env_sample(
            env, ss, False, jnp.float32(1.0), seed, sun_disk=True
        )
        delta = sun_disk_radiance(ss, d)
        est = np.asarray(
            jnp.mean(delta / jnp.maximum(pdf, 1e-12)[:, None], axis=0)
        )

        # analytic flux by 1D quadrature: delta is radially symmetric about
        # the sun axis here (sun well above horizon, constant turbidity).
        present, axis, cos_theta = jax.tree.map(np.asarray, sun_disk_cone(ss))
        theta_max = float(np.arccos(np.clip(cos_theta, -1, 1)))
        thetas = np.linspace(0.0, theta_max, 4096)
        # directions at angle theta from the axis (any azimuth: symmetry)
        t = np.array([1.0, 0.0, 0.0])
        t = t - axis * (t @ axis)
        t /= np.linalg.norm(t)
        dirs = (
            np.cos(thetas)[:, None] * axis[None, :]
            + np.sin(thetas)[:, None] * t[None, :]
        )
        vals = np.asarray(sun_disk_radiance(ss, jnp.asarray(dirs, jnp.float32)))
        flux = 2.0 * np.pi * np.trapezoid(
            vals * np.sin(thetas)[:, None], thetas, axis=0
        )
        np.testing.assert_allclose(est, flux, rtol=0.08)

    def test_rays_normalized_and_pdf_positive(self):
        from vk_raytrace_tpu.ops import rng as rngmod
        from vk_raytrace_tpu.ops.env import env_sample

        ss = default_sun_sky(in_use=True)
        env = self._env(ss)
        seed = rngmod.tea(jnp.arange(4096, dtype=jnp.uint32), jnp.uint32(1))
        rad, d, pdf, _ = env_sample(
            env, ss, False, jnp.float32(1.0), seed, sun_disk=True
        )
        assert np.allclose(np.linalg.norm(np.asarray(d), axis=1), 1.0, atol=1e-5)
        assert np.all(np.asarray(pdf) > 0)
        assert np.all(np.isfinite(np.asarray(rad)))

    def test_disabled_disk_falls_back_to_alias(self):
        """sun_disk sampling with a zero-intensity disk must reproduce the
        plain alias stream's directions (q=0: every lane takes the alias
        branch with the same xi)."""
        from vk_raytrace_tpu.ops import rng as rngmod
        from vk_raytrace_tpu.ops.env import env_sample

        ss = default_sun_sky(in_use=True)._replace(
            sun_disk_intensity=jnp.float32(0.0)
        )
        env = self._env(ss)
        seed = rngmod.tea(jnp.arange(1024, dtype=jnp.uint32), jnp.uint32(2))
        _, d_mix, pdf_mix, _ = env_sample(
            env, ss, False, jnp.float32(1.0), seed, sun_disk=True
        )
        # plain path consumes one fewer draw; replicate its xi by skipping
        # the mixture draw manually
        seed2, _ = rngmod.rand(seed)
        _, d_plain, pdf_plain, _ = env_sample(
            env, ss, False, jnp.float32(1.0), seed2, sun_disk=False
        )
        np.testing.assert_allclose(np.asarray(d_mix), np.asarray(d_plain))
        np.testing.assert_allclose(np.asarray(pdf_mix), np.asarray(pdf_plain))


class TestRendererIntegration:
    def test_hard_shadow(self):
        """A floor under a blocker lit by the analytic sun: the umbra is
        dark, the lit side is bright, and the transition is sharp (the
        baked-disk path smears it over the whole texel angle).
        Reference behavior: sharp sun shadows via per-ray disk NEE
        (env_sampling.glsl:110-125)."""
        from vk_raytrace_tpu import render as R
        from vk_raytrace_tpu.models.procedural import (
            GeometryBuilder, _quad, look_at_camera,
        )
        from vk_raytrace_tpu.models.schema import (
            PBR_GLTF, RenderConfig, default_sun_sky, make_lights,
            make_materials,
        )

        # sun straight down the +y axis for a crisp overhead shadow
        ss = default_sun_sky(in_use=True)._replace(
            sun_direction=jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
        )
        b = GeometryBuilder()
        # floor at y=0 spanning [-4,4]^2, blocker quad at y=1 over x in [-1,0]
        fv, fi = _quad([-4, 0, -4], [-4, 0, 4], [4, 0, 4], [4, 0, -4])
        b.add_mesh(fv, fi, 0)
        bv, bi = _quad([-1, 1, -1], [-1, 1, 1], [0, 1, 1], [0, 1, -1])
        b.add_mesh(bv, bi, 0)
        geom = b.build()
        mats = make_materials(
            [dict(base_color_factor=[0.8, 0.8, 0.8, 1.0],
                  metallic_factor=0.0, roughness_factor=1.0,
                  double_sided=1)]
        )
        lights = make_lights([])
        cam = look_at_camera(
            eye=[0.0, 3.0, 3.5], center=[0.0, 0.0, 0.0], up=[0, 1, 0],
            fov_deg=45.0, aspect=1.0,
        )
        scene = R.build_scene(geom, mats, lights, cam)
        cfg = RenderConfig(
            width=64, height=64, max_depth=2, max_samples=8,
            hdr_multiplier=1.0, pbr_mode=PBR_GLTF, use_sun_sky=True,
            rr=False, firefly_clamp=1e20,
        )
        scene = scene._replace(sun_sky=ss)
        r = R.Renderer(scene, cfg)
        assert r._run_cfg.sun_disk  # analytic-sun mode engaged
        img = np.asarray(r.render(frames=4))
        assert np.isfinite(img).all()
        hdr = np.asarray(r.hdr())
        # sample a floor row through the shadow: find columns under the
        # blocker vs to the lit side by luminance contrast
        lum = hdr.sum(-1)
        row = lum[44]  # lower third of the image: the floor
        dark = row.min()
        bright = row.max()
        assert bright > 4.0 * (dark + 1e-6), (dark, bright)
