"""Tests for the tonemap/post chain and the procedural sun & sky."""

import numpy as np
import jax.numpy as jnp

from vk_raytrace_tpu.models.schema import default_sun_sky, default_tonemapper
from vk_raytrace_tpu.ops import tonemap as tm
from vk_raytrace_tpu.ops.sunsky import bake_environment, sun_and_sky


class TestTonemapCurves:
    def test_uncharted_monotonic_and_bounded(self):
        x = jnp.linspace(0.0, 20.0, 256)[:, None] * jnp.ones((1, 3))
        y = np.asarray(tm.tonemap_uncharted(x))
        assert (np.diff(y[:, 0]) >= -1e-6).all()
        assert y.min() >= 0.0
        # The curve applies a 2x exposure bias before normalizing by the
        # W=11.2 white point (tonemapping.glsl:58-64), so output hits 1.0
        # at input W/2; beyond that it slightly exceeds 1 until the post
        # chain clamps (same as the reference).
        w = np.asarray(tm.tonemap_uncharted(jnp.full((1, 3), 5.6)))
        assert abs(w[0, 0] - 1.0) < 1e-3

    def test_aces_bounded(self):
        x = jnp.linspace(0.0, 50.0, 128)[:, None] * jnp.ones((1, 3))
        y = np.asarray(tm.tonemap_aces(x))
        assert y.min() >= 0.0 and y.max() <= 1.0 + 1e-5

    def test_zero_maps_to_zero(self):
        z = jnp.zeros((4, 3))
        assert np.allclose(np.asarray(tm.tonemap_uncharted(z)), 0.0, atol=1e-6)
        assert np.allclose(np.asarray(tm.tonemap_hejl_richard(z)), 0.0, atol=1e-6)

    def test_exposure_scales(self):
        x = jnp.full((2, 3), 0.5)
        lo = np.asarray(tm.tone_map(x, 0.5))
        hi = np.asarray(tm.tone_map(x, 2.0))
        assert (hi > lo).all()


class TestPostChain:
    def _img(self):
        rng = np.random.default_rng(0)
        return jnp.asarray(rng.uniform(0, 4, size=(32, 32, 3)), jnp.float32)

    def test_output_range(self):
        out = np.asarray(tm.apply_post(self._img(), default_tonemapper()))
        assert out.shape == (32, 32, 3)
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_dither_toggle_changes_output(self):
        t = default_tonemapper()
        a = np.asarray(tm.apply_post(self._img(), t))
        b = np.asarray(tm.apply_post(self._img(), t._replace(dither=jnp.int32(0))))
        assert not np.array_equal(a, b)
        # dither perturbs by at most ~1 LSB
        assert np.abs(a - b).max() < 2.5 / 255.0

    def test_vignette_darkens_corners(self):
        t = default_tonemapper()._replace(
            vignette=jnp.float32(0.5), dither=jnp.int32(0)
        )
        img = jnp.ones((33, 33, 3), jnp.float32)
        out = np.asarray(tm.apply_post(img, t))
        assert out[0, 0].mean() < out[16, 16].mean()

    def test_auto_exposure_normalizes(self):
        """Bright and dim versions of a scene end up closer after auto
        exposure (post.frag:64-70 behavior)."""
        t = default_tonemapper()._replace(
            auto_exposure=jnp.int32(1), dither=jnp.int32(0)
        )
        base = self._img()
        dim = np.asarray(tm.apply_post(base * 0.1, t))
        bright = np.asarray(tm.apply_post(base * 10.0, t))
        no_ae = default_tonemapper()._replace(dither=jnp.int32(0))
        dim0 = np.asarray(tm.apply_post(base * 0.1, no_ae))
        bright0 = np.asarray(tm.apply_post(base * 10.0, no_ae))
        gap_ae = abs(dim.mean() - bright.mean())
        gap_plain = abs(dim0.mean() - bright0.mean())
        assert gap_ae < gap_plain

    def test_local_exposure_runs_and_bounded(self):
        """Local adaptation (post.frag:72-95, auto_exposure bit 1) produces
        an in-range image that differs from the global operator on a
        high-contrast scene."""
        base = self._img()
        # add a hot spot so the local operator has contrast to adapt to
        img = base.at[4:8, 4:8].set(200.0)
        t_loc = default_tonemapper()._replace(
            auto_exposure=jnp.int32(3), dither=jnp.int32(0)
        )
        t_glob = default_tonemapper()._replace(
            auto_exposure=jnp.int32(1), dither=jnp.int32(0)
        )
        loc = np.asarray(tm.apply_post(img, t_loc))
        glob = np.asarray(tm.apply_post(img, t_glob))
        assert np.isfinite(loc).all()
        assert loc.min() >= 0.0 and loc.max() <= 1.0
        assert not np.allclose(loc, glob)

    def test_local_exposure_flat_field_matches_global_shape(self):
        """On a constant image every mip level is identical, so the local
        operator reduces to adapting to the global luminance — output must
        be a constant image too (chromaticity preserved)."""
        img = jnp.broadcast_to(jnp.asarray([0.8, 0.4, 0.2]), (16, 16, 3))
        mips = tm.luminance_pyramid(img)
        out = np.asarray(
            tm.tone_local_exposure(img, jnp.float32(0.5), 0.5, 0.5, mips)
        )
        assert np.allclose(out, out[0, 0], atol=1e-5)
        ratio = out[0, 0] / np.asarray([0.8, 0.4, 0.2])
        assert np.allclose(ratio, ratio[0], rtol=1e-4)

    def test_manual_exposure_multiplies(self):
        """`avg_lum` is toneMap's exposure multiplier (tonemapping.glsl:86-88):
        larger value -> brighter output."""
        img = jnp.full((8, 8, 3), 0.25)
        t_lo = default_tonemapper()._replace(
            avg_lum=jnp.float32(0.5), dither=jnp.int32(0)
        )
        t_hi = default_tonemapper()._replace(
            avg_lum=jnp.float32(2.0), dither=jnp.int32(0)
        )
        lo = np.asarray(tm.apply_post(img, t_lo))
        hi = np.asarray(tm.apply_post(img, t_hi))
        assert hi.mean() > lo.mean()


class TestSunSky:
    def test_sky_brighter_toward_sun(self):
        ss = default_sun_sky(in_use=True)
        sun = np.asarray(ss.sun_direction)
        sun = sun / np.linalg.norm(sun)
        near = jnp.asarray([sun + [0.05, 0.02, 0.0]], jnp.float32)
        near = near / jnp.linalg.norm(near)
        away = jnp.asarray([[-sun[0], sun[1], -sun[2]]], jnp.float32)
        l_near = float(np.asarray(sun_and_sky(ss, near)).mean())
        l_away = float(np.asarray(sun_and_sky(ss, away)).mean())
        assert l_near > l_away

    def test_sun_disk_is_bright(self):
        ss = default_sun_sky(in_use=True)
        sun = np.asarray(ss.sun_direction)
        sun = jnp.asarray([sun / np.linalg.norm(sun)], jnp.float32)
        horizon = jnp.asarray([[1.0, 0.02, 0.0]], jnp.float32)
        horizon = horizon / jnp.linalg.norm(horizon)
        disk = float(np.asarray(sun_and_sky(ss, sun)).max())
        sky = float(np.asarray(sun_and_sky(ss, horizon)).max())
        assert disk > 50.0 * sky, (disk, sky)

    def test_ground_uses_ground_color(self):
        ss = default_sun_sky(in_use=True)
        down = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
        up = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
        g = np.asarray(sun_and_sky(ss, down))[0]
        s = np.asarray(sun_and_sky(ss, up))[0]
        assert (g >= 0).all() and np.isfinite(g).all()
        assert not np.allclose(g, s)

    def test_multiplier_zero_is_black(self):
        ss = default_sun_sky(in_use=True)._replace(
            multiplier=jnp.float32(0.0)
        )
        v = np.asarray(sun_and_sky(ss, jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)))
        assert np.allclose(v, 0.0)

    def test_bake_matches_pointwise_eval(self):
        """Baked texels must equal direct evaluation at texel centers."""
        ss = default_sun_sky(in_use=True)
        img = np.asarray(bake_environment(ss, 32, 64))
        # center of texel (y=8, x=20)
        u = (20 + 0.5) / 64
        v = (8 + 0.5) / 32
        theta = (u - 0.5) * 2 * np.pi
        gamma = (v - 0.5) * np.pi
        d = np.array([
            np.cos(gamma) * np.cos(theta),
            -np.sin(gamma),
            np.cos(gamma) * np.sin(theta),
        ])
        direct = np.asarray(sun_and_sky(ss, jnp.asarray([d], jnp.float32)))[0]
        assert np.allclose(img[8, 20], direct, rtol=1e-4, atol=1e-6)

    def test_night_floor(self):
        ss = default_sun_sky(in_use=True)._replace(
            sun_direction=jnp.asarray([0.0, -0.9, 0.4], jnp.float32),
            multiplier=jnp.float32(1.0),
        )
        v = np.asarray(
            sun_and_sky(ss, jnp.asarray([[0.3, 0.9, 0.1]], jnp.float32) / np.sqrt(0.91))
        )
        # night color floor keeps the sky non-negative and finite at night
        assert np.isfinite(v).all() and (v >= 0).all()
