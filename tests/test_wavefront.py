"""Pooled-wavefront integrator parity vs the unrolled reference integrator.

The pooled loop (``integrator/wavefront.py``) must compute the *same
estimator* as the unrolled per-depth loop (``integrator/path.py``): identical
per-path RNG streams, identical clause ordering — only lane scheduling and
floating-point accumulation order may differ."""

import numpy as np
import jax.numpy as jnp
import pytest

from vk_raytrace_tpu.models import procedural
from vk_raytrace_tpu.models.schema import PBR_DISNEY, PBR_GLTF, RenderConfig
from vk_raytrace_tpu import render as R
from vk_raytrace_tpu.integrator.wavefront import render_units_pooled


def _setup(pbr_mode, spp=1, depth=3):
    geom, mats, lights, cam = procedural.cornell_box()
    scene = R.build_scene(geom, mats, lights, cam)
    cfg = RenderConfig(
        width=48, height=48, max_depth=depth, max_samples=spp,
        hdr_multiplier=0.0, pbr_mode=pbr_mode, firefly_clamp=100.0,
    )
    return scene, R.pack_scene(scene.bvh, scene.geometry), cfg


@pytest.mark.parametrize("pbr_mode", [PBR_GLTF, PBR_DISNEY])
def test_pooled_matches_unrolled(pbr_mode):
    scene, packed, cfg = _setup(pbr_mode)
    frame = jnp.asarray(2, jnp.int32)

    ref = R.render_strip_impl(
        scene, packed, cfg, jnp.asarray(0, jnp.int32), cfg.height, frame, False
    ).reshape(-1, 3)

    for pool in (256, 4096):  # smaller and larger than the unit count
        got, steps, rays = render_units_pooled(
            scene, packed, cfg, frame, False,
            jnp.asarray(0, jnp.int32), cfg.width * cfg.height, pool,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5,
            err_msg=f"pool={pool}",
        )
        assert int(rays) > cfg.width * cfg.height  # primary + some shadow


def test_pooled_multi_sample():
    scene, packed, cfg = _setup(PBR_GLTF, spp=2)
    frame = jnp.asarray(1, jnp.int32)
    ref = R.render_strip_impl(
        scene, packed, cfg, jnp.asarray(0, jnp.int32), cfg.height, frame, False
    ).reshape(-1, 3)
    got, _, _ = render_units_pooled(
        scene, packed, cfg, frame, False,
        jnp.asarray(0, jnp.int32), cfg.width * cfg.height, 2048,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_pooled_pixel_slices():
    """Slicing the pixel range must compose to the full frame."""
    scene, packed, cfg = _setup(PBR_GLTF)
    frame = jnp.asarray(3, jnp.int32)
    n = cfg.width * cfg.height
    full, _, _ = render_units_pooled(
        scene, packed, cfg, frame, False, jnp.asarray(0, jnp.int32), n, 1024
    )
    half = n // 2
    a, _, _ = render_units_pooled(
        scene, packed, cfg, frame, False, jnp.asarray(0, jnp.int32), half, 1024
    )
    b, _, _ = render_units_pooled(
        scene, packed, cfg, frame, False, jnp.asarray(half, jnp.int32), half, 1024
    )
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([a, b])), np.asarray(full), rtol=1e-5, atol=1e-6
    )


def test_renderer_uses_pool_and_matches_goldens_path():
    """Renderer.step (pooled) must equal the strip path it replaced."""
    geom, mats, lights, cam = procedural.cornell_box()
    scene = R.build_scene(geom, mats, lights, cam)
    cfg = RenderConfig(width=48, height=48, max_depth=3, max_samples=1,
                       hdr_multiplier=0.0, pbr_mode=PBR_GLTF,
                       firefly_clamp=100.0)
    r = R.Renderer(scene, cfg)
    for _ in range(3):
        r.step()
    pooled = np.asarray(r.hdr())

    r2 = R.Renderer(scene, cfg)
    frames = []
    for f in range(3):
        frames.append(np.asarray(r2._frame_strips(jnp.asarray(f, jnp.int32))))
    ref = np.mean(frames, axis=0)
    np.testing.assert_allclose(pooled, ref, rtol=1e-4, atol=1e-5)


def test_pooled_matches_unrolled_compat_mode():
    """The reference-compat estimator (full_mis=False — the one any RMSE
    comparison against reference renders must use, schema.py full_mis note)
    must be implemented identically by the production pooled loop."""
    import dataclasses

    scene, packed, cfg = _setup(PBR_GLTF)
    cfg = dataclasses.replace(cfg, full_mis=False)
    frame = jnp.asarray(2, jnp.int32)
    ref = R.render_strip_impl(
        scene, packed, cfg, jnp.asarray(0, jnp.int32), cfg.height, frame, False
    ).reshape(-1, 3)
    got, _, _ = render_units_pooled(
        scene, packed, cfg, frame, False,
        jnp.asarray(0, jnp.int32), cfg.width * cfg.height, 2048,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_tiered_tail_bitexact():
    """The tiered tail (full -> pool/4 -> pool/16 staged loops,
    wavefront.py::compact) must be invisible to the estimator: same paths,
    same seeds, same unique-unit scatter targets -> bit-identical image."""
    import os

    scene, packed, cfg = _setup(PBR_GLTF, depth=4)
    frame = jnp.asarray(3, jnp.int32)
    n_pix = cfg.width * cfg.height

    def run():
        img, _steps, rays = render_units_pooled(
            scene, packed, cfg, frame, False,
            jnp.asarray(0, jnp.int32), n_pix, 512,
        )
        return np.asarray(img), int(rays)

    old = os.environ.get("VKRT_TIERS")
    try:
        os.environ["VKRT_TIERS"] = "0"
        flat_img, flat_rays = run()
        os.environ["VKRT_TIERS"] = "force"
        tier_img, tier_rays = run()
    finally:
        if old is None:
            os.environ.pop("VKRT_TIERS", None)
        else:
            os.environ["VKRT_TIERS"] = old
    assert flat_rays == tier_rays
    np.testing.assert_array_equal(flat_img, tier_img)
