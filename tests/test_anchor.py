"""Independent correctness anchors (VERDICT r1 #6 / BASELINE RMSE gate).

Two non-self sources of truth:

1. **BVH-free renders**: full images through :class:`integrator.brute.
   BruteTracer` (O(T·R) intersection, zero shared acceleration-structure
   code) compared against the production 8-wide BVH path at identical RNG
   streams. Any traversal bug — build, collapse, stack, slab test, alpha
   split — shows up as image divergence.
2. **Analytic furnace scenes**: a Lambertian surface under a constant
   unit environment must return its albedo (energy conservation of the
   whole NEE + MIS + BSDF + env-sampling chain); a classic 2x-error from
   double-counted NEE or a pi/2pi normalization slip fails these bounds.
"""

import numpy as np
import jax.numpy as jnp

from vk_raytrace_tpu.integrator.brute import BruteTracer
from vk_raytrace_tpu.integrator.camera import generate_rays_for_pixels, with_aspect
from vk_raytrace_tpu.integrator.path import sample_pixels
from vk_raytrace_tpu.models.hdr import build_environment
from vk_raytrace_tpu.models.procedural import (
    cornell_box,
    look_at_camera,
    material_test_grid,
)
from vk_raytrace_tpu.models.schema import PBR_GLTF, RenderConfig, make_materials, make_lights
from vk_raytrace_tpu.ops import rng
from vk_raytrace_tpu.render import build_scene, pack_scene


def _render(scene, packed, cfg, frames, tracer=None):
    """Minimal progressive render loop (render_strip_impl semantics) with a
    pluggable traversal back end; identical RNG streams across tracers."""
    h, w = cfg.height, cfg.width
    scene = scene._replace(camera=with_aspect(scene.camera, w, h))
    pix = jnp.arange(h * w, dtype=jnp.uint32)
    accum = np.zeros((h * w, 3), np.float32)
    for frame in range(frames):
        f = jnp.asarray(frame, jnp.int32)
        total = np.zeros((h * w, 3), np.float32)
        for s in range(cfg.max_samples):
            seed = rng.tea(pix, jnp.uint32(frame * cfg.max_samples + s))
            o, d, seed = generate_rays_for_pixels(scene.camera, w, h, pix, f, seed)
            radiance, _, _ = sample_pixels(
                scene, packed, cfg, o, d, seed, False, tracer=tracer
            )
            total += np.asarray(radiance)
        accum += (total / cfg.max_samples - accum) / (frame + 1)
    return accum.reshape(h, w, 3)


def _assert_images_match(a, b, scale=None):
    """Pixel-exact comparison modulo shared-edge tie-breaks.

    With identical RNG streams the two tracers produce bit-comparable paths
    EXCEPT where a ray hits the shared diagonal of a quad exactly: both
    intersections are valid at the same t, but the two intersectors break
    the tie toward different triangles (measured ~0.5% of rays on Cornell),
    after which the whole path diverges. Those rays are not errors — so the
    gate is: >=98.5% of pixels match tightly, AND the RMSE over the matched
    set is <1% (the BASELINE bar, minus the tie pixels)."""
    if scale is None:
        scale = max(float(np.mean(b)), 1e-9)
    diff = np.abs(a - b).max(axis=-1)
    matched = diff < 0.02 * scale
    frac = float(np.mean(matched))
    assert frac >= 0.985, f"only {frac:.1%} of pixels match"
    rmse = float(np.sqrt(np.mean((a[matched] - b[matched]) ** 2))) / scale
    assert rmse < 0.01, f"matched-set RMSE {rmse:.4f}"


class TestBruteForceAnchor:
    def test_cornell_wide_bvh_matches_brute(self):
        geom, mats, lights, cam = cornell_box()
        scene = build_scene(geom, mats, lights, cam)
        packed = pack_scene(scene.bvh, scene.geometry)
        cfg = RenderConfig(
            width=64, height=64, max_depth=4, max_samples=2,
            pbr_mode=PBR_GLTF, hdr_multiplier=0.0, rr=False,
        )
        img_bvh = _render(scene, packed, cfg, frames=2)
        img_brute = _render(
            scene, packed, cfg, frames=2, tracer=BruteTracer(scene.geometry)
        )
        _assert_images_match(img_bvh, img_brute)

    def test_material_grid_wide_bvh_matches_brute(self):
        geom, mats, lights, cam = material_test_grid(n=2)
        scene = build_scene(geom, mats, lights, cam)
        packed = pack_scene(scene.bvh, scene.geometry)
        env = build_environment(
            np.full((8, 16, 3), 0.8, np.float32)
        )
        scene = scene._replace(env=env)
        cfg = RenderConfig(
            width=48, height=32, max_depth=3, max_samples=1,
            hdr_multiplier=1.0, rr=False,
        )
        img_bvh = _render(scene, packed, cfg, frames=2)
        img_brute = _render(
            scene, packed, cfg, frames=2, tracer=BruteTracer(scene.geometry)
        )
        _assert_images_match(img_bvh, img_brute)


def _furnace_scene(albedo: float):
    """A big Lambertian quad under a constant unit-radiance environment."""
    from vk_raytrace_tpu.models.procedural import GeometryBuilder, _quad

    g = GeometryBuilder()
    e = 2000.0
    gv, gi = _quad([-e, 0, -e], [-e, 0, e], [e, 0, e], [e, 0, -e])
    g.add_mesh(gv, gi, 0)
    mats = make_materials([
        dict(
            base_color_factor=[albedo, albedo, albedo, 1.0],
            metallic_factor=0.0, roughness_factor=1.0,
        )
    ])
    lights = make_lights([])
    cam = look_at_camera(
        eye=[0.0, 50.0, 0.0], center=[0.0, 0.0, 1e-3], up=[0, 0, 1],
        fov_deg=40.0, aspect=1.0,
    )
    geom = g.build()
    scene = build_scene(geom, mats, lights, cam)
    env = build_environment(np.ones((8, 16, 3), np.float32))
    return scene._replace(env=env)


class TestFurnace:
    def test_env_only_exact(self):
        """Rays that miss everything return exactly the env radiance."""
        scene = _furnace_scene(1.0)
        # aim the camera up, away from the quad
        cam = look_at_camera(
            eye=[0.0, 50.0, 0.0], center=[0.0, 100.0, 1e-3], up=[0, 0, 1],
            fov_deg=40.0, aspect=1.0,
        )
        scene = scene._replace(camera=cam)
        packed = pack_scene(scene.bvh, scene.geometry)
        cfg = RenderConfig(width=16, height=16, max_depth=2, max_samples=1, rr=False)
        img = _render(scene, packed, cfg, frames=1)
        assert np.allclose(img, 1.0, atol=1e-4)

    def test_lambertian_albedo_bounds(self):
        """Furnace: the rendered plane converges to ~albedo under the
        default full-MIS estimator. The glTF BSDF keeps the reference's
        f0=0.04 dielectric specular + single-scatter GGX, so exact equality
        isn't expected — but pi-vs-2pi normalization errors or double-counted
        NEE (the reference's own env weighting measures +25% here, see
        test_reference_mis_compat_overestimates) are far outside."""
        for albedo, lo, hi in ((1.0, 0.88, 1.06), (0.5, 0.43, 0.55)):
            scene = _furnace_scene(albedo)
            packed = pack_scene(scene.bvh, scene.geometry)
            cfg = RenderConfig(
                width=24, height=24, max_depth=6, max_samples=4,
                pbr_mode=PBR_GLTF, rr=False,
            )
            img = _render(scene, packed, cfg, frames=4)
            mean = float(img[4:-4, 4:-4].mean())
            assert lo < mean < hi, f"albedo={albedo}: furnace mean {mean}"

    def test_reference_mis_compat_overestimates(self):
        """full_mis=False reproduces the reference's one-sided env weighting
        (pathtrace.glsl:177-179 vs :228), which over-counts the environment —
        kept as a compat mode for RMSE comparison against reference renders."""
        scene = _furnace_scene(1.0)
        packed = pack_scene(scene.bvh, scene.geometry)
        cfg = RenderConfig(
            width=16, height=16, max_depth=4, max_samples=4,
            pbr_mode=PBR_GLTF, rr=False, full_mis=False,
        )
        img = _render(scene, packed, cfg, frames=2)
        mean = float(img[3:-3, 3:-3].mean())
        assert mean > 1.1, mean


class TestCompatModeAnchor:
    def test_cornell_compat_matches_brute(self):
        """full_mis=False (reference-compat weighting) against the
        BVH-free brute-force tracer: the compat estimator itself — not
        just the default one — holds the <1% matched-set RMSE bar that
        any future RMSE-vs-reference comparison relies on."""
        import dataclasses

        from vk_raytrace_tpu.integrator.brute import BruteTracer

        geom, mats, lights, cam = cornell_box()
        scene = build_scene(geom, mats, lights, cam)
        packed = pack_scene(scene.bvh, scene.geometry)
        cfg = RenderConfig(
            width=40, height=40, max_depth=3, max_samples=2,
            pbr_mode=PBR_GLTF, rr=False, full_mis=False, hdr_multiplier=0.0,
        )
        img_bvh = _render(scene, packed, cfg, frames=2)
        img_brute = _render(
            scene, packed, cfg, frames=2, tracer=BruteTracer(scene.geometry)
        )
        _assert_images_match(img_bvh, img_brute)
