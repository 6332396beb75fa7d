"""Multi-chip sharding tests on the 8-device virtual CPU mesh
(SURVEY.md §4.4): tile-sharded rendering must match single-device output."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vk_raytrace_tpu.models import procedural
from vk_raytrace_tpu.models.schema import PBR_GLTF, RenderConfig
from vk_raytrace_tpu.parallel import sharding
from vk_raytrace_tpu import render as R


@pytest.fixture(scope="module")
def cornell():
    geom, mats, lights, cam = procedural.cornell_box()
    scene = R.build_scene(geom, mats, lights, cam)
    return scene


def _cfg(h=32, w=32, samples=1):
    return RenderConfig(
        width=w, height=h, max_depth=2, max_samples=samples,
        hdr_multiplier=0.0, pbr_mode=PBR_GLTF, firefly_clamp=1e4,
    )


class TestTileSharding:
    def test_requires_8_devices(self):
        assert len(jax.devices()) == 8, "conftest should configure 8 CPU devices"

    def test_tile_sharded_matches_single_device(self, cornell):
        """Pure tile sharding (sample axis = 1) must reproduce the
        single-device image bit-for-bit: same pixels, same seeds."""
        scene = cornell
        cfg = _cfg(h=32, w=32)
        packed = R.pack_scene(scene.bvh, scene.geometry)

        # Single device
        r = R.Renderer(scene, cfg)
        r.step()
        single = np.asarray(r.hdr())

        # 8-way tile sharding
        mesh = sharding.make_mesh(tile=8, sample=1)
        scene_r = sharding.replicate(mesh, scene)
        packed_r = sharding.replicate(mesh, packed)
        step = sharding.sharded_render_step(mesh, scene_r, packed_r, cfg, False)
        accum = sharding.shard_accum(mesh, jnp.zeros((32, 32, 3), jnp.float32))
        accum, rays = step(accum, jnp.asarray(0, jnp.int32))
        multi = np.asarray(jax.device_get(accum))

        assert int(rays) > 0  # global in-integrator ray count (psum over ICI)
        assert np.allclose(single, multi, atol=1e-6), np.abs(single - multi).max()

    def test_sample_axis_averages(self, cornell):
        """(tile=4, sample=2): the psum over the sample axis averages two
        independent sample sets -> lower variance than either alone, and the
        mean over many pixels matches the tile-only render statistically."""
        scene = cornell
        cfg = _cfg(h=32, w=32)
        packed = R.pack_scene(scene.bvh, scene.geometry)

        mesh = sharding.make_mesh(tile=4, sample=2)
        scene_r = sharding.replicate(mesh, scene)
        packed_r = sharding.replicate(mesh, packed)
        step = sharding.sharded_render_step(mesh, scene_r, packed_r, cfg, False)
        accum = sharding.shard_accum(mesh, jnp.zeros((32, 32, 3), jnp.float32))
        accum, rays = step(accum, jnp.asarray(0, jnp.int32))
        multi = np.asarray(jax.device_get(accum))

        r = R.Renderer(scene, cfg)
        r.step()
        single = np.asarray(r.hdr())
        # Not bitwise (different seeds per sample shard) but statistically equal
        assert multi.mean() > 0.0
        assert abs(multi.mean() - single.mean()) / single.mean() < 0.1

    def test_progressive_accumulation_sharded(self, cornell):
        scene = cornell
        cfg = _cfg(h=16, w=16)
        packed = R.pack_scene(scene.bvh, scene.geometry)
        mesh = sharding.make_mesh(tile=8, sample=1)
        scene_r = sharding.replicate(mesh, scene)
        packed_r = sharding.replicate(mesh, packed)
        step = sharding.sharded_render_step(mesh, scene_r, packed_r, cfg, False)
        accum = sharding.shard_accum(mesh, jnp.zeros((16, 16, 3), jnp.float32))
        for f in range(3):
            accum, _rays = step(accum, jnp.asarray(f, jnp.int32))
        multi = np.asarray(jax.device_get(accum))

        r = R.Renderer(scene, cfg)
        for _ in range(3):
            r.step()
        single = np.asarray(r.hdr())
        assert np.allclose(single, multi, atol=1e-5), np.abs(single - multi).max()

    def test_mesh_shapes(self):
        m = sharding.make_mesh(tile=2, sample=4)
        assert m.shape == {"tile": 2, "sample": 4}
        m = sharding.make_mesh()
        assert m.shape["tile"] == 8 and m.shape["sample"] == 1
