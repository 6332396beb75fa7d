"""Golden-image regression tests (SURVEY.md §7 step 12, §4.3).

Fixed-seed renders compared to stored goldens by RMSE — the harness the
reference lacks (its verification was interactive). Goldens were produced by
this renderer on CPU; the gate catches any change to integrator semantics,
RNG streams, traversal, or BSDFs.

IMPORTANT: goldens must be (re)generated under the SAME backend config the
suite runs with (conftest: CPU + --xla_force_host_platform_device_count=8).
XLA CPU codegen differs measurably between device-count configs (~3% RMSE
via fp reassociation cascading through RR/tie comparisons); absolute
correctness is anchored independently in tests/test_anchor.py.
"""

import os

import numpy as np
import pytest

from vk_raytrace_tpu.models import procedural
from vk_raytrace_tpu.models.schema import PBR_DISNEY, PBR_GLTF, RenderConfig
from vk_raytrace_tpu import render as R

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _render_cornell(pbr_mode, frames=32):
    geom, mats, lights, cam = procedural.cornell_box()
    scene = R.build_scene(geom, mats, lights, cam)
    cfg = RenderConfig(width=64, height=64, max_depth=3, max_samples=1,
                       hdr_multiplier=0.0, pbr_mode=pbr_mode,
                       firefly_clamp=100.0)
    r = R.Renderer(scene, cfg)
    for _ in range(frames):
        r.step()
    return np.asarray(r.hdr())


def _rmse(a, b):
    return float(np.sqrt(np.mean((a - b) ** 2)))


class TestGoldens:
    @pytest.mark.parametrize("name,mode", [
        ("cornell_64_d3_gltf_32f.npy", PBR_GLTF),
        ("cornell_64_d3_disney_32f.npy", PBR_DISNEY),
    ])
    def test_cornell_matches_golden(self, name, mode):
        golden = np.load(os.path.join(GOLDEN_DIR, name))
        img = _render_cornell(mode)
        # Deterministic renderer: must match the stored output almost exactly
        # (tiny slack for cross-platform transcendental differences).
        rmse = _rmse(img, golden)
        scale = float(np.sqrt(np.mean(golden**2)))
        assert rmse / scale < 0.01, (rmse, scale)

    def test_rmse_decreases_with_accumulation(self):
        """More accumulation -> closer to the (converged) golden estimate."""
        golden = np.load(os.path.join(GOLDEN_DIR, "cornell_64_d3_gltf_32f.npy"))
        img4 = _render_cornell(PBR_GLTF, frames=4)
        img16 = _render_cornell(PBR_GLTF, frames=16)
        assert _rmse(img16, golden) < _rmse(img4, golden)
