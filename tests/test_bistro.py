"""Bistro-class street scene tests (models/procedural.py::bistro_scene).

BASELINE config #5 class: >1M instantiated triangles, instanced trees with
alpha-cutout foliage, two-level TLAS/BLAS acceleration. The reference's
equivalent workload is an arbitrary large glTF through the driver-built
BLAS/TLAS (accelstruct.cpp:110-162); these tests pin (a) instanced-vs-baked
image parity at reduced detail and (b) that the FULL-scale scene (>1M tris)
actually builds through both acceleration paths — the round-2 scale-ceiling
gap (ids must stay exact in f32 lanes, VERDICT.md round 2 item 6).
"""

import numpy as np
import pytest

from vk_raytrace_tpu import render as R
from vk_raytrace_tpu.models import procedural
from vk_raytrace_tpu.models.schema import PBR_GLTF, RenderConfig


def _cfg(w=64, h=36):
    return RenderConfig(
        width=w, height=h, max_depth=2, max_samples=1,
        pbr_mode=PBR_GLTF, hdr_multiplier=0.0, rr=False,
    )


class TestBistroScene:
    def test_counts_and_dedup(self):
        pool, inst, *_ = procedural.bistro_scene(detail=1.0)
        per_inst = np.asarray(pool.tri_count)[np.asarray(inst.mesh_id)]
        total = int(per_inst.sum())
        unique = int(pool.geometry.indices.shape[0])
        assert total > 1_000_000, total          # config #5 scale
        assert unique < 0.6 * total              # instancing dedups >40%
        # alpha-cutout foliage present (any-hit workload)
        assert bool(np.any(np.asarray(pool.geometry.tri_flags) & 2))

    def test_baked_equals_instanced_geometry(self):
        pool, inst, *_ = procedural.bistro_scene(detail=0.05)
        baked, *_ = procedural.bistro_scene(detail=0.05, instanced=False)
        per_inst = np.asarray(pool.tri_count)[np.asarray(inst.mesh_id)]
        assert int(per_inst.sum()) == int(baked.indices.shape[0])

    def test_instanced_render_matches_baked(self):
        """Same scene both ways -> same image (fp transform rounding only)."""
        pool, inst, mats, lights, cam, atlas = procedural.bistro_scene(
            detail=0.05
        )
        baked, mats_b, lights_b, cam_b, atlas_b = procedural.bistro_scene(
            detail=0.05, instanced=False
        )
        cfg = _cfg()
        r_i = R.Renderer(
            R.build_instanced_scene(pool, inst, mats, lights, cam, atlas=atlas),
            cfg,
        )
        r_i.step()
        img_i = np.asarray(r_i.hdr())
        r_b = R.Renderer(
            R.build_scene(baked, mats_b, lights_b, cam_b, atlas=atlas_b), cfg
        )
        r_b.step()
        img_b = np.asarray(r_b.hdr())
        diff = np.abs(img_i - img_b).max(axis=-1)
        scale = max(float(img_b.mean()), 1e-6)
        assert float((diff < 0.05 * scale).mean()) > 0.97

    def test_full_scale_builds(self):
        """The 1M-triangle pool builds through the two-level path: per-mesh
        BLAS tables concatenate under the exact-f32 ref ceiling and every
        leaf's triangle id stays exactly representable."""
        pool, inst, mats, lights, cam, atlas = procedural.bistro_scene(
            detail=1.0
        )
        from vk_raytrace_tpu.ops.tlas import build_instanced_accel

        accel = build_instanced_accel(pool, inst)
        rows = np.asarray(accel.blas.rows)
        assert rows.shape[0] * 4 + 4 < 2**23
        n_tris = int(pool.geometry.indices.shape[0])
        assert n_tris * 4 + 3 < 2**24  # ids exact in f32 lanes
        # every mesh root is a valid row
        assert int(np.asarray(accel.mesh_root).max()) < rows.shape[0]
