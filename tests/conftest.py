"""Test environment: force CPU with 8 virtual devices so multi-chip sharding
tests run without a pod (SURVEY.md §4.4).

Note: the axon TPU plugin in this image ignores the JAX_PLATFORMS env var,
so the backend must be forced via jax.config after import.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")


import pytest

# ---------------------------------------------------------------------------
# Test tiers (VERDICT r4 #7). The host is a SINGLE CPU core; cold XLA
# compiles dominate, so the default tier keeps unit + one parity/render
# representative per subsystem and pushes the heavyweight renders/goldens
# to `-m slow` (`make test-full`). Durations measured cold 2026-08-19
# (docs/ARCHITECTURE.md "Test tiers"); marks live HERE, centrally, so the
# tier split is one auditable table instead of 20 scattered decorators.
# ---------------------------------------------------------------------------
_SLOW_PREFIXES = (
    # module: anchors (brute-force matched-set gates; >20 min together)
    "tests/test_anchor.py::",
    # module: fused-shade parity (123s + 94s + 48s; the fused shade stage
    # is opt-in-off — its gate runs in the full tier; the TPU real-kernel
    # smoke below stays in the default tier and skips off-TPU)
    "tests/test_shade_fused.py::TestShadeFusedParity",
    # module: fused traversal parity — interpret-mode kernels on 1 CPU
    # core (456s total). Default-tier fused coverage: alpha mask parity
    # (kept below), bvh8 wide-vs-binary parity, wavefront integration.
    "tests/test_fused.py::",
    # big-scene / golden-ish renders, each >30s cold:
    "tests/test_alpha_fused.py::test_blend_layers_transmission",    # 84s
    "tests/test_alpha_fused.py::test_blend_opacity_distribution",   # 36s
    "tests/test_alpha_fused.py::test_fully_transparent_never_hits", # 36s
    "tests/test_alpha_fused.py::test_mask_any_hit_exact_parity",    # 21s
    "tests/test_bistro.py::TestBistroScene::test_instanced_render_matches_baked",  # 69s
    "tests/test_sunsky_disk.py::TestRendererIntegration::test_hard_shadow",        # 54s
    "tests/test_gltf.py::TestLoader::test_renders",                 # 47s
    "tests/test_gltf.py::TestLoader::test_shared_mesh_instancing",  # 39s
    "tests/test_instancing.py::TestInstancedRender::test_image_matches_baked_scene",  # 45s
    "tests/test_instancing.py::TestInstancedAlphaSplit::test_opaque_hits_unchanged_by_alpha_ctx",  # 18s
    "tests/test_scale_scenes.py::TestHelmet::test_render_under_env",  # 41s
    "tests/test_scale_scenes.py::TestMatFeatureGating::test_features_do_not_change_results",  # 27s
    "tests/test_scale_scenes.py::TestAtrium::test_accel_build_and_render",  # 16s
    "tests/test_mips.py::TestMinification::test_distant_checker_stable",    # 35s
    "tests/test_bvh8.py::TestRendererUsesWide::test_render_matches_brute_force_depth1",  # 35s
    "tests/test_bvh8.py::TestWideVsBinary::test_any_hit_parity",    # 17s
    "tests/test_bvh8.py::TestWideVsBinary::test_closest_hit_parity[<lambda>-1024",  # 16s
    "tests/test_bvh.py::TestTraversalVsBruteForce::test_closest_hit_matches",  # 18s+17s
    "tests/test_sharding.py::TestTileSharding::test_progressive_accumulation_sharded",  # 30s
    "tests/test_sharding.py::TestTileSharding::test_sample_axis_averages",  # 16s
    # wavefront: keep pooled_matches_unrolled[0] (39s) as the production-
    # integrator parity representative; the rest is the full tier.
    "tests/test_wavefront.py::test_tiered_tail_bitexact",            # 62s
    "tests/test_wavefront.py::test_pooled_matches_unrolled[1",       # 54s
    "tests/test_wavefront.py::test_pooled_pixel_slices",             # 46s
    "tests/test_wavefront.py::test_pooled_matches_unrolled_compat_mode",  # 37s
    "tests/test_wavefront.py::test_pooled_multi_sample",
    "tests/test_wavefront.py::test_renderer_uses_pool_and_matches_goldens_path",
    # integrator: keep the estimator core (running-mean equivalence,
    # determinism, checkpoint/resume, analytic direct light); the render-
    # flavored probes are full-tier.
    "tests/test_integrator.py::TestDirectLighting::test_shadowing",
    "tests/test_integrator.py::TestDebugModes",
    "tests/test_integrator.py::TestEmissiveUnlit",
    "tests/test_integrator.py::TestFireflyClamp",
    # bvh/bvh8: keep builds + one closest/backface parity each.
    "tests/test_bvh.py::TestTraversalVsBruteForce::test_any_hit_distance_limit",
    "tests/test_bvh.py::TestTraversalVsBruteForce::test_active_mask",  # 15s
    "tests/test_bvh8.py::TestWideVsBinary::test_alpha_cutout_blocks_stochastically",
    # instancing: any_hit_matches_baked (2s) + mask/dedup/scan stay.
    "tests/test_instancing.py::TestInstancedTraversal::test_closest_matches_baked",  # 21s
    "tests/test_instancing.py::TestScanCandidate::test_many_instances_scan_auto",
    "tests/test_instancing.py::test_width32_instanced_matches_width16",
    # prologue parity guards a default-OFF flagged path: full tier.
    "tests/test_fused.py::test_root_descent_prologue_parity",
)


# Default-tier exceptions to the prefixes above: the production fused
# traversal MUST have a gate in the default tier (a broken
# _traverse_fused slipped through the tier split once — the CPU default
# path is the XLA body, so only fused-marked tests execute this code).
_FAST_EXCEPTIONS = (
    "tests/test_fused.py::test_closest_hit_matches_xla[cornell]",
    "tests/test_fused.py::test_any_hit_matches_xla",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        nid = item.nodeid
        if nid in _FAST_EXCEPTIONS or nid.startswith(_FAST_EXCEPTIONS):
            continue
        if any(nid.startswith(p) for p in _SLOW_PREFIXES):
            item.add_marker(pytest.mark.slow)


def _rss_gb() -> float:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1e6
    except OSError:
        pass
    return 0.0


@pytest.fixture(autouse=True, scope="module")
def _bound_jax_memory():
    """Release compiled executables between test modules: the full suite
    holds hundreds of XLA:CPU programs and the compiler segfaults under the
    resulting memory pressure near the end of the run (observed twice at
    >90%; every module passes in isolation). Clearing is CONDITIONAL on
    actual pressure — an unconditional clear forced cross-module recompiles
    of shared programs, a large share of the default tier's wall time on
    this single-core host."""
    yield
    if _rss_gb() > 48.0:
        jax.clear_caches()
