"""Viewer shell units: PNG encoder, orbit-camera math, control routing."""

import json
import numpy as np

from vk_raytrace_tpu import viewer as V
from vk_raytrace_tpu.models.procedural import look_at_camera


def test_png_bytes_roundtrip():
    img = np.zeros((8, 8, 3), np.float32)
    img[2, 3] = [1.0, 0.5, 0.25]
    data = V._png_bytes(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    from PIL import Image
    import io

    back = np.asarray(Image.open(io.BytesIO(data)))
    assert back.shape == (8, 8, 3)
    assert tuple(back[2, 3]) == (255, 128, 64)
    assert back[0, 0].sum() == 0


def test_orbit_preserves_pivot_distance():
    cam = look_at_camera([0, 1, 3], [0, 1, 0], [0, 1, 0], 45.0, 1.0)
    oc = V.OrbitCamera(cam, 64, 64)
    r0 = np.linalg.norm(oc.eye - oc.center)
    oc.orbit(120.0, -35.0)
    r1 = np.linalg.norm(oc.eye - oc.center)
    np.testing.assert_allclose(r0, r1, rtol=1e-5)
    # dolly changes the distance, pan moves both points together
    oc.dolly(-2.0)
    assert np.linalg.norm(oc.eye - oc.center) < r1
    c_before = oc.center.copy()
    d_before = oc.eye - oc.center
    oc.pan(30.0, -10.0)
    np.testing.assert_allclose(oc.eye - oc.center, d_before, atol=1e-6)
    assert np.linalg.norm(oc.center - c_before) > 0


def test_orbit_camera_produces_valid_matrices():
    cam = look_at_camera([2, 2, 2], [0, 0, 0], [0, 1, 0], 45.0, 16 / 9)
    oc = V.OrbitCamera(cam, 160, 90)
    oc.orbit(50, 20)
    cam2 = oc.camera()
    vi = np.asarray(cam2.view_inverse)
    # Rotation block orthonormal
    r = vi[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)


def test_control_page_covers_sample_gui_inventory():
    """Every sample_gui.cpp control family has a viewer counterpart
    (VERDICT r2 item 7): all 13 debug modes, full tonemapper, sun&sky
    editor, aperture/focal, renderer switch, stats + profiler panels."""
    page = V._PAGE
    # all 13 debug modes, numbered per models/schema.py DEBUG_*
    for v, name in [(0, "none"), (1, "base color"), (2, "normal"),
                    (3, "metallic"), (4, "emissive"), (5, "alpha"),
                    (6, "roughness"), (7, "texcoord"), (8, "tangent"),
                    (9, "radiance"), (10, "weight"), (11, "ray dir"),
                    (12, "heatmap")]:
        assert f'<option value="{v}">{name}</option>' in page, name
    for ctl in ["fov", "aperture", "focal", "depth", "spp", "pbr",
                "renderer", "tonemode", "exposure", "brightness",
                "contrast", "saturation", "vignette", "autoexp", "dither",
                "sunsky", "azimuth", "elevation", "haze", "rbshift",
                "horizon", "horizonblur", "sundisk", "sunscale", "sunglow"]:
        assert f'id="{ctl}"' in page, ctl
    assert 'id="stats"' in page and 'id="prof"' in page
    # live utilization plots (nvml_monitor.hpp ring plots analog)
    for pl in ["pl_ms", "pl_mrays", "pl_mem"]:
        assert f'id="{pl}"' in page, pl


def test_scene_derived_pivot_and_set_pivot():
    """Orbit pivot comes from the scene bounds (not a fixed 3.0 units) and
    pick re-targets it (sample_example.cpp:493-510)."""
    cam = look_at_camera([0, 1, 10], [0, 1, 0], [0, 1, 0], 45.0, 1.0)
    bounds = (np.asarray([-2.0, 0.0, -2.0]), np.asarray([2.0, 2.0, 2.0]))
    oc = V.OrbitCamera(cam, 64, 64, bounds=bounds)
    # scene center is 10 units away along the view ray; dist must track it
    np.testing.assert_allclose(oc.dist, 10.0, atol=0.5)
    oc.set_pivot([1.0, 1.0, 1.0])
    np.testing.assert_allclose(oc.center, [1.0, 1.0, 1.0])
    # fov recovered from the projection matrix
    np.testing.assert_allclose(oc.fov, 45.0, atol=0.5)


def test_prof_and_stats_strings():
    class _FakeGeom:
        indices = np.zeros((5, 3), np.int64)

    class _FakeRenderer:
        frame = 3
        last_rays = 1_000_000
        build_times = {"accel_s": 1.2}

    import types
    from vk_raytrace_tpu.models.schema import RenderConfig

    s = V._prof_stats(_FakeRenderer(), 0.5, RenderConfig(width=8, height=8))
    assert "Mrays/s" in s and "2.00" in s
    assert "accel_s" in s


def test_max_frames_stops_accumulation():
    """cfg.max_frames halts progressive accumulation (m_maxFrames,
    sample_example.cpp:407-408), and the traced config is normalized so
    sweeping max_frames never fragments the jit cache."""
    from vk_raytrace_tpu.models import procedural
    from vk_raytrace_tpu import render as R
    from vk_raytrace_tpu.models.schema import PBR_GLTF, RenderConfig

    geom, mats, lights, cam = procedural.cornell_box()
    scene = R.build_scene(geom, mats, lights, cam)
    cfg = RenderConfig(width=16, height=16, max_depth=2, max_samples=1,
                       hdr_multiplier=0.0, pbr_mode=PBR_GLTF, max_frames=2)
    r = R.Renderer(scene, cfg)
    assert r._run_cfg.max_frames == 100000  # jit key stays stable
    for _ in range(4):
        r.step()
    assert r.frame == 2 and r.converged
    frozen = np.asarray(r.accum).copy()
    r.step()
    np.testing.assert_array_equal(np.asarray(r.accum), frozen)
    # reset() re-arms accumulation (camera change in the reference)
    r.reset()
    assert not r.converged
    r.step()
    assert r.frame == 1


def test_viewer_interaction_descaling(tmp_path):
    """During a camera drag the viewer renders at 1/DS resolution through a
    twin renderer sharing the accel, then snaps back to full-res
    accumulation (sample_example.cpp:410-415)."""
    import threading
    import time
    import types

    args = types.SimpleNamespace(
        scene="cornell", size=(32, 32), depth=2, spp=1, hdr=None,
        sun_sky=False, hdr_multiplier=1.0, pbr="gltf", debug_mode="none",
        render_scale=1, firefly_clamp=None, no_any_hit=False, no_rr=False,
        instancing="auto",
    )
    svc = V.ViewerService(args)
    t = threading.Thread(target=svc.run_render_loop, daemon=True)
    t.start()

    def wait_for(pred, timeout=240.0):
        t0 = time.time()
        while time.time() - t0 < timeout:
            with svc._lock:
                st = dict(svc._state)
            if pred(st):
                return st
            time.sleep(0.2)
        raise AssertionError(f"timeout; last state={st}")

    # full-res frames accumulate first
    st0 = wait_for(lambda st: st.get("frame", 0) >= 2)
    desc0 = st0.get("descale_frames", 0)
    resets0 = st0.get("resets", 0)
    # a drag: descaled frame(s) must be presented and the full-res
    # accumulation must restart. Assert on the MONOTONIC counters — the
    # transient `descaled` flag can slip between polls (8x8 descaled
    # frames render in ~ms; this flaked under host load).
    with svc._lock:
        svc._controls.append({"cmd": "orbit", "dx": 40.0, "dy": 10.0})
    st = wait_for(lambda st: st.get("descale_frames", 0) > desc0)
    assert st.get("resets", 0) > resets0  # accumulation restarted
    # and it snaps back to full-res accumulation afterwards
    st = wait_for(lambda st: not st.get("descaled") and st.get("frame", 0) >= 2)
    # live utilization history (NVML ring-plot analog,
    # nvml_monitor.hpp:56-176): per-frame ms + Mrays/s rings feed the
    # profiler sparklines; they must carry numeric samples and grow.
    hist = st.get("hist")
    assert hist and len(hist["ms"]) >= 2 and len(hist["mrays"]) >= 2
    assert all(isinstance(x, (int, float)) and x >= 0 for x in hist["ms"])
    n0 = len(hist["ms"])
    if n0 < 120:  # ring not yet saturated: it must keep growing
        st = wait_for(lambda st: len(st["hist"]["ms"]) > n0)
    svc._stop = True
    t.join(timeout=60)
