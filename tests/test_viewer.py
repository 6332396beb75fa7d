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
