"""Procedural test scenes (no assets shipped with the repo).

Provides the benchmark geometry from BASELINE.md: a CornellBox (config #1),
a Disney-BSDF material test array (config #4), and a parametric many-triangle
"city" stress scene standing in for Sponza/Bistro-class geometry
(configs #3/#5) since the environment has no network access to fetch assets.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .builder import GeometryBuilder
from .schema import (
    ALPHA_MASK,
    LIGHT_POINT,
    Camera,
    Geometry,
    Materials,
    make_lights,
    make_materials,
)


def _quad(a, b, c, d):
    """Two CCW triangles for quad a-b-c-d (normals via right-hand rule)."""
    verts = np.array([a, b, c, d], np.float64)
    idx = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    return verts, idx


def _box(center, size):
    """Axis-aligned box, outward-facing quads."""
    cx, cy, cz = center
    sx, sy, sz = np.asarray(size) / 2.0
    v = []
    f = []
    quads = [
        # +x
        [[cx + sx, cy - sy, cz - sz], [cx + sx, cy + sy, cz - sz], [cx + sx, cy + sy, cz + sz], [cx + sx, cy - sy, cz + sz]],
        # -x
        [[cx - sx, cy - sy, cz + sz], [cx - sx, cy + sy, cz + sz], [cx - sx, cy + sy, cz - sz], [cx - sx, cy - sy, cz - sz]],
        # +y
        [[cx - sx, cy + sy, cz - sz], [cx - sx, cy + sy, cz + sz], [cx + sx, cy + sy, cz + sz], [cx + sx, cy + sy, cz - sz]],
        # -y
        [[cx - sx, cy - sy, cz + sz], [cx - sx, cy - sy, cz - sz], [cx + sx, cy - sy, cz - sz], [cx + sx, cy - sy, cz + sz]],
        # +z
        [[cx - sx, cy - sy, cz + sz], [cx + sx, cy - sy, cz + sz], [cx + sx, cy + sy, cz + sz], [cx - sx, cy + sy, cz + sz]],
        # -z
        [[cx - sx, cy + sy, cz - sz], [cx + sx, cy + sy, cz - sz], [cx + sx, cy - sy, cz - sz], [cx - sx, cy - sy, cz - sz]],
    ]
    off = 0
    for q in quads:
        verts, idx = _quad(*q)
        v.append(verts)
        f.append(idx + off)
        off += 4
    return np.concatenate(v), np.concatenate(f)


def look_at_camera(
    eye, center, up, fov_deg: float, aspect: float,
    focal_dist: float = 0.0, aperture: float = 0.0,
) -> Camera:
    """Build the SceneCamera matrices (viewInverse/projInverse) the ray
    generator consumes (pathtrace.glsl:360-363)."""
    eye = np.asarray(eye, np.float64)
    center = np.asarray(center, np.float64)
    up = np.asarray(up, np.float64)
    f = center - eye
    f /= np.linalg.norm(f)
    s = np.cross(f, up)
    s /= np.linalg.norm(s)
    u = np.cross(s, f)
    view = np.eye(4)
    view[0, :3] = s
    view[1, :3] = u
    view[2, :3] = -f
    view[:3, 3] = -view[:3, :3] @ eye

    fov = np.deg2rad(fov_deg)
    fy = 1.0 / np.tan(fov / 2.0)
    near, far = 0.1, 1000.0
    proj = np.zeros((4, 4))
    proj[0, 0] = fy / aspect
    proj[1, 1] = -fy  # Vulkan clip space: y down (the ref flips via proj)
    proj[2, 2] = far / (near - far)
    proj[2, 3] = (far * near) / (near - far)
    proj[3, 2] = -1.0

    if focal_dist <= 0.0:
        focal_dist = float(np.linalg.norm(center - eye))

    return Camera(
        view_inverse=jnp.asarray(np.linalg.inv(view), jnp.float32),
        proj_inverse=jnp.asarray(np.linalg.inv(proj), jnp.float32),
        focal_dist=jnp.asarray(focal_dist, jnp.float32),
        aperture=jnp.asarray(aperture, jnp.float32),
    )


def cornell_box(light_intensity: float = 40.0):
    """The classic box: white walls, red/green sides, two blocks, one point
    light (benchmark config #1). Returns (geometry, materials, lights, camera).
    """
    white = dict(base_color_factor=[0.73, 0.73, 0.73, 1.0], metallic_factor=0.0, roughness_factor=1.0)
    red = dict(base_color_factor=[0.65, 0.05, 0.05, 1.0], metallic_factor=0.0, roughness_factor=1.0)
    green = dict(base_color_factor=[0.12, 0.45, 0.15, 1.0], metallic_factor=0.0, roughness_factor=1.0)
    mats = make_materials([white, red, green])

    g = GeometryBuilder()
    s = 5.0  # half-size
    # floor (+y up); walls double-sided off, CCW outward-facing into the box
    floor_v, floor_i = _quad([-s, 0, -s], [-s, 0, s], [s, 0, s], [s, 0, -s])
    ceil_v, ceil_i = _quad([-s, 2 * s, -s], [s, 2 * s, -s], [s, 2 * s, s], [-s, 2 * s, s])
    back_v, back_i = _quad([-s, 0, -s], [s, 0, -s], [s, 2 * s, -s], [-s, 2 * s, -s])
    left_v, left_i = _quad([-s, 0, s], [-s, 0, -s], [-s, 2 * s, -s], [-s, 2 * s, s])
    right_v, right_i = _quad([s, 0, -s], [s, 0, s], [s, 2 * s, s], [s, 2 * s, -s])
    for v, i, m in [
        (floor_v, floor_i, 0),
        (ceil_v, ceil_i, 0),
        (back_v, back_i, 0),
        (left_v, left_i, 1),
        (right_v, right_i, 2),
    ]:
        g.add_mesh(v, i, m)

    bv, bi = _box([-1.9, 3.0, -1.7], [3.0, 6.0, 3.0])
    g.add_mesh(bv, bi, 0)
    bv, bi = _box([2.0, 1.5, 1.6], [3.0, 3.0, 3.0])
    g.add_mesh(bv, bi, 0)

    lights = make_lights([
        dict(type=LIGHT_POINT, position=[0.0, 9.6, 0.0], color=[1.0, 1.0, 1.0],
             intensity=light_intensity, range=0.0),
    ])

    cam = look_at_camera(
        eye=[0.0, 5.0, 24.0], center=[0.0, 5.0, 0.0], up=[0, 1, 0],
        fov_deg=40.0, aspect=1.0,
    )
    return g.build(), mats, lights, cam


def material_test_grid(n: int = 5):
    """Grid of spheres sweeping roughness/metallic (+ clearcoat/sheen/
    transmission rows) over a ground plane — benchmark config #4 analog."""
    rows = []
    g = GeometryBuilder()
    sphere_v, sphere_i, sphere_n, sphere_uv = _uv_sphere(24, 48)

    spacing = 2.5
    for iy in range(n):
        for ix in range(n):
            mid = len(rows)
            t = ix / max(n - 1, 1)
            kind = iy % 5
            m = dict(base_color_factor=[0.8, 0.3, 0.25, 1.0], roughness_factor=max(0.05, t))
            if kind == 0:
                m["metallic_factor"] = 0.0
            elif kind == 1:
                m["metallic_factor"] = 1.0
            elif kind == 2:
                m.update(metallic_factor=0.0, clearcoat_factor=1.0, clearcoat_roughness=max(0.03, t))
            elif kind == 3:
                m.update(metallic_factor=0.0, sheen_color=[0.9, 0.9, 0.9], sheen_roughness=1.0)
            else:
                m.update(metallic_factor=0.0, transmission_factor=1.0, ior=1.5,
                         thickness_factor=1.0, attenuation_color=[0.9, 0.6, 0.6],
                         attenuation_distance=2.0, base_color_factor=[1.0, 1.0, 1.0, 1.0])
            rows.append(m)
            tr = np.eye(4)
            tr[:3, 3] = [(ix - (n - 1) / 2) * spacing, 1.0, (iy - (n - 1) / 2) * spacing]
            g.add_mesh(sphere_v, sphere_i, mid, normals=sphere_n, uv=sphere_uv, transform=tr)

    ground = len(rows)
    rows.append(dict(base_color_factor=[0.6, 0.6, 0.6, 1.0], metallic_factor=0.0, roughness_factor=0.9))
    e = n * spacing
    gv, gi = _quad([-e, 0, -e], [-e, 0, e], [e, 0, e], [e, 0, -e])
    g.add_mesh(gv, gi, ground)

    mats = make_materials(rows)
    lights = make_lights([])
    cam = look_at_camera(
        eye=[0.0, n * 1.6, n * 2.3], center=[0, 0.5, 0], up=[0, 1, 0],
        fov_deg=45.0, aspect=16 / 9,
    )
    return g.build(), mats, lights, cam


def city_scene(n_blocks: int = 24, seed: int = 7, alpha_panels: bool = True):
    """Many-box 'city' stress scene (~30k-1M tris with n_blocks) with
    optional alpha-cutout panels — stands in for Sponza (config #3)."""
    rng = np.random.default_rng(seed)
    rows = [
        dict(base_color_factor=[0.75, 0.75, 0.75, 1.0], roughness_factor=0.8, metallic_factor=0.0),
        dict(base_color_factor=[0.8, 0.45, 0.25, 1.0], roughness_factor=0.6, metallic_factor=0.0),
        dict(base_color_factor=[0.55, 0.65, 0.8, 1.0], roughness_factor=0.25, metallic_factor=0.9),
        dict(base_color_factor=[0.9, 0.9, 0.9, 0.55], roughness_factor=0.9, metallic_factor=0.0,
             alpha_mode=ALPHA_MASK, alpha_cutoff=0.5, double_sided=1),
    ]
    g = GeometryBuilder()
    e = n_blocks * 2.2
    gv, gi = _quad([-e, 0, -e], [-e, 0, e], [e, 0, e], [e, 0, -e])
    g.add_mesh(gv, gi, 0)

    for i in range(n_blocks):
        for j in range(n_blocks):
            h = float(rng.uniform(1.0, 8.0))
            w = float(rng.uniform(0.8, 1.8))
            x = (i - n_blocks / 2) * 4.0 + float(rng.uniform(-0.5, 0.5))
            z = (j - n_blocks / 2) * 4.0 + float(rng.uniform(-0.5, 0.5))
            bv, bi = _box([x, h / 2, z], [w, h, w])
            g.add_mesh(bv, bi, int(rng.integers(1, 3)))
            if alpha_panels and rng.uniform() < 0.3:
                pv, pi = _quad(
                    [x - w, h * 0.6, z + w * 1.2], [x + w, h * 0.6, z + w * 1.2],
                    [x + w, h * 1.1, z + w * 1.2], [x - w, h * 1.1, z + w * 1.2],
                )
                g.add_mesh(pv, pi, 3, double_sided=True, alpha_mode=ALPHA_MASK)

    mats = make_materials(rows)
    lights = make_lights([
        dict(type=LIGHT_POINT, position=[0.0, 30.0, 0.0], intensity=2000.0),
    ])
    cam = look_at_camera(
        eye=[e * 0.7, 14.0, e * 0.7], center=[0, 2.0, 0], up=[0, 1, 0],
        fov_deg=55.0, aspect=16 / 9,
    )
    return g.build(), mats, lights, cam


def _uv_sphere(n_lat: int, n_lon: int, radius: float = 1.0):
    """UV sphere with positions/normals/uv."""
    lats = np.linspace(0, np.pi, n_lat + 1)
    lons = np.linspace(0, 2 * np.pi, n_lon + 1)
    verts, norms, uvs = [], [], []
    for i, th in enumerate(lats):
        for j, ph in enumerate(lons):
            nx = np.sin(th) * np.cos(ph)
            ny = np.cos(th)
            nz = np.sin(th) * np.sin(ph)
            verts.append([radius * nx, radius * ny, radius * nz])
            norms.append([nx, ny, nz])
            uvs.append([j / n_lon, i / n_lat])
    idx = []
    stride = n_lon + 1
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * stride + j
            b = a + 1
            c = a + stride
            d = c + 1
            if i > 0:
                idx.append([a, c, b])
            if i < n_lat - 1:
                idx.append([b, c, d])
    return (
        np.asarray(verts),
        np.asarray(idx, np.int64),
        np.asarray(norms),
        np.asarray(uvs),
    )
