"""Instance tables for two-level (TLAS/BLAS-style) acceleration.

The reference builds one BLAS per glTF primitive mesh and a TLAS over scene
nodes carrying {transform, instanceCustomIndex, flags}
(``accelstruct.cpp:132-162``). Round 1 of this framework baked every
instance's transform into one world-space triangle pool — N copies of a mesh
cost N× memory and N× BVH build. This module is the TPU-native two-level
representation: meshes stay OBJECT-space in one shared pool, instances are
{3×4 transform, mesh id} rows, and traversal transforms rays into object
space at instance entry (``ops/tlas.py``).

Winding note: like ``VK_KHR_acceleration_structure``, front-facing is
evaluated in OBJECT space; mirrored instances (negative-determinant
transforms) flip apparent world-space winding — mark such instances'
materials double-sided (the reference has the same behavior unless the
FLIP_FACING instance flag is set, which it never sets).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .schema import ALPHA_OPAQUE, Geometry
from .builder import GeometryBuilder


class InstanceTable(NamedTuple):
    """SoA instance rows (``InstanceData``/TLAS instances,
    host_device.h:200-205 + accelstruct.cpp:140-150)."""

    object_to_world: jax.Array   # (I, 3, 4) f32
    world_to_object: jax.Array   # (I, 3, 4) f32
    mesh_id: jax.Array           # (I,) i32
    # world-space AABB of each instance (transformed mesh bounds) — the
    # "TLAS leaves"
    aabb_min: jax.Array          # (I, 3) f32
    aabb_max: jax.Array          # (I, 3) f32


class MeshPool(NamedTuple):
    """Shared object-space mesh pool: one Geometry whose triangles are the
    concatenation of all meshes; per-mesh triangle ranges index it."""

    geometry: Geometry           # object-space, mesh-concatenated
    tri_start: np.ndarray        # (M,) host: first triangle of each mesh
    tri_count: np.ndarray        # (M,) host
    aabb_min: np.ndarray         # (M, 3) host: object-space mesh bounds
    aabb_max: np.ndarray         # (M, 3) host


class InstancedSceneBuilder:
    """Builds a MeshPool + InstanceTable.

    Usage::

        b = InstancedSceneBuilder()
        tree = b.add_mesh(verts, idx, material, uv=...)   # returns mesh id
        b.add_instance(tree, transform)                    # any number
        pool, instances = b.build()
    """

    def __init__(self) -> None:
        self._g = GeometryBuilder()
        self._ranges: list[tuple[int, int]] = []
        self._bounds: list[tuple[np.ndarray, np.ndarray]] = []
        self._tri_cursor = 0
        self._inst_mesh: list[int] = []
        self._inst_xf: list[np.ndarray] = []

    def add_mesh(
        self,
        positions,
        indices,
        material: int,
        *,
        normals=None,
        uv=None,
        tangents=None,
        colors=None,
        double_sided: bool = False,
        alpha_mode: int = ALPHA_OPAQUE,
    ) -> int:
        positions = np.asarray(positions, np.float64).reshape(-1, 3)
        indices = np.asarray(indices, np.int64).reshape(-1, 3)
        self._g.add_mesh(
            positions, indices, material,
            normals=normals, uv=uv, tangents=tangents, colors=colors,
            double_sided=double_sided, alpha_mode=alpha_mode,
        )
        nt = len(indices)
        self._ranges.append((self._tri_cursor, nt))
        self._bounds.append((positions.min(axis=0), positions.max(axis=0)))
        self._tri_cursor += nt
        return len(self._ranges) - 1

    def add_instance(self, mesh_id: int, transform: np.ndarray) -> int:
        m = np.asarray(transform, np.float64)
        assert m.shape == (4, 4)
        self._inst_mesh.append(int(mesh_id))
        self._inst_xf.append(m)
        return len(self._inst_mesh) - 1

    def build(self) -> tuple[MeshPool, InstanceTable]:
        assert self._inst_mesh, "no instances"
        geom = self._g.build()
        tri_start = np.asarray([r[0] for r in self._ranges], np.int64)
        tri_count = np.asarray([r[1] for r in self._ranges], np.int64)
        mmin = np.stack([b[0] for b in self._bounds])
        mmax = np.stack([b[1] for b in self._bounds])
        pool = MeshPool(
            geometry=geom,
            tri_start=tri_start,
            tri_count=tri_count,
            aabb_min=mmin.astype(np.float32),
            aabb_max=mmax.astype(np.float32),
        )

        n = len(self._inst_mesh)
        o2w = np.zeros((n, 3, 4), np.float32)
        w2o = np.zeros((n, 3, 4), np.float32)
        amin = np.zeros((n, 3), np.float32)
        amax = np.zeros((n, 3), np.float32)
        for i, (mid, m) in enumerate(zip(self._inst_mesh, self._inst_xf)):
            inv = np.linalg.inv(m)
            o2w[i] = m[:3, :4]
            w2o[i] = inv[:3, :4]
            # world AABB of the transformed object AABB (the standard
            # per-axis |M| trick)
            c = (mmin[mid] + mmax[mid]) / 2.0
            e = (mmax[mid] - mmin[mid]) / 2.0
            cw = m[:3, :3] @ c + m[:3, 3]
            ew = np.abs(m[:3, :3]) @ e
            amin[i] = cw - ew
            amax[i] = cw + ew
        inst = InstanceTable(
            object_to_world=np.asarray(o2w, np.float32),
            world_to_object=np.asarray(w2o, np.float32),
            mesh_id=np.asarray(self._inst_mesh, np.int32),
            aabb_min=np.asarray(amin, np.float32),
            aabb_max=np.asarray(amax, np.float32),
        )
        return pool, inst
