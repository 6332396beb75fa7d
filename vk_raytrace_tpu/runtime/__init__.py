"""Native (C++) host runtime with automatic build + Python fallback.

The reference's host layer is C++ (``src/scene.cpp``, ``src/hdr_sampling.cpp``);
this package provides the same hot loops as a small C-ABI shared library
(``native.cpp``) loaded via ctypes — pybind11 isn't available in this image.
The library is compiled on first use with g++ and cached next to the source;
every entry point has a pure-numpy fallback so the framework works without a
toolchain.

Exposed helpers: :func:`rgbe_decode`, :func:`oct_encode`, :func:`oct_decode`,
:func:`smooth_normals`, :func:`alias_table_seq`, :func:`pack_rgba8`,
plus :data:`available` saying whether the native path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "native.cpp")
_LIB = os.path.join(_DIR, "_native.so")

_lib = None


class SceneScaleError(ValueError):
    """Raised when a scene exceeds the exact-f32 encoding ceilings of the
    wide-BVH row format (documented in docs/ARCHITECTURE.md):

    * triangle ids ride in f32 leaf lanes as ``orig*4 + flags`` — exact
      only below ``2**22`` (~4.19M) triangles per id space;
    * child refs ride in f32 interior lanes as ``row*leaf_tris + count`` —
      exact only below ``2**23`` encoded values (~2M rows at 4-tri leaves).

    Scenes past the id ceiling must be split across instanced BLAS id
    spaces (models/instances.py — each mesh's ids are pool-global but the
    POOL, not the instantiated total, is what counts) or chunked.
    """


def _check_id_ceiling(max_orig: int) -> None:
    if max_orig * 4 + 3 >= 2**24:
        raise SceneScaleError(
            f"triangle id {max_orig} exceeds the exact-f32 ceiling of "
            f"{2**22 - 1} unique triangles; instance repeated geometry "
            "(models/instances.py) or split the scene"
        )


def _check_ref_ceiling(n_rows: int, leaf_tris: int) -> None:
    if n_rows * leaf_tris + leaf_tris >= 2**23:
        raise SceneScaleError(
            f"{n_rows} BVH rows exceed the exact-f32 ref ceiling of "
            f"{2**23 // leaf_tris - 1}; instance repeated geometry "
            "(models/instances.py) or split the scene"
        )


def _build() -> bool:
    # Portable target by default (the .so is rebuilt lazily per machine and
    # never committed); VKRT_NATIVE_ARCH=native opts into machine tuning.
    arch = os.environ.get("VKRT_NATIVE_ARCH", "x86-64-v2")
    for march in (arch, "x86-64"):  # fallback for toolchains without -v2
        try:
            cmd = [
                "g++", "-O3", f"-march={march}", "-shared", "-fPIC",
                "-o", _LIB + ".tmp", _SRC,
            ]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(_LIB + ".tmp", _LIB)
            return True
        except Exception:
            continue
    return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_LIB)
        lib.rgbe_decode.restype = ctypes.c_int
        lib.alias_table_build.restype = ctypes.c_float
        lib.build_bvh8.restype = ctypes.c_int64
        lib.build_bvh16.restype = ctypes.c_int64
        lib.build_bvh32.restype = ctypes.c_int64
        _lib = lib
    except OSError:
        _lib = False
    return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


@property
def _available():  # pragma: no cover - trivial
    return bool(_load())


def available() -> bool:
    """True when the native library loaded (or compiled) successfully."""
    return bool(_load())


def rgbe_decode(data: bytes, width: int, height: int) -> np.ndarray | None:
    """Decode RGBE scanlines to (H, W, 3) f32; None -> caller falls back."""
    lib = _load()
    if not lib:
        return None
    buf = np.frombuffer(data, np.uint8)
    out = np.empty((height, width, 3), np.float32)
    rc = lib.rgbe_decode(
        _ptr(buf), ctypes.c_int64(len(buf)), width, height, _ptr(out)
    )
    return out if rc == 0 else None


def oct_encode(vecs: np.ndarray) -> np.ndarray:
    """Octahedral-compress unit vectors (n, 3) f32 -> (n,) u32."""
    vecs = np.ascontiguousarray(vecs, np.float32)
    lib = _load()
    n = len(vecs)
    if lib:
        out = np.empty(n, np.uint32)
        lib.oct_encode_batch(_ptr(vecs), ctypes.c_int64(n), _ptr(out))
        return out
    # numpy fallback mirrors ops/math.py::oct_encode
    import jax.numpy as jnp

    from ..ops.math import oct_encode as jax_oct

    return np.asarray(jax_oct(jnp.asarray(vecs)))


def oct_decode(packed: np.ndarray) -> np.ndarray:
    packed = np.ascontiguousarray(packed, np.uint32)
    lib = _load()
    n = len(packed)
    if lib:
        out = np.empty((n, 3), np.float32)
        lib.oct_decode_batch(_ptr(packed), ctypes.c_int64(n), _ptr(out))
        return out
    import jax.numpy as jnp

    from ..ops.math import oct_decode as jax_dec

    return np.asarray(jax_dec(jnp.asarray(packed)))


def smooth_normals(positions: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals; (nv,3) f64 + (nt,3) i64 -> (nv,3) f64."""
    positions = np.ascontiguousarray(positions, np.float64)
    indices = np.ascontiguousarray(indices, np.int64)
    lib = _load()
    if lib:
        out = np.empty_like(positions)
        lib.smooth_normals(
            _ptr(positions), ctypes.c_int64(len(positions)),
            _ptr(indices), ctypes.c_int64(len(indices)), _ptr(out),
        )
        return out
    n = np.zeros_like(positions)
    p0 = positions[indices[:, 0]]
    p1 = positions[indices[:, 1]]
    p2 = positions[indices[:, 2]]
    fn = np.cross(p1 - p0, p2 - p0)
    for k in range(3):
        np.add.at(n, indices[:, k], fn)
    ln = np.linalg.norm(n, axis=1, keepdims=True)
    bad = ln[:, 0] < 1e-20
    n[bad] = [0.0, 0.0, 1.0]
    ln[bad] = 1.0
    return n / ln


def alias_table_seq(importance: np.ndarray):
    """Exact sequential Walker table (the reference algorithm,
    hdr_sampling.cpp:107-176). Returns (q, alias, integral)."""
    importance = np.ascontiguousarray(importance, np.float32)
    n = len(importance)
    lib = _load()
    if lib:
        q = np.empty(n, np.float32)
        alias = np.empty(n, np.uint32)
        total = lib.alias_table_build(
            _ptr(importance), ctypes.c_int64(n), _ptr(q), _ptr(alias)
        )
        return q, alias.astype(np.int64), float(total)
    # numpy fallback
    total = float(importance.sum())
    q = importance.astype(np.float64) * n / max(total, 1e-30)
    alias = np.arange(n)
    part = np.zeros(n, np.int64)
    s, large = 0, n
    for i in range(n):
        if q[i] < 1.0:
            part[s] = i
            s += 1
        else:
            large -= 1
            part[large] = i
    s = 0
    while s < large and large < n:
        lo, hi = part[s], part[large]
        alias[lo] = hi
        q[hi] -= 1.0 - q[lo]
        if q[hi] < 1.0:
            large += 1
        s += 1
    return q.astype(np.float32), alias, total


def build_bvh8_rows(
    positions: np.ndarray,
    indices: np.ndarray,
    uv: np.ndarray,
    tri_flags: np.ndarray,
    tri_ids: np.ndarray | None = None,
) -> np.ndarray | None:
    """Native top-down binned-SAH build of the 8-wide traversal rows
    (`ops/bvh8.py::WideScene` layout). Returns (n_rows, 64) f32, or None when
    the native library is unavailable (caller falls back to the device LBVH +
    host collapse path).

    The reference builds its BLAS/TLAS natively through the Vulkan driver
    (``accelstruct.cpp:110-162``); this is the host-native equivalent — no
    XLA compile cost, and SAH trees trace faster than Morton LBVH.
    """
    lib = _load()
    if not lib:
        return None
    positions = np.ascontiguousarray(positions, np.float32)
    indices = np.ascontiguousarray(indices, np.int32)
    uv = np.ascontiguousarray(uv, np.float32)
    tri_flags = np.ascontiguousarray(tri_flags, np.int32)
    t = len(indices)
    ids_arg = None
    max_orig = t - 1
    if tri_ids is not None:
        tri_ids = np.ascontiguousarray(tri_ids, np.int32)
        ids_arg = _ptr(tri_ids)
        max_orig = int(tri_ids.max(initial=0))
    _check_id_ceiling(max_orig)
    for max_rows in (t + t // 3 + 16, 2 * t + 8):
        rows = np.empty((max_rows, 64), np.float32)
        n = lib.build_bvh8(
            _ptr(positions), _ptr(indices), _ptr(uv), ids_arg,
            _ptr(tri_flags), ctypes.c_int64(t), _ptr(rows),
            ctypes.c_int64(max_rows),
        )
        if n > 0:
            _check_ref_ceiling(n, 4)
            return np.ascontiguousarray(rows[:n])
    return None


def build_planar_rows(
    positions: np.ndarray,
    indices: np.ndarray,
    uv: np.ndarray,
    tri_flags: np.ndarray,
    tri_ids: np.ndarray | None = None,
    width: int = 16,
    presplit: float | None = None,
) -> tuple[np.ndarray, int] | None:
    """Native binned-SAH build of ``width``-wide PLANAR rows consumed by the
    fused Pallas traversal (ops/traverse_fused.py). Returns
    ``(rows (n, width*8) f32, stack_depth)`` or None without the native
    library.

    Same hardware rationale as :func:`build_bvh8_rows` (accelstruct.cpp:
    110-162 analog). width=16 -> 512B rows (gathers cost the same per row
    as 256B: half the per-ray gathers for free); width=32 -> 1024B rows
    (+14% per gather for half the rows again, VKRT_WIDE=32)."""
    assert width in (16, 32), width
    lib = _load()
    if not lib:
        return None
    positions = np.ascontiguousarray(positions, np.float32)
    indices = np.ascontiguousarray(indices, np.int32)
    uv = np.ascontiguousarray(uv, np.float32)
    tri_flags = np.ascontiguousarray(tri_flags, np.int32)
    t = len(indices)
    ids_arg = None
    max_orig = t - 1
    if tri_ids is not None:
        tri_ids = np.ascontiguousarray(tri_ids, np.int32)
        ids_arg = _ptr(tri_ids)
        max_orig = int(tri_ids.max(initial=0))
    _check_id_ceiling(max_orig)
    if presplit is None:
        presplit = float(os.environ.get("VKRT_PRESPLIT", "0"))
    fn = lib.build_bvh16 if width == 16 else lib.build_bvh32
    leaf = width // 2
    depth = ctypes.c_int32(0)
    # Presplitting emits up to presplit*t extra fragments; leaves dedup, so
    # the fragment count bounds rows the same way triangles do.
    f = t + int(presplit * t) + 1
    for max_rows in (f // (leaf // 2) + f // leaf + 16, f + 8):
        rows = np.empty((max_rows, width * 8), np.float32)
        n = fn(
            _ptr(positions), _ptr(indices), _ptr(uv), ids_arg,
            _ptr(tri_flags), ctypes.c_int64(t), _ptr(rows),
            ctypes.c_int64(max_rows), ctypes.byref(depth),
            ctypes.c_float(presplit),
        )
        if n > 0:
            _check_ref_ceiling(n, leaf)
            return np.ascontiguousarray(rows[:n]), int(depth.value)
    return None


def build_bvh16_rows(positions, indices, uv, tri_flags, tri_ids=None):
    return build_planar_rows(
        positions, indices, uv, tri_flags, tri_ids=tri_ids, width=16
    )


def pack_rgba8(colors: np.ndarray) -> np.ndarray:
    colors = np.ascontiguousarray(colors, np.float32)
    lib = _load()
    if lib:
        out = np.empty(len(colors), np.uint32)
        lib.pack_rgba8(_ptr(colors), ctypes.c_int64(len(colors)), _ptr(out))
        return out
    c8 = np.round(np.clip(colors, 0.0, 1.0) * 255.0).astype(np.uint32)
    return c8[:, 0] | (c8[:, 1] << 8) | (c8[:, 2] << 16) | (c8[:, 3] << 24)
