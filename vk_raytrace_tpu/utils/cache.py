"""Content-addressed disk cache for scene-build products.

The reference rebuilds its BLAS/TLAS on every run because the Vulkan driver
does it in milliseconds (``accelstruct.cpp:110-162``); the TPU framework's
host-side binned-SAH build and sun&sky bake are seconds-scale, so repeat
runs of the same scene (benchmarks, viewers, tests) cache them on disk,
keyed by a blake2b hash of the exact input arrays. A cache hit is a plain
``np.load``; corrupt or mismatched entries fall back to a rebuild.

Layout: ``$VKRT_SCENE_CACHE`` (default ``~/.cache/vkrt_scene``)/``<key>.npz``.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np


def _cache_dir() -> str | None:
    d = os.environ.get(
        "VKRT_SCENE_CACHE", os.path.expanduser("~/.cache/vkrt_scene")
    )
    if d in ("", "0", "off"):
        return None
    try:
        os.makedirs(d, exist_ok=True)
        return d
    except OSError:
        return None


def content_key(tag: str, *parts) -> str:
    """Hash arrays/scalars/strings into a cache key. Arrays hash their raw
    bytes + dtype + shape, so any geometry or parameter change misses."""
    h = hashlib.blake2b(tag.encode(), digest_size=20)
    for p in parts:
        if p is None:
            h.update(b"\x00none")
            continue
        a = np.asarray(p)
        h.update(str(a.dtype).encode())
        h.update(str(a.shape).encode())
        h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()


def load(key: str) -> dict | None:
    d = _cache_dir()
    if d is None:
        return None
    path = os.path.join(d, key + ".npz")
    if not os.path.exists(path):
        return None
    try:
        with np.load(path, allow_pickle=False) as z:
            return {k: z[k] for k in z.files}
    except Exception:
        try:
            os.remove(path)
        except OSError:
            pass
        return None


def save(key: str, **arrays) -> None:
    d = _cache_dir()
    if d is None:
        return
    path = os.path.join(d, key + ".npz")
    # np.savez appends ".npz" when the name lacks it — the tmp name must
    # already end in ".npz" or the atomic rename below can never find it.
    tmp = path + f".tmp{os.getpid()}.npz"
    try:
        np.savez(tmp, **{k: np.asarray(v) for k, v in arrays.items()})
        os.replace(tmp, path)
    except Exception:
        try:
            os.remove(tmp)
        except OSError:
            pass


def enable_compile_cache() -> None:
    """Persistent XLA compilation cache, keyed by backend AND host.

    The cache must not be shared across machines or backends: the axon
    remote-compile helper writes CPU-AOT artifacts with the REMOTE host's
    machine features into whatever dir is configured, and loading those on
    this host SIGILLs (cpu_aot_loader machine-feature mismatch). Used by
    bench.py, the CLI, the viewer and the profiling scripts."""
    try:
        import platform

        import jax

        base = os.environ.get(
            "VKRT_COMPILE_CACHE", os.path.expanduser("~/.cache/vkrt_xla")
        )
        cache_dir = f"{base}_{jax.default_backend()}_{platform.node()}"
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
