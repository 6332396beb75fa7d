"""Profiling + observability utilities.

The TPU analog of the reference's measurement machinery (SURVEY.md §5):
``nvvk::ProfilerVK`` GPU timer scopes ("Render"/"Tonemap"/"Mipmap",
sample_example.cpp:404, main.cpp:232), the CPU-side ``MilliTimer``
(tools.hpp:41-44) and the NVML load/memory monitor (nvml_monitor.hpp).

* :class:`Profiler` — named scopes with running mean/min/max (blocks on the
  device so timings are honest under async dispatch).
* :func:`device_memory_stats` — per-device HBM usage, the NVML stand-in.
* :func:`trace` — context manager around ``jax.profiler`` for deep dives.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Optional

import jax


class Profiler:
    """Named wall-clock scopes with aggregation.

    Usage::

        prof = Profiler()
        with prof.scope("render", block_on=img):
            img = step()
        print(prof.report())
    """

    def __init__(self) -> None:
        self._times: dict[str, list[float]] = defaultdict(list)

    @contextlib.contextmanager
    def scope(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._times[name].append(time.perf_counter() - t0)

    def add(self, name: str, seconds: float) -> None:
        self._times[name].append(seconds)

    def stats(self, name: str):
        v = self._times.get(name, [])
        if not v:
            return None
        return {
            "count": len(v),
            "mean_ms": 1e3 * sum(v) / len(v),
            "min_ms": 1e3 * min(v),
            "max_ms": 1e3 * max(v),
            "total_s": sum(v),
        }

    def report(self) -> str:
        lines = []
        for name in sorted(self._times):
            s = self.stats(name)
            lines.append(
                f"{name:>16}: {s['mean_ms']:8.2f} ms avg "
                f"({s['min_ms']:.2f}..{s['max_ms']:.2f}, n={s['count']})"
            )
        return "\n".join(lines)

    def reset(self) -> None:
        self._times.clear()


def device_memory_stats():
    """Per-device memory usage (the NVML plots stand-in,
    nvml_monitor.hpp:149-176). Returns a list of dicts."""
    out = []
    for d in jax.devices():
        try:
            s = d.memory_stats() or {}
        except Exception:
            s = {}
        out.append(
            {
                "device": str(d),
                "bytes_in_use": s.get("bytes_in_use", -1),
                "bytes_limit": s.get("bytes_limit", -1),
                "peak_bytes_in_use": s.get("peak_bytes_in_use", -1),
            }
        )
    return out


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/vkrt_trace"):
    """``jax.profiler`` trace scope for kernel-level analysis."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
