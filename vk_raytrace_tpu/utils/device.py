"""Device/tunnel helpers.

On remote-TPU tunnels (the axon backend) the FIRST device->host readback in
a process blocks for ~2 minutes on a transport handshake, independent of
transfer size; later readbacks run at normal speed. Scene build is pure
host work (models/builder.py), so the handshake is warmed on a background
thread concurrently with the build instead of serializing after it.
"""

from __future__ import annotations

import atexit
import threading
import time

_warm_thread: threading.Thread | None = None
warm_seconds: float | None = None  # measured handshake duration (once done)


def warm_transfers_async() -> threading.Thread:
    """Start (once) a daemon thread that performs one tiny device->host
    readback to absorb the tunnel's first-readback latency. Returns the
    thread; callers never need to join it — any later real readback simply
    piggybacks on the warmed channel."""
    global _warm_thread
    if _warm_thread is not None:
        return _warm_thread

    def _warm():
        global warm_seconds
        t0 = time.time()
        try:
            import jax
            import jax.numpy as jnp

            # One scalar round trip on the default backend.
            float(jax.device_put(jnp.zeros((), jnp.float32)) + 1.0)
            warm_seconds = time.time() - t0
        except Exception:
            pass

    _warm_thread = threading.Thread(
        target=_warm, daemon=True, name="vkrt-transfer-warm"
    )
    _warm_thread.start()
    # Interpreter teardown while the PJRT readback is in flight aborts the
    # process (uncatchable C++ terminate) — join before exit. Callers all
    # do device work anyway, so in practice this join is instant.
    atexit.register(lambda: _warm_thread.join() if _warm_thread else None)
    return _warm_thread
