"""Row-gather machine probes: what the traversal's flat-cost gather
actually depends on (index pattern, row size, duplication).

Usage: python scripts/gatherprobe.py [n_rays]

Patterns probed (all gather n 512B rows from the production-size table):
  random     idx = k*2654435761 % X  (the bench's ceiling measurement)
  sorted     the same indices, sorted ascending (spatial locality)
  dup64      idx = k % 64            (everyone reads the same 32 KB)
  dup1       idx = 0                 (everyone reads ONE row)
  seq        idx = k % X             (pure sequential)
  bcast      rows[0:1] broadcast     (no gather: isolates the output write)
Also: random at 256B and 1024B row widths (slicing the table's lanes /
concatenating two gathers is avoided — separate tables are built).

Interpretation: if dup64/sorted are no faster than random, the gather's
cost is its OUTPUT MATERIALIZATION and coherence-sorting rays cannot help;
if they are much faster, lane-coherence (Morton regeneration order,
direction binning) raises the traversal ceiling directly.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vk_raytrace_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = int(sys.argv[1]) if len(sys.argv) > 1 else (1 << 20)
    X = 60000  # ~atrium row-table size
    rng = np.random.RandomState(0)

    def bench(rows, idx, reps=8):
        dev_rows = jnp.asarray(rows)
        idxd = jnp.asarray(idx, jnp.int32)

        @jax.jit
        def g(idxd):
            def body(s, _):
                j = (idxd + s.astype(jnp.int32)) % rows.shape[0]
                return s + dev_rows[j].sum() * 1e-12, None
            s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
            return s

        jax.block_until_ready(g(idxd))
        t0 = time.perf_counter()
        jax.block_until_ready(g(idxd))
        dt = (time.perf_counter() - t0) / reps
        gbps = n * rows.shape[1] * 4 / dt / 1e9
        return dt * 1e3, gbps

    def bench_bcast(rows, reps=8):
        dev_rows = jnp.asarray(rows)

        @jax.jit
        def g(s0):
            def body(s, _):
                out = jnp.broadcast_to(
                    dev_rows[0:1] + s, (n, rows.shape[1])
                )
                return s + out.sum() * 1e-12, None
            s, _ = jax.lax.scan(body, s0, None, length=reps)
            return s

        jax.block_until_ready(g(jnp.float32(0.0)))
        t0 = time.perf_counter()
        jax.block_until_ready(g(jnp.float32(0.0)))
        dt = (time.perf_counter() - t0) / reps
        gbps = n * rows.shape[1] * 4 / dt / 1e9
        return dt * 1e3, gbps

    rows128 = rng.rand(X, 128).astype(np.float32)
    rand = (np.arange(n, dtype=np.int64) * 2654435761) % X
    patterns = {
        "random": rand,
        "sorted": np.sort(rand),
        "dup64": np.arange(n, dtype=np.int64) % 64,
        "dup1": np.zeros(n, np.int64),
        "seq": np.arange(n, dtype=np.int64) % X,
    }
    print(f"n={n} rows, table {X} x 512B")
    for name, idx in patterns.items():
        ms, gbps = bench(rows128, idx)
        print(f"  {name:8s} {ms:7.2f} ms  {gbps:7.1f} GB/s", flush=True)
    ms, gbps = bench_bcast(rows128)
    print(f"  {'bcast':8s} {ms:7.2f} ms  {gbps:7.1f} GB/s (write-only bound)",
          flush=True)
    for lanes in (64, 256):
        rowsw = rng.rand(X, lanes).astype(np.float32)
        ms, gbps = bench(rowsw, rand)
        print(f"  random @{lanes*4}B rows: {ms:7.2f} ms  {gbps:7.1f} GB/s",
              flush=True)
    # Table-size sweep: random gathers from small tables. If a table that
    # fits VMEM gathers dramatically faster (XLA can hoist the loop-
    # invariant table into VMEM), a gather-free/cheap tree-top descent
    # prologue is worth building; if size-insensitive, the cost is pure
    # output materialization and only STEP COUNT reduction helps.
    for xs in (16, 272, 4352, 60000):
        rows_s = rng.rand(xs, 128).astype(np.float32)
        idx_s = (np.arange(n, dtype=np.int64) * 2654435761) % xs
        ms, gbps = bench(rows_s, idx_s)
        kb = xs * 512 // 1024
        print(f"  random table={xs:6d} rows ({kb:6d} KB): {ms:7.2f} ms  "
              f"{gbps:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
