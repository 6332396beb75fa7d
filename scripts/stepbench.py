"""Per-step cost decomposition of the fused traversal kernel.

Times a lax.scan of 8 raw kernel steps at full pool width under controlled
variants, attributing the per-step wall cost to HBM components, loop/carry
plumbing, and (round 5) the kernel's internal stages:

  base      the production step (gather + kernel, aliased carry)
  stack8 / stackfull   stack rows forced to 8 / the full builder bound
  nogather  row block sliced instead of gathered (INCORRECT): gather cost
  noalias   aliasing off: what in-place aliasing saves
  unroll / while / hbmpin / noloop   loop-structure + carry experiments
            (round-5 verdicts: the carry chain is NOT the bottleneck —
            noloop with zero loop-carried state measured SLOWER than the
            production scan; hbmpin dies in XLA alias coloring)
  nosort / noslab / nomt / nopush / notrans / kmin   kernel-internal
            ablations (INCORRECT traversal — timing only). Round-5
            verdict: no single whale; the step is a sum of VPU passes.
            Beware Mosaic DCE: notrans once read 0.01 ms — below the
            physical carry-traffic floor, i.e. the ablation had erased
            the computation, not the transpose.

Usage: python scripts/stepbench.py [variants...]
Env: VKRT_BLK / VKRT_STACK / VKRT_XLAT sweep kernel shape knobs.
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

    from vk_raytrace_tpu.models import procedural
    from vk_raytrace_tpu import render as R
    from vk_raytrace_tpu.models.schema import PBR_GLTF, RenderConfig
    from vk_raytrace_tpu.ops import traverse_fused as TF
    from vk_raytrace_tpu.integrator.camera import generate_rays_for_pixels

    geom, mats, lights, cam, atlas = procedural.atrium_scene()
    scene = R.build_scene(geom, mats, lights, cam, atlas=atlas)
    cfg = RenderConfig(width=1920, height=1080, max_depth=4, max_samples=1,
                       hdr_multiplier=1.0, pbr_mode=PBR_GLTF,
                       firefly_clamp=10.0, use_sun_sky=True)
    r = R.Renderer(scene, cfg)
    planar = r.packed.opaque_planar
    P = 524288
    pix = (np.arange(P, dtype=np.uint32) * 7919) % (1920 * 1080)
    seeds = jnp.asarray((pix.astype(np.uint64) * 2654435761) % (1 << 31), jnp.uint32)
    o, d, _ = generate_rays_for_pixels(
        r.scene.camera, 1920, 1080, jnp.asarray(pix), jnp.uint32(0), seeds
    )
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)

    def t4(a):
        return jnp.concatenate([a.T, jnp.zeros((1, P), a.dtype)], axis=0)

    o4, d4 = t4(o), t4(d)
    del inv
    rows = jnp.asarray(planar.rows)
    W = planar.width
    specs_loop = ["scan"]  # mutated per variant below

    def build_scan(stack_depth, gather, alias, ablate=()):
        n_meta = 8
        kern = TF._make_step_kernel(
            True, False, stack_depth, W, candidates=False,
            n_rows=int(rows.shape[0]), _ablate=ablate,
            pre_transposed=TF.xla_transpose_rows(),
        )
        if not alias:
            os.environ["VKRT_NOALIAS"] = "1"
        else:
            os.environ.pop("VKRT_NOALIAS", None)

        def step(rows_in, oo, dd, cur, rowid, meta, stack):
            if gather:
                out = TF._step(rows_in, kern, stack_depth, W, n_meta,
                               oo, dd, cur, rowid, meta, stack)
                if specs_loop[0] == "hbmpin":
                    # Pin the BIG carries (meta, stack) to HBM: does
                    # forbidding the memory-space pass's VMEM round trips
                    # remove the staging copies? cur/rowid stay unpinned —
                    # the XLA row gather cannot consume a space-typed array.
                    from jax.experimental.pallas import tpu as _pt

                    pin = lambda a: _pt.with_memory_space_constraint(
                        a, _pt.MemorySpace.HBM)
                    out = (out[0], out[1], pin(out[2]), pin(out[3]))
                return out
            # no-gather variant: a contiguous slice stands in for the row
            # block (timing only; traversal results are wrong)
            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu
            row = jax.lax.dynamic_slice(
                rows_in, (0, 0), (P if P <= rows_in.shape[0] else rows_in.shape[0], rows_in.shape[1])
            )
            if row.shape[0] < P:
                row = jnp.pad(row, ((0, P - row.shape[0]), (0, 0)))

            def cmaj(nr):
                return pl.BlockSpec((nr, TF.BLK), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)

            if TF.xla_transpose_rows():
                row = row.T
                row_spec = cmaj(W * 8)
            else:
                row_spec = pl.BlockSpec((TF.BLK, W * 8), lambda i: (i, 0),
                                        memory_space=pltpu.VMEM)
            return pl.pallas_call(
                kern,
                grid=(P // TF.BLK,),
                in_specs=[
                    row_spec,
                    cmaj(4), cmaj(4), cmaj(1), cmaj(1), cmaj(n_meta),
                    cmaj(stack_depth),
                ],
                out_specs=[cmaj(1), cmaj(1), cmaj(n_meta), cmaj(stack_depth)],
                out_shape=[
                    jax.ShapeDtypeStruct((1, P), jnp.int32),
                    jax.ShapeDtypeStruct((1, P), jnp.int32),
                    jax.ShapeDtypeStruct((n_meta, P), jnp.float32),
                    jax.ShapeDtypeStruct((stack_depth, P), jnp.int32),
                ],
                input_output_aliases=(
                    {3: 0, 4: 1, 5: 2, 6: 3} if alias else {}
                ),
                interpret=TF._interpret_mode(),
            )(row, oo, dd, cur, rowid, meta, stack)

        loop = specs_loop[0]
        if loop == "noloop":
            # 8 INDEPENDENT kernel calls (no loop-carried state): bounds the
            # cost of the carry chain itself. Production steps are data-
            # dependent, so this also lets XLA overlap gathers across steps
            # — treat it as a lower bound, not an achievable target.
            @jax.jit
            def run(cur, rowid, meta, stack):
                outs = []
                for k in range(8):
                    s = step(rows, o4, d4, cur + k, rowid, meta, stack)
                    outs.append(s[2][0, 0])
                return jnp.stack(outs).sum()
        elif loop == "unroll":
            @jax.jit
            def run(cur, rowid, meta, stack):
                s = (cur, rowid, meta, stack)
                for _ in range(8):
                    s = step(rows, o4, d4, *s)
                return s[0].sum(), s[2].sum()
        elif loop == "while":
            @jax.jit
            def run(cur, rowid, meta, stack):
                def body(s):
                    it, ss = s
                    return it + 1, step(rows, o4, d4, *ss)
                _, (cur, rowid, meta, stack) = jax.lax.while_loop(
                    lambda s: s[0] < 8, body,
                    (jnp.int32(0), (cur, rowid, meta, stack)),
                )
                return cur.sum(), meta.sum()
        else:
            pin_carry = loop == "hbmpin"

            @jax.jit
            def run(cur, rowid, meta, stack):
                if pin_carry:
                    # The constraint is part of the type: pin the carry INIT
                    # too so scan's in/out carry types match.
                    from jax.experimental.pallas import tpu as _pt

                    pin = lambda a: _pt.with_memory_space_constraint(
                        a, _pt.MemorySpace.HBM)
                    meta, stack = pin(meta), pin(stack)

                def body(s, _):
                    return step(rows, o4, d4, *s), None
                (cur, rowid, meta, stack), _ = jax.lax.scan(
                    body, (cur, rowid, meta, stack), None, length=8
                )
                if pin_carry:
                    # A space-typed array cannot feed XLA reductions;
                    # return it raw (timing only needs block_until_ready).
                    return cur.sum(), meta
                return cur.sum(), meta.sum()

        cur0 = jnp.zeros((1, P), jnp.int32)
        rowid0 = jnp.zeros((1, P), jnp.int32)
        meta0 = jnp.zeros((8, P), jnp.float32).at[1].set(1e30)
        meta0 = meta0.at[2].set(-1.0)
        stack0 = jnp.zeros((stack_depth, P), jnp.int32)
        return run, (cur0, rowid0, meta0, stack0)

    variants = sys.argv[1:] or ["base", "stack8", "nogather", "noalias"]
    k_stack = min(planar.stack_depth, TF.STACK_ROWS)
    specs = {
        "base": dict(stack_depth=k_stack, gather=True, alias=True),
        "stack8": dict(stack_depth=8, gather=True, alias=True),
        "stackfull": dict(stack_depth=planar.stack_depth, gather=True, alias=True),
        "nogather": dict(stack_depth=k_stack, gather=False, alias=True),
        "noalias": dict(stack_depth=k_stack, gather=True, alias=False),
        # loop-structure variants: same production step, different carry
        # plumbing — attributes the scan-boundary staging copies
        "unroll": dict(stack_depth=k_stack, gather=True, alias=True),
        "while": dict(stack_depth=k_stack, gather=True, alias=True),
        "hbmpin": dict(stack_depth=k_stack, gather=True, alias=True),
        "noloop": dict(stack_depth=k_stack, gather=True, alias=False),
        # Kernel-internal ablations (TIMING ONLY — results wrong): each
        # replaces one kernel stage with same-shape garbage.
        "notrans": dict(stack_depth=k_stack, gather=True, alias=True,
                        ablate=("notrans",)),
        "nosort": dict(stack_depth=k_stack, gather=True, alias=True,
                       ablate=("nosort",)),
        "noslab": dict(stack_depth=k_stack, gather=True, alias=True,
                       ablate=("noslab",)),
        "nomt": dict(stack_depth=k_stack, gather=True, alias=True,
                     ablate=("nomt",)),
        "nopush": dict(stack_depth=k_stack, gather=True, alias=True,
                       ablate=("nopush",)),
        "kmin": dict(stack_depth=k_stack, gather=True, alias=True,
                     ablate=("notrans", "nosort", "noslab", "nomt", "nopush")),
    }
    for name in variants:
        specs_loop[0] = (
            name if name in ("unroll", "while", "hbmpin", "noloop") else "scan"
        )
        try:
            run, init = build_scan(**specs[name])
            out = jax.block_until_ready(run(*init))
            t0 = time.perf_counter()
            n = 6
            for _ in range(n):
                out = jax.block_until_ready(run(*init))
            dt = (time.perf_counter() - t0) / n / 8
            print(f"{name:9s} {dt*1e3:7.3f} ms/step @ {P} lanes", flush=True)
        except Exception as e:  # one bad variant must not kill the sweep
            print(f"{name:9s} FAILED: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
