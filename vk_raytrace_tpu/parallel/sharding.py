"""Multi-chip rendering: tile x sample sharding over a device mesh.

The reference is strictly single-GPU (SURVEY.md §2.3); this module provides
the multi-chip scaling the TPU rebuild adds as a first-class capability:

* **Mesh axes**: ``tile`` shards image rows (pure data parallelism over
  pixels — the accumulation buffer lives sharded, no communication on the
  hot path), ``sample`` splits samples-per-pixel across chips and reduces
  with a single ``pmean`` per frame over ICI.
* **Production path**: each shard runs the pooled wavefront with ray
  regeneration (``integrator/wavefront.py``) over its own pixel slice —
  the same integrator that produces the single-chip headline numbers, not
  a debug path. The pooled ``pix0``/``n_pix`` slicing maps directly onto
  the tile axis.
* **Scene replication**: scene SoA + BVH are replicated (Sponza-scale fits
  HBM easily, SURVEY.md §5); only the image is sharded.
* **Deterministic RNG**: per-path streams are seeded from the *global*
  pixel id and a globally unique stream id ``frame * n_sample +
  sample_idx`` — chip count changes the schedule, never the estimator, and
  tile-sharded output is bit-identical to the single-device pooled render
  at ``sample=1`` (``tests/test_sharding.py``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..integrator.camera import generate_rays_for_pixels
from ..integrator.path import sample_pixels
from ..integrator.wavefront import render_units_pooled
from ..models.schema import RenderConfig, SceneData
from ..ops import rng
from ..ops.bvh8 import AccelBundle


def make_mesh(devices=None, tile: Optional[int] = None, sample: Optional[int] = None) -> Mesh:
    """Build a (tile, sample) mesh. Defaults: all devices on the tile axis
    (pixel parallelism scales furthest), sample=1."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if tile is None and sample is None:
        tile, sample = n, 1
    elif tile is None:
        tile = n // sample
    elif sample is None:
        sample = n // tile
    assert tile * sample == n, f"mesh {tile}x{sample} != {n} devices"
    arr = np.asarray(devices).reshape(tile, sample)
    return Mesh(arr, axis_names=("tile", "sample"))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree across the mesh (scene/BVH tables)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_accum(mesh: Mesh, accum: jax.Array) -> jax.Array:
    """Shard the (H, W, 3) accumulation image over tile rows."""
    return jax.device_put(accum, NamedSharding(mesh, P("tile", None, None)))


def sharded_render_step(
    mesh: Mesh,
    scene: SceneData,
    packed: AccelBundle,
    cfg: RenderConfig,
    has_alpha: bool,
    features=None,
    pool: Optional[int] = None,
):
    """Build the jitted multi-chip progressive-frame function over the
    PRODUCTION pooled-wavefront integrator.

    Returns ``step(accum_sharded, frame) -> (accum_sharded, rays)`` where
    ``accum`` is row-sharded over the ``tile`` axis and ``rays`` is the
    global in-integrator ray count for the frame (one psum over ICI).
    Samples per frame = ``cfg.max_samples * mesh.shape['sample']``.
    """
    from ..render import POOL_LANES

    h, w = cfg.height, cfg.width
    n_tile = mesh.shape["tile"]
    n_sample = mesh.shape["sample"]
    assert h % n_tile == 0, f"height {h} not divisible by tile axis {n_tile}"
    rows = h // n_tile
    n_pix = rows * w
    if pool is None:
        pool = min(POOL_LANES, max(1024, n_pix * cfg.max_samples))

    def chunk_step(scene_, packed_, accum_chunk, frame):
        tile_idx = jax.lax.axis_index("tile")
        sample_idx = jax.lax.axis_index("sample")
        pix0 = (tile_idx * n_pix).astype(jnp.int32)
        # Globally unique RNG stream per (frame, sample shard): the pooled
        # integrator seeds tea(pixel, stream*spp + s), so stream =
        # frame*n_sample + sample_idx never collides across chips. The
        # TRUE frame still drives the jitter gate so sample shards stay
        # estimator-compatible with the single-chip path.
        stream = frame * n_sample + sample_idx
        out, _steps, rays = render_units_pooled(
            scene_, packed_, cfg, frame, has_alpha, pix0, n_pix, pool,
            features=features, stream=stream,
        )
        # Average the per-chip sample estimates over ICI; aggregate the
        # honest ray count — the frame's only collectives.
        new = jax.lax.pmean(out, "sample")
        rays = jax.lax.psum(rays, ("tile", "sample"))
        new = new.reshape(rows, w, 3)
        a = 1.0 / (frame.astype(jnp.float32) + 1.0)
        return accum_chunk + (new - accum_chunk) * a, rays

    shard_fn = jax.shard_map(
        chunk_step,
        mesh=mesh,
        in_specs=(P(), P(), P("tile", None, None), P()),
        out_specs=(P("tile", None, None), P()),
        check_vma=False,
    )

    @jax.jit
    def step(accum, frame):
        return shard_fn(scene, packed, accum, frame)

    return step


def sharded_render_step_unrolled(
    mesh: Mesh,
    scene: SceneData,
    packed: AccelBundle,
    cfg: RenderConfig,
    has_alpha: bool,
):
    """The unrolled per-depth integrator over the same mesh (debug render
    modes ride this path, matching ``Renderer._frame_strips``)."""
    h, w = cfg.height, cfg.width
    n_tile = mesh.shape["tile"]
    n_sample = mesh.shape["sample"]
    assert h % n_tile == 0, f"height {h} not divisible by tile axis {n_tile}"
    rows = h // n_tile

    def chunk_step(scene_, packed_, accum_chunk, frame):
        tile_idx = jax.lax.axis_index("tile")
        sample_idx = jax.lax.axis_index("sample")
        row0 = tile_idx * rows
        pix = (
            jnp.arange(rows * w, dtype=jnp.uint32)
            + row0.astype(jnp.uint32) * jnp.uint32(w)
        )

        total = jnp.zeros((rows * w, 3), jnp.float32)
        for s in range(cfg.max_samples):
            stream = (
                frame.astype(jnp.uint32) * (cfg.max_samples * n_sample)
                + sample_idx.astype(jnp.uint32) * cfg.max_samples
                + s
            )
            seed = rng.tea(pix, stream)
            o, d, seed = generate_rays_for_pixels(
                scene_.camera, w, h, pix, frame, seed
            )
            radiance, seed, _ = sample_pixels(
                scene_, packed_, cfg, o, d, seed, has_alpha
            )
            total = total + radiance

        new = total / cfg.max_samples
        new = jax.lax.pmean(new, "sample")
        new = new.reshape(rows, w, 3)
        a = 1.0 / (frame.astype(jnp.float32) + 1.0)
        return accum_chunk + (new - accum_chunk) * a

    shard_fn = jax.shard_map(
        chunk_step,
        mesh=mesh,
        in_specs=(P(), P(), P("tile", None, None), P()),
        out_specs=P("tile", None, None),
        check_vma=False,
    )

    @jax.jit
    def step(accum, frame):
        return shard_fn(scene, packed, accum, frame)

    return step
