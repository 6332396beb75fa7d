"""Multi-chip rendering: tile x sample sharding over a device mesh.

The reference is strictly single-GPU (SURVEY.md §2.3); this module provides
the multi-chip scaling the TPU rebuild adds as a first-class capability:

* **Mesh axes**: ``tile`` shards image rows (pure data parallelism over
  pixels — the accumulation buffer lives sharded, no communication on the
  hot path), ``sample`` splits samples-per-pixel across chips and reduces
  with a single ``psum`` per frame over ICI.
* **Scene replication**: scene SoA + BVH are replicated (Sponza-scale fits
  HBM easily, SURVEY.md §5); only the image is sharded.
* **Deterministic RNG**: per-pixel streams are seeded from the *global*
  pixel id and (frame, sample-shard) — chip count changes the schedule, not
  the estimator, and tile-sharded output is bit-comparable to single-device
  rendering up to the sample-axis reduction order.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..integrator.camera import generate_rays_for_pixels
from ..integrator.path import sample_pixels
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
):
    """Build the jitted multi-chip progressive-frame function.

    Returns ``step(accum_sharded, frame) -> accum_sharded`` where ``accum``
    is row-sharded over the ``tile`` axis. Samples per frame =
    ``cfg.max_samples * mesh.shape['sample']``.
    """
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
        # Average the per-chip sample estimates over ICI (one collective
        # per frame — the only communication in the hot path).
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
