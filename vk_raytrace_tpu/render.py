"""High-level renderer: scene ownership, progressive accumulation, post.

The application layer of the framework — the TPU analog of the reference's
``SampleExample`` (frame orchestration, ``src/sample_example.cpp``) +
``RenderOutput`` (accumulation image + tonemap pass, ``src/render_output.cpp``).

Progressive accumulation follows the reference exactly:
``accum = mix(accum, new_sample_mean, 1/(frame+1))``
(``pathtrace.rgen:96-107``), so the accumulation buffer + frame counter are
the complete, checkpointable render state (SURVEY.md §5 "checkpoint/resume").
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .integrator.camera import generate_rays, generate_rays_for_pixels
from .integrator.path import sample_pixels
from .models.schema import (
    Camera,
    Environment,
    Geometry,
    Lights,
    Materials,
    RenderConfig,
    SceneData,
    SunSky,
    TextureAtlas,
    Tonemapper,
    default_sun_sky,
    default_tonemapper,
    dummy_atlas,
    dummy_environment,
)
from .ops import rng
from .ops.bvh import build_bvh
from .ops.bvh8 import AccelBundle, build_accel_bundle
from .ops.tonemap import apply_post


def build_scene(
    geometry: Geometry,
    materials: Materials,
    lights: Lights,
    camera: Camera,
    *,
    env: Optional[Environment] = None,
    sun_sky: Optional[SunSky] = None,
    atlas: Optional[TextureAtlas] = None,
    n_lights: Optional[int] = None,
    binary_bvh: Optional[bool] = None,
) -> SceneData:
    """Assemble a renderable SceneData.

    ``binary_bvh``: build the binary LBVH (``scene.bvh``) used by the
    cross-check traversal back end (``ops/traverse.py``) and the node-count
    stats. Default (None): only when the native wide-BVH builder is
    unavailable, since production traversal then needs it for the collapse
    fallback. The LBVH program runs on the CPU backend — scene build should
    never pay a TPU tunnel compile (reference builds are driver-side,
    accelstruct.cpp:110-162).
    """
    if binary_bvh is None:
        from . import runtime

        binary_bvh = not runtime.available()
    bvh = _build_binary_bvh_cpu(geometry) if binary_bvh else None
    if n_lights is None:
        # make_lights pads empty tables with one zero-intensity dummy row
        n_lights = int(
            np.count_nonzero(np.asarray(lights.intensity) > 0.0)
        )
    from .integrator.shade import build_shade_rows
    from .ops.texture import build_tap_rows

    use_tap_rows = os.environ.get("VKRT_TAPROWS", "1") != "0"
    atlas_r = atlas if atlas is not None else dummy_atlas()
    return SceneData(
        geometry=geometry,
        materials=materials,
        lights=lights,
        n_lights=np.int32(n_lights),
        atlas=atlas_r,
        env=env if env is not None else dummy_environment(),
        camera=camera,
        sun_sky=sun_sky if sun_sky is not None else default_sun_sky(),
        bvh=bvh,
        shade_rows=build_shade_rows(geometry, materials, atlas_r),
        tap_rows=(
            build_tap_rows(atlas)
            if (atlas is not None and use_tap_rows)
            else None
        ),
    )


def _build_binary_bvh_cpu(geometry: Geometry):
    """Run the jitted LBVH build on the CPU backend and return HOST numpy
    arrays. Scene build must never touch the accelerator: device round
    trips over a remote-TPU tunnel cost seconds each (and the first
    readback in a process, minutes); every downstream build pass reads
    the result back."""
    pos = np.asarray(geometry.positions)
    idx = np.asarray(geometry.indices)
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return build_bvh(pos, idx)
    with jax.default_device(cpu):
        bvh = build_bvh(jnp.asarray(pos), jnp.asarray(idx))
    return jax.tree.map(lambda a: np.asarray(a), bvh)


def build_instanced_scene(
    pool,
    instances,
    materials: Materials,
    lights: Lights,
    camera: Camera,
    *,
    env: Optional[Environment] = None,
    sun_sky: Optional[SunSky] = None,
    atlas: Optional[TextureAtlas] = None,
    n_lights: Optional[int] = None,
) -> SceneData:
    """Assemble a two-level (instanced) SceneData: ``pool`` is a
    :class:`models.instances.MeshPool` (shared object-space meshes) and
    ``instances`` an :class:`models.instances.InstanceTable`; the TLAS/BLAS
    structure is built here (accelstruct.cpp:55-162 analog)."""
    from .integrator.shade import build_shade_rows
    from .ops.texture import build_tap_rows
    from .ops.tlas import build_instanced_accel

    accel = build_instanced_accel(pool, instances)
    if n_lights is None:
        n_lights = int(np.count_nonzero(np.asarray(lights.intensity) > 0.0))
    use_tap_rows = os.environ.get("VKRT_TAPROWS", "1") != "0"
    atlas_r = atlas if atlas is not None else dummy_atlas()
    return SceneData(
        geometry=pool.geometry,
        materials=materials,
        lights=lights,
        n_lights=np.int32(n_lights),
        atlas=atlas_r,
        env=env if env is not None else dummy_environment(),
        camera=camera,
        sun_sky=sun_sky if sun_sky is not None else default_sun_sky(),
        bvh=None,
        instances=accel,
        shade_rows=build_shade_rows(pool.geometry, materials, atlas_r),
        tap_rows=(
            build_tap_rows(atlas)
            if (atlas is not None and use_tap_rows)
            else None
        ),
    )


def pack_scene(bvh, geometry) -> AccelBundle:
    """Build the traversal-ready acceleration bundle: 8-wide row tables with
    opaque/alpha split (see ops/bvh8.py)."""
    return build_accel_bundle(geometry, bvh_full=bvh)


def scene_has_alpha(scene: SceneData) -> bool:
    """Static host-side check: any non-opaque material in use?"""
    return bool(np.any(np.asarray(scene.geometry.tri_flags) & 2))


def prepare_sun_sky(scene: SceneData, cfg: RenderConfig):
    """Bake the procedural sky into the environment when enabled.

    Returns ``(scene', cfg')`` where the runtime integrator path treats the
    baked sky exactly like an HDR environment (see
    ops/sunsky.py::bake_environment for the rationale).
    """
    if not cfg.use_sun_sky:
        return scene, cfg
    from .models.hdr import build_environment
    from .ops.sunsky import bake_environment
    from .models.schema import EnvAccel, Environment
    from .utils import cache as _cache

    # Hybrid analytic sun (VKRT_ANALYTIC_SUN=0 reverts to the fully-baked
    # sky): bake WITHOUT the sub-texel disk core and let the runtime add it
    # analytically (env_sampling.glsl:105-135 / sun_and_sky.glsl:543-548
    # semantics the bake alone cannot resolve).
    analytic_sun = os.environ.get("VKRT_ANALYTIC_SUN", "1") != "0"
    key = _cache.content_key(
        "sunsky-v2-nodisk" if analytic_sun else "sunsky-v1", *scene.sun_sky
    )
    hit = _cache.load(key)
    if hit is not None:
        env = Environment(
            image=hit["image"],
            accel=EnvAccel(
                alias=hit["alias"], q=hit["q"], pdf=hit["pdf"],
                alias_pdf=hit["alias_pdf"],
            ),
            integral=hit["integral"], average=hit["average"],
            rows=hit["rows"],
        )
        return (
            scene._replace(env=env),
            dataclasses.replace(
                cfg, use_sun_sky=False, sun_disk=analytic_sun
            ),
        )

    # Bake + alias build run on the CPU backend: these are scene-build
    # programs whose one-off TPU tunnel compile (minutes when the persistent
    # cache is cold) would otherwise dominate build time.
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None:
        with jax.default_device(cpu):
            img = bake_environment(scene.sun_sky, disk=not analytic_sun)
            env = build_environment(img)
        env = jax.tree.map(lambda a: np.asarray(a), env)
    else:
        img = bake_environment(scene.sun_sky, disk=not analytic_sun)
        env = build_environment(img)
    _cache.save(
        key,
        image=env.image, alias=env.accel.alias, q=env.accel.q,
        pdf=env.accel.pdf, alias_pdf=env.accel.alias_pdf,
        integral=env.integral, average=env.average, rows=env.rows,
    )
    scene = scene._replace(env=env)
    cfg = dataclasses.replace(cfg, use_sun_sky=False, sun_disk=analytic_sun)
    return scene, cfg


# Env toggles that change TRACED behavior (which kernel path, ablations,
# tiering). They must ride in the jit key: two traces with identical
# (treedef, avals, statics) but different toggle values are DIFFERENT
# programs — an env-blind cache serves one variant's executable for the
# other (the round-3 "Execution supplied N buffers but compiled program
# expected M" failure class, and silently-vacuous A/B comparisons).
_TRACE_ENVS = (
    "VKRT_FUSED", "VKRT_FUSED_SHADE", "VKRT_FUSED_ALPHA", "VKRT_TIERS",
    "VKRT_ABLATE", "VKRT_MIP_SAMPLE", "VKRT_MIP_BIAS", "VKRT_MERGED_MAT",
    "VKRT_UNROLL", "VKRT_NOALIAS", "VKRT_BLK", "VKRT_PHASE_DIVS",
    "VKRT_ANALYTIC_SUN", "VKRT_MORTON", "VKRT_ROOTPRO", "VKRT_XLAT",
    "VKRT_TLAS_TIERS", "VKRT_TLAS_SCAN", "VKRT_TLAS_SPLIT",
)


def trace_env_key() -> tuple:
    """Static jit-key component capturing every VKRT_* env toggle read
    during tracing; callers pass it as the jitted entry points' env_key."""
    return tuple(os.environ.get(k, "") for k in _TRACE_ENVS)


def render_strip_impl(
    scene: SceneData,
    packed: AccelBundle,
    cfg: RenderConfig,
    row0: jax.Array,    # () i32 first image row of this strip
    n_rows: int,        # static strip height
    frame: jax.Array,   # () i32
    has_alpha: bool,
    features=None,      # static MatFeatures (integrator/shade.py)
    env_key=(),         # static trace-env key (trace_env_key); unused in
                        # the body — cache-correctness only
) -> jax.Array:
    """``maxSamples`` full paths per pixel for one row strip, averaged.

    Strips bound the size of a single device program: a full 1080p bounce
    loop in one dispatch runs for tens of seconds and can trip device
    watchdogs, and strip-sized programs also keep live wavefront state small.
    """
    w = cfg.width
    pix = (
        jnp.arange(n_rows * w, dtype=jnp.uint32)
        + row0.astype(jnp.uint32) * jnp.uint32(w)
    )
    total = jnp.zeros((n_rows * w, 3), jnp.float32)
    for s in range(cfg.max_samples):
        seed = rng.tea(pix, frame.astype(jnp.uint32) * cfg.max_samples + s)
        o, d, seed = generate_rays_for_pixels(scene.camera, w, cfg.height, pix, frame, seed)
        radiance, seed, _ = sample_pixels(
            scene, packed, cfg, o, d, seed, has_alpha, features=features
        )
        total = total + radiance
    return (total / cfg.max_samples).reshape(n_rows, w, 3)


render_strip = functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_rows", "has_alpha", "features", "env_key"),
)(render_strip_impl)


def render_pool_impl(
    scene, packed, cfg, frame, has_alpha, pix0, n_pix, pool, features=None,
    env_key=(),
):
    del env_key  # jit-key only (trace_env_key)
    from .integrator.wavefront import render_units_pooled

    return render_units_pooled(
        scene, packed, cfg, frame, has_alpha, pix0, n_pix, pool,
        features=features,
    )


render_pool = functools.partial(
    jax.jit,
    static_argnames=("cfg", "has_alpha", "n_pix", "pool", "features",
                     "env_key"),
)(render_pool_impl)

# Pooled-dispatch sizing: paths per device program (watchdog bound) and the
# lane-pool width (VMEM/HBM state is ~200 B/lane + the traversal stack).
# Env-overridable for hardware tuning sweeps (scripts/ablate.py); read at
# CALL time — pool/dispatch are static jit args, so in-process A/B sweeps
# key cleanly without riding trace_env_key.


def max_paths_per_dispatch() -> int:
    return int(os.environ.get("VKRT_DISPATCH", 1 << 21))


def pool_lanes() -> int:
    # 2^18 measured 4.7% faster than 2^19 on the atrium 1080p bench (round-5
    # pool sweep, docs/PERFORMANCE.md): the smaller carry halves the per-step
    # traversal state traffic and the extra regeneration rounds are cheaper
    # than the saving.
    return int(os.environ.get("VKRT_POOL", 1 << 18))


# Backwards-compat module constants (scripts/ablate.py reads these).
MAX_PATHS_PER_DISPATCH = max_paths_per_dispatch()
POOL_LANES = pool_lanes()


def _dispatch_with_cache_repair(jitted, *args, **kw):
    """Dispatch a jitted entry point, repairing a jax jit-cache
    inconsistency observed across scene switches in one process.

    Reproducer (standalone, jax 0.9 CPU): render scene A through
    render_pool, then build an INSTANCED scene B and step it twice — frame
    0 compiles and runs, frame 1's fastpath dispatch fails with
    ``INVALID_ARGUMENT: Execution supplied 29 buffers but compiled program
    expected 31 buffers`` (the cached executable and the fastpath's
    pruned-argument bookkeeping disagree; the args' pytree has no
    duplicate leaves and the jit key — including trace_env_key — is
    unique). ``clear_cache()`` + retry recompiles and every subsequent
    frame is fine, so this wrapper repairs exactly that case and re-raises
    anything else. Cost when triggered: one retrace.
    """
    try:
        return jitted(*args, **kw)
    except Exception as e:  # noqa: BLE001 — filtered by message below
        # The PJRT runtime raises this as jax.errors.JaxRuntimeError (a
        # RuntimeError subclass on jax 0.9), NOT ValueError; catch broadly
        # and let the message substring decide (ADVICE r4 #1).
        if "buffers but compiled program expected" not in str(e):
            raise
        jitted.clear_cache()
        return jitted(*args, **kw)


def render_frame_impl(
    scene: SceneData,
    packed: AccelBundle,
    cfg: RenderConfig,
    accum: jax.Array,   # (H, W, 3) running mean
    frame: jax.Array,   # () i32
    has_alpha: bool,
) -> jax.Array:
    """One progressive frame in a single program (used by the driver's
    compile checks and the multi-chip path, where per-device chunks are
    already strip-sized)."""
    new = render_strip_impl(
        scene, packed, cfg, jnp.asarray(0, jnp.int32), cfg.height, frame, has_alpha
    )
    a = 1.0 / (frame.astype(jnp.float32) + 1.0)
    return accum + (new - accum) * a


render_frame = functools.partial(
    jax.jit, static_argnames=("cfg", "has_alpha"), donate_argnames=("accum",)
)(render_frame_impl)

# Target rays per device program (watchdog-safe, see render_strip_impl).
MAX_RAYS_PER_DISPATCH = 1 << 19


def strip_rows_for(cfg: RenderConfig) -> int:
    rows = max(8, MAX_RAYS_PER_DISPATCH // max(cfg.width, 1))
    rows = min(rows, cfg.height)
    # Equal-height strips that divide the image exactly keep one compiled
    # executable for all strips.
    n = -(-cfg.height // rows)
    while cfg.height % n:
        n += 1
    return cfg.height // n


class Renderer:
    """Progressive path tracer over one scene.

    Usage::

        scene = build_scene(geom, mats, lights, cam, env=env)
        r = Renderer(scene, RenderConfig(width=512, height=512))
        img = r.render(frames=16)          # (H, W, 3) float, post-processed
    """

    def __init__(
        self,
        scene: SceneData,
        cfg: RenderConfig,
        tonemapper: Optional[Tonemapper] = None,
        packed=None,
    ):
        """``packed`` reuses a prebuilt AccelBundle (GUI-style live config
        edits rebuild the renderer without rebuilding acceleration
        structures — the reference keeps BLAS/TLAS across UI changes)."""
        import time as _time

        self.cfg = cfg
        from .utils.device import warm_transfers_async

        warm_transfers_async()  # overlap tunnel handshake with host build
        self.build_times: dict[str, float] = {}
        # Reference recomputes proj from the window size every frame
        # (scene.cpp:629-668); do the equivalent once per config.
        from .integrator.camera import with_aspect

        scene = scene._replace(
            camera=with_aspect(scene.camera, cfg.width, cfg.height)
        )
        t0 = _time.time()
        self.scene, self._run_cfg = prepare_sun_sky(scene, cfg)
        # max_frames gates step() host-side only; normalize it in the traced
        # config so sweeping it never fragments the jit cache (cfg is a
        # static jit argument).
        if self._run_cfg.max_frames != 100000:
            import dataclasses as _dc

            self._run_cfg = _dc.replace(self._run_cfg, max_frames=100000)
        self.build_times["sky_bake_s"] = _time.time() - t0
        self.tonemapper = tonemapper or default_tonemapper()
        t0 = _time.time()
        if packed is not None:
            self.packed = packed
        elif scene.instances is not None:
            self.packed = scene.instances  # prebuilt two-level structure
        else:
            self.packed = pack_scene(scene.bvh, scene.geometry)
        if self.scene.instances is not None:
            # The accel rides ONLY as ``packed``: passing the same subtree
            # twice to a jitted call (scene.instances AND packed) trips
            # XLA's pruned-parameter bookkeeping ("Execution supplied N
            # buffers but compiled program expected M").
            self.scene = self.scene._replace(instances=None)
        self.build_times["accel_s"] = _time.time() - t0
        self.has_alpha = scene_has_alpha(scene)
        from .integrator.shade import mat_features

        self.features = mat_features(scene.materials)
        # ONE host->device upload of everything the hot path reads. All
        # build passes above run on host numpy (models/builder.py rationale);
        # committing earlier would turn each of them into a device readback
        # over the tunnel. The reference stages host buffers and submits one
        # upload command buffer the same way (scene.cpp:93-103).
        t0 = _time.time()
        self.scene, self.packed = jax.device_put((self.scene, self.packed))
        jax.block_until_ready(self.packed)
        self.build_times["upload_s"] = _time.time() - t0
        self.reset()

    @property
    def converged(self) -> bool:
        """True once ``cfg.max_frames`` progressive frames have accumulated
        (the reference stops tracing then, sample_example.cpp:407-408)."""
        return self.frame >= self.cfg.max_frames

    # -- frame/accumulation control (sample_example.cpp:183-207) -----------
    def reset(self) -> None:
        """Reset accumulation (camera/scene change in the reference)."""
        self.frame = 0
        self.accum = jnp.zeros((self.cfg.height, self.cfg.width, 3), jnp.float32)

    def step(self) -> None:
        """Render one progressive frame into the accumulation buffer.

        Production path: the pooled wavefront with ray regeneration
        (``integrator/wavefront.py``), sliced into watchdog-safe dispatches.
        Debug render modes use the unrolled per-depth integrator, which
        carries the first-hit debug machinery. The assembled frame blends
        into the running mean (pathtrace.rgen:96-107)."""
        from .models.schema import DEBUG_NONE

        if self.converged:
            # m_maxFrames convergence stop (sample_example.cpp:407-408):
            # the accumulated image is final; tracing more frames would
            # only burn device time.
            return
        h, w = self.cfg.height, self.cfg.width
        frame = jnp.asarray(self.frame, jnp.int32)
        if self._run_cfg.debug_mode == DEBUG_NONE:
            new = self._frame_pooled(frame)
        else:
            new = self._frame_strips(frame)
        a = 1.0 / (self.frame + 1.0)
        self.accum = self.accum + (new - self.accum) * a
        self.frame += 1

    def _frame_pooled(self, frame) -> jax.Array:
        h, w = self.cfg.height, self.cfg.width
        cfg = self._run_cfg
        total_px = h * w
        px_per_dispatch = max(1, max_paths_per_dispatch() // max(cfg.max_samples, 1))
        n = max(1, -(-total_px // px_per_dispatch))
        while total_px % n:
            n += 1
        n_pix = total_px // n
        pool = min(pool_lanes(), max(1024, n_pix * cfg.max_samples))
        parts = []
        ray_counts = []
        # Dispatch every slice without touching host values: converting the
        # ray counter per dispatch would sync and serialize the pipeline
        # (dispatch k+1 should be enqueued while k runs on device).
        for i in range(n):
            out, steps, rays = _dispatch_with_cache_repair(
                render_pool,
                self.scene, self.packed, cfg, frame, self.has_alpha,
                jnp.asarray(i * n_pix, jnp.int32), n_pix, pool,
                features=self.features, env_key=trace_env_key(),
            )
            parts.append(out)
            ray_counts.append(rays)
        self.last_rays = int(sum(jnp.stack(ray_counts)))
        img = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        return img.reshape(h, w, 3)

    def _frame_strips(self, frame) -> jax.Array:
        h, w = self.cfg.height, self.cfg.width
        rows = strip_rows_for(self.cfg)
        strips = []
        for row0 in range(0, h, rows):
            strips.append(
                _dispatch_with_cache_repair(
                    render_strip,
                    self.scene, self.packed, self._run_cfg,
                    jnp.asarray(row0, jnp.int32), rows, frame, self.has_alpha,
                    features=self.features, env_key=trace_env_key(),
                )
            )
        return jnp.concatenate(strips, axis=0) if len(strips) > 1 else strips[0]

    def render(self, frames: int = 1) -> np.ndarray:
        """Accumulate ``frames`` progressive frames and return the
        post-processed LDR image (H, W, 3) in [0, 1]."""
        for _ in range(frames):
            self.step()
        return np.asarray(self.postprocess())

    def hdr(self) -> jax.Array:
        """The raw accumulated radiance image (checkpointable state)."""
        return self.accum

    def postprocess(self) -> jax.Array:
        """Tonemap + post chain (drawPost, sample_example.cpp:362-384).
        ``self.tone_mode`` selects the curve (Uncharted2/Hejl/ACES —
        post.frag:30, live-switchable in the viewer like sample_gui's
        tonemapper combo)."""
        return apply_post(
            self.accum, self.tonemapper, mode=getattr(self, "tone_mode", 0)
        )

    # -- picking (screenPicking analog, sample_example.cpp:469-511) --------
    def pick(self, x: int, y: int):
        """Trace one ray through pixel (x, y); returns a dict with the hit
        triangle / material / distance / position (RayPickerKHR analog)."""
        from .integrator.camera import generate_rays_for_pixels
        from .ops import rng as rngmod
        from .ops.tlas import InstancedAccel, closest_hit_instanced
        from .ops.traverse_wide import closest_hit_bundle

        pix = jnp.asarray([y * self.cfg.width + x], jnp.uint32)
        seed = rngmod.tea(pix, jnp.uint32(0))
        o, d, _ = generate_rays_for_pixels(
            self.scene.camera, self.cfg.width, self.cfg.height, pix,
            jnp.asarray(0, jnp.int32), seed,
        )
        if isinstance(self.packed, InstancedAccel):
            hit, _ = closest_hit_instanced(
                self.packed, self.scene.geometry.tri_material, o, d
            )
        else:
            hit, _ = closest_hit_bundle(
                self.packed, self.scene.geometry.tri_material, o, d
            )
        tri = int(hit.tri[0])
        if tri < 0:
            return None
        t = float(hit.t[0])
        p = np.asarray(o[0] + d[0] * t)
        out = {
            "triangle": tri,
            "material": int(self.scene.geometry.tri_material[tri]),
            "t": t,
            "position": p,
            "barycentrics": (float(hit.u[0]), float(hit.v[0])),
        }
        if hit.inst is not None:
            out["instance"] = int(hit.inst[0])
        return out

    # -- checkpoint/resume (SURVEY.md §5) ----------------------------------
    def save_state(self):
        return {"accum": np.asarray(self.accum), "frame": self.frame}

    def load_state(self, state) -> None:
        self.accum = jnp.asarray(state["accum"])
        self.frame = int(state["frame"])


def write_png(path: str, img01: np.ndarray) -> None:
    """Write a [0,1] float image to PNG."""
    from PIL import Image

    arr = np.clip(np.asarray(img01) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)
