"""Flat SoA scene schema — the TPU-native analog of ``shaders/host_device.h``.

The reference shares packed structs between C++ and GLSL and binds them as
descriptor sets (``host_device.h:107-281``). On TPU the natural equivalent is a
pytree of device arrays passed to jitted functions: every field below is a
``jax.Array`` leaf, so a whole scene can be ``jax.device_put`` once, donated,
sharded, or checkpointed as a unit.

Key TPU-first design decisions (vs. the reference):

* **World-space flattening** — the reference keeps per-mesh vertex buffers and
  instances them through the TLAS (``accelstruct.cpp:132-162``). Pointer-chased
  two-level traversal is hostile to a vector machine, so scene build bakes the
  instance transforms into one global vertex/triangle pool (per-triangle
  material/flags preserved). Rebuilding on instance motion is cheap because the
  LBVH builder runs on device.
* **SoA everywhere** — gathers in the traversal/shading hot loops touch exactly
  the arrays they need (positions for traversal; oct-packed normals only at
  shade time, mirroring ``VertexAttributes``, host_device.h:117-124).
* **Texture atlas** — the reference binds a variable-count descriptor array of
  textures (``scene.cpp:586-624``). XLA wants static shapes, so all textures
  are packed into one atlas array plus a per-texture table; lookups are
  computed bilinear gathers (see ``ops/texture.py``).
* **Static config** — the live-GUI ``RtxState`` push constants
  (host_device.h:183-196) split into a hashable static config
  (:class:`RenderConfig`) and per-frame dynamic scalars (frame index).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

# Alpha modes (host_device.h:130-132)
ALPHA_OPAQUE = 0
ALPHA_MASK = 1
ALPHA_BLEND = 2

# Light types (host_device.h:211-213)
LIGHT_DIRECTIONAL = 0
LIGHT_POINT = 1
LIGHT_SPOT = 2

# Debug modes (host_device.h:88-102)
DEBUG_NONE = 0
DEBUG_BASECOLOR = 1
DEBUG_NORMAL = 2
DEBUG_METALLIC = 3
DEBUG_EMISSIVE = 4
DEBUG_ALPHA = 5
DEBUG_ROUGHNESS = 6
DEBUG_TEXCOORD = 7
DEBUG_TANGENT = 8
DEBUG_RADIANCE = 9
DEBUG_WEIGHT = 10
DEBUG_RAYDIR = 11
DEBUG_HEATMAP = 12

# PBR models (RtxState.pbrMode, host_device.h:191)
PBR_DISNEY = 0
PBR_GLTF = 1


class Geometry(NamedTuple):
    """World-space triangle pool (flattened instances).

    Mirrors ``VertexAttributes`` (host_device.h:117-124) as SoA: positions are
    full fp32, normals/tangents oct-compressed to uint32
    (``compress.glsl:111-139``), vertex colors packed RGBA8.
    """

    positions: jax.Array          # (V, 3) f32
    normals: jax.Array            # (V,)   u32 oct-compressed
    tangents: jax.Array           # (V,)   u32 oct-compressed
    tangent_handedness: jax.Array # (V,)   f32 (+1 / -1); ref packs this into uv.y LSB
    uv: jax.Array                 # (V, 2) f32
    color: jax.Array              # (V,)   u32 packed RGBA8
    indices: jax.Array            # (T, 3) i32 into the pools above
    tri_material: jax.Array       # (T,)   i32
    tri_flags: jax.Array          # (T,)   i32: bit0 double-sided, bit1 non-opaque alpha


class Materials(NamedTuple):
    """SoA material table, one row per ``GltfShadeMaterial``
    (host_device.h:133-179). All ~25 fields preserved."""

    base_color_factor: jax.Array          # (M, 4) f32
    base_color_texture: jax.Array         # (M,)   i32, -1 = none
    metallic_factor: jax.Array            # (M,)   f32
    roughness_factor: jax.Array           # (M,)   f32
    metallic_roughness_texture: jax.Array # (M,)   i32
    emissive_factor: jax.Array            # (M, 3) f32
    emissive_texture: jax.Array           # (M,)   i32
    alpha_mode: jax.Array                 # (M,)   i32
    alpha_cutoff: jax.Array               # (M,)   f32
    double_sided: jax.Array               # (M,)   i32
    normal_texture: jax.Array             # (M,)   i32
    normal_texture_scale: jax.Array       # (M,)   f32
    uv_transform: jax.Array               # (M, 3, 3) f32, applied as [u,v,1] @ T
    unlit: jax.Array                      # (M,)   i32
    transmission_factor: jax.Array        # (M,)   f32
    transmission_texture: jax.Array       # (M,)   i32
    ior: jax.Array                        # (M,)   f32
    anisotropy_direction: jax.Array       # (M, 3) f32
    anisotropy: jax.Array                 # (M,)   f32
    attenuation_color: jax.Array          # (M, 3) f32
    thickness_factor: jax.Array           # (M,)   f32
    thickness_texture: jax.Array          # (M,)   i32
    attenuation_distance: jax.Array       # (M,)   f32
    clearcoat_factor: jax.Array           # (M,)   f32
    clearcoat_roughness: jax.Array        # (M,)   f32
    clearcoat_texture: jax.Array          # (M,)   i32
    clearcoat_roughness_texture: jax.Array# (M,)   i32
    sheen_color: jax.Array                # (M, 3) f32 (unpacked from RGBA8)
    sheen_roughness: jax.Array            # (M,)   f32


class Lights(NamedTuple):
    """KHR_lights_punctual table (``Light``, host_device.h:215-230)."""

    direction: jax.Array      # (L, 3) f32
    range: jax.Array          # (L,)   f32 (<=0 means unlimited)
    color: jax.Array          # (L, 3) f32
    intensity: jax.Array      # (L,)   f32
    position: jax.Array       # (L, 3) f32
    inner_cone_cos: jax.Array # (L,)   f32
    outer_cone_cos: jax.Array # (L,)   f32
    type: jax.Array           # (L,)   i32


class TextureAtlas(NamedTuple):
    """All scene textures packed into one array (replaces the variable-count
    sampler array, scene.cpp:586-624). Per-texture placement + sampler info."""

    data: jax.Array    # (H, W, 4) u8 raw texel values (sRGB decode at shade time)
    x: jax.Array       # (N,) i32 atlas x offset
    y: jax.Array       # (N,) i32 atlas y offset
    width: jax.Array   # (N,) i32
    height: jax.Array  # (N,) i32
    wrap_s: jax.Array  # (N,) i32: 0 repeat, 1 clamp, 2 mirror
    wrap_t: jax.Array  # (N,) i32
    # Mip chain strips (models/textures.py, VKRT_MIPS=0 disables): level
    # l >= 1 of texture t lives at (mip_x[t] + w - (w >> (l-1)), mip_y[t])
    # with size (max(w>>l,1), max(h>>l,1)) — a closed-form placement, so
    # per-lane level selection needs NO extra placement gathers
    # (ops/texture.py::mip_placement). -1 = no mips for that texture.
    # The reference generates mips per scene texture with vkCmdBlitImage
    # (scene.cpp:447-580); its RT integrator samples LOD 0 everywhere
    # (gltf_material.glsl textureLod(...,0)), so mip SAMPLING here is a
    # quality extension (ray-cone LOD), not a parity requirement.
    mip_x: Optional[jax.Array] = None  # (N,) i32
    mip_y: Optional[jax.Array] = None  # (N,) i32


class EnvAccel(NamedTuple):
    """Walker alias table over env texels (``EnvAccel``, host_device.h:233-239;
    built on device, see ``models/hdr.py``)."""

    alias: jax.Array      # (N,) i32
    q: jax.Array          # (N,) f32
    pdf: jax.Array        # (N,) f32
    alias_pdf: jax.Array  # (N,) f32


class Environment(NamedTuple):
    """HDR lat-long environment + importance-sampling table
    (``src/hdr_sampling.{hpp,cpp}``)."""

    image: jax.Array     # (He, We, 3) f32
    accel: EnvAccel      # He*We entries
    integral: jax.Array  # ()  f32 — radiance integral (firefly clamp driver)
    average: jax.Array   # ()  f32 — average CIE luminance (auto exposure)
    # Gather-packed per-texel rows (models/hdr.py::pack_env_rows): the 2x2
    # bilinear neighborhood RGB + alias data in ONE 64-byte row, so a miss
    # lookup is 1 gather (was 4) and an alias-method NEE sample 2 (was 7).
    rows: Optional[jax.Array] = None  # (He*We, 16) f32


class Camera(NamedTuple):
    """``SceneCamera`` UBO analog (host_device.h:107-115)."""

    view_inverse: jax.Array  # (4, 4) f32
    proj_inverse: jax.Array  # (4, 4) f32
    focal_dist: jax.Array    # ()     f32
    aperture: jax.Array      # ()     f32


class SunSky(NamedTuple):
    """``SunAndSky`` UBO analog (host_device.h:258-281). All leaves () f32/i32
    so the GUI-style live editing of the reference maps to retraced scalars."""

    rgb_unit_conversion: jax.Array  # (3,)
    multiplier: jax.Array
    haze: jax.Array
    redblueshift: jax.Array
    saturation: jax.Array
    horizon_height: jax.Array
    ground_color: jax.Array         # (3,)
    horizon_blur: jax.Array
    night_color: jax.Array          # (3,)
    sun_disk_intensity: jax.Array
    sun_direction: jax.Array        # (3,)
    sun_disk_scale: jax.Array
    sun_glow_intensity: jax.Array
    y_is_up: jax.Array              # i32
    physically_scaled_sun: jax.Array# i32
    in_use: jax.Array               # i32


def default_sun_sky(in_use: bool = False) -> SunSky:
    """Defaults from ``sample_example.hpp:175-192``."""
    f = lambda v: np.asarray(v, np.float32)
    i = lambda v: np.asarray(v, np.int32)
    return SunSky(
        rgb_unit_conversion=f([1.0, 1.0, 1.0]),
        multiplier=f(0.0000101320),
        haze=f(0.0),
        redblueshift=f(0.0),
        saturation=f(1.0),
        horizon_height=f(0.0),
        ground_color=f([0.4, 0.4, 0.4]),
        horizon_blur=f(0.1),
        night_color=f([0.0, 0.0, 0.01]),
        sun_disk_intensity=f(0.8),
        sun_direction=f([0.0, 0.78, 0.62]),
        sun_disk_scale=f(5.0),
        sun_glow_intensity=f(1.0),
        y_is_up=i(1),
        physically_scaled_sun=i(1),
        in_use=i(1 if in_use else 0),
    )


class BVH(NamedTuple):
    """Binary LBVH over the world-space triangle pool, threaded for
    stackless traversal.

    Replaces the driver-built BLAS/TLAS (``accelstruct.cpp``). Node index
    space: internal nodes ``[0, T-2]`` (root = 0), leaves ``[T-1, 2T-2]``.
    ``skip`` pointers thread the tree in depth-first order so traversal keeps
    a single node register per ray instead of a stack — per-ray state stays
    in registers and the hot loop is pure gathers + VPU math (no scatters),
    which is the TPU-friendly substitute for the hardware traversal stack.
    """

    aabb_min: jax.Array  # (2T-1, 3) f32
    aabb_max: jax.Array  # (2T-1, 3) f32
    left: jax.Array      # (2T-1,) i32 first child; -1 for leaves
    right: jax.Array     # (2T-1,) i32 second child; -1 for leaves
    skip: jax.Array      # (2T-1,) i32 next node when skipping subtree; -1 = done
    node_tri: jax.Array  # (2T-1,) i32 triangle id for leaves; -1 for internal
    range_lo: jax.Array  # (2T-1,) i32 sorted-leaf range start of the subtree
    range_hi: jax.Array  # (2T-1,) i32 sorted-leaf range end (inclusive)
    order: jax.Array     # (T,) i32 sorted-leaf position -> original triangle id


class SceneData(NamedTuple):
    """Everything a render step needs, as one pytree (replicate across chips)."""

    geometry: Geometry
    materials: Materials
    lights: Lights
    n_lights: jax.Array   # () i32 (SceneCamera.nbLights, host_device.h:114)
    atlas: TextureAtlas
    env: Environment
    camera: Camera
    sun_sky: SunSky
    bvh: BVH
    # Two-level mode (ops/tlas.py): the prebuilt instanced acceleration
    # structure; None = single-level world-space geometry (baked transforms).
    # When set, `geometry` is the OBJECT-space shared mesh pool.
    instances: Optional[NamedTuple] = None
    # Packed per-triangle shade rows (integrator/shade.py::build_shade_rows):
    # ONE row gather replaces ~18 vertex-attribute gathers per shaded lane.
    shade_rows: Optional[jax.Array] = None
    # Per-texel 2x2 bilinear footprint rows (ops/texture.py::build_tap_rows):
    # ONE row gather per texture tap instead of 4 texel gathers.
    tap_rows: Optional[jax.Array] = None


class Tonemapper(NamedTuple):
    """``Tonemapper`` push-constant analog (host_device.h:242-255), defaults
    from ``render_output.hpp:37-49``."""

    brightness: jax.Array
    contrast: jax.Array
    saturation: jax.Array
    vignette: jax.Array
    avg_lum: jax.Array
    zoom: jax.Array
    rendering_ratio: jax.Array  # (2,)
    auto_exposure: jax.Array    # i32 bitfield: bit0 on, bit1 local
    ywhite: jax.Array
    key: jax.Array
    dither: jax.Array           # i32


def default_tonemapper() -> Tonemapper:
    f = lambda v: np.asarray(v, np.float32)
    i = lambda v: np.asarray(v, np.int32)
    return Tonemapper(
        brightness=f(1.0),
        contrast=f(1.0),
        saturation=f(1.0),
        vignette=f(0.0),
        avg_lum=f(1.0),
        zoom=f(1.0),
        rendering_ratio=f([1.0, 1.0]),
        auto_exposure=i(0),
        ywhite=f(0.5),
        key=f(0.5),
        dither=i(1),
    )


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render state — the hashable analog of ``RtxState``
    (host_device.h:183-196) minus the per-frame counter.

    Fields are compile-time constants: changing one retraces (the reference
    analogously rebuilds/resets on GUI change, ``sample_example.cpp:296-300``).
    """

    width: int = 1280
    height: int = 720
    max_depth: int = 10
    max_samples: int = 1
    firefly_clamp: float = 1.0e20  # enabled per-scene from env integral
    hdr_multiplier: float = 1.0
    debug_mode: int = DEBUG_NONE
    pbr_mode: int = PBR_DISNEY
    use_sun_sky: bool = False
    # Ray-cone texture mip sampling (integrator/shade.py::_mip_lanes):
    # active when True AND the atlas carries mip chains (VKRT_MIPS). Part
    # of the static jit key — prefer this over env toggles mid-process.
    mip_sample: bool = True
    # Hybrid analytic sun (production sun&sky path): prepare_sun_sky bakes
    # the sky WITHOUT the sub-texel disk core and sets this, so misses add
    # the core analytically and NEE mixes in a sun-cone strategy
    # (ops/sunsky.py::sun_disk_radiance, ops/env.py::env_sample). Mutually
    # exclusive with use_sun_sky (which evaluates the full model per ray).
    sun_disk: bool = False
    render_scale: int = 1          # descaling level (sample_example.cpp:410-415)
    # Convergence stop: accumulation halts after this many progressive
    # frames (m_maxFrames, sample_example.cpp:407-408; default 100000,
    # main.cpp:47-48). Renderer.step() becomes a no-op once reached.
    max_frames: int = 100000
    # Heatmap range: this renderer feeds accumulated traversal STEP counts
    # (tens to a few hundred per path) into the temperature ramp, not the
    # reference's shader-clock cycles (pathtrace.rgen:82-93, default 65000),
    # so the default range is steps-scaled.
    min_heatmap: float = 0.0
    max_heatmap: float = 256.0
    use_any_hit: bool = True       # stochastic alpha during traversal
    rr: bool = True                # Russian roulette (pathtrace.glsl:27)
    rr_depth: int = 0
    # Light-strategy weighting. The reference's estimator is biased: the
    # BSDF-side environment hit adds FULL radiance with no MIS weight
    # (pathtrace.glsl:228) while NEE adds an env-MIS-weighted term
    # (pathtrace.glsl:177-179), and neither NEE branch divides by the 0.5
    # strategy-selection probability or the uniform light pick (1/nbLights)
    # — measured +25% on an analytic furnace (tests/test_anchor.py).
    # full_mis=True (default) uses the correct two-sided power-heuristic
    # estimator (selection probs included, BSDF-side env hits weighted via
    # ops/env.py::environment_pdf); False reproduces the reference's
    # weighting exactly for RMSE comparisons against its renders.
    full_mis: bool = True


def _np(x, dtype):
    # Host numpy, not device arrays: scene tables are consumed by host-side
    # build passes (shade rows, native SAH, feature probes) before Renderer
    # uploads them once; device commits here would make every such pass a
    # slow tunnel readback (see models/builder.py::GeometryBuilder.build).
    return np.asarray(np.asarray(x), dtype=dtype)


def make_materials(rows: list[dict]) -> Materials:
    """Build the SoA material table from a list of per-material dicts
    (missing keys get glTF defaults)."""
    m = len(rows)

    def col(key, default, dtype, shape=()):
        out = np.empty((m,) + shape, dtype=np.float64 if dtype == jnp.float32 else np.int64)
        for i, r in enumerate(rows):
            out[i] = np.asarray(r.get(key, default))
        return _np(out, dtype)

    ident3 = np.eye(3)
    return Materials(
        base_color_factor=col("base_color_factor", [1, 1, 1, 1], jnp.float32, (4,)),
        base_color_texture=col("base_color_texture", -1, jnp.int32),
        metallic_factor=col("metallic_factor", 1.0, jnp.float32),
        roughness_factor=col("roughness_factor", 1.0, jnp.float32),
        metallic_roughness_texture=col("metallic_roughness_texture", -1, jnp.int32),
        emissive_factor=col("emissive_factor", [0, 0, 0], jnp.float32, (3,)),
        emissive_texture=col("emissive_texture", -1, jnp.int32),
        alpha_mode=col("alpha_mode", ALPHA_OPAQUE, jnp.int32),
        alpha_cutoff=col("alpha_cutoff", 0.5, jnp.float32),
        double_sided=col("double_sided", 0, jnp.int32),
        normal_texture=col("normal_texture", -1, jnp.int32),
        normal_texture_scale=col("normal_texture_scale", 1.0, jnp.float32),
        uv_transform=col("uv_transform", ident3, jnp.float32, (3, 3)),
        unlit=col("unlit", 0, jnp.int32),
        transmission_factor=col("transmission_factor", 0.0, jnp.float32),
        transmission_texture=col("transmission_texture", -1, jnp.int32),
        ior=col("ior", 1.5, jnp.float32),
        anisotropy_direction=col("anisotropy_direction", [1, 0, 0], jnp.float32, (3,)),
        anisotropy=col("anisotropy", 0.0, jnp.float32),
        attenuation_color=col("attenuation_color", [1, 1, 1], jnp.float32, (3,)),
        thickness_factor=col("thickness_factor", 0.0, jnp.float32),
        thickness_texture=col("thickness_texture", -1, jnp.int32),
        attenuation_distance=col("attenuation_distance", 1e10, jnp.float32),
        clearcoat_factor=col("clearcoat_factor", 0.0, jnp.float32),
        clearcoat_roughness=col("clearcoat_roughness", 0.0, jnp.float32),
        clearcoat_texture=col("clearcoat_texture", -1, jnp.int32),
        clearcoat_roughness_texture=col("clearcoat_roughness_texture", -1, jnp.int32),
        sheen_color=col("sheen_color", [0, 0, 0], jnp.float32, (3,)),
        sheen_roughness=col("sheen_roughness", 0.0, jnp.float32),
    )


def make_lights(rows: list[dict]) -> Lights:
    """Build the punctual-light table (empty tables get one dummy row so shapes
    stay static; ``n_lights`` gates its use)."""
    if not rows:
        rows = [dict(type=LIGHT_POINT, position=[0, 0, 0], intensity=0.0)]
    L = len(rows)

    def col(key, default, dtype, shape=()):
        out = np.empty((L,) + shape)
        for i, r in enumerate(rows):
            out[i] = np.asarray(r.get(key, default))
        return _np(out, dtype)

    return Lights(
        direction=col("direction", [0, 0, -1], jnp.float32, (3,)),
        range=col("range", 0.0, jnp.float32),
        color=col("color", [1, 1, 1], jnp.float32, (3,)),
        intensity=col("intensity", 1.0, jnp.float32),
        position=col("position", [0, 0, 0], jnp.float32, (3,)),
        inner_cone_cos=col("inner_cone_cos", 0.0, jnp.float32),
        outer_cone_cos=col("outer_cone_cos", 0.7071, jnp.float32),
        type=col("type", LIGHT_POINT, jnp.int32),
    )


def dummy_atlas() -> TextureAtlas:
    """1x1 white atlas used when a scene has no textures (the reference
    similarly substitutes dummy textures, scene.cpp:496-533)."""
    return TextureAtlas(
        data=np.full((8, 128, 4), 255, np.uint8),
        x=np.zeros((1,), np.int32),
        y=np.zeros((1,), np.int32),
        width=np.ones((1,), np.int32),
        height=np.ones((1,), np.int32),
        wrap_s=np.zeros((1,), np.int32),
        wrap_t=np.zeros((1,), np.int32),
    )


def dummy_environment(color=(1.0, 1.0, 1.0)) -> Environment:
    """Constant-color 2x4 environment with a valid alias table."""
    img = np.ascontiguousarray(
        np.broadcast_to(np.asarray(color, np.float32), (2, 4, 3))
    )
    n = 8
    return Environment(
        image=img,
        accel=EnvAccel(
            alias=np.arange(n, dtype=np.int32),
            q=np.ones((n,), np.float32),
            pdf=np.full((n,), 1.0 / (4.0 * np.pi), np.float32),
            alias_pdf=np.full((n,), 1.0 / (4.0 * np.pi), np.float32),
        ),
        integral=np.float32(4.0 * np.pi * float(np.max(color))),
        average=np.float32(float(np.mean(color))),
    )
