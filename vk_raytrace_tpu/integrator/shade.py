"""Hit shading state + material resolve.

The gather/interpolate stage of the wavefront: reconstructs geometric state
from a :class:`~vk_raytrace_tpu.ops.traverse.Hit` (the analog of
``GetShadeState``, ``shaders/shade_state.glsl:63-145``) and resolves the full
material (``GetMaterialsAndTextures``/``GetMetallicRoughness``,
``shaders/gltf_material.glsl:52-193``) into a :class:`SurfState`.

Geometry is stored world-space (instance transforms baked at scene build),
so the object->world matrix chain of the reference collapses to identity.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models.schema import Geometry, Materials, TextureAtlas
from ..ops.math import (
    dot,
    make_coordinate_system,
    normalize,
    oct_decode,
    srgb_to_linear,
)
from ..ops.state import MatState, SurfState
from ..ops.texture import sample_atlas


def _unpack_rgba8(c: jax.Array) -> jax.Array:
    c = c.astype(jnp.uint32)
    return (
        jnp.stack(
            [
                (c & 0xFF).astype(jnp.float32),
                ((c >> 8) & 0xFF).astype(jnp.float32),
                ((c >> 16) & 0xFF).astype(jnp.float32),
                ((c >> 24) & 0xFF).astype(jnp.float32),
            ],
            axis=-1,
        )
        * (1.0 / 255.0)
    )


def build_shade_rows(
    geom: Geometry, materials=None, atlas=None
) -> jax.Array:
    """Pack everything GetShadeState reads into one (T, 40) f32 row per
    triangle, so the shading stage costs ONE row gather per lane instead of
    ~18 (indices + 3x{positions, normals, tangents, uv, color} + handedness
    + material). Row gathers are flat-cost per row up to 512B on v5e, so a
    160B row is the same price as the 12B index fetch was.

    u32-packed fields (oct normals/tangents, RGBA8 colors) are split into
    two exact-f32 16-bit halves — TPU float lanes flush denormals, so raw
    32-bit patterns must never ride in f32 lanes (see ops/traverse.py).

    Lanes: [0:9] p0 p1 p2 | [9:12] n oct lo x3 | [12:15] n oct hi x3
    | [15:18] t oct lo x3 | [18:21] t oct hi x3 | [21] handedness(v0)
    | [22:28] uv x3 | [28:31] color lo x3 | [31:34] color hi x3
    | [34] mat_id | [35:40] pad. Lo/hi halves are PLANAR (not interleaved):
    the fused shading kernel (integrator/shade_fused.py) reads them as
    contiguous sublane slices — Mosaic has no strided sublane access.

    With ``materials`` (+``atlas``) given, the per-triangle MATERIAL row
    (:func:`pack_material_rows`, ``_PACK_LANES`` cols) is appended at
    [40:40+_PACK_LANES], making the merged row 400 B — still inside the
    flat-gather window, so shade state AND material resolve ride ONE gather
    (``resolve_material`` consumes the slice via ``ss["prow"]``; the
    separate (M,60) table gather disappears from the bounce).
    """
    idx = np.asarray(geom.indices).astype(np.int64)       # (T, 3)
    pos = np.asarray(geom.positions)
    nrm = np.asarray(geom.normals).astype(np.uint32)
    tan = np.asarray(geom.tangents).astype(np.uint32)
    uv = np.asarray(geom.uv)
    col = np.asarray(geom.color).astype(np.uint32)
    t = len(idx)
    rows = np.zeros((t, 40), np.float32)
    rows[:, 0:9] = pos[idx].reshape(t, 9)
    n3 = nrm[idx]
    rows[:, 9:12] = (n3 & 0xFFFF).astype(np.float32)
    rows[:, 12:15] = (n3 >> 16).astype(np.float32)
    t3 = tan[idx]
    rows[:, 15:18] = (t3 & 0xFFFF).astype(np.float32)
    rows[:, 18:21] = (t3 >> 16).astype(np.float32)
    rows[:, 21] = np.asarray(geom.tangent_handedness)[idx[:, 0]]
    rows[:, 22:28] = uv[idx].reshape(t, 6)
    c3 = col[idx]
    rows[:, 28:31] = (c3 & 0xFFFF).astype(np.float32)
    rows[:, 31:34] = (c3 >> 16).astype(np.float32)
    tri_mat = np.maximum(np.asarray(geom.tri_material), 0)
    rows[:, 34] = tri_mat
    # Memory tradeoff: merging duplicates the 60-lane material row per
    # TRIANGLE (160 B -> 400 B/row; atrium +52 MB, a 10M-tri scene +2.4 GB)
    # to buy one gather instead of two per bounce. VKRT_MERGED_MAT=0 keeps
    # the separate (M, 60) table for high-tri scenes. Material edits must
    # rebuild shade_rows (Renderer construction does; no in-place mutation
    # path exists).
    merged = os.environ.get("VKRT_MERGED_MAT", "1") != "0"
    if materials is not None and atlas is not None and merged:
        # Host-side: never touch the accelerator during scene build
        # (render.py::_build_binary_bvh_cpu rationale).
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            cpu = None
        if cpu is not None:
            with jax.default_device(cpu):
                mrows = np.asarray(pack_material_rows(materials, atlas))
        else:
            mrows = np.asarray(pack_material_rows(materials, atlas))
        if len(mrows):
            rows = np.concatenate(
                [rows, mrows[np.minimum(tri_mat, len(mrows) - 1)]], axis=1
            ).astype(np.float32)
        # Pad merged rows to 128 lanes (512 B — still inside the flat-gather
        # window) IN THE TABLE: the fused shading kernel wants 128-lane
        # blocks, and padding per-gather cost a full (R, 128) copy every
        # bounce (round-4's fused-shade glue tax).
        if rows.shape[1] < 128:
            rows = np.pad(rows, ((0, 0), (0, 128 - rows.shape[1])))
    return rows


def _join16(lo: jax.Array, hi: jax.Array) -> jax.Array:
    return lo.astype(jnp.uint32) | (hi.astype(jnp.uint32) << 16)


def get_shade_state(
    geom: Geometry,
    tri: jax.Array,
    u: jax.Array,
    v: jax.Array,
    instances=None,
    inst: jax.Array | None = None,
    shade_rows: jax.Array | None = None,
):
    """Interpolate vertex attributes at hit points (shade_state.glsl:63-145).

    ``tri`` (R,) original triangle ids (callers mask invalid lanes),
    ``u``/``v`` barycentrics of vertices 1/2.

    ``instances``/``inst``: two-level mode — ``geom`` is the OBJECT-space
    mesh pool; interpolated quantities are brought to world space with the
    per-lane instance transform (the reference's objectToWorld /
    worldToObject payload fields, pathtrace.rchit + shade_state.glsl:70-90).

    Returns a dict with position/normal/geom_normal/tangent/bitangent/uv/
    color/mat_id arrays.
    """
    trc = jnp.maximum(tri, 0)
    w = 1.0 - u - v
    bary = jnp.stack([w, u, v], axis=-1)      # (R, 3)

    prow = None
    if shade_rows is not None:
        row = shade_rows[trc]                 # (R, 40 or 40+60): THE gather
        if row.shape[1] >= 40 + _PACK_LANES:
            prow = row[:, 40:40 + _PACK_LANES]
        p = row[:, 0:9].reshape(-1, 3, 3)
        n_pk = _join16(row[:, 9:12], row[:, 12:15])
        t_pk = _join16(row[:, 15:18], row[:, 18:21])
        handed = row[:, 21]
        uv3 = row[:, 22:28].reshape(-1, 3, 2)
        c_pk = _join16(row[:, 28:31], row[:, 31:34])
        mat_id = row[:, 34].astype(jnp.int32)
    else:
        idx = geom.indices[trc]               # (R, 3)
        p = geom.positions[idx]               # (R, 3, 3)
        n_pk = geom.normals[idx]
        t_pk = geom.tangents[idx]
        handed = geom.tangent_handedness[idx[:, 0]]
        uv3 = geom.uv[idx]
        c_pk = geom.color[idx]
        mat_id = jnp.maximum(geom.tri_material[trc], 0)

    position = jnp.einsum("rk,rkc->rc", bary, p)

    n = oct_decode(n_pk)                      # (R, 3, 3)
    normal = normalize(jnp.einsum("rk,rkc->rc", bary, n))
    geom_normal = normalize(jnp.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]))

    t = oct_decode(t_pk)                      # (R, 3, 3)
    tangent = normalize(jnp.einsum("rk,rkc->rc", bary, t))

    if instances is not None:
        ii = jnp.maximum(inst, 0) if inst is not None else jnp.zeros_like(trc)
        o2w = instances.object_to_world[ii]   # (R, 3, 4)
        w2o = instances.world_to_object[ii]
        m3 = o2w[:, :, :3]
        position = jnp.einsum("rij,rj->ri", m3, position) + o2w[:, :, 3]
        # normals transform by (M^-1)^T = world_to_object rows transposed
        normal = normalize(jnp.einsum("rij,ri->rj", w2o[:, :, :3], normal))
        geom_normal = normalize(
            jnp.einsum("rij,ri->rj", w2o[:, :, :3], geom_normal)
        )
        tangent = normalize(jnp.einsum("rij,rj->ri", m3, tangent))
    # Gram-Schmidt against the shading normal (shade_state.glsl:112-113)
    tangent = normalize(tangent - dot(tangent, normal, keepdims=True) * normal)
    bitangent = jnp.cross(normal, tangent) * handed[..., None]

    uv = jnp.einsum("rk,rkc->rc", bary, uv3)
    color = jnp.einsum("rk,rkc->rc", bary, _unpack_rgba8(c_pk))

    # Triangle uv density: 0.5*log2(uv_area / world_area) — the
    # texture-independent half of the ray-cone mip term (Moller ray cones;
    # resolve_material adds 0.5*log2(w*h) per texture). World area uses the
    # instance-transformed edges in two-level mode. Dead-code-eliminated by
    # XLA when the integrator doesn't consume it (mips off).
    e1 = p[:, 1] - p[:, 0]
    e2 = p[:, 2] - p[:, 0]
    if instances is not None:
        m3w = o2w[:, :, :3]
        e1 = jnp.einsum("rij,rj->ri", m3w, e1)
        e2 = jnp.einsum("rij,rj->ri", m3w, e2)
    area_w = jnp.linalg.norm(jnp.cross(e1, e2), axis=-1)
    u1 = uv3[:, 1] - uv3[:, 0]
    u2 = uv3[:, 2] - uv3[:, 0]
    area_uv = jnp.abs(u1[:, 0] * u2[:, 1] - u1[:, 1] * u2[:, 0])
    uv_density = 0.5 * jnp.log2(
        jnp.maximum(area_uv, 1e-20) / jnp.maximum(area_w, 1e-20)
    )

    # Put the shading normal on the geometric side (shade_state.glsl:139-143)
    flip = dot(normal, geom_normal) <= 0.0
    normal = jnp.where(flip[..., None], -normal, normal)

    out = dict(
        position=position,
        normal=normal,
        geom_normal=geom_normal,
        tangent=tangent,
        bitangent=bitangent,
        uv=uv,
        color=color[..., :3],
        mat_id=mat_id,
        uv_density=uv_density,
    )
    if prow is not None:
        out["prow"] = prow   # merged material slice: resolve_material skips
    return out               # its own (M, 60) table gather


@dataclasses.dataclass(frozen=True)
class MatFeatures:
    """Static per-scene texture/feature presence (host-side scan of the
    material table). Absent features compile to nothing: an untextured
    scene's material resolve is ONE row gather instead of ~95 small ones
    (each masked-out ``sample_atlas`` still cost 10 gathers at trace time).
    Defaults are conservative (everything on)."""

    base_tex: bool = True
    mr_tex: bool = True
    normal_tex: bool = True
    emissive_tex: bool = True
    transmission_tex: bool = True
    clearcoat_tex: bool = True
    anisotropy: bool = True


def mat_features(materials: Materials) -> MatFeatures:
    """Scan the material table (host-side, once per scene)."""
    import numpy as np

    def anytex(a):
        return bool(np.any(np.asarray(a) >= 0))

    m = materials
    return MatFeatures(
        base_tex=anytex(m.base_color_texture),
        mr_tex=anytex(m.metallic_roughness_texture),
        normal_tex=anytex(m.normal_texture),
        emissive_tex=anytex(m.emissive_texture),
        transmission_tex=anytex(m.transmission_texture),
        clearcoat_tex=anytex(m.clearcoat_texture)
        or anytex(m.clearcoat_roughness_texture),
        anisotropy=bool(np.any(np.asarray(m.anisotropy) > 0.0)),
    )


# Packed material row layout: (name, lane count). One (M, 64) table replaces
# ~25 per-field gathers + the 6 per-texture placement gathers of each
# sample_atlas call — the measured XLA gather cost is flat per ROW for
# 32..512 B rows (docs/PERFORMANCE.md), so fewer/fatter gathers win ~10x.
_TEX = ["base", "mr", "normal", "emissive"]  # hot textures: placement inline
_LAYOUT = [
    ("uvT", 6),                    # uv transform rows [00,01,10,11,20,21]
    # id, ox, oy, w, h, wrap(ws*3+wt), mip_x, mip_y (closed-form mip strip
    # placement, ops/texture.py::mip_placement; -1 = no chain)
    *[(f"{t}_tex", 8) for t in _TEX],
    ("emissive_factor", 3),
    ("normal_scale", 1),
    ("ior", 1),
    ("rough_f", 1),
    ("metal_f", 1),
    ("base_factor", 4),
    ("transmission_f", 1),
    ("transmission_tid", 1),
    ("unlit", 1),
    ("aniso", 1),
    ("aniso_dir", 3),
    ("atten_color", 3),
    ("atten_dist", 1),
    ("thickness", 1),
    ("cc_f", 1),
    ("cc_tid", 1),
    ("cc_rough", 1),
    ("cc_rough_tid", 1),
    ("sheen_color", 3),
    ("sheen_rough", 1),
]
_OFFS = {}
_cursor = 0
for _name, _n in _LAYOUT:
    _OFFS[_name] = _cursor
    _cursor += _n
_PACK_LANES = _cursor  # 60


def pack_material_rows(m: Materials, atlas: TextureAtlas) -> jax.Array:
    """Build the (M, _PACK_LANES) packed row table (pure jnp; XLA hoists it
    out of the per-ray work — the table is a few KB)."""

    def tex(tex_id):
        tid = jnp.clip(tex_id, 0, atlas.x.shape[0] - 1)
        f = jnp.float32
        if atlas.mip_x is not None:
            mx = atlas.mip_x[tid].astype(f)
            my = atlas.mip_y[tid].astype(f)
        else:
            mx = jnp.full(tid.shape, -1.0, f)
            my = jnp.full(tid.shape, -1.0, f)
        return [
            tex_id.astype(f),
            atlas.x[tid].astype(f),
            atlas.y[tid].astype(f),
            atlas.width[tid].astype(f),
            atlas.height[tid].astype(f),
            (atlas.wrap_s[tid] * 3 + atlas.wrap_t[tid]).astype(f),
            mx,
            my,
        ]

    t = m.uv_transform
    cols = [
        t[:, 0, 0], t[:, 0, 1], t[:, 1, 0], t[:, 1, 1], t[:, 2, 0], t[:, 2, 1],
        *tex(m.base_color_texture),
        *tex(m.metallic_roughness_texture),
        *tex(m.normal_texture),
        *tex(m.emissive_texture),
        m.emissive_factor[:, 0], m.emissive_factor[:, 1], m.emissive_factor[:, 2],
        m.normal_texture_scale,
        m.ior,
        m.roughness_factor,
        m.metallic_factor,
        m.base_color_factor[:, 0], m.base_color_factor[:, 1],
        m.base_color_factor[:, 2], m.base_color_factor[:, 3],
        m.transmission_factor,
        m.transmission_texture.astype(jnp.float32),
        m.unlit.astype(jnp.float32),
        m.anisotropy,
        m.anisotropy_direction[:, 0], m.anisotropy_direction[:, 1],
        m.anisotropy_direction[:, 2],
        m.attenuation_color[:, 0], m.attenuation_color[:, 1],
        m.attenuation_color[:, 2],
        m.attenuation_distance,
        m.thickness_factor,
        m.clearcoat_factor,
        m.clearcoat_texture.astype(jnp.float32),
        m.clearcoat_roughness,
        m.clearcoat_roughness_texture.astype(jnp.float32),
        m.sheen_color[:, 0], m.sheen_color[:, 1], m.sheen_color[:, 2],
        m.sheen_roughness,
    ]
    return jnp.stack([c.astype(jnp.float32) for c in cols], axis=1)


def _col(prow, name, n=1):
    o = _OFFS[name]
    if n == 1:
        return prow[:, o]
    return prow[:, o : o + n]


def _mip_lanes(prow, o, lod):
    """Per-lane mip level + placement from the 8 packed texture lanes.

    ``lod`` is the texture-independent footprint log (ray-cone width x
    triangle uv density, integrator-provided); the per-texture term
    0.5*log2(w*h) is added here. Nearest-level selection (round) keeps the
    tap at ONE footprint-row gather — trilinear would double it. Level 0
    reproduces the mip-less path bit-exactly.
    """
    w0 = jnp.maximum(prow[:, o + 3].astype(jnp.int32), 1)
    h0 = jnp.maximum(prow[:, o + 4].astype(jnp.int32), 1)
    ox0 = prow[:, o + 1].astype(jnp.int32)
    oy0 = prow[:, o + 2].astype(jnp.int32)
    mx = prow[:, o + 6].astype(jnp.int32)
    my = prow[:, o + 7].astype(jnp.int32)
    wf, hf = w0.astype(jnp.float32), h0.astype(jnp.float32)
    n_lvl = jnp.floor(
        jnp.log2(jnp.maximum(jnp.minimum(wf, hf), 1.0)) + 1e-4
    ).astype(jnp.int32)
    # KHR_texture_transform scales uv before the tap, so the footprint in
    # texel space scales by |det(uvT 2x2)|; fold 0.5*log2 of it into the
    # level (ADVICE r4 #3). Identity transforms contribute exactly 0.
    t00, t01 = prow[:, _OFFS["uvT"]], prow[:, _OFFS["uvT"] + 1]
    t10, t11 = prow[:, _OFFS["uvT"] + 2], prow[:, _OFFS["uvT"] + 3]
    det = jnp.abs(t00 * t11 - t01 * t10)
    lam = lod + 0.5 * jnp.log2(wf * hf) + 0.5 * jnp.log2(jnp.maximum(det, 1e-20))
    lvl = jnp.clip(jnp.round(lam).astype(jnp.int32), 0, n_lvl)
    lvl = jnp.where(mx >= 0, lvl, 0)
    # closed-form strip placement (ops/texture.py::mip_placement)
    oxl = mx + w0 - (w0 >> jnp.maximum(lvl - 1, 0))
    wl = jnp.maximum(w0 >> lvl, 1)
    hl = jnp.maximum(h0 >> lvl, 1)
    base = lvl == 0
    return (
        jnp.where(base, ox0, oxl),
        jnp.where(base, oy0, my),
        jnp.where(base, w0, wl),
        jnp.where(base, h0, hl),
    )


def _tap_packed(atlas: TextureAtlas, prow, name, uv, srgb=False, lod=None):
    """Bilinear tap using the placement lanes already in the packed row:
    4 texel gathers total (vs 6 placement + 4 texel in sample_atlas)."""
    o = _OFFS[name]
    tid = prow[:, o]
    if lod is not None:
        ox, oy, w, h = _mip_lanes(prow, o, lod)
    else:
        ox = prow[:, o + 1].astype(jnp.int32)
        oy = prow[:, o + 2].astype(jnp.int32)
        w = jnp.maximum(prow[:, o + 3].astype(jnp.int32), 1)
        h = jnp.maximum(prow[:, o + 4].astype(jnp.int32), 1)
    wrap = prow[:, o + 5].astype(jnp.int32)
    ws, wt = wrap // 3, wrap % 3

    px = uv[..., 0] * w.astype(jnp.float32) - 0.5
    py = uv[..., 1] * h.astype(jnp.float32) - 0.5
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    fx = (px - x0.astype(jnp.float32))[..., None]
    fy = (py - y0.astype(jnp.float32))[..., None]

    aw = atlas.data.shape[1]
    flat = atlas.data.reshape(-1, 4)

    def wrapc(c, size, mode):
        rep = jnp.remainder(c, size)
        clm = jnp.clip(c, 0, size - 1)
        mm = jnp.remainder(c, 2 * size)
        mir = jnp.where(mm >= size, 2 * size - 1 - mm, mm)
        return jnp.where(mode == 0, rep, jnp.where(mode == 1, clm, mir))

    def tap(xi, yi):
        xw = wrapc(xi, w, ws) + ox
        yw = wrapc(yi, h, wt) + oy
        return flat[yw * aw + xw].astype(jnp.float32) * (1.0 / 255.0)

    c00 = tap(x0, y0)
    c10 = tap(x0 + 1, y0)
    c01 = tap(x0, y0 + 1)
    c11 = tap(x0 + 1, y0 + 1)
    top = c00 + (c10 - c00) * fx
    bot = c01 + (c11 - c01) * fx
    out = top + (bot - top) * fy
    if srgb:
        out = jnp.concatenate(
            [srgb_to_linear(out[..., :3]), out[..., 3:4]], axis=-1
        )
    return jnp.where((tid < 0.0)[..., None], jnp.ones_like(out), out)


def _axis_base(p: jax.Array, size: jax.Array, mode: jax.Array):
    """Reduce one bilinear axis to (base texel, blend weight) against the
    footprint rows of :func:`~vk_raytrace_tpu.ops.texture.build_tap_rows`.

    The footprint row at base ``b`` holds ``(b, b+1-wrapped)``; each wrap
    mode's 2-tap blend is expressible in that form:

    * REPEAT: base ``floor(p) % size``, weight ``frac(p)``.
    * CLAMP: clamp ``p`` into ``[0, size-1]`` first — the out-of-range taps
      of the reference blend (both taps = edge texel) collapse to weight
      0/1 against the in-range pair.
    * MIRROR: the ascending branch is REPEAT-like; the descending branch
      (tap pair ``(m, m-1)``) is the footprint at ``m-1`` with weight
      ``1-frac``; at the period edge (``m == 0``) both taps coincide.
    """
    sf = size.astype(jnp.float32)
    i0 = jnp.floor(p).astype(jnp.int32)
    f = p - i0.astype(jnp.float32)
    b_rep = jnp.remainder(i0, size)
    pc = jnp.clip(p, 0.0, sf - 1.0)
    b_clm = jnp.clip(
        jnp.floor(pc).astype(jnp.int32), 0, jnp.maximum(size - 2, 0)
    )
    g_clm = pc - b_clm.astype(jnp.float32)
    m2 = jnp.remainder(i0, 2 * size)
    asc = m2 < size
    xw = jnp.where(asc, m2, 2 * size - 1 - m2)
    b_mir = jnp.where(asc, xw, jnp.maximum(xw - 1, 0))
    g_mir = jnp.where(asc, f, jnp.where(xw > 0, 1.0 - f, 0.0))
    b = jnp.where(mode == 0, b_rep, jnp.where(mode == 1, b_clm, b_mir))
    g = jnp.where(mode == 0, f, jnp.where(mode == 1, g_clm, g_mir))
    return b, g


def _tap_footprint(atlas, tap_rows, prow, name, uv, srgb=False, lod=None):
    """Bilinear tap as ONE footprint-row gather (vs 4 texel gathers in
    :func:`_tap_packed`): the (H*W, 4) u32 table from ``build_tap_rows``
    already holds each base texel's wrapped 2x2 neighborhood."""
    o = _OFFS[name]
    tid = prow[:, o]
    if lod is not None:
        ox, oy, w, h = _mip_lanes(prow, o, lod)
    else:
        ox = prow[:, o + 1].astype(jnp.int32)
        oy = prow[:, o + 2].astype(jnp.int32)
        w = jnp.maximum(prow[:, o + 3].astype(jnp.int32), 1)
        h = jnp.maximum(prow[:, o + 4].astype(jnp.int32), 1)
    wrap = prow[:, o + 5].astype(jnp.int32)
    ws, wt = wrap // 3, wrap % 3

    px = uv[..., 0] * w.astype(jnp.float32) - 0.5
    py = uv[..., 1] * h.astype(jnp.float32) - 0.5
    bx, gx = _axis_base(px, w, ws)
    by, gy = _axis_base(py, h, wt)

    aw = atlas.data.shape[1]
    row = tap_rows[(oy + by) * aw + (ox + bx)]      # (R, 4): THE gather
    c00 = _unpack_rgba8(row[:, 0])
    c10 = _unpack_rgba8(row[:, 1])
    c01 = _unpack_rgba8(row[:, 2])
    c11 = _unpack_rgba8(row[:, 3])
    gx = gx[..., None]
    gy = gy[..., None]
    top = c00 + (c10 - c00) * gx
    bot = c01 + (c11 - c01) * gx
    out = top + (bot - top) * gy
    if srgb:
        out = jnp.concatenate(
            [srgb_to_linear(out[..., :3]), out[..., 3:4]], axis=-1
        )
    return jnp.where((tid < 0.0)[..., None], jnp.ones_like(out), out)


def resolve_material(
    ss: dict,
    materials: Materials,
    atlas: TextureAtlas,
    ray_dir: jax.Array,
    features: MatFeatures | None = None,
    tap_rows: jax.Array | None = None,
    lod: jax.Array | None = None,
) -> SurfState:
    """``GetMaterialsAndTextures`` (gltf_material.glsl:105-193) over the batch.

    ``features``: static per-scene presence flags (see :class:`MatFeatures`);
    None compiles the conservative everything-on path."""
    if features is None:
        features = MatFeatures()
    if "prow" in ss:
        prow = ss["prow"]                  # merged shade+material row: the
                                           # shade-state gather covered it
    else:
        rows = pack_material_rows(materials, atlas)
        prow = rows[ss["mat_id"]]                   # (R, 60): THE gather

    def tap(name, uv, srgb=False):
        if tap_rows is not None:
            return _tap_footprint(
                atlas, tap_rows, prow, name, uv, srgb=srgb, lod=lod
            )
        return _tap_packed(atlas, prow, name, uv, srgb=srgb, lod=lod)
    ones4 = jnp.ones(prow.shape[:1] + (4,), jnp.float32)

    # UV transform: [u, v, 1] @ T (gltf_material.glsl:116)
    uvt = _col(prow, "uvT", 6)
    su, sv = ss["uv"][..., 0], ss["uv"][..., 1]
    uv = jnp.stack(
        [
            su * uvt[:, 0] + sv * uvt[:, 2] + uvt[:, 4],
            su * uvt[:, 1] + sv * uvt[:, 3] + uvt[:, 5],
        ],
        axis=-1,
    )

    normal = ss["normal"]
    tangent = ss["tangent"]
    bitangent = ss["bitangent"]
    ffnormal = jnp.where(
        dot(normal, ray_dir, keepdims=True) <= 0.0, normal, -normal
    )

    # Normal mapping (gltf_material.glsl:121-129): perturb, refresh ffnormal,
    # rebuild the tangent frame from the new ffnormal.
    if features.normal_tex:
        nscale = _col(prow, "normal_scale")
        nval = tap("normal_tex", uv)[..., :3]
        nvec = normalize(nval * 2.0 - 1.0)
        nvec = nvec * jnp.stack([nscale, nscale, jnp.ones_like(nscale)], axis=-1)
        mapped = normalize(
            nvec[..., 0:1] * tangent + nvec[..., 1:2] * bitangent
            + nvec[..., 2:3] * normal
        )
        has_nmap = (_col(prow, "normal_tex") >= 0.0)[..., None]
        normal = jnp.where(has_nmap, mapped, normal)
        ffnormal = jnp.where(
            dot(normal, ray_dir, keepdims=True) <= 0.0, normal, -normal
        )
        t2, b2 = make_coordinate_system(ffnormal)
        tangent = jnp.where(has_nmap, t2, tangent)
        bitangent = jnp.where(has_nmap, b2, bitangent)

    # Emission (gltf_material.glsl:131-135)
    emission = _col(prow, "emissive_factor", 3)
    if features.emissive_tex:
        emission = emission * tap("emissive_tex", uv, srgb=True)[..., :3]

    # Metallic-roughness + base color (gltf_material.glsl:52-93)
    ior = _col(prow, "ior")
    dielectric_spec = ((ior - 1.0) / (ior + 1.0)) ** 2
    mr = tap("mr_tex", uv) if features.mr_tex else ones4
    roughness = mr[..., 1] * _col(prow, "rough_f")
    metallic = mr[..., 2] * _col(prow, "metal_f")
    base = _col(prow, "base_factor", 4) * (
        tap("base_tex", uv, srgb=True) if features.base_tex else ones4
    )
    f0 = (
        dielectric_spec[..., None] * (1.0 - metallic[..., None])
        + base[..., :3] * metallic[..., None]
    )
    albedo = base[..., :3]
    alpha = base[..., 3]
    roughness = jnp.maximum(roughness, 0.001)

    # Transmission (gltf_material.glsl:144-149)
    transmission = _col(prow, "transmission_f")
    if features.transmission_tex:
        ttid = _col(prow, "transmission_tid").astype(jnp.int32)
        transmission = transmission * jnp.where(
            ttid >= 0, sample_atlas(atlas, ttid, uv)[..., 0], 1.0
        )

    # eta at the interface (gltf_material.glsl:152-153)
    eta = jnp.where(dot(normal, ffnormal) > 0.0, 1.0 / ior, ior)

    unlit = _col(prow, "unlit") == 1.0

    # Anisotropy (gltf_material.glsl:157-169)
    anisotropy = _col(prow, "aniso")
    aspect = jnp.sqrt(1.0 - anisotropy * 0.9)
    ax = jnp.maximum(0.001, roughness / aspect)
    ay = jnp.maximum(0.001, roughness * aspect)
    if features.anisotropy:
        adir = _col(prow, "aniso_dir", 3)
        t_rot = normalize(
            adir[..., 0:1] * tangent + adir[..., 1:2] * bitangent
            + adir[..., 2:3] * normal
        )
        b_rot = normalize(jnp.cross(normal, t_rot))
        has_aniso = (anisotropy > 0.0)[..., None]
        tangent = jnp.where(has_aniso, t_rot, tangent)
        bitangent = jnp.where(has_aniso, b_rot, bitangent)

    # Volume (gltf_material.glsl:171-174)
    attenuation_color = _col(prow, "atten_color", 3)
    attenuation_distance = _col(prow, "atten_dist")
    thinwalled = _col(prow, "thickness") == 0.0

    # Clearcoat (gltf_material.glsl:176-188)
    clearcoat = _col(prow, "cc_f")
    ccr = _col(prow, "cc_rough")
    if features.clearcoat_tex:
        cctid = _col(prow, "cc_tid").astype(jnp.int32)
        clearcoat = clearcoat * jnp.where(
            cctid >= 0, sample_atlas(atlas, cctid, uv)[..., 0], 1.0
        )
        ccrtid = _col(prow, "cc_rough_tid").astype(jnp.int32)
        ccr = ccr * jnp.where(
            ccrtid >= 0, sample_atlas(atlas, ccrtid, uv)[..., 1], 1.0
        )
    ccr = jnp.maximum(ccr, 0.001)

    mat = MatState(
        albedo=albedo * ss["color"],  # vertex color (pathtrace.glsl:252)
        metallic=metallic,
        roughness=roughness,
        f0=f0,
        alpha=alpha,
        emission=emission,
        transmission=transmission,
        ior=ior,
        unlit=unlit,
        anisotropy=anisotropy,
        ax=ax,
        ay=ay,
        attenuation_color=attenuation_color,
        attenuation_distance=attenuation_distance,
        thinwalled=thinwalled,
        clearcoat=clearcoat,
        clearcoat_roughness=ccr,
        sheen_color=_col(prow, "sheen_color", 3),
        sheen_roughness=_col(prow, "sheen_rough"),
        specular=jnp.full_like(metallic, 0.5),
        specular_tint=jnp.ones_like(metallic),
        subsurface=jnp.zeros_like(metallic),
    )
    return SurfState(
        position=ss["position"],
        normal=normal,
        geom_normal=ss["geom_normal"],
        ffnormal=ffnormal,
        tangent=tangent,
        bitangent=bitangent,
        tex_coord=uv,
        eta=eta,
        mat=mat,
    )
