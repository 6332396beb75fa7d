"""Fused shading stage: one Pallas kernel for everything between the two
traversals of a pooled-wavefront bounce.

The XLA shading stage (``get_shade_state`` + ``resolve_material`` +
NEE eval + ``pbr_sample``) is ~50 ms per 524k-lane bounce on a v5e —
comparable to a whole fused traversal — because every (R, 3) intermediate
and comparator pass materializes to HBM and the stage boundary pays layout
copies (scripts/stagebench.py; docs/PERFORMANCE.md round-4). The math is
pure VPU work: fused next to the unavoidable row gathers it is nearly free,
exactly like the traversal body (ops/traverse_fused.py).

Split of labor:

* **XLA (prologue)**: everything that *gathers* — the merged shade/material
  row (ONE (R, 100) row, integrator/shade.py::build_shade_rows), the four
  hot texture footprint taps (indices depend on the shade row's UV, so the
  uv transform is duplicated host-of-kernel), the environment NEE sample
  and miss radiance (alias + bilinear env rows), the punctual light row,
  and the bounce's 11 RNG draws (u32 chains XLA fuses well; drawing them
  up front keeps per-lane streams bit-identical to the unfused path).
* **Pallas (this kernel)**: the full shade-state reconstruction
  (``shade_state.glsl:63-145``), material resolve
  (``gltf_material.glsl:52-193``), NEE evaluation + MIS
  (``pathtrace.glsl:97-188``), and glTF-PBR BSDF sampling
  (``pbr_gltf.glsl:365-554``) — attr-major, rays on lanes.
* **XLA (epilogue, in integrator/wavefront.py)**: the deferred shadow
  traversal, Russian roulette (its draw follows the shadow ray's in the
  reference stream order), the unit scatter.

Semantics are clause-for-clause those of the XLA path; the parity gate is
``tests/test_shade_fused.py`` (interpret mode executes the same jnp ops).
Supported statically: PBR_GLTF mode, merged shade rows, footprint tap rows,
no transmission/clearcoat textures (rare; those fall back to the XLA path).
Two-level instanced scenes are supported via per-lane transform rows.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.schema import PBR_GLTF
from ..ops import rng
from .shade import _OFFS, _PACK_LANES

M_PI = 3.14159265358979
_SROW_MAT0 = 40  # material row offset inside the merged shade row

# Narrow per-lane inputs ride in ONE (R, _AUXW) array (single wide in-VMEM
# transpose; Mosaic dislikes many non-tile-aligned ones). Offsets:
_AUX = {
    "gxy": 0,     # 8: per-texture bilinear axis weights (gx, gy) x4
    "uv": 8,      # 2: transformed tex uv
    "geo": 10,    # 8: dir3, hit_u, hit_v, hit_t, active, miss
    "orig": 18,   # 3: st.origin
    "lrow": 21,   # 12: ldir3, lcontrib3, ldist, lpdf, use_light, envmiss3
    "state": 33,  # 9: radiance3, throughput3, absorption3
    "draws": 42,  # 6: prob, r1, r2, u_trans, u_reflect, u_lobe
    "irow": 48,   # 24: instance o2w | w2o rows (instanced scenes ONLY —
                  #     single-level scenes stop at 48 lanes; round-4's
                  #     fixed 96-lane aux wrote 24 zero lanes + 24 pad
                  #     lanes of pure HBM tax per bounce)
}


def _auxw(instanced: bool) -> int:
    return _AUX["irow"] + 24 if instanced else _AUX["irow"]


def enabled() -> bool:
    """Fused shading policy: currently OPT-IN (VKRT_FUSED_SHADE=1).

    The kernel compiles and matches the XLA stage numerically, but the
    first TPU measurement came out SLOWER than the XLA stage (1507 vs
    1069 ms/frame on the atrium) — under investigation; default stays
    off until it wins (docs/PERFORMANCE.md round-4)."""
    return os.environ.get("VKRT_FUSED_SHADE", "") == "1"


def supported(cfg, scene, features, is_instanced: bool) -> bool:
    """Static feasibility of the fused path for this scene/config."""
    if not enabled():
        return False
    if cfg.pbr_mode != PBR_GLTF:
        return False  # Disney stays on the XLA stage
    if cfg.use_sun_sky:
        return False  # production bakes the sky (prepare_sun_sky); the
        # fused env prologue assumes the alias-table path
    if features is None or features.transmission_tex or features.clearcoat_tex:
        return False  # cold-texture taps not ported (rare)
    sr = scene.shade_rows
    if sr is None or sr.shape[1] < _SROW_MAT0 + _PACK_LANES:
        return False  # needs the merged shade+material row
    if scene.tap_rows is None and (
        features.base_tex or features.mr_tex or features.normal_tex
        or features.emissive_tex
    ):
        return False
    return True


# ---------------------------------------------------------------------------
# In-kernel vector helpers: vectors are (3, B), scalars (1, B).
# Formulations mirror ops/math.py exactly (divide-by-sqrt, not rsqrt) so the
# interpret-mode parity test sees identical float ops.
# ---------------------------------------------------------------------------

def _vdot(a, b):
    return jnp.sum(a * b, axis=0, keepdims=True)


def _vnormalize(v):
    return v / jnp.sqrt(_vdot(v, v))


def _vcross(a, b):
    ax, ay, az = a[0:1], a[1:2], a[2:3]
    bx, by, bz = b[0:1], b[1:2], b[2:3]
    return jnp.concatenate(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=0
    )


def _mix(a, b, t):
    return a + (b - a) * t


def _pow5(x):
    # f_schlick uses jnp.power(x, 5.0); x**5 by squaring matches ulps on the
    # interpret path closely enough for the 1e-5 parity gate and is cheaper
    # on the VPU than exp/log.
    x2 = x * x
    return x2 * x2 * x


def _srgb(c):
    """pow(max(c,0), 2.2) (ops/math.srgb_to_linear) via exp/log (Mosaic has
    no direct pow); exact at 0 by masking."""
    c = jnp.maximum(c, 0.0)
    out = jnp.exp(2.2 * jnp.log(jnp.maximum(c, 1e-30)))
    return jnp.where(c <= 0.0, 0.0, out)


def _oct_decode3(lo, hi):
    """Octahedral decode of 3 vertices' packed normals: ``lo``/``hi`` are
    (3, B) f32 carrying the u16 halves (integer-exact in f32). Returns
    (x, y, z) each (3, B). Mirrors ops/math.py::oct_decode in i32."""
    x = lo.astype(jnp.int32) - 32767
    y = hi.astype(jnp.int32) - 32767
    maskx = x >> 31
    masky = y >> 31
    tmp0 = 32767 + maskx + masky
    ymask = y ^ masky
    tmp1 = tmp0 - (x ^ maskx)
    z = tmp1 - ymask
    xf = (tmp0 - ymask) ^ maskx
    yf = tmp1 ^ masky
    neg = z < 0
    x = jnp.where(neg, xf, x)
    y = jnp.where(neg, yf, y)
    s = jnp.float32(1.0 / 32768.0)
    return (
        x.astype(jnp.float32) * s,
        y.astype(jnp.float32) * s,
        z.astype(jnp.float32) * s,
    )


def _bary3(w, u, v, a0, a1, a2):
    return w * a0 + u * a1 + v * a2


def _unpack_rgba8_lohi(lo, hi):
    """(lo | hi<<16) RGBA8 -> 4 channels in [0,1]; exact float arithmetic
    (all intermediates < 2^16; no frem — Mosaic lacks it)."""
    g = jnp.floor(lo * (1.0 / 256.0))
    a = jnp.floor(hi * (1.0 / 256.0))
    r = lo - g * 256.0
    b = hi - a * 256.0
    s = jnp.float32(1.0 / 255.0)
    return r * s, g * s, b * s, a * s


def _unpack_texel(c):
    """RGBA8 u32 (as i32 bits) -> (4, B) floats in [0,1]."""
    s = jnp.float32(1.0 / 255.0)
    return jnp.concatenate(
        [
            (c & 0xFF).astype(jnp.float32) * s,
            ((c >> 8) & 0xFF).astype(jnp.float32) * s,
            ((c >> 16) & 0xFF).astype(jnp.float32) * s,
            ((c >> 24) & 0xFF).astype(jnp.float32) * s,
        ],
        axis=0,
    )


def _tap_blend(trow, gx, gy, srgb):
    """Bilinear blend of a gathered footprint row ((4, B) i32: c00 c10 c01
    c11) with precomputed axis weights — the kernel half of
    integrator/shade.py::_tap_footprint."""
    c00 = _unpack_texel(trow[0:1])
    c10 = _unpack_texel(trow[1:2])
    c01 = _unpack_texel(trow[2:3])
    c11 = _unpack_texel(trow[3:4])
    top = c00 + (c10 - c00) * gx
    bot = c01 + (c11 - c01) * gx
    out = top + (bot - top) * gy
    if srgb:
        out = jnp.concatenate([_srgb(out[0:3]), out[3:4]], axis=0)
    return out


def _f_schlick(f0, f90, vdoth):
    return f0 + (f90 - f0) * _pow5(jnp.clip(1.0 - vdoth, 0.0, 1.0))


def _v_ggx(ndotl, ndotv, alpha):
    a2 = alpha * alpha
    ggxv = ndotl * jnp.sqrt(ndotv * ndotv * (1.0 - a2) + a2)
    ggxl = ndotv * jnp.sqrt(ndotl * ndotl * (1.0 - a2) + a2)
    ggx = ggxv + ggxl
    return jnp.where(ggx > 0.0, 0.5 / jnp.maximum(ggx, 1e-12), 0.0)


def _v_ggx_aniso(ndotl, ndotv, bdotv, tdotv, tdotl, bdotl, at, ab):
    ggxv = ndotl * jnp.sqrt((at * tdotv) ** 2 + (ab * bdotv) ** 2 + ndotv**2)
    ggxl = ndotv * jnp.sqrt((at * tdotl) ** 2 + (ab * bdotl) ** 2 + ndotl**2)
    return jnp.clip(0.5 / jnp.maximum(ggxv + ggxl, 1e-12), 0.0, 1.0)


def _d_ggx(ndoth, alpha):
    a2 = alpha * alpha
    f = ndoth * ndoth * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(M_PI * f * f, 1e-12)


def _d_ggx_aniso(ndoth, tdoth, bdoth, at, ab):
    a2 = at * ab
    f2 = (ab * tdoth) ** 2 + (at * bdoth) ** 2 + (a2 * ndoth) ** 2
    w2 = a2 / jnp.maximum(f2, 1e-20)
    return a2 * w2 * w2 / M_PI


def _sdiv(num, den, eps=1e-9):
    safe = jnp.where(jnp.abs(den) < eps, jnp.where(den < 0, -eps, eps), den)
    return num / safe


def _reflect(i, n):
    return i - 2.0 * _vdot(n, i) * n


def _refract(i, n, eta):
    cosi = _vdot(n, i)
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    tir = k < 0.0
    out = eta * i - (eta * cosi + jnp.sqrt(jnp.maximum(k, 0.0))) * n
    return jnp.where(tir, jnp.zeros_like(out), out)


def _from_local(x, y, z, t, b, n):
    return x * t + y * b + z * n


def _offset_ray(p, n):
    """ops/math.py::offset_ray on (3, B) rows (integer-ULP offset)."""
    of_i = (256.0 * n).astype(jnp.int32)
    p_bits = jax.lax.bitcast_convert_type(p, jnp.int32)
    p_i_bits = p_bits + jnp.where(p < 0.0, -of_i, of_i)
    p_i = jax.lax.bitcast_convert_type(p_i_bits, jnp.float32)
    return jnp.where(jnp.abs(p) < (1.0 / 32.0), p + (1.0 / 65536.0) * n, p_i)


class _Mat:
    """Kernel-local resolved material (rows, not pytrees)."""

    __slots__ = (
        "albedo", "metallic", "roughness", "f0", "emission", "transmission",
        "ior", "unlit", "anisotropy", "atten_color", "atten_dist",
        "thinwalled", "clearcoat", "cc_rough",
    )


def _make_kernel(features, full_mis: bool, instanced: bool):
    """Build the bounce-shading kernel. All flags are static."""

    def kern(
        srow_ref,      # (B, 128) f32 merged shade+material row (the TABLE
                       #   is padded to 128 lanes, integrator/shade.py —
                       #   the gather feeds the kernel directly)
        taps_ref,      # (B, 16) i32: 4 textures x (c00 c10 c01 c11)
        aux_ref,       # (B, _auxw) f32: every narrow per-lane input in ONE
                       #   array (single wide in-VMEM transpose instead of
                       #   many non-tile-aligned ones); layout in _AUX
        out_vec_ref,   # (B, 24) f32: new_origin3 new_dir3 radiance3
                       #   throughput3 absorption3 nee3 ldir3(pass) ldist
                       #   rr_pcont pdf_b
        out_msk_ref,   # (B, 8) f32: alive, visible, pad
    ):
        srow = srow_ref[:].T          # (128, B)
        aux = aux_ref[:].T            # (96, B)
        gxy = aux[_AUX["gxy"]:_AUX["gxy"] + 8]
        uv = aux[_AUX["uv"]:_AUX["uv"] + 2]
        geo = aux[_AUX["geo"]:_AUX["geo"] + 8]
        d = geo[0:3]
        hit_u, hit_v = geo[3:4], geo[4:5]
        hit_t = geo[5:6]
        active = geo[6:7] > 0.5
        miss = geo[7:8] > 0.5
        st_origin = aux[_AUX["orig"]:_AUX["orig"] + 3]
        lrow = aux[_AUX["lrow"]:_AUX["lrow"] + 12]
        state = aux[_AUX["state"]:_AUX["state"] + 9]
        radiance = state[0:3]
        throughput = state[3:6]
        absorption = state[6:9]
        draws = aux[_AUX["draws"]:_AUX["draws"] + 6]

        def mrow(name, n=1):
            o = _SROW_MAT0 + _OFFS[name]
            return srow[o:o + n]

        # ---- shade state (shade_state.glsl:63-145) -----------------------
        w_b = 1.0 - hit_u - hit_v
        p0 = srow[0:3]
        p1 = srow[3:6]
        p2 = srow[6:9]
        position = _bary3(w_b, hit_u, hit_v, p0, p1, p2)
        nx, ny, nz = _oct_decode3(srow[9:12], srow[12:15])
        # oct vertices are normalized before interpolation (ops/math.py
        # oct_decode normalizes); fold that in per vertex.
        nlen = jnp.sqrt(nx * nx + ny * ny + nz * nz)
        nx = nx / nlen
        ny = ny / nlen
        nz = nz / nlen
        normal = _vnormalize(
            jnp.concatenate(
                [
                    _bary3(w_b, hit_u, hit_v, nx[0:1], nx[1:2], nx[2:3]),
                    _bary3(w_b, hit_u, hit_v, ny[0:1], ny[1:2], ny[2:3]),
                    _bary3(w_b, hit_u, hit_v, nz[0:1], nz[1:2], nz[2:3]),
                ],
                axis=0,
            )
        )
        geom_normal = _vnormalize(_vcross(p1 - p0, p2 - p0))
        tx, ty, tz = _oct_decode3(srow[15:18], srow[18:21])
        tlen = jnp.sqrt(tx * tx + ty * ty + tz * tz)
        tx, ty, tz = tx / tlen, ty / tlen, tz / tlen
        tangent = _vnormalize(
            jnp.concatenate(
                [
                    _bary3(w_b, hit_u, hit_v, tx[0:1], tx[1:2], tx[2:3]),
                    _bary3(w_b, hit_u, hit_v, ty[0:1], ty[1:2], ty[2:3]),
                    _bary3(w_b, hit_u, hit_v, tz[0:1], tz[1:2], tz[2:3]),
                ],
                axis=0,
            )
        )
        handed = srow[21:22]

        if instanced:
            o2w = aux[_AUX["irow"]:_AUX["irow"] + 12]
            w2o = aux[_AUX["irow"] + 12:_AUX["irow"] + 24]

            def m3v(m, v):
                # (3,4) row-major flat: [i, j] at lane 4i+j
                return jnp.concatenate(
                    [
                        m[4 * i:4 * i + 1] * v[0:1]
                        + m[4 * i + 1:4 * i + 2] * v[1:2]
                        + m[4 * i + 2:4 * i + 3] * v[2:3]
                        for i in (0, 1, 2)
                    ],
                    axis=0,
                )

            position = m3v(o2w, position) + jnp.concatenate(
                [o2w[3:4], o2w[7:8], o2w[11:12]], axis=0
            )

            def m3t_v(m, v):
                # rows transposed: out_j = sum_i m[i, j] * v_i
                return jnp.concatenate(
                    [
                        m[0:1] * v[0:1] + m[4:5] * v[1:2] + m[8:9] * v[2:3],
                        m[1:2] * v[0:1] + m[5:6] * v[1:2] + m[9:10] * v[2:3],
                        m[2:3] * v[0:1] + m[6:7] * v[1:2] + m[10:11] * v[2:3],
                    ],
                    axis=0,
                )

            normal = _vnormalize(m3t_v(w2o, normal))
            geom_normal = _vnormalize(m3t_v(w2o, geom_normal))
            tangent = _vnormalize(m3v(o2w, tangent))

        # Gram-Schmidt + handedness (shade_state.glsl:112-113)
        tangent = _vnormalize(tangent - _vdot(tangent, normal) * normal)
        bitangent = _vcross(normal, tangent) * handed

        # vertex color (rgb)
        cr, cg, cb, _ca = _unpack_rgba8_lohi(srow[28:31], srow[31:34])
        vcol = jnp.concatenate(
            [
                _bary3(w_b, hit_u, hit_v, cr[0:1], cr[1:2], cr[2:3]),
                _bary3(w_b, hit_u, hit_v, cg[0:1], cg[1:2], cg[2:3]),
                _bary3(w_b, hit_u, hit_v, cb[0:1], cb[1:2], cb[2:3]),
            ],
            axis=0,
        )

        # shading normal to the geometric side (shade_state.glsl:139-143)
        flip = _vdot(normal, geom_normal) <= 0.0
        normal = jnp.where(flip, -normal, normal)

        # ---- material resolve (gltf_material.glsl:105-193) ---------------
        taps = taps_ref[:].T           # (16, B) i32
        ffnormal = jnp.where(_vdot(normal, d) <= 0.0, normal, -normal)

        ones4 = jnp.ones((4, uv.shape[1]), jnp.float32)
        tap_i = {"base": 0, "mr": 1, "normal": 2, "emissive": 3}

        def tap(name, srgb=False):
            i = tap_i[name]
            out = _tap_blend(
                taps[4 * i:4 * i + 4], gxy[2 * i:2 * i + 1],
                gxy[2 * i + 1:2 * i + 2], srgb,
            )
            tid = mrow(f"{name}_tex")
            return jnp.where(tid < 0.0, jnp.ones_like(out), out)

        if features.normal_tex:
            nscale = mrow("normal_scale")
            nval = tap("normal")[0:3]
            nvec = _vnormalize(nval * 2.0 - 1.0)
            sc = jnp.concatenate(
                [nscale, nscale, jnp.ones_like(nscale)], axis=0
            )
            nvec = nvec * sc
            mapped = _vnormalize(
                nvec[0:1] * tangent + nvec[1:2] * bitangent
                + nvec[2:3] * normal
            )
            has_nmap = mrow("normal_tex") >= 0.0
            normal = jnp.where(has_nmap, mapped, normal)
            ffnormal = jnp.where(_vdot(normal, d) <= 0.0, normal, -normal)
            # make_coordinate_system(ffnormal) (common.glsl:80-92)
            fx, fy, fz = ffnormal[0:1], ffnormal[1:2], ffnormal[2:3]
            big_z = jnp.abs(fz) > 0.99999
            t2 = jnp.where(
                big_z,
                jnp.concatenate([-fx * fy, 1.0 - fy * fy, -fy * fz], axis=0),
                jnp.concatenate([-fx * fz, -fy * fz, 1.0 - fz * fz], axis=0),
            )
            t2 = _vnormalize(t2)
            b2 = _vcross(t2, ffnormal)
            tangent = jnp.where(has_nmap, t2, tangent)
            bitangent = jnp.where(has_nmap, b2, bitangent)

        emission = mrow("emissive_factor", 3)
        if features.emissive_tex:
            emission = emission * tap("emissive", srgb=True)[0:3]

        ior = mrow("ior")
        dielectric_spec = ((ior - 1.0) / (ior + 1.0)) ** 2
        mr = tap("mr") if features.mr_tex else ones4
        roughness = mr[1:2] * mrow("rough_f")
        metallic = mr[2:3] * mrow("metal_f")
        base = mrow("base_factor", 4) * (
            tap("base", srgb=True) if features.base_tex else ones4
        )
        f0 = dielectric_spec * (1.0 - metallic) + base[0:3] * metallic
        albedo = base[0:3] * vcol        # vertex color (pathtrace.glsl:252)
        roughness = jnp.maximum(roughness, 0.001)
        transmission = mrow("transmission_f")
        eta = jnp.where(_vdot(normal, ffnormal) > 0.0, 1.0 / ior, ior)
        unlit = mrow("unlit") == 1.0

        anisotropy = mrow("aniso")
        if features.anisotropy:
            adir = mrow("aniso_dir", 3)
            t_rot = _vnormalize(
                adir[0:1] * tangent + adir[1:2] * bitangent
                + adir[2:3] * normal
            )
            b_rot = _vnormalize(_vcross(normal, t_rot))
            has_aniso = anisotropy > 0.0
            tangent = jnp.where(has_aniso, t_rot, tangent)
            bitangent = jnp.where(has_aniso, b_rot, bitangent)

        atten_color = mrow("atten_color", 3)
        atten_dist = mrow("atten_dist")
        thinwalled = mrow("thickness") == 0.0
        clearcoat = mrow("cc_f")
        cc_rough = jnp.maximum(mrow("cc_rough"), 0.001)
        sheen = 0.0  # glTF eval path has no sheen lobe (pbr_gltf.glsl)
        del sheen

        m = _Mat()
        m.albedo = albedo
        m.metallic = metallic
        m.roughness = roughness
        m.f0 = f0
        m.emission = emission
        m.transmission = transmission
        m.ior = ior
        m.unlit = unlit
        m.anisotropy = anisotropy
        m.atten_color = atten_color
        m.atten_dist = atten_dist
        m.thinwalled = thinwalled
        m.clearcoat = clearcoat
        m.cc_rough = cc_rough

        # ---- integrator clauses (pathtrace.glsl:258-296) ------------------
        alive = active & jnp.logical_not(miss)
        unlit_l = alive & m.unlit
        radiance = radiance + jnp.where(unlit_l, m.albedo * throughput, 0.0)
        alive = alive & jnp.logical_not(unlit_l)

        exiting = _vdot(normal, ffnormal) > 0.0
        absorption = jnp.where(exiting, 0.0, absorption)
        radiance = radiance + jnp.where(alive, m.emission * throughput, 0.0)
        throughput = throughput * jnp.where(
            alive,
            jnp.exp(-absorption * jnp.minimum(hit_t, 1e30)),
            1.0,
        )

        # ---- NEE eval (pathtrace.glsl:97-188) ------------------------------
        v = -d
        ldir = lrow[0:3]
        lcontrib = lrow[3:6]
        ldist = lrow[6:7]
        lpdf = lrow[7:8]
        use_light = lrow[8:9] > 0.5
        envmiss = lrow[9:12]

        f_l, pdf_l = _pbr_eval_rows(
            features, m, v, ffnormal, ldir, tangent, bitangent, eta, normal
        )
        t2mis = lpdf * lpdf
        ph = t2mis / (pdf_l * pdf_l + t2mis)
        mis = jnp.where(use_light, 1.0, jnp.maximum(0.0, ph))
        nee = (
            mis * f_l * jnp.abs(_vdot(ldir, ffnormal)) * lcontrib
            / jnp.maximum(lpdf, 1e-9)
        )
        visible = alive & (_vdot(ldir, ffnormal) > 0.0)
        nee = nee * throughput

        # env-miss radiance (weighted in the XLA prologue)
        radiance = radiance + jnp.where(miss, envmiss * throughput, 0.0)

        # ---- BSDF sample (pbr_gltf.glsl:439-554) ---------------------------
        f_b, l_b, pdf_b = _pbr_sample_rows(
            features, full_mis, m, v, ffnormal, normal, tangent, bitangent,
            eta, draws,
        )

        entering = _vdot(ffnormal, l_b) < 0.0
        new_abs = -jnp.log(jnp.clip(m.atten_color, 1e-6, 1.0)) / jnp.maximum(
            m.atten_dist, 1e-9
        )
        absorption = jnp.where(alive & entering, new_abs, absorption)

        pdf_ok = pdf_b > 0.0
        throughput = jnp.where(
            alive & pdf_ok,
            throughput * f_b * jnp.abs(_vdot(ffnormal, l_b))
            / jnp.maximum(pdf_b, 1e-20),
            throughput,
        )
        alive = alive & pdf_ok

        # Russian-roulette continuation probability (pathtrace.glsl:309-314);
        # the depth gate and the kill draw stay in XLA (stream order: the
        # shadow ray's alpha draws come first).
        max_thr = jnp.max(throughput, axis=0, keepdims=True)
        rr_pcont = jnp.minimum(max_thr * eta * eta + 0.001, 0.95)

        going_out = _vdot(l_b, ffnormal) > 0.0
        off_n = jnp.where(going_out, ffnormal, -ffnormal)
        new_origin = _offset_ray(position, off_n)
        new_origin = jnp.where(alive, new_origin, st_origin)
        new_dir = jnp.where(alive, l_b, d)

        out_vec = jnp.concatenate(
            [
                new_origin, new_dir, radiance, throughput, absorption, nee,
                ldir, ldist, rr_pcont, pdf_b,
            ],
            axis=0,
        )
        out_vec_ref[:] = out_vec.T
        msk = jnp.concatenate(
            [
                alive.astype(jnp.float32),
                visible.astype(jnp.float32),
                jnp.zeros((6, hit_t.shape[1]), jnp.float32),
            ],
            axis=0,
        )
        out_msk_ref[:] = msk.T

    return kern


def _pbr_eval_rows(features, m, v, n, l, tangent, bitangent, eta, normal):
    """``PbrEval`` (pbr_gltf.glsl:365-434) on (k, B) rows — the kernel-side
    twin of ops/bsdf_gltf.py::pbr_eval."""
    ndotl = _vdot(n, l)
    h = jnp.where(
        ndotl < 0.0,
        _vnormalize(l * (1.0 / eta) + v),
        _vnormalize(l + v),
    )
    h = jnp.where(_vdot(n, h) < 0.0, -h, h)

    diffuse_ratio = 0.5 * (1.0 - m.metallic)
    spec_ratio = 1.0 - diffuse_ratio
    primary_spec_ratio = 1.0 / (1.0 + m.clearcoat)
    trans_weight = (1.0 - m.metallic) * m.transmission

    # dielectric refraction (simplified; pbr_gltf.glsl:340-344)
    bsdf = m.albedo
    bsdf_pdf = jnp.abs(ndotl)

    f0 = m.f0
    reflectance = jnp.max(f0, axis=0, keepdims=True)
    f90 = jnp.clip(reflectance * 50.0, 0.0, 1.0)

    # diffuse (pbr_gltf.glsl:204-220)
    ndotv_r = _vdot(n, v)
    valid_d = (ndotl >= 0.0) & (ndotv_r >= 0.0)
    ndotl_c = jnp.clip(ndotl, 0.001, 1.0)
    pd = jnp.where(valid_d, ndotl_c * (1.0 / M_PI), 0.0)
    fd = jnp.where(
        valid_d, (1.0 - m.metallic) * (m.albedo * (1.0 / M_PI)), 0.0
    )

    # clearcoat (pbr_gltf.glsl:289-314)
    valid_c = ndotl >= 0.0
    ndotv = jnp.clip(jnp.abs(_vdot(n, v)), 0.001, 1.0)
    ndoth_u = _vdot(n, h)
    vdoth_u = _vdot(v, h)
    ldoth_u = _vdot(l, h)
    ccf = _f_schlick(jnp.float32(0.04), jnp.float32(1.0), vdoth_u)
    cca = m.cc_rough * m.cc_rough
    g_c = _v_ggx(ndotl_c, ndotv, cca)
    d_c = _d_ggx(ndoth_u, jnp.maximum(0.001, cca))
    pc = jnp.where(
        valid_c, d_c * ndoth_u / jnp.maximum(4.0 * ldoth_u, 1e-9), 0.0
    )
    fc = jnp.where(valid_c, ccf * d_c * g_c * m.clearcoat, 0.0)

    # specular (pbr_gltf.glsl:225-284)
    ndoth = jnp.clip(ndoth_u, 0.0, 1.0)
    ldoth = jnp.clip(ldoth_u, 0.0, 1.0)
    vdoth = jnp.clip(vdoth_u, 0.0, 1.0)
    pdf_iso = _d_ggx(ndoth, m.roughness) * ndoth / jnp.maximum(
        4.0 * ldoth, 1e-9
    )
    f_iso = (
        _f_schlick(f0, f90, vdoth)
        * _v_ggx(ndotl_c, ndotv, m.roughness)
        * _d_ggx(ndoth, jnp.maximum(0.001, m.roughness))
    )
    if features.anisotropy:
        tdotv = jnp.clip(_vdot(tangent, v), 0.0, 1.0)
        bdotv = jnp.clip(_vdot(bitangent, v), 0.0, 1.0)
        tdotl = _vdot(tangent, l)
        bdotl = _vdot(bitangent, l)
        tdoth = _vdot(tangent, h)
        bdoth = _vdot(bitangent, h)
        aniso = m.anisotropy
        at = jnp.maximum(m.roughness * (1.0 + aniso), 0.001)
        ab = jnp.maximum(m.roughness * (1.0 - aniso), 0.001)
        d_a = _d_ggx_aniso(ndoth_u, tdoth, bdoth, at, ab)
        pdf_a = _sdiv(d_a, 4.0 * ldoth_u)
        at2 = jnp.maximum(m.roughness * (1.0 + aniso), 0.00001)
        ab2 = jnp.maximum(m.roughness * (1.0 - aniso), 0.00001)
        f_a = (
            _f_schlick(f0, f90, vdoth)
            * _v_ggx_aniso(ndotl_c, ndotv, bdotv, tdotv, tdotl, bdotl,
                           at2, ab2)
            * _d_ggx_aniso(ndoth_u, tdoth, bdoth, at2, ab2)
        )
        use_a = aniso > 0.0
        ps_u = jnp.where(use_a, pdf_a, pdf_iso)
        fs_u = jnp.where(use_a, f_a, f_iso)
    else:
        ps_u, fs_u = pdf_iso, f_iso
    valid_s = ndotl >= 0.0
    ps = jnp.where(valid_s, ps_u, 0.0)
    fs = jnp.where(valid_s, fs_u, 0.0)

    refl_side = ndotl > 0.0
    brdf = jnp.where(refl_side, fd + fc + fs, 0.0)
    brdf_pdf = jnp.where(
        refl_side,
        pd * diffuse_ratio
        + pc * (1.0 - primary_spec_ratio) * spec_ratio
        + ps * primary_spec_ratio * spec_ratio,
        0.0,
    )
    pdf = _mix(brdf_pdf, bsdf_pdf, trans_weight)
    f = _mix(brdf, bsdf, trans_weight)
    return f, pdf


def _pbr_sample_rows(features, full_mis, m, v, n, normal, tangent, bitangent,
                     eta, draws):
    """``PbrSample`` (pbr_gltf.glsl:439-554) on rows — twin of
    ops/bsdf_gltf.py::pbr_sample (draws precomputed by the XLA prologue)."""
    probability = draws[0:1]
    r1 = draws[1:2]
    r2 = draws[2:3]
    u_trans = draws[3:4]
    u_reflect = draws[4:5]
    u_lobe = draws[5:6]

    diffuse_ratio = 0.5 * (1.0 - m.metallic)
    trans_weight = (1.0 - m.metallic) * m.transmission

    # ggx_sample(roughness, r1, r2) in tangent space (ops/sampling.py)
    def ggx_dir(alpha):
        a = jnp.maximum(0.001, alpha)
        phi = r1 * (2.0 * M_PI)
        cos_t = jnp.sqrt((1.0 - r2) / (1.0 + (a * a - 1.0) * r2))
        sin_t = jnp.clip(jnp.sqrt(1.0 - cos_t * cos_t), 0.0, 1.0)
        return _from_local(
            sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t,
            tangent, bitangent, n,
        )

    # transmission branch (pbr_gltf.glsl:452-498)
    n2 = m.ior
    r0 = ((1.0 - n2) / (1.0 + n2)) ** 2
    h_t = ggx_dir(m.roughness)
    vdoth = _vdot(v, h_t)
    f_refl = _f_schlick(r0, jnp.ones_like(r0), vdoth)
    discriminant = 1.0 - eta * eta * (1.0 - vdoth * vdoth)
    inside = _vdot(n, normal) < 0.0  # ffnormal vs normal
    f_refl = jnp.where(m.thinwalled & inside, 0.0, f_refl)
    discriminant = jnp.where(m.thinwalled & inside, 0.0, discriminant)
    eta_t = jnp.where(m.thinwalled, 1.0, eta)
    do_reflect = (discriminant < 0.0) | (u_reflect < f_refl)
    l_refl = _vnormalize(_reflect(-v, h_t))
    l_refr = _vnormalize(_refract(-v, h_t, eta_t))
    bad = _vdot(l_refr, l_refr) < 0.5
    l_refr = jnp.where(bad, -v, l_refr)
    l_trans = jnp.where(do_reflect, l_refl, l_refr)
    f_trans = m.albedo
    pdf_trans = jnp.abs(_vdot(n, l_trans))

    # diffuse sub-branch: cosine hemisphere (ops/sampling.py)
    rs = jnp.sqrt(r1)
    phi_d = (2.0 * M_PI) * r2
    dx = rs * jnp.cos(phi_d)
    dy = rs * jnp.sin(phi_d)
    dz = jnp.sqrt(jnp.maximum(0.0, 1.0 - dx * dx - dy * dy))
    l_diff = _from_local(dx, dy, dz, tangent, bitangent, n)
    ndotl_d = _vdot(n, l_diff)
    valid_d = (ndotl_d >= 0.0) & (_vdot(n, v) >= 0.0)
    pdf_d = jnp.where(valid_d, jnp.clip(ndotl_d, 0.001, 1.0) * (1.0 / M_PI), 0.0)
    f_d = jnp.where(
        valid_d, (1.0 - m.metallic) * (m.albedo * (1.0 / M_PI)), 0.0
    )
    pdf_d = pdf_d * (1.0 - 0.0) * diffuse_ratio  # subsurface = 0 in glTF

    # specular / clearcoat sub-branch
    primary_spec_ratio = 1.0 / (1.0 + m.clearcoat)
    spec_ratio = 1.0 - diffuse_ratio
    use_primary = u_lobe < primary_spec_ratio
    rough_s = jnp.where(use_primary, m.roughness, m.cc_rough)
    h_s = ggx_dir(rough_s)
    l_spec = _reflect(-v, h_s)

    # eval specular at (l_spec, h_s)
    ndotl_s = _vdot(n, l_spec)
    valid_s = ndotl_s >= 0.0
    ndotl_c = jnp.clip(ndotl_s, 0.001, 1.0)
    ndotv = jnp.clip(jnp.abs(_vdot(n, v)), 0.001, 1.0)
    ndoth_u = _vdot(n, h_s)
    ldoth_u = _vdot(l_spec, h_s)
    vdoth_u = _vdot(v, h_s)
    ndoth = jnp.clip(ndoth_u, 0.0, 1.0)
    ldoth = jnp.clip(ldoth_u, 0.0, 1.0)
    vdoth_c = jnp.clip(vdoth_u, 0.0, 1.0)
    f0 = m.f0
    f90 = jnp.clip(jnp.max(f0, axis=0, keepdims=True) * 50.0, 0.0, 1.0)
    pdf_iso = _d_ggx(ndoth, m.roughness) * ndoth / jnp.maximum(4.0 * ldoth, 1e-9)
    f_iso = (
        _f_schlick(f0, f90, vdoth_c)
        * _v_ggx(ndotl_c, ndotv, m.roughness)
        * _d_ggx(ndoth, jnp.maximum(0.001, m.roughness))
    )
    if features.anisotropy:
        tdotv = jnp.clip(_vdot(tangent, v), 0.0, 1.0)
        bdotv = jnp.clip(_vdot(bitangent, v), 0.0, 1.0)
        tdotl = _vdot(tangent, l_spec)
        bdotl = _vdot(bitangent, l_spec)
        tdoth = _vdot(tangent, h_s)
        bdoth = _vdot(bitangent, h_s)
        aniso = m.anisotropy
        at = jnp.maximum(m.roughness * (1.0 + aniso), 0.001)
        ab = jnp.maximum(m.roughness * (1.0 - aniso), 0.001)
        d_a = _d_ggx_aniso(ndoth_u, tdoth, bdoth, at, ab)
        pdf_a = _sdiv(d_a, 4.0 * ldoth_u)
        at2 = jnp.maximum(m.roughness * (1.0 + aniso), 0.00001)
        ab2 = jnp.maximum(m.roughness * (1.0 - aniso), 0.00001)
        f_a = (
            _f_schlick(f0, f90, vdoth_c)
            * _v_ggx_aniso(ndotl_c, ndotv, bdotv, tdotv, tdotl, bdotl,
                           at2, ab2)
            * _d_ggx_aniso(ndoth_u, tdoth, bdoth, at2, ab2)
        )
        use_a = aniso > 0.0
        pdf_su = jnp.where(use_a, pdf_a, pdf_iso)
        f_su = jnp.where(use_a, f_a, f_iso)
    else:
        pdf_su, f_su = pdf_iso, f_iso
    pdf_s = jnp.where(valid_s, pdf_su, 0.0) * primary_spec_ratio * spec_ratio
    f_s = jnp.where(valid_s, f_su, 0.0)

    # clearcoat eval at (l_spec, h_s)
    ccf = _f_schlick(jnp.float32(0.04), jnp.float32(1.0), vdoth_u)
    cca = m.cc_rough * m.cc_rough
    g_c = _v_ggx(ndotl_c, ndotv, cca)
    d_c = _d_ggx(ndoth_u, jnp.maximum(0.001, cca))
    pdf_c = jnp.where(
        valid_s, d_c * ndoth_u / jnp.maximum(4.0 * ldoth_u, 1e-9), 0.0
    ) * (1.0 - primary_spec_ratio) * spec_ratio
    f_c = jnp.where(valid_s, ccf * d_c * g_c * m.clearcoat, 0.0)

    f_sc = jnp.where(use_primary, f_s, f_c)
    pdf_sc = jnp.where(use_primary, pdf_s, pdf_c)

    pick_diffuse = probability < diffuse_ratio
    l_brdf = jnp.where(pick_diffuse, l_diff, l_spec)
    f_brdf = jnp.where(pick_diffuse, f_d, f_sc) * (1.0 - trans_weight)
    pdf_brdf = jnp.where(pick_diffuse, pdf_d, pdf_sc) * (1.0 - trans_weight)

    pick_trans = u_trans < trans_weight
    l_out = jnp.where(pick_trans, l_trans, l_brdf)
    f_out = jnp.where(pick_trans, f_trans, f_brdf)
    pdf_out = jnp.where(pick_trans, pdf_trans, pdf_brdf)
    if full_mis:
        f_out, pdf_out = _pbr_eval_rows(
            features, m, v, n, l_out, tangent, bitangent, eta, normal
        )
    return f_out, l_out, pdf_out


# ---------------------------------------------------------------------------
# XLA prologue + pallas_call wrapper
# ---------------------------------------------------------------------------

_BLK = 2048


def _interpret_mode() -> bool:
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:
        return True


def _tex_index_weights(srow, name, uv, tap_rows, atlas_w, n_rows, lod=None):
    """The index half of integrator/shade.py::_tap_footprint: per-lane base
    texel + axis weights from the material placement lanes. With ``lod``,
    nearest-mip placement rides the same lanes (shade.py::_mip_lanes) —
    level selection is pure XLA index math, the kernel is unchanged."""
    from .shade import _axis_base, _mip_lanes

    o = _SROW_MAT0 + _OFFS[f"{name}_tex"]
    if lod is not None:
        prow = srow[:, _SROW_MAT0:_SROW_MAT0 + _PACK_LANES]
        ox, oy, w, h = _mip_lanes(prow, _OFFS[f"{name}_tex"], lod)
    else:
        ox = srow[:, o + 1].astype(jnp.int32)
        oy = srow[:, o + 2].astype(jnp.int32)
        w = jnp.maximum(srow[:, o + 3].astype(jnp.int32), 1)
        h = jnp.maximum(srow[:, o + 4].astype(jnp.int32), 1)
    wrap = srow[:, o + 5].astype(jnp.int32)
    ws, wt = wrap // 3, wrap % 3
    px = uv[:, 0] * w.astype(jnp.float32) - 0.5
    py = uv[:, 1] * h.astype(jnp.float32) - 0.5
    bx, gx = _axis_base(px, w, ws)
    by, gy = _axis_base(py, h, wt)
    flat = jnp.clip((oy + by) * atlas_w + (ox + bx), 0, n_rows - 1)
    return flat, gx, gy


def shade_bounce_fused(
    scene,
    features,
    full_mis: bool,
    p_select_light: float,
    hdr_mult,
    hit,
    st_origin,
    st_direction,
    seed,
    active,
    radiance,
    throughput,
    absorption,
    bsdf_pdf,
    instances=None,
    sun_disk: bool = False,
    mip=None,  # (pixel_spread, tdist-including-this-hit) for ray-cone mip
               # LOD; None = sample the base level (LOD selection is pure
               # XLA index math feeding the tap gathers — kernel unchanged)
):
    """Run the fused shading stage for one pooled bounce.

    Returns a dict with: radiance, throughput, absorption, alive, visible,
    nee, light_dir, light_dist, new_origin, new_dir, rr_pcont, pdf_b, seed,
    miss — the epilogue inputs of integrator/wavefront.py::bounce.
    """
    r = st_direction.shape[0]
    miss = active & (hit.tri < 0)
    instanced = instances is not None
    if instanced:
        ii = jnp.maximum(hit.inst, 0)
        o2w = instances.object_to_world[ii]               # (R, 3, 4)
        w2o = instances.world_to_object[ii]

    # ---- RNG draws, reference order (pathtrace.glsl DirectLight+Sample) ---
    seed, u_sel = rng.rand(seed)
    seed, u_li = rng.rand(seed)
    if sun_disk:
        # env_sample's mixture-selection draw precedes xi (ops/env.py).
        seed, u_mix = rng.rand(seed)
    seed, xi = rng.rand3(seed)
    seed, probability = rng.rand(seed)
    seed, r1 = rng.rand(seed)
    seed, r2 = rng.rand(seed)
    seed, u_trans = rng.rand(seed)
    seed, u_reflect = rng.rand(seed)
    seed, u_lobe = rng.rand(seed)

    # ---- gathers ----------------------------------------------------------
    trc = jnp.maximum(hit.tri, 0)
    srow = scene.shade_rows[trc]                       # (R, 100): THE gather

    # uv transform (duplicated from the kernel: tap indices need it)
    wb = 1.0 - hit.u - hit.v
    uv3 = srow[:, 22:28].reshape(-1, 3, 2)
    uv_raw = (
        wb[:, None] * uv3[:, 0] + hit.u[:, None] * uv3[:, 1]
        + hit.v[:, None] * uv3[:, 2]
    )
    o_uvt = _SROW_MAT0 + _OFFS["uvT"]
    uvt = srow[:, o_uvt:o_uvt + 6]
    su, sv = uv_raw[:, 0], uv_raw[:, 1]
    uv = jnp.stack(
        [
            su * uvt[:, 0] + sv * uvt[:, 2] + uvt[:, 4],
            su * uvt[:, 1] + sv * uvt[:, 3] + uvt[:, 5],
        ],
        axis=-1,
    )

    # Ray-cone mip level (integrator/path.py::cone_lod semantics): the
    # texture-independent footprint log, computed from the already-gathered
    # shade row; _mip_lanes adds the per-texture terms.
    lod = None
    if mip is not None:
        spread, tdist = mip
        p3 = srow[:, 0:9].reshape(-1, 3, 3)
        e1 = p3[:, 1] - p3[:, 0]
        e2 = p3[:, 2] - p3[:, 0]
        if instanced:
            m3w = o2w[:, :, :3]
            e1 = jnp.einsum("rij,rj->ri", m3w, e1)
            e2 = jnp.einsum("rij,rj->ri", m3w, e2)
        area_w = jnp.linalg.norm(jnp.cross(e1, e2), axis=-1)
        uvt3 = srow[:, 22:28].reshape(-1, 3, 2)
        u1 = uvt3[:, 1] - uvt3[:, 0]
        u2 = uvt3[:, 2] - uvt3[:, 0]
        area_uv = jnp.abs(u1[:, 0] * u2[:, 1] - u1[:, 1] * u2[:, 0])
        uv_density = 0.5 * jnp.log2(
            jnp.maximum(area_uv, 1e-20) / jnp.maximum(area_w, 1e-20)
        )
        lod = uv_density + jnp.log2(jnp.maximum(spread * tdist, 1e-20))

    atlas_w = scene.atlas.data.shape[1]
    tap_rows = scene.tap_rows
    n_tap = tap_rows.shape[0] if tap_rows is not None else 1
    taps = []
    gxy = []
    for name, on in (
        ("base", features.base_tex),
        ("mr", features.mr_tex),
        ("normal", features.normal_tex),
        ("emissive", features.emissive_tex),
    ):
        if on:
            flat, gx, gy = _tex_index_weights(
                srow, name, uv, tap_rows, atlas_w, n_tap, lod=lod
            )
            taps.append(
                jax.lax.bitcast_convert_type(tap_rows[flat], jnp.int32)
            )
            gxy += [gx, gy]
        else:
            taps.append(jnp.zeros((r, 4), jnp.int32))
            gxy += [jnp.zeros((r,), jnp.float32)] * 2
    taps = jnp.concatenate(taps, axis=1)               # (R, 16)
    gxy = jnp.stack(gxy, axis=-1)                      # (R, 8)

    # ---- light + env NEE sample (XLA: data-dependent gathers) -------------
    from ..ops.env import env_radiance, env_sample
    from ..ops.lights import sample_light
    from .path import env_bsdf_mis_weight, nee_strategy_pdf

    use_light = (scene.n_lights > 0) & (u_sel <= p_select_light)
    n_l = jnp.maximum(scene.n_lights, 1)
    light_index = jnp.minimum(
        (u_li * n_l.astype(jnp.float32)).astype(jnp.int32), n_l - 1
    )
    l_int, l_dir, l_dist = _positioned_light(
        scene, light_index, srow, hit, instances
    )
    # env_sample consumes xi (already drawn; use_sun_sky is False on the
    # production path — prepare_sun_sky bakes the sky into env).
    if sun_disk:
        e_rad, e_dir, e_pdf = _env_sample_mixture(
            scene.env, scene.sun_sky, u_mix, xi
        )
    else:
        e_rad, e_dir, e_pdf = _env_sample_xi(scene.env, xi)
    e_rad = e_rad * hdr_mult
    light_contrib = jnp.where(use_light[..., None], l_int, e_rad)
    light_dir = jnp.where(use_light[..., None], l_dir, e_dir)
    light_dist = jnp.where(use_light, l_dist, 1e32)
    light_pdf = nee_strategy_pdf(full_mis, scene, use_light, e_pdf, p_select_light)

    env = env_radiance(
        scene.env, scene.sun_sky, False, hdr_mult, st_direction,
        sun_disk=sun_disk,
    )
    if full_mis:
        w_env = env_bsdf_mis_weight(
            scene, bsdf_pdf, st_direction, p_select_light, sun_disk=sun_disk
        )
        env = env * w_env[..., None]

    aux_parts = [
        gxy,                                            # 8
        uv,                                             # 2
        st_direction,                                   # geo: 8
        hit.u[:, None], hit.v[:, None], hit.t[:, None],
        active.astype(jnp.float32)[:, None],
        miss.astype(jnp.float32)[:, None],
        st_origin,                                      # 3
        light_dir, light_contrib,                       # lrow: 12
        light_dist[:, None], light_pdf[:, None],
        use_light.astype(jnp.float32)[:, None], env,
        radiance, throughput, absorption,               # state: 9
        jnp.stack([probability, r1, r2, u_trans, u_reflect, u_lobe],
                  axis=-1),                             # draws: 6
    ]
    if instanced:
        aux_parts += [o2w.reshape(r, 12), w2o.reshape(r, 12)]
    aux = jnp.concatenate(aux_parts, axis=1)            # (R, _auxw)
    assert aux.shape[1] == _auxw(instanced), aux.shape

    # The merged shade-row TABLE is 128-lane padded (integrator/shade.py),
    # so the gather feeds the kernel directly — no per-bounce (R, 128) pad.
    assert srow.shape[1] == 128, srow.shape

    # pad rays to block multiple
    rp = max(_BLK, (r + _BLK - 1) // _BLK * _BLK)

    def pad(a):
        if a.shape[0] == rp:
            return a
        return jnp.pad(a, ((0, rp - a.shape[0]), (0, 0)))

    kern = _make_kernel(features, full_mis, instanced)

    def rm(k):
        return pl.BlockSpec((_BLK, k), lambda i: (i, 0), memory_space=pltpu.VMEM)

    out_vec, out_msk = pl.pallas_call(
        kern,
        grid=(rp // _BLK,),
        in_specs=[rm(128), rm(16), rm(_auxw(instanced))],
        out_specs=[rm(24), rm(8)],
        out_shape=[
            jax.ShapeDtypeStruct((rp, 24), jnp.float32),
            jax.ShapeDtypeStruct((rp, 8), jnp.float32),
        ],
        interpret=_interpret_mode(),
    )(pad(srow), pad(taps), pad(aux))
    out_vec = out_vec[:r]
    out_msk = out_msk[:r]

    return dict(
        new_origin=out_vec[:, 0:3],
        new_dir=out_vec[:, 3:6],
        radiance=out_vec[:, 6:9],
        throughput=out_vec[:, 9:12],
        absorption=out_vec[:, 12:15],
        nee=out_vec[:, 15:18],
        light_dir=out_vec[:, 18:21],
        light_dist=out_vec[:, 21],
        rr_pcont=out_vec[:, 22],
        pdf_b=out_vec[:, 23],
        alive=out_msk[:, 0] > 0.5,
        visible=out_msk[:, 1] > 0.5,
        seed=seed,
        miss=miss,
    )


def _positioned_light(scene, light_index, srow, hit, instances):
    """sample_light needs the hit position; recompute it cheaply in XLA
    (9 lanes of the already-gathered shade row)."""
    from ..ops.lights import sample_light

    wb = 1.0 - hit.u - hit.v
    p = srow[:, 0:9].reshape(-1, 3, 3)
    position = (
        wb[:, None] * p[:, 0] + hit.u[:, None] * p[:, 1]
        + hit.v[:, None] * p[:, 2]
    )
    if instances is not None:
        ii = jnp.maximum(hit.inst, 0)
        o2w = instances.object_to_world[ii]
        position = (
            jnp.einsum("rij,rj->ri", o2w[:, :, :3], position) + o2w[:, :, 3]
        )
    return sample_light(scene.lights, light_index, position)


def _env_sample_xi(env, xi):
    """ops/env.py::environment_sample with the variates already drawn."""
    from ..ops.env import environment_sample

    return environment_sample(env, xi)


def _env_sample_mixture(env, sun_sky, u_mix, xi):
    """ops/env.py::sample_env_mixture (pre-drawn variates: u_mix then xi)."""
    from ..ops.env import sample_env_mixture

    return sample_env_mixture(env, sun_sky, u_mix, xi)
