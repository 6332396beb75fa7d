"""Khronos glTF metallic-roughness BSDF (eval + sample).

Branchless vectorized reimplementation of ``shaders/pbr_gltf.glsl`` —
the lobe structure, ratios and pdf mixing follow the reference exactly
(``PbrEval`` :365-434, ``PbrSample`` :439-554):

* diffuse (Lambert, metallic-scaled), pdf = NdotL/pi x diffuseRatio
* specular GGX (isotropic or anisotropic when ``anisotropy > 0``)
* clearcoat GGX (secondary specular lobe, ratio 1/(1+clearcoat))
* dielectric transmission (simplified: albedo passthrough, the reference's
  active code path at pbr_gltf.glsl:340-361) with Schlick Fresnel
  reflect/refract selection and thin-walled handling

All control flow is ``jnp.where`` masks over the ray batch, so the whole
BSDF is straight-line VPU code under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import rng
from .math import dot, from_local, mix, normalize, reflect, refract
from .sampling import cosine_sample_hemisphere, ggx_sample
from .state import SurfState

M_PI = jnp.pi
_1_PI = 1.0 / jnp.pi


def _sdiv(num, den, eps=1e-9):
    """Sign-preserving safe division (see bsdf_disney._sdiv)."""
    safe = jnp.where(jnp.abs(den) < eps, jnp.where(den < 0, -eps, eps), den)
    return num / safe


def _f_schlick(f0, f90, vdoth):
    return f0 + (f90 - f0) * jnp.power(jnp.clip(1.0 - vdoth, 0.0, 1.0), 5.0)


def _v_ggx(ndotl, ndotv, alpha):
    """Height-correlated Smith visibility (pbr_gltf.glsl:54-67)."""
    a2 = alpha * alpha
    ggxv = ndotl * jnp.sqrt(ndotv * ndotv * (1.0 - a2) + a2)
    ggxl = ndotv * jnp.sqrt(ndotl * ndotl * (1.0 - a2) + a2)
    ggx = ggxv + ggxl
    return jnp.where(ggx > 0.0, 0.5 / jnp.maximum(ggx, 1e-12), 0.0)


def _v_ggx_aniso(ndotl, ndotv, bdotv, tdotv, tdotl, bdotl, at, ab):
    """(pbr_gltf.glsl:71-77)"""
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


def _spec_colors(state: SurfState):
    """f0/f90 from reflectance (pbr_gltf.glsl:411-415)."""
    f0 = state.mat.f0
    reflectance = jnp.max(f0, axis=-1)
    f90 = jnp.clip(reflectance * 50.0, 0.0, 1.0)[..., None] * jnp.ones_like(f0)
    return f0, f90


def _eval_diffuse(state: SurfState, f0, f90, v, n, l, h):
    """(pbr_gltf.glsl:204-220). Returns (f, pdf)."""
    ndotv = dot(n, v)
    ndotl = dot(n, l)
    valid = (ndotl >= 0.0) & (ndotv >= 0.0)
    ndotl_c = jnp.clip(ndotl, 0.001, 1.0)
    pdf = ndotl_c * _1_PI
    f = (1.0 - state.mat.metallic)[..., None] * (state.mat.albedo * _1_PI)
    zero = jnp.zeros_like(f)
    return jnp.where(valid[..., None], f, zero), jnp.where(valid, pdf, 0.0)


def _eval_specular(state: SurfState, f0, f90, v, n, l, h):
    """Isotropic or anisotropic GGX lobe (pbr_gltf.glsl:225-284)."""
    ndotl = dot(n, l)
    valid = ndotl >= 0.0
    ndotl_c = jnp.clip(ndotl, 0.001, 1.0)
    ndotv = jnp.clip(jnp.abs(dot(n, v)), 0.001, 1.0)
    ndoth = jnp.clip(dot(n, h), 0.0, 1.0)
    ldoth = jnp.clip(dot(l, h), 0.0, 1.0)
    vdoth = jnp.clip(dot(v, h), 0.0, 1.0)

    # Isotropic
    pdf_iso = _d_ggx(ndoth, state.mat.roughness) * ndoth / jnp.maximum(4.0 * ldoth, 1e-9)
    f_iso = (
        _f_schlick(f0, f90, vdoth[..., None])
        * _v_ggx(ndotl_c, ndotv, state.mat.roughness)[..., None]
        * _d_ggx(ndoth, jnp.maximum(0.001, state.mat.roughness))[..., None]
    )

    # Anisotropic (pbr_gltf.glsl:225-258)
    t, b = state.tangent, state.bitangent
    tdotv = jnp.clip(dot(t, v), 0.0, 1.0)
    bdotv = jnp.clip(dot(b, v), 0.0, 1.0)
    tdotl = dot(t, l)
    bdotl = dot(b, l)
    tdoth = dot(t, h)
    bdoth = dot(b, h)
    ndoth_u = dot(n, h)
    ldoth_u = dot(l, h)
    aniso = state.mat.anisotropy
    at = jnp.maximum(state.mat.roughness * (1.0 + aniso), 0.001)
    ab = jnp.maximum(state.mat.roughness * (1.0 - aniso), 0.001)
    d_a = _d_ggx_aniso(ndoth_u, tdoth, bdoth, at, ab)
    pdf_a = _sdiv(d_a, 4.0 * ldoth_u)
    # BRDF_specularAnisotropicGGX (pbr_gltf.glsl:151-176) uses Kulla-Conty at/ab
    at2 = jnp.maximum(state.mat.roughness * (1.0 + aniso), 0.00001)
    ab2 = jnp.maximum(state.mat.roughness * (1.0 - aniso), 0.00001)
    f_a = (
        _f_schlick(f0, f90, vdoth[..., None])
        * _v_ggx_aniso(ndotl_c, ndotv, bdotv, tdotv, tdotl, bdotl, at2, ab2)[..., None]
        * _d_ggx_aniso(ndoth_u, tdoth, bdoth, at2, ab2)[..., None]
    )

    use_aniso = aniso > 0.0
    pdf = jnp.where(use_aniso, pdf_a, pdf_iso)
    f = jnp.where(use_aniso[..., None], f_a, f_iso)
    zero = jnp.zeros_like(f)
    return jnp.where(valid[..., None], f, zero), jnp.where(valid, pdf, 0.0)


def _eval_clearcoat(state: SurfState, v, n, l, h):
    """(pbr_gltf.glsl:289-314)"""
    ndotl = dot(n, l)
    valid = ndotl >= 0.0
    ndotl_c = jnp.clip(ndotl, 0.001, 1.0)
    ndotv = jnp.clip(jnp.abs(dot(n, v)), 0.001, 1.0)
    ndoth = dot(n, h)
    vdoth = dot(v, h)
    ldoth = dot(l, h)

    clearcoat = state.mat.clearcoat
    ccf = _f_schlick(jnp.float32(0.04), jnp.float32(1.0), vdoth)
    cca = state.mat.clearcoat_roughness * state.mat.clearcoat_roughness
    g = _v_ggx(ndotl_c, ndotv, cca)
    d = _d_ggx(ndoth, jnp.maximum(0.001, cca))
    pdf = d * ndoth / jnp.maximum(4.0 * ldoth, 1e-9)
    f = (ccf * d * g * clearcoat)[..., None] * jnp.ones(3, jnp.float32)
    zero = jnp.zeros_like(f)
    return jnp.where(valid[..., None], f, zero), jnp.where(valid, pdf, 0.0)


def _eval_dielectric_refraction(state: SurfState, v, n, l, h):
    """Simplified transmission (the reference's live code path,
    pbr_gltf.glsl:340-344): f = albedo, pdf = |NdotL|."""
    pdf = jnp.abs(dot(n, l))
    return state.mat.albedo, pdf


def pbr_eval(state: SurfState, v, n, l):
    """``PbrEval`` (pbr_gltf.glsl:365-434). Returns (f (R,3), pdf (R,))."""
    ndotl = dot(n, l)
    h = jnp.where(
        (ndotl < 0.0)[..., None],
        normalize(l * (1.0 / state.eta)[..., None] + v),
        normalize(l + v),
    )
    h = jnp.where(dot(n, h)[..., None] < 0.0, -h, h)

    diffuse_ratio = 0.5 * (1.0 - state.mat.metallic)
    spec_ratio = 1.0 - diffuse_ratio
    primary_spec_ratio = 1.0 / (1.0 + state.mat.clearcoat)
    trans_weight = (1.0 - state.mat.metallic) * state.mat.transmission

    bsdf, bsdf_pdf = _eval_dielectric_refraction(state, v, n, l, h)

    f0, f90 = _spec_colors(state)
    fd, pd = _eval_diffuse(state, f0, f90, v, n, l, h)
    fc, pc = _eval_clearcoat(state, v, n, l, h)
    fs, ps = _eval_specular(state, f0, f90, v, n, l, h)

    refl_side = ndotl > 0.0
    brdf = jnp.where(refl_side[..., None], fd + fc + fs, 0.0)
    brdf_pdf = jnp.where(
        refl_side,
        pd * diffuse_ratio
        + pc * (1.0 - primary_spec_ratio) * spec_ratio
        + ps * primary_spec_ratio * spec_ratio,
        0.0,
    )

    tw = trans_weight
    pdf = mix(brdf_pdf, bsdf_pdf, tw)
    f = mix(brdf, bsdf, tw[..., None])
    return f, pdf


def pbr_sample(state: SurfState, v, n, seed, combined: bool = False):
    """``PbrSample`` (pbr_gltf.glsl:439-554).

    Returns ``(f (R,3), L (R,3), pdf (R,), seed')``. The RNG consumption
    pattern mirrors the reference: probability, r1, r2, then branch draws —
    every lane consumes the same number of draws (branchless), which keeps
    streams aligned across the wavefront.

    ``combined=False`` reproduces the reference's single-lobe return: f and
    pdf of the CHOSEN lobe only, pdf scaled by the lobe-selection
    probability. That estimator is internally unbiased, but its pdf is a
    different function than ``pbr_eval``'s mixture pdf, so MIS weights
    built from the two don't sum to 1 (measured -13% on an analytic
    furnace). ``combined=True`` (the full_mis path) keeps the identical
    sampled direction and RNG stream but returns ``pbr_eval`` at it — the
    mixture f and pdf — making sampling and evaluation share one pdf
    function (and removing lobe-selection variance).
    """
    m = state.mat
    seed, probability = rng.rand(seed)
    diffuse_ratio = 0.5 * (1.0 - m.metallic)
    spec_ratio = 1.0 - diffuse_ratio
    trans_weight = (1.0 - m.metallic) * m.transmission

    seed, r1 = rng.rand(seed)
    seed, r2 = rng.rand(seed)
    seed, u_trans = rng.rand(seed)       # transmission branch selector
    seed, u_reflect = rng.rand(seed)     # Fresnel reflect/refract selector
    seed, u_lobe = rng.rand(seed)        # primary spec vs clearcoat

    t, b = state.tangent, state.bitangent

    # ---------------- transmission branch (pbr_gltf.glsl:452-498) ----------
    eta = state.eta
    n1 = 1.0
    n2 = m.ior
    r0 = ((n1 - n2) / (n1 + n2)) ** 2
    h_t = from_local(ggx_sample(m.roughness, r1, r2), t, b, n)
    vdoth = dot(v, h_t)
    f_refl = _f_schlick(r0, jnp.ones_like(r0), vdoth)
    discriminant = 1.0 - eta * eta * (1.0 - vdoth * vdoth)

    inside = dot(state.ffnormal, state.normal) < 0.0
    f_refl = jnp.where(m.thinwalled & inside, 0.0, f_refl)
    discriminant = jnp.where(m.thinwalled & inside, 0.0, discriminant)
    eta_t = jnp.where(m.thinwalled, 1.0, eta)

    do_reflect = (discriminant < 0.0) | (u_reflect < f_refl)
    l_refl = normalize(reflect(-v, h_t))
    l_refr = normalize(refract(-v, h_t, eta_t))
    # refract() returns 0 on TIR; the reference also catches NaN -> -V
    bad = jnp.sum(l_refr * l_refr, axis=-1) < 0.5
    l_refr = jnp.where(bad[..., None], -v, l_refr)
    l_trans = jnp.where(do_reflect[..., None], l_refl, l_refr)
    f_trans, pdf_trans = _eval_dielectric_refraction(state, v, n, l_trans, h_t)

    # ---------------- reflection branch (pbr_gltf.glsl:499-551) ------------
    f0, f90 = _spec_colors(state)

    # diffuse sub-branch
    l_diff = from_local(cosine_sample_hemisphere(r1, r2), t, b, n)
    h_diff = normalize(l_diff + v)
    f_d, pdf_d = _eval_diffuse(state, f0, f90, v, n, l_diff, h_diff)
    pdf_d = pdf_d * (1.0 - m.subsurface) * diffuse_ratio

    # specular / clearcoat sub-branch
    primary_spec_ratio = 1.0 / (1.0 + m.clearcoat)
    use_primary = u_lobe < primary_spec_ratio
    rough = jnp.where(use_primary, m.roughness, m.clearcoat_roughness)
    h_s = from_local(ggx_sample(rough, r1, r2), t, b, n)
    l_spec = reflect(-v, h_s)
    f_s, pdf_s = _eval_specular(state, f0, f90, v, n, l_spec, h_s)
    pdf_s = pdf_s * primary_spec_ratio * spec_ratio
    f_c, pdf_c = _eval_clearcoat(state, v, n, l_spec, h_s)
    pdf_c = pdf_c * (1.0 - primary_spec_ratio) * spec_ratio

    f_sc = jnp.where(use_primary[..., None], f_s, f_c)
    pdf_sc = jnp.where(use_primary, pdf_s, pdf_c)
    l_sc = l_spec

    pick_diffuse = probability < diffuse_ratio
    l_brdf = jnp.where(pick_diffuse[..., None], l_diff, l_sc)
    f_brdf = jnp.where(pick_diffuse[..., None], f_d, f_sc)
    pdf_brdf = jnp.where(pick_diffuse, pdf_d, pdf_sc)

    f_brdf = f_brdf * (1.0 - trans_weight)[..., None]
    pdf_brdf = pdf_brdf * (1.0 - trans_weight)

    f_trans_w = f_trans  # transmission keeps full weight in eval...
    pdf_trans_w = pdf_trans
    # ...but the reference does not scale the transmission branch (the
    # weights cancel through the MC estimator); keep parity.

    pick_trans = u_trans < trans_weight
    l_out = jnp.where(pick_trans[..., None], l_trans, l_brdf)
    f_out = jnp.where(pick_trans[..., None], f_trans_w, f_brdf)
    pdf_out = jnp.where(pick_trans, pdf_trans_w, pdf_brdf)
    if combined:
        f_out, pdf_out = pbr_eval(state, v, n, l_out)
    return f_out, l_out, pdf_out, seed
