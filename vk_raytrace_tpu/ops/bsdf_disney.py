"""Disney 2015 principled BSDF (eval + sample).

Branchless vectorized reimplementation of the reference's Disney path
(``shaders/pbr_disney.glsl``, itself derived from Asif Ali's MIT-licensed
GLSL path tracer). Lobes and probability tree (``DisneySample`` :414-520,
``DisneyEval`` :524-599):

* dielectric reflection/refraction (GTR2, dielectric Fresnel), gated by
  ``transWeight = (1-metallic) * transmission``
* diffuse + sheen with the Burley retro-reflection Fd90 term
* subsurface approximation (uniform hemisphere into the surface)
* anisotropic primary specular (GTR2_aniso, Smith GGX aniso)
* clearcoat (GTR1, fixed 0.25 Smith roughness)

Sampling draws the same lobe selectors as the reference; every lane computes
every branch and selects with masks, so wavefronts stay divergence-free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import rng
from .math import dot, from_local, mix, normalize, reflect, refract
from .sampling import (
    cosine_sample_hemisphere,
    ggx_sample,
    gtr1_sample,
    gtr2_aniso_sample,
    uniform_sample_hemisphere,
)
from .state import SurfState

PI = jnp.pi
_1_PI = 1.0 / jnp.pi
_1_2PI = 1.0 / (2.0 * jnp.pi)


def _sdiv(num, den, eps=1e-12):
    """Sign-preserving safe division (GLSL just divides; we only guard the
    magnitude so negative denominators keep their sign semantics)."""
    safe = jnp.where(jnp.abs(den) < eps, jnp.where(den < 0, -eps, eps), den)
    return num / safe


def _schlick_weight(u):
    m = jnp.clip(1.0 - u, 0.0, 1.0)
    m2 = m * m
    return m2 * m2 * m


def _dielectric_fresnel(cos_i, eta):
    """(pbr_disney.glsl:123-137)"""
    sin2_t = eta * eta * (1.0 - cos_i * cos_i)
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    rs = (eta * cos_t - cos_i) / jnp.maximum(eta * cos_t + cos_i, 1e-12)
    rp = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, 1e-12)
    f = 0.5 * (rs * rs + rp * rp)
    return jnp.where(sin2_t > 1.0, 1.0, f)  # total internal reflection


def _gtr1(ndoth, a):
    a_c = jnp.clip(a, 1e-4, 0.9999)
    a2 = a_c * a_c
    t = 1.0 + (a2 - 1.0) * ndoth * ndoth
    val = _sdiv(a2 - 1.0, PI * jnp.log(a2) * t)
    return jnp.where(a >= 1.0, _1_PI, val)


def _gtr2(ndoth, a):
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * ndoth * ndoth
    return a2 / jnp.maximum(PI * t * t, 1e-12)


def _gtr2_aniso(ndoth, hdotx, hdoty, ax, ay):
    a = hdotx / ax
    b = hdoty / ay
    c = a * a + b * b + ndoth * ndoth
    return 1.0 / jnp.maximum(PI * ax * ay * c * c, 1e-12)


def _smith_g(ndotv, alpha):
    a = alpha * alpha
    b = ndotv * ndotv
    return 1.0 / jnp.maximum(ndotv + jnp.sqrt(a + b - a * b), 1e-12)


def _smith_g_aniso(ndotv, vdotx, vdoty, ax, ay):
    a = vdotx * ax
    b = vdoty * ay
    c = ndotv
    return 1.0 / jnp.maximum(ndotv + jnp.sqrt(a * a + b * b + c * c), 1e-12)


def _tint_colors(state: SurfState):
    """Cspec0/Csheen derivation (pbr_disney.glsl:426-431)."""
    cdlin = state.mat.albedo
    cdlum = 0.3 * cdlin[..., 0] + 0.6 * cdlin[..., 1] + 0.1 * cdlin[..., 2]
    ctint = jnp.where(
        (cdlum > 0.0)[..., None], cdlin / jnp.maximum(cdlum, 1e-12)[..., None], 1.0
    )
    spec = state.mat.specular[..., None]
    tint = state.mat.specular_tint[..., None]
    cspec0 = mix(
        spec * 0.08 * mix(jnp.ones_like(ctint), ctint, tint),
        cdlin,
        state.mat.metallic[..., None],
    )
    csheen = state.mat.sheen_color  # reference uses sheenTint directly (:431)
    return cspec0, csheen


def _eval_dielectric_reflection(state, v, n, l, h):
    """(pbr_disney.glsl:320-332)"""
    valid = dot(n, l) > 0.0
    f = _dielectric_fresnel(dot(v, h), state.eta)
    d = _gtr2(dot(n, h), state.mat.roughness)
    pdf = _sdiv(d * dot(n, h) * f, 4.0 * dot(v, h))
    g = _smith_g(jnp.abs(dot(n, l)), state.mat.roughness) * _smith_g(
        jnp.abs(dot(n, v)), state.mat.roughness
    )
    fr = state.mat.albedo * (f * d * g)[..., None]
    return (
        jnp.where(valid[..., None], fr, 0.0),
        jnp.where(valid, pdf, 0.0),
    )


def _eval_dielectric_refraction(state, v, n, l, h):
    """(pbr_disney.glsl:336-347)"""
    f = _dielectric_fresnel(jnp.abs(dot(v, h)), state.eta)
    d = _gtr2(dot(n, h), state.mat.roughness)
    denom = dot(l, h) * state.eta + dot(v, h)
    denom2 = jnp.maximum(denom * denom, 1e-12)
    pdf = d * dot(n, h) * (1.0 - f) * jnp.abs(dot(l, h)) / denom2
    g = _smith_g(jnp.abs(dot(n, l)), state.mat.roughness) * _smith_g(
        jnp.abs(dot(n, v)), state.mat.roughness
    )
    fr = state.mat.albedo * (
        (1.0 - f) * d * g * jnp.abs(dot(v, h)) * jnp.abs(dot(l, h))
        * 4.0 * state.eta * state.eta / denom2
    )[..., None]
    return fr, pdf


def _eval_specular(state, cspec0, v, n, l, h):
    """Anisotropic GTR2 lobe (pbr_disney.glsl:351-364)."""
    valid = dot(n, l) > 0.0
    t, b = state.tangent, state.bitangent
    ax, ay = state.mat.ax, state.mat.ay
    d = _gtr2_aniso(dot(n, h), dot(h, t), dot(h, b), ax, ay)
    pdf = _sdiv(d * dot(n, h), 4.0 * dot(v, h))
    fh = _schlick_weight(dot(l, h))
    f = mix(cspec0, jnp.ones_like(cspec0), fh[..., None])
    g = _smith_g_aniso(dot(n, l), dot(l, t), dot(l, b), ax, ay)
    g = g * _smith_g_aniso(dot(n, v), dot(v, t), dot(v, b), ax, ay)
    fr = f * (d * g)[..., None]
    return jnp.where(valid[..., None], fr, 0.0), jnp.where(valid, pdf, 0.0)


def _eval_clearcoat(state, v, n, l, h):
    """(pbr_disney.glsl:368-380)"""
    valid = dot(n, l) > 0.0
    d = _gtr1(dot(n, h), state.mat.clearcoat_roughness)
    pdf = _sdiv(d * dot(n, h), 4.0 * dot(v, h))
    fh = _schlick_weight(dot(l, h))
    f = mix(jnp.float32(0.04), jnp.float32(1.0), fh)
    g = _smith_g(dot(n, l), jnp.float32(0.25)) * _smith_g(dot(n, v), jnp.float32(0.25))
    fr = (0.25 * state.mat.clearcoat * f * d * g)[..., None] * jnp.ones(3, jnp.float32)
    return jnp.where(valid[..., None], fr, 0.0), jnp.where(valid, pdf, 0.0)


def _eval_diffuse(state, csheen, v, n, l, h):
    """Burley diffuse + sheen (pbr_disney.glsl:384-398)."""
    valid = dot(n, l) > 0.0
    pdf = dot(n, l) * _1_PI
    fl = _schlick_weight(dot(n, l))
    fv = _schlick_weight(dot(n, v))
    fh = _schlick_weight(dot(l, h))
    fd90 = 0.5 + 2.0 * dot(l, h) ** 2 * state.mat.roughness
    fd = mix(1.0, fd90, fl) * mix(1.0, fd90, fv)
    fsheen = fh[..., None] * state.mat.sheen_roughness[..., None] * csheen
    fr = (
        _1_PI * (fd * (1.0 - state.mat.subsurface))[..., None] * state.mat.albedo
        + fsheen
    ) * (1.0 - state.mat.metallic)[..., None]
    return jnp.where(valid[..., None], fr, 0.0), jnp.where(valid, pdf, 0.0)


def _eval_subsurface(state, v, n, l):
    """Hanrahan-Krueger-ish approximation (pbr_disney.glsl:402-410)."""
    pdf = jnp.full_like(state.eta, _1_2PI)
    fl = _schlick_weight(jnp.abs(dot(n, l)))
    fv = _schlick_weight(dot(n, v))
    fd = (1.0 - 0.5 * fl) * (1.0 - 0.5 * fv)
    fr = (
        jnp.sqrt(jnp.maximum(state.mat.albedo, 0.0))
        * (
            state.mat.subsurface * _1_PI * fd
            * (1.0 - state.mat.metallic) * (1.0 - state.mat.transmission)
        )[..., None]
    )
    return fr, pdf


def disney_eval(state: SurfState, v, n, l):
    """``DisneyEval`` (pbr_disney.glsl:524-599). Returns (f (R,3), pdf (R,))."""
    ndotl = dot(n, l)
    h = jnp.where(
        (ndotl < 0.0)[..., None],
        normalize(l * (1.0 / state.eta)[..., None] + v),
        normalize(l + v),
    )
    h = jnp.where(dot(n, h)[..., None] < 0.0, -h, h)

    m = state.mat
    diffuse_ratio = 0.5 * (1.0 - m.metallic)
    primary_spec_ratio = 1.0 / (1.0 + m.clearcoat)
    trans_weight = (1.0 - m.metallic) * m.transmission

    # BSDF side
    f_refl, p_refl = _eval_dielectric_reflection(state, v, n, l, h)
    f_refr, p_refr = _eval_dielectric_refraction(state, v, n, l, h)
    trans_side = ndotl < 0.0
    bsdf = jnp.where(trans_side[..., None], f_refr, f_refl)
    bsdf_pdf = jnp.where(trans_side, p_refr, p_refl)
    bsdf = jnp.where((trans_weight > 0.0)[..., None], bsdf, 0.0)
    bsdf_pdf = jnp.where(trans_weight > 0.0, bsdf_pdf, 0.0)

    # BRDF side
    cspec0, csheen = _tint_colors(state)
    f_ss, p_ss = _eval_subsurface(state, v, n, l)
    below = ndotl < 0.0
    has_ss = m.subsurface > 0.0
    brdf_below = jnp.where((below & has_ss)[..., None], f_ss, 0.0)
    brdf_below_pdf = jnp.where(below & has_ss, p_ss * m.subsurface * diffuse_ratio, 0.0)

    f_d, p_d = _eval_diffuse(state, csheen, v, n, l, h)
    f_s, p_s = _eval_specular(state, cspec0, v, n, l, h)
    f_c, p_c = _eval_clearcoat(state, v, n, l, h)
    brdf_above = f_d + f_s + f_c
    brdf_above_pdf = (
        p_d * (1.0 - m.subsurface) * diffuse_ratio
        + p_s * primary_spec_ratio * (1.0 - diffuse_ratio)
        + p_c * (1.0 - primary_spec_ratio) * (1.0 - diffuse_ratio)
    )

    brdf = jnp.where(below[..., None], brdf_below, brdf_above)
    brdf_pdf = jnp.where(below, brdf_below_pdf, brdf_above_pdf)
    brdf = jnp.where((trans_weight < 1.0)[..., None], brdf, 0.0)
    brdf_pdf = jnp.where(trans_weight < 1.0, brdf_pdf, 0.0)

    pdf = mix(brdf_pdf, bsdf_pdf, trans_weight)
    f = mix(brdf, bsdf, trans_weight[..., None])
    return f, pdf


def disney_sample(state: SurfState, v, n, seed, combined: bool = False):
    """``DisneySample`` (pbr_disney.glsl:414-520).

    Returns ``(f (R,3), L (R,3), pdf (R,), is_subsurface (R,) bool, seed')``.

    ``combined=True`` keeps the identical sampled direction / RNG stream but
    returns ``disney_eval``'s mixture (f, pdf) at it instead of the chosen
    lobe's — see ops/bsdf_gltf.py::pbr_sample for why (MIS pdf consistency).
    """
    m = state.mat
    seed, r1 = rng.rand(seed)
    seed, r2 = rng.rand(seed)
    seed, u_trans = rng.rand(seed)
    seed, u_refl = rng.rand(seed)       # Fresnel selector (trans branch)
    seed, u_diff = rng.rand(seed)       # diffuse vs specular
    seed, u_ss = rng.rand(seed)         # subsurface selector
    seed, u_lobe = rng.rand(seed)       # primary spec vs clearcoat

    diffuse_ratio = 0.5 * (1.0 - m.metallic)
    trans_weight = (1.0 - m.metallic) * m.transmission
    cspec0, csheen = _tint_colors(state)
    t, b = state.tangent, state.bitangent

    # ---- transmission branch (pbr_disney.glsl:434-463) --------------------
    h_t = from_local(ggx_sample(m.roughness, r1, r2), t, b, n)
    r_dir = reflect(-v, h_t)
    f_fres = _dielectric_fresnel(jnp.abs(dot(r_dir, h_t)), state.eta)
    inside = dot(state.ffnormal, state.normal) < 0.0
    f_fres = jnp.where(m.thinwalled & inside, 0.0, f_fres)
    eta_eff = jnp.where(m.thinwalled, 1.001, state.eta)
    state_t = state._replace(eta=eta_eff)

    do_reflect = u_refl < f_fres
    l_refl = normalize(r_dir)
    l_refr = normalize(refract(-v, h_t, eta_eff))
    bad = jnp.sum(l_refr * l_refr, axis=-1) < 0.5   # TIR -> refract() = 0
    l_refr = jnp.where(bad[..., None], l_refl, l_refr)
    fr_refl, pdf_refl = _eval_dielectric_reflection(state_t, v, n, l_refl, h_t)
    fr_refr, pdf_refr = _eval_dielectric_refraction(state_t, v, n, l_refr, h_t)
    l_bsdf = jnp.where(do_reflect[..., None], l_refl, l_refr)
    f_bsdf = jnp.where(do_reflect[..., None], fr_refl, fr_refr)
    pdf_bsdf = jnp.where(do_reflect, pdf_refl, pdf_refr)
    f_bsdf = f_bsdf * trans_weight[..., None]
    pdf_bsdf = pdf_bsdf * trans_weight

    # ---- BRDF branch ------------------------------------------------------
    # subsurface (diffuse transmission, :468-478)
    l_ss_loc = uniform_sample_hemisphere(r1, r2)
    l_ss = l_ss_loc[..., 0:1] * t + l_ss_loc[..., 1:2] * b - l_ss_loc[..., 2:3] * n
    f_ss, pdf_ss = _eval_subsurface(state, v, n, l_ss)
    pdf_ss = pdf_ss * m.subsurface * diffuse_ratio

    # diffuse (:479-488)
    l_d = from_local(cosine_sample_hemisphere(r1, r2), t, b, n)
    h_d = normalize(l_d + v)
    f_d, pdf_d = _eval_diffuse(state, csheen, v, n, l_d, h_d)
    pdf_d = pdf_d * (1.0 - m.subsurface) * diffuse_ratio

    pick_ss = u_ss < m.subsurface
    l_diffuse = jnp.where(pick_ss[..., None], l_ss, l_d)
    f_diffuse = jnp.where(pick_ss[..., None], f_ss, f_d)
    pdf_diffuse = jnp.where(pick_ss, pdf_ss, pdf_d)

    # primary specular (:495-504)
    primary_spec_ratio = 1.0 / (1.0 + m.clearcoat)
    h_s = normalize(from_local(gtr2_aniso_sample(m.ax, m.ay, r1, r2), t, b, n))
    l_s = normalize(reflect(-v, h_s))
    f_s, pdf_s = _eval_specular(state, cspec0, v, n, l_s, h_s)
    pdf_s = pdf_s * primary_spec_ratio * (1.0 - diffuse_ratio)

    # clearcoat (:505-513)
    h_c = from_local(gtr1_sample(m.clearcoat_roughness, r1, r2), t, b, n)
    l_c = normalize(reflect(-v, h_c))
    f_c, pdf_c = _eval_clearcoat(state, v, n, l_c, h_c)
    pdf_c = pdf_c * (1.0 - primary_spec_ratio) * (1.0 - diffuse_ratio)

    pick_primary = u_lobe < primary_spec_ratio
    l_spec = jnp.where(pick_primary[..., None], l_s, l_c)
    f_spec = jnp.where(pick_primary[..., None], f_s, f_c)
    pdf_spec = jnp.where(pick_primary, pdf_s, pdf_c)

    pick_diffuse = u_diff < diffuse_ratio
    l_brdf = jnp.where(pick_diffuse[..., None], l_diffuse, l_spec)
    f_brdf = jnp.where(pick_diffuse[..., None], f_diffuse, f_spec)
    pdf_brdf = jnp.where(pick_diffuse, pdf_diffuse, pdf_spec)
    f_brdf = f_brdf * (1.0 - trans_weight)[..., None]
    pdf_brdf = pdf_brdf * (1.0 - trans_weight)

    pick_trans = u_trans < trans_weight
    l_out = jnp.where(pick_trans[..., None], l_bsdf, l_brdf)
    f_out = jnp.where(pick_trans[..., None], f_bsdf, f_brdf)
    pdf_out = jnp.where(pick_trans, pdf_bsdf, pdf_brdf)
    is_subsurface = (~pick_trans) & pick_diffuse & pick_ss
    if combined:
        f_out, pdf_out = disney_eval(state, v, n, l_out)
    return f_out, l_out, pdf_out, is_subsurface, seed
