"""BSDF property tests (SURVEY.md §4.1): sample/eval consistency, energy
conservation (white furnace), pdf validity — for both Disney and glTF models."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vk_raytrace_tpu.ops import rng
from vk_raytrace_tpu.ops.bsdf_disney import disney_eval, disney_sample
from vk_raytrace_tpu.ops.bsdf_gltf import pbr_eval, pbr_sample
from vk_raytrace_tpu.ops.state import MatState, SurfState


def make_state(n, albedo=(0.8, 0.8, 0.8), metallic=0.0, roughness=0.5,
               transmission=0.0, clearcoat=0.0, sheen=0.0, anisotropy=0.0,
               ior=1.5):
    """Upward-facing surface (+z normal) replicated n times."""
    ones = jnp.ones((n,), jnp.float32)
    zeros = jnp.zeros((n,), jnp.float32)
    alb = jnp.broadcast_to(jnp.asarray(albedo, jnp.float32), (n, 3))
    rough = jnp.maximum(ones * roughness, 0.001)
    aspect = jnp.sqrt(1.0 - anisotropy * 0.9)
    f0 = 0.04 * (1.0 - metallic) + alb * metallic
    mat = MatState(
        albedo=alb,
        metallic=ones * metallic,
        roughness=rough,
        f0=f0 * jnp.ones((n, 3)),
        alpha=ones,
        emission=jnp.zeros((n, 3)),
        transmission=ones * transmission,
        ior=ones * ior,
        unlit=jnp.zeros((n,), bool),
        anisotropy=ones * anisotropy,
        ax=jnp.maximum(0.001, rough / aspect),
        ay=jnp.maximum(0.001, rough * aspect),
        attenuation_color=jnp.ones((n, 3)),
        attenuation_distance=ones * 1e10,
        thinwalled=jnp.zeros((n,), bool),
        clearcoat=ones * clearcoat,
        clearcoat_roughness=jnp.maximum(ones * 0.3, 0.001),
        sheen_color=jnp.broadcast_to(jnp.asarray([1.0, 1.0, 1.0]), (n, 3)) * sheen,
        sheen_roughness=ones * sheen,
        specular=ones * 0.5,
        specular_tint=ones,
        subsurface=zeros,
    )
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    tangent = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (n, 3))
    bitangent = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (n, 3))
    return SurfState(
        position=jnp.zeros((n, 3)),
        normal=normal,
        geom_normal=normal,
        ffnormal=normal,
        tangent=tangent,
        bitangent=bitangent,
        tex_coord=jnp.zeros((n, 2)),
        eta=ones / ior,
        mat=mat,
    )


def view_dirs(n, seed=0, theta_max=1.2):
    r = np.random.default_rng(seed)
    th = r.uniform(0.05, theta_max, n)
    ph = r.uniform(0, 2 * np.pi, n)
    return jnp.asarray(
        np.stack([np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph), np.cos(th)], -1),
        jnp.float32,
    )


@pytest.mark.parametrize("which", ["disney", "gltf"])
class TestSampleEvalConsistency:
    def test_single_lobe_metal_matches(self, which):
        """For a pure-metal material only the specular lobe exists, so the
        sample's (f, pdf) must equal eval's mixture at the sampled L.
        (With multiple lobes the reference's Sample intentionally returns
        only the chosen lobe — eval is then a strict superset.)"""
        n = 4096
        state = make_state(n, metallic=1.0, roughness=0.4)
        v = view_dirs(n, seed=1)
        nrm = state.normal
        seed = rng.tea(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(7))
        if which == "disney":
            f_s, l, pdf_s, _ss, _ = disney_sample(state, v, nrm, seed)
            f_e, pdf_e = disney_eval(state, v, nrm, l)
        else:
            f_s, l, pdf_s, _ = pbr_sample(state, v, nrm, seed)
            f_e, pdf_e = pbr_eval(state, v, nrm, l)
        m = (np.asarray(pdf_s) > 1e-3) & (
            np.asarray(jnp.sum(l * nrm, axis=-1)) > 1e-3
        )
        assert m.mean() > 0.5
        ps, pe = np.asarray(pdf_s)[m], np.asarray(pdf_e)[m]
        rel = np.abs(ps - pe) / np.maximum(pe, 1e-3)
        assert np.median(rel) < 0.02, float(np.median(rel))
        fs, fe = np.asarray(f_s)[m], np.asarray(f_e)[m]
        relf = np.abs(fs - fe).max(-1) / np.maximum(fe.max(-1), 1e-3)
        assert np.median(relf) < 0.02, float(np.median(relf))

    def test_eval_pdf_covers_sampled_lobe(self, which):
        """Mixture pdf at a sampled direction must be at least the sampled
        lobe's contribution (MIS weights depend on this)."""
        n = 4096
        state = make_state(n, metallic=0.3, roughness=0.4, clearcoat=0.4)
        v = view_dirs(n, seed=1)
        nrm = state.normal
        seed = rng.tea(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(7))
        if which == "disney":
            f_s, l, pdf_s, _ss, _ = disney_sample(state, v, nrm, seed)
            f_e, pdf_e = disney_eval(state, v, nrm, l)
        else:
            f_s, l, pdf_s, _ = pbr_sample(state, v, nrm, seed)
            f_e, pdf_e = pbr_eval(state, v, nrm, l)
        m = (np.asarray(pdf_s) > 1e-3) & (
            np.asarray(jnp.sum(l * nrm, axis=-1)) > 1e-3
        )
        ps, pe = np.asarray(pdf_s)[m], np.asarray(pdf_e)[m]
        assert (pe >= ps * 0.95).mean() > 0.98, (pe >= ps * 0.95).mean()

    def test_pdf_positive_when_f_positive(self, which):
        n = 2048
        state = make_state(n, metallic=0.0, roughness=0.3)
        v = view_dirs(n, seed=2)
        l = view_dirs(n, seed=3)
        if which == "disney":
            f, pdf = disney_eval(state, v, state.normal, l)
        else:
            f, pdf = pbr_eval(state, v, state.normal, l)
        f, pdf = np.asarray(f), np.asarray(pdf)
        assert np.all(pdf[f.max(-1) > 1e-6] > 0.0)
        assert np.all(np.isfinite(f)) and np.all(np.isfinite(pdf))


@pytest.mark.parametrize("which", ["disney", "gltf"])
class TestEnergyConservation:
    @pytest.mark.parametrize("metallic,roughness", [(0.0, 0.8), (1.0, 0.3), (0.5, 0.5)])
    def test_white_furnace_bound(self, which, metallic, roughness):
        """MC estimate of directional albedo: must be finite and <= ~1 for
        an albedo-1 material (energy conservation)."""
        n = 1 << 15
        state = make_state(n, albedo=(1.0, 1.0, 1.0), metallic=metallic,
                           roughness=roughness)
        v = jnp.broadcast_to(jnp.asarray([0.3, 0.0, jnp.sqrt(1 - 0.09)]), (n, 3))
        seed = rng.tea(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(11))
        if which == "disney":
            f, l, pdf, _ss, _ = disney_sample(state, v, state.normal, seed)
        else:
            f, l, pdf, _ = pbr_sample(state, v, state.normal, seed)
        cos = jnp.abs(jnp.sum(l * state.normal, axis=-1))
        w = jnp.where(pdf > 1e-6, f.max(-1) * cos / jnp.maximum(pdf, 1e-6), 0.0)
        est = float(jnp.mean(w))
        assert np.isfinite(est)
        assert est <= 1.35, est  # small MC + lobe-mix slack; ref isn't exact either

    def test_diffuse_furnace_close_to_albedo(self, which):
        """Pure Lambertian: directional albedo ~= albedo * (diffuse part)."""
        n = 1 << 16
        state = make_state(n, albedo=(1.0, 1.0, 1.0), metallic=0.0, roughness=1.0)
        v = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        seed = rng.tea(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(13))
        if which == "disney":
            f, l, pdf, _ss, _ = disney_sample(state, v, state.normal, seed)
        else:
            f, l, pdf, _ = pbr_sample(state, v, state.normal, seed)
        cos = jnp.abs(jnp.sum(l * state.normal, axis=-1))
        w = jnp.where(pdf > 1e-6, f[:, 0] * cos / jnp.maximum(pdf, 1e-6), 0.0)
        est = float(jnp.mean(w))
        # diffuse+specular mixture of a white dielectric: between 0.6 and 1.3
        assert 0.5 < est < 1.35, est


class TestTransmission:
    def test_disney_glass_refracts(self):
        n = 1 << 14
        state = make_state(n, albedo=(1.0, 1.0, 1.0), metallic=0.0,
                           roughness=0.05, transmission=1.0)
        v = jnp.broadcast_to(jnp.asarray([0.2, 0.0, jnp.sqrt(1 - 0.04)]), (n, 3))
        seed = rng.tea(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(17))
        f, l, pdf, _ss, _ = disney_sample(state, v, state.normal, seed)
        below = np.asarray(jnp.sum(l * state.normal, axis=-1)) < 0
        # Most samples transmit through a glass surface at near-normal incidence
        assert below.mean() > 0.5, below.mean()
        assert np.isfinite(np.asarray(f)).all()

    def test_gltf_transmission_goes_through(self):
        n = 1 << 14
        state = make_state(n, albedo=(1.0, 1.0, 1.0), metallic=0.0,
                           roughness=0.05, transmission=1.0)
        v = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        seed = rng.tea(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(19))
        f, l, pdf, _ = pbr_sample(state, v, state.normal, seed)
        below = np.asarray(jnp.sum(l * state.normal, axis=-1)) < 0
        assert below.mean() > 0.5


class TestAnisotropy:
    def test_aniso_changes_lobe(self):
        n = 4096
        state_i = make_state(n, metallic=1.0, roughness=0.3, anisotropy=0.0)
        state_a = make_state(n, metallic=1.0, roughness=0.3, anisotropy=0.9)
        v = jnp.broadcast_to(jnp.asarray([0.5, 0.0, jnp.sqrt(0.75)]), (n, 3))
        l = view_dirs(n, seed=5)
        fi, _ = disney_eval(state_i, v, state_i.normal, l)
        fa, _ = disney_eval(state_a, v, state_a.normal, l)
        assert not np.allclose(np.asarray(fi), np.asarray(fa), rtol=1e-2)
