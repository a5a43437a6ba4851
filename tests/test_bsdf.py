"""BSDF property tests: sample/eval agreement, energy, Fresnel sanity.

These cover the invariants the reference leaves to golden images (which are
LFS stubs here): for every rough lobe, the (f, pdf) returned by ``sample``
must match ``evaluate``/``pdf`` recomputed from (wo, wi); f/pdf must conserve
energy; Fresnel terms must hit their analytic anchors.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pathtracer.render import bsdf as B
from tpu_pathtracer.render import microfacet as mf
from tpu_pathtracer.render.surface import Interaction
from tpu_pathtracer.scene.builder import (Glass, Lambert, Metal, Plastic,
                                          SceneBuilder)
from tpu_pathtracer.scene import mesh
from tpu_pathtracer.spectrum import sampled as swl
from tpu_pathtracer.utils.vec import (S4, V2, make_frame, s4_stack, to_frame,
                                      v2_unstack, v3_stack, v3_unstack)

R = 2048


def _fake_scene(materials):
    sb = SceneBuilder(table_res=32)
    mats = [sb.add_material(m) for m in materials]
    tri = mesh.quad([-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1])
    for m in mats:
        sb.add_mesh(tri, m)
    from tpu_pathtracer.scene.builder import Emissive
    light = sb.add_material(Emissive(spectrum=(1.0, 1.0, 1.0), intensity=1.0))
    sb.add_triangle([0, 3, 0], [1, 3, 0], [0, 3, 1], light)
    return sb.build((0.0, 1.0, 3.0))


def _fake_interaction(scene, mat_id, r=R, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    n = v3_unstack(jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (r, 3)))
    t = v3_unstack(jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (r, 3)))
    # wo: random upper-hemisphere directions
    wo = rng.normal(size=(r, 3))
    wo[:, 2] = np.abs(wo[:, 2]) + 0.05
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    wo = v3_unstack(jnp.asarray(wo, jnp.float32))
    it = Interaction(
        valid=jnp.ones(r, bool),
        position=v3_unstack(jnp.zeros((r, 3))),
        geo_n=n, shading_n=n, tangent=t,
        uv=v2_unstack(jnp.full((r, 2), 0.5)),
        mat_id=jnp.full(r, mat_id, jnp.int32),
        light_id=jnp.full(r, -1, jnp.int32), tri=jnp.zeros(r, jnp.int32),
        t=jnp.ones(r), wo=wo)
    frame = make_frame(it.shading_n, it.tangent)
    wo_t = to_frame(frame, wo)
    return it, frame, wo_t


def _uniforms(r, seed):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.uniform(size=r), jnp.float32),
            v2_unstack(jnp.asarray(rng.uniform(size=(r, 2)), jnp.float32)))


@pytest.mark.parametrize("desc,mat_idx", [
    (Metal(kind="gold", roughness=0.5), 0),
    (Glass(kind="bk7", roughness=0.4), 1),
    (Plastic(color=(0.8, 0.3, 0.3), eta=1.5, roughness=0.3), 2),
    (Lambert(albedo=(0.7, 0.6, 0.5)), 3),
])
def test_sample_eval_agreement(desc, mat_idx):
    """For rough lobes, evaluate(wo, wi_sampled) must reproduce sample's
    (f, pdf) — catches any Jacobian/half-vector mismatch."""
    scene, meta = _fake_scene([
        Metal(kind="gold", roughness=0.5),
        Glass(kind="bk7", roughness=0.4),
        Plastic(color=(0.8, 0.3, 0.3), eta=1.5, roughness=0.3),
        Lambert(albedo=(0.7, 0.6, 0.5)),
    ])
    it, frame, wo_t = _fake_interaction(scene, mat_idx)
    wl = swl.sample_uniform(jnp.full((R,), 0.42))
    uc, uv2 = _uniforms(R, 1)
    ms = B.sample_material(scene, meta, it, frame, wo_t, uc, uv2, wl)
    ok = np.asarray(ms.sampled & ~ms.specular)
    assert ok.mean() > 0.5, f"low sample success {ok.mean()}"
    f_e, pdf_e = B.evaluate_material(scene, meta, it, frame, wo_t, ms.wi_t, wl)
    f_s, pdf_s = np.asarray(s4_stack(ms.f)), np.asarray(ms.pdf)
    f_e, pdf_e = np.asarray(s4_stack(f_e)), np.asarray(pdf_e)
    sel = ok & (pdf_s > 1e-3) & (f_s.max(-1) > 1e-5)
    rel_f = np.abs(f_e[sel] - f_s[sel]) / (np.abs(f_s[sel]) + 1e-3)
    rel_p = np.abs(pdf_e[sel] - pdf_s[sel]) / (pdf_s[sel] + 1e-3)
    assert np.quantile(rel_f, 0.99) < 0.02, np.quantile(rel_f, 0.99)
    assert np.quantile(rel_p, 0.99) < 0.02, np.quantile(rel_p, 0.99)


def test_energy_conservation():
    """E[f/pdf] (hemispherical reflectance estimate) must be <= 1 for every
    material, ~albedo for Lambert."""
    scene, meta = _fake_scene([
        Lambert(albedo=(0.6, 0.6, 0.6)),
        Metal(kind="silver", roughness=0.3),
        Glass(kind="bk7", roughness=0.0),
        Plastic(color=(1.0, 1.0, 1.0), eta=1.5, roughness=0.0, thin=True),
    ])
    for mat_idx, hi in ((0, 0.65), (1, 1.02), (2, 1.02), (3, 1.02)):
        it, frame, wo_t = _fake_interaction(scene, mat_idx, rng_seed=mat_idx)
        wl = swl.sample_uniform(jnp.full((R,), 0.3))
        uc, uv2 = _uniforms(R, mat_idx + 10)
        ms = B.sample_material(scene, meta, it, frame, wo_t, uc, uv2, wl)
        w = np.asarray(jnp.where(ms.sampled, ms.f.a /
                                 jnp.maximum(ms.pdf, 1e-12), 0.0))
        est = w.mean()
        assert est <= hi + 0.05, f"mat {mat_idx}: energy {est}"
        assert est > 0.05


def test_fresnel_anchors():
    def s4c(v, n=4):
        x = jnp.full((n,), v)
        return S4(x, x, x, x)

    # dielectric normal incidence: ((n-1)/(n+1))^2
    f0 = float(mf.fresnel_dielectric(jnp.ones(4), s4c(1.5)).a[0])
    assert abs(f0 - 0.04) < 1e-3
    # grazing -> 1
    fg = float(mf.fresnel_dielectric(jnp.full(4, 1e-4), s4c(1.5)).a[0])
    assert fg > 0.98
    # TIR from inside: eta_rel = 1/1.5, cos below critical angle
    f_tir = float(mf.fresnel_dielectric(jnp.asarray([0.3]),
                                        s4c(1.0 / 1.5, 1)).a[0])
    assert f_tir > 0.999
    # conductor: gold at 600nm (eta~0.25, k~3.0) -> R ~ 0.92 at normal inc
    fc = float(mf.fresnel_complex(jnp.ones(1), s4c(0.25, 1),
                                  s4c(2.99, 1)).a[0])
    assert 0.85 < fc < 0.97


def test_dispersion_terminates_wavelengths():
    scene, meta = _fake_scene([Glass(kind="sf11", roughness=0.0)])
    it, frame, wo_t = _fake_interaction(scene, 0)
    wl = swl.sample_uniform(jnp.full((R,), 0.5))
    uc, uv2 = _uniforms(R, 3)
    ms = B.sample_material(scene, meta, it, frame, wo_t, uc, uv2, wl)
    transmitted = np.asarray(ms.sampled) & (np.asarray(ms.wi_t.z) < 0)
    term = np.asarray(ms.wl.secondary_terminated)
    # every transmitted ray must be terminated (dispersive glass)
    assert term[transmitted].all()
    # reflected rays keep all 4 lanes
    reflected = np.asarray(ms.sampled) & (np.asarray(ms.wi_t.z) > 0)
    assert not term[reflected].any()


def test_smooth_glass_snell():
    """Smooth BK7 transmission obeys Snell's law at the hero wavelength."""
    scene, meta = _fake_scene([Glass(kind="bk7", roughness=0.0)])
    it, frame, wo_t = _fake_interaction(scene, 0)
    wl = swl.sample_uniform(jnp.full((R,), 0.5))
    uc, uv2 = _uniforms(R, 4)
    ms = B.sample_material(scene, meta, it, frame, wo_t, uc, uv2, wl)
    sel = np.asarray(ms.sampled) & (np.asarray(ms.wi_t.z) < 0)
    wo = np.asarray(v3_stack(wo_t))[sel]
    wi = np.asarray(v3_stack(ms.wi_t))[sel]
    sin_o = np.sqrt(np.clip(1 - wo[:, 2] ** 2, 0, 1))
    sin_i = np.sqrt(np.clip(1 - wi[:, 2] ** 2, 0, 1))
    from tpu_pathtracer.spectrum import glass_eta, grid
    lam0 = np.asarray(ms.wl.lam.a)[sel]
    n = glass_eta("bk7")[np.clip((lam0 - 360).astype(int), 0, 469)]
    assert np.abs(sin_o - sin_i * n).max() < 5e-3
