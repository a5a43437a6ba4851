"""Material system: batched BSDF sample / evaluate / pdf with tag dispatch.

Replaces the reference's ``Arc<dyn SurfaceMaterial>`` trait objects
(scene/src/material/traits.rs:10-109) with masked evaluation over the
material kinds *present in the scene* (static set from SceneMeta): each
kind's sample/eval runs once over the full ray batch and results merge by
``mat_type`` masks.  With <= 5 kinds per scene this is a bounded constant
factor and keeps everything branch-free for the VPU.

Everything here is **true SoA** (utils/vec.py): directions are ``V3``
component triples, spectra are ``S4`` lane quads, masks/scalars are bare
``(R,)`` arrays — no ``(R, C)`` minor axes anywhere in the math, so every
op runs at full VPU lane width (the round-4 hot-path ceiling, PERF.md).

Differentiation stance (the differentiable pass, SURVEY §7.6): traversal
and hit attributes are detached (ops/trace.py custom zero-vjp) and discrete
lobe/light/RR decisions are FIXED sample decisions — reverse-mode flows
through the continuous factors only.  VNDF sampling is *attached*: the
sampled direction wm(alpha, u) differentiates w.r.t. roughness, an implicit
reparameterization whose sample-motion term complements the explicit
d(f/pdf)/d(alpha) term (both estimate dE/d(alpha); their per-sample values
differ).  The FD gates in tests/test_grad.py therefore validate the
microfacet derivative chain on ONE-bounce NEE-only configurations, where
radiance is a pure f_eval(wo, wi_light; params) chain and AD-vs-FD is
exact up to float noise; deep-path gradients are additionally covered by
the loss-descent training gates.  Known estimator gap (documented, not a
correctness bug for fitting): the *mixture-by-picking* metallic choice
(uc <= metallic) contributes d(mixture)/d(metallic) only through the eval
side (NEE/MIS), not through the picked-lobe boundary term.

Conventions (same as the reference):
  * all directions live in the *vertex shading-tangent* frame (+Z = vertex
    shading normal) — ``wo_t``, ``wi_t``;
  * f INCLUDES the |cos theta_i| factor (samples.rs:12-17);
  * normal maps rotate into a secondary frame inside each material
    (lambert_material.rs:57-66);
  * sidedness against the GEOMETRIC normal kills penetration samples for
    opaque materials (lambert_material.rs:78-93).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..scene.types import (MAT_CLEARCOAT, MAT_EMISSIVE, MAT_GLASS,
                           MAT_LAMBERT, MAT_METAL, MAT_PBR, MAT_PLASTIC,
                           SceneData, SceneMeta)
from ..spectrum import grid as sgrid
from ..spectrum import rgb2spec
from ..spectrum.sampled import SampledWavelengths
from ..utils.vec import (Frame, S4, V2, V3, dot3, from_frame, make_frame,
                         normalize3, s4_mean, sel, smap, to_frame,
                         s4_stack, s4_unstack)
from . import texture as tex_mod

INV_PI = 1.0 / math.pi


class MaterialSample(NamedTuple):
    """Batched MaterialSample (ref: samples.rs:37-100)."""
    f: S4                   # BSDF value (cosine included)
    wi_t: V3                # sampled direction, vertex-tangent space
    pdf: jnp.ndarray        # (R,)
    sampled: jnp.ndarray    # (R,) bool
    specular: jnp.ndarray   # (R,) bool
    wl: SampledWavelengths  # possibly dispersion-terminated wavelengths


# ---------------------------------------------------------------------------
# Shared helpers
# ---------------------------------------------------------------------------

def _hash_unit(u, salt: int):
    """Decorrelated uniform derived from the BITS of u (fallback when a
    caller omits the uc2/uc3 sampler dims).  Unlike a golden-ratio rotation
    of u — which stays deterministic in u, so conditioning on the first
    lobe decision (u <= p) skews the follow-up decision — a bit-avalanche
    hash is uniform conditioned on any interval of u at these scales."""
    from ..render.sampler import _fmix32
    bits = jax.lax.bitcast_convert_type(u.astype(jnp.float32), jnp.uint32)
    h = _fmix32(bits ^ jnp.uint32(salt))
    return h.astype(jnp.float32) * jnp.float32(2.0 ** -32)


def _bank_eval(scene: SceneData, row, wl) -> S4:
    """Spectra-bank row evaluated at the path wavelengths -> S4.

    Uses the per-sample pre-evaluated slice (``wl.bank``, O(K) column
    select) when present; falls back to the dense one-hot evaluation."""
    if wl.bank is not None:
        return sgrid.bank_pick(wl.bank, row)
    lam = s4_stack(wl.lam)
    return s4_unstack(sgrid.eval_bank(scene.spectra, row, lam))


def _s4_ones(r) -> S4:
    one = jnp.ones_like(r) if hasattr(r, "shape") else jnp.ones((r,))
    return S4(one, one, one, one)


def _albedo_spectrum(scene: SceneData, it, wl) -> S4:
    """Base color/albedo at the hit, as an S4 spectral reflectance.

    Constant colors were pre-resolved to sigmoid coefficients at compile
    time; textured colors look coefficients up through the device table
    (ref: rgb_texture.rs builds an RgbAlbedoSpectrum per texel fetch).
    """
    m = scene.materials
    coeff = m.base_coeff[it.mat_id]                       # (R, 3)
    tex_ids = m.base_tex[it.mat_id]
    if len(scene.textures):
        rgb = tex_mod.sample_indexed(scene.textures, tex_ids, it.uv, 3,
                                     jnp.zeros(3))
        tex_coeff = rgb2spec.lookup_coeffs(rgb, scene.rs_zn, scene.rs_coeffs)
        coeff = jnp.where((tex_ids >= 0)[:, None], tex_coeff, coeff)
    return rgb2spec.sigmoid_poly_s4(coeff, wl.lam)


def _normal_map_frame(scene: SceneData, it, wo_t):
    """Per-ray normal-map rotation within the vertex-tangent frame.

    Returns a Frame N such that v_nm = to_frame(N, v_t), identity where
    the material has no normal map (ref: Transform::from_normal_map,
    math/src/transform.rs:216-245, operating inside tangent space where the
    vertex normal is +Z and the vertex tangent is +X).
    """
    m = scene.materials
    if not len(scene.textures):
        return None
    tex_ids = m.normal_tex[it.mat_id]
    raw = tex_mod.sample_indexed(scene.textures, tex_ids, it.uv, 3,
                                 jnp.asarray([0.5, 0.5, 1.0]))
    n = normalize3(V3(raw[:, 0] * 2.0 - 1.0, raw[:, 1] * 2.0 - 1.0,
                      raw[:, 2] * 2.0 - 1.0))
    has = tex_ids >= 0
    z = jnp.zeros_like(n.x)
    n = sel(has, n, V3(z, z, jnp.ones_like(n.x)))
    # frame around the perturbed normal keeping +X as tangent direction
    x_axis = V3(jnp.ones_like(n.x), z, z)
    return make_frame(n, x_axis)


def _nm_to(nm_frame, v: V3) -> V3:
    return to_frame(nm_frame, v) if nm_frame is not None else v


def _nm_from(nm_frame, v: V3) -> V3:
    return from_frame(nm_frame, v) if nm_frame is not None else v


def _roughness(scene: SceneData, it) -> jnp.ndarray:
    m = scene.materials
    rough = m.roughness[it.mat_id]
    tex_ids = m.roughness_tex[it.mat_id]
    if len(scene.textures):
        t = tex_mod.sample_indexed(scene.textures, tex_ids, it.uv, 1,
                                   jnp.zeros(1))[:, 0]
        rough = jnp.where(tex_ids >= 0, t, rough)
    return rough


def sample_cosine_hemisphere(uv: V2) -> V3:
    """V2 -> V3 cosine-weighted +Z hemisphere (bsdf/lambert.rs:12-17)."""
    r = jnp.sqrt(uv.x)
    theta = 2.0 * math.pi * uv.y
    z = jnp.sqrt(jnp.maximum(1.0 - uv.x, 0.0))
    return V3(r * jnp.cos(theta), r * jnp.sin(theta), z)


def _mirror(v: V3) -> V3:
    return V3(-v.x, -v.y, v.z)


def _flip_z(v: V3, flip) -> V3:
    return V3(v.x, v.y, jnp.where(flip, -v.z, v.z))


# ---------------------------------------------------------------------------
# Lambert (ref: bsdf/lambert.rs + lambert_material.rs)
# ---------------------------------------------------------------------------

def _lambert_sample(scene, it, wo_t, uv2, wl, nm_frame):
    albedo = _albedo_spectrum(scene, it, wl)              # S4
    wo_nm = _nm_to(nm_frame, wo_t)
    wi_nm = sample_cosine_hemisphere(uv2)
    # flip to wo's hemisphere (lambert.rs:45-50)
    wi_nm = _flip_z(wi_nm, wo_nm.z < 0.0)
    cos_i = jnp.abs(wi_nm.z)
    f = albedo * (cos_i * INV_PI)
    pdf = cos_i * INV_PI
    wi_t = _nm_from(nm_frame, wi_nm)
    ok = (wo_nm.z != 0.0) & (wi_nm.z != 0.0)
    return f, wi_t, pdf, ok


def _lambert_eval(scene, it, wo_t, wi_t, wl, nm_frame):
    albedo = _albedo_spectrum(scene, it, wl)
    wo_nm = _nm_to(nm_frame, wo_t)
    wi_nm = _nm_to(nm_frame, wi_t)
    cos_o = wo_nm.z
    cos_i = wi_nm.z
    same = (jnp.sign(cos_o) == jnp.sign(cos_i)) & (cos_o != 0.0) & (cos_i != 0.0)
    f = albedo * jnp.where(same, jnp.abs(cos_i) * INV_PI, 0.0)
    pdf = jnp.where(same, jnp.abs(cos_i) * INV_PI, 0.0)
    return f, pdf


# ---------------------------------------------------------------------------
# Conductor / Metal (ref: bsdf/conductor.rs + metal_material.rs)
# ---------------------------------------------------------------------------

SMOOTH_ALPHA = 1e-3   # effectively_smooth threshold (conductor.rs:154-156)


def _metal_eta_k(scene, it, wl):
    m = scene.materials
    eta_row = jnp.maximum(m.eta_row[it.mat_id], 0)
    k_row = jnp.maximum(m.k_row[it.mat_id], 0)
    eta = _bank_eval(scene, eta_row, wl)
    k = _bank_eval(scene, k_row, wl)
    return eta, k


def _metal_sample(scene, it, wo_t, uv2, wl, nm_frame):
    from . import microfacet as mf
    eta, k = _metal_eta_k(scene, it, wl)
    rough = _roughness(scene, it)
    alpha = rough * rough            # metal_material.rs:80-82
    smooth = alpha < SMOOTH_ALPHA
    wo = _nm_to(nm_frame, wo_t)

    # specular branch (conductor.rs:274-295): wi = mirror, f = F, pdf = 1
    wi_s = _mirror(wo)
    f_s = mf.fresnel_complex(jnp.abs(wi_s.z), eta, k)

    # microfacet branch (conductor.rs:297-351)
    wm = mf.sample_vndf(wo, uv2, alpha, alpha)
    wi_m = mf.reflect(wo, wm)
    same = mf.same_hemisphere(wo, wi_m)
    f_m = _torrance_sparrow_f(wo, wi_m, wm, eta, k, alpha)
    pdf_m = mf.vndf_pdf(wo, wm, alpha, alpha) / jnp.maximum(
        4.0 * jnp.abs(dot3(wo, wm)), 1e-12)

    zero4 = smap(jnp.zeros_like, f_m)
    f = sel(smooth, f_s, sel(same, f_m, zero4))
    wi = sel(smooth, wi_s, wi_m)
    pdf = jnp.where(smooth, 1.0, pdf_m)
    ok = (wo.z != 0.0) & (smooth | (same & (pdf_m > 0.0)))
    wi_t = _nm_from(nm_frame, wi)
    return f, wi_t, pdf, ok, smooth


def _torrance_sparrow_f(wo, wi, wm, eta, k, alpha):
    from . import microfacet as mf
    cos_o = jnp.abs(wo.z)
    fres = mf.fresnel_complex(jnp.abs(dot3(wo, wm)), eta, k)
    d = mf.distribution_d(wm, alpha, alpha)
    g = mf.g2(wo, wi, alpha, alpha)
    f = fres * jnp.where(cos_o > 0.0,
                         d * g / jnp.maximum(4.0 * cos_o, 1e-12), 0.0)
    return f


def _metal_eval(scene, it, wo_t, wi_t, wl, nm_frame):
    from . import microfacet as mf
    eta, k = _metal_eta_k(scene, it, wl)
    rough = _roughness(scene, it)
    alpha = rough * rough
    smooth = alpha < SMOOTH_ALPHA
    wo = _nm_to(nm_frame, wo_t)
    wi = _nm_to(nm_frame, wi_t)
    wm = wo + wi
    ok = (~smooth) & mf.same_hemisphere(wo, wi) & (dot3(wm, wm) > 0.0) & \
        (wo.z != 0.0) & (wi.z != 0.0)
    wm = normalize3(wm)
    f = _torrance_sparrow_f(wo, wi, wm, eta, k, alpha)
    pdf = mf.vndf_pdf(wo, wm, alpha, alpha) / jnp.maximum(
        4.0 * jnp.abs(dot3(wo, wm)), 1e-12)
    return smap(lambda x: jnp.where(ok, x, 0.0), f), jnp.where(ok, pdf, 0.0)


# ---------------------------------------------------------------------------
# Dielectric: glass (measured dispersive eta) and plastic (constant eta+tint)
# (ref: bsdf/dielectric.rs + glass_material.rs + plastic_material.rs)
# ---------------------------------------------------------------------------

def _dielectric_eta(scene, it, wl, dispersive: bool) -> S4:
    """S4 absolute IOR of the medium."""
    m = scene.materials
    if dispersive:
        row = jnp.maximum(m.eta_row[it.mat_id], 0)
        return _bank_eval(scene, row, wl)
    e = m.const_eta[it.mat_id]
    return S4(e, e, e, e)


def _dielectric_sample(scene, it, wo_t, uc, uv2, wl, nm_frame,
                       dispersive: bool, tinted: bool):
    """DielectricBsdf::sample batched (dielectric.rs:168-527).

    Returns (f, wi_t, pdf, ok, specular, terminate) — terminate marks
    dispersive transmission events that collapse secondary wavelengths
    (dielectric.rs:500-502,610-613).
    """
    from . import microfacet as mf
    r = uc.shape[0]
    n_abs = _dielectric_eta(scene, it, wl, dispersive)    # absolute IOR
    entering = dot3(it.geo_n, it.wo) > 0.0                # glass_material.rs:119
    thin = scene.materials.thin[it.mat_id] > 0
    rough = _roughness(scene, it)
    alpha = rough                                          # raw (glass_material.rs:124)
    smooth = alpha < SMOOTH_ALPHA

    wo = _nm_to(nm_frame, wo_t)

    # relative IOR spectrum: entering or thin -> n, leaving -> 1/n
    ent = entering | thin
    eta_rel = smap(lambda n: jnp.where(ent, n, 1.0 / n), n_abs)
    eta_scalar = eta_rel.a

    # ---- smooth path (dielectric.rs:416-527) -----------------------------
    zero = jnp.zeros((r,))
    n_vec = V3(zero, zero, jnp.where(entering, 1.0, -1.0))
    fres_s = mf.fresnel_dielectric(jnp.abs(wo.z), eta_rel)
    avg_f_s = s4_mean(fres_s)
    pr_s, pt_s = _refl_trans_probs(avg_f_s, thin)
    choose_refl_s = uc < pr_s / jnp.maximum(pr_s + pt_s, 1e-12)
    wi_refl = _mirror(wo)
    wt, refract_ok = mf.refract(wo, n_vec, eta_scalar)
    wi_thin_t = -wo
    f_refl_s = fres_s
    # transmit: thin -> (1-F); solid -> (1-F)/eta^2 (radiance scaling :511)
    one_m_f = 1.0 - fres_s
    f_trans_s = sel(thin, one_m_f, one_m_f * (1.0 / (eta_scalar ** 2)))
    wi_s = sel(choose_refl_s, wi_refl, sel(thin, wi_thin_t, wt))
    f_s = sel(choose_refl_s, f_refl_s, f_trans_s)
    pdf_s = jnp.where(choose_refl_s, pr_s / jnp.maximum(pr_s + pt_s, 1e-12),
                      pt_s / jnp.maximum(pr_s + pt_s, 1e-12))
    ok_s = jnp.where(choose_refl_s, jnp.abs(wo.z) > 1e-6,
                     thin | refract_ok)

    # ---- rough path (dielectric.rs:236-412) ------------------------------
    wm = mf.sample_vndf(wo, uv2, alpha, alpha)
    fres_m = mf.fresnel_dielectric(jnp.abs(dot3(wo, wm)), eta_rel)
    avg_f_m = s4_mean(fres_m)
    pr_m, pt_m = _refl_trans_probs(avg_f_m, thin)
    choose_refl_m = uc < pr_m / jnp.maximum(pr_m + pt_m, 1e-12)

    # reflection lobe
    wi_mr = mf.reflect(wo, wm)
    same_r = mf.same_hemisphere(wo, wi_mr)
    d = mf.distribution_d(wm, alpha, alpha)
    g_r = mf.g2(wo, wi_mr, alpha, alpha)
    cos_o = jnp.maximum(jnp.abs(wo.z), 1e-12)
    prob_r = pr_m / jnp.maximum(pr_m + pt_m, 1e-12)
    # f = F D G / (4 cos_o): with the f-includes-cosine convention the
    # explicit cos_i cancels (the reference's dielectric *sample* multiplies
    # an extra |cos_i| that its own evaluate() and the conductor lack,
    # dielectric.rs:318 vs :588 — we implement the consistent form)
    f_mr = fres_m * (d * g_r / (4.0 * cos_o))
    pdf_mr = mf.vndf_pdf(wo, wm, alpha, alpha) / jnp.maximum(
        4.0 * jnp.abs(dot3(wo, wm)), 1e-12) * prob_r
    ok_mr = same_r & (jnp.abs(dot3(wo, wm)) > 1e-6)

    # transmission lobe (dielectric.rs:329-363)
    wm_refr = sel(entering, wm, -wm)
    wi_mt, refr_ok_m = mf.refract(wo, wm_refr, eta_scalar)
    prob_t = pt_m / jnp.maximum(pr_m + pt_m, 1e-12)
    # thin rough transmission is pass-through (dielectric.rs:366-389)
    wi_mt = sel(thin, -wo, wi_mt)
    denom = (dot3(wi_mt, wm) + dot3(wo, wm) / eta_scalar) ** 2
    dwm_dwi = jnp.abs(dot3(wi_mt, wm)) / jnp.maximum(denom, 1e-12)
    g_t = mf.g2(wo, wi_mt, alpha, alpha)
    f_mt_solid = (1.0 - fres_m) * (
        d * g_t * jnp.abs(dot3(wi_mt, wm)) * jnp.abs(dot3(wo, wm))
        / (jnp.maximum(denom, 1e-12) * cos_o * eta_scalar ** 2))
    pdf_mt_solid = mf.vndf_pdf(wo, wm, alpha, alpha) * dwm_dwi * prob_t
    f_mt = sel(thin, 1.0 - fres_m, f_mt_solid)
    pdf_mt = jnp.where(thin, prob_t, pdf_mt_solid)
    ok_mt = jnp.where(thin, jnp.ones(r, bool),
                      refr_ok_m & ~mf.same_hemisphere(wo, wi_mt) &
                      (jnp.abs(wi_mt.z) > 0.0))

    wi_m = sel(choose_refl_m, wi_mr, wi_mt)
    f_m = sel(choose_refl_m, f_mr, f_mt)
    pdf_m = jnp.where(choose_refl_m, pdf_mr, pdf_mt)
    ok_m = jnp.where(choose_refl_m, ok_mr, ok_mt)

    # ---- merge smooth/rough ---------------------------------------------
    choose_refl = jnp.where(smooth, choose_refl_s, choose_refl_m)
    wi = sel(smooth, wi_s, wi_m)
    f = sel(smooth, f_s, f_m)
    pdf = jnp.where(smooth, pdf_s, pdf_m)
    ok = jnp.where(smooth, ok_s, ok_m) & (wo.z != 0.0)
    specular = smooth

    # plastic tint on transmission (plastic_material.rs:166-170; we use the
    # surface uv, fixing the reference's use of the random sample as uv)
    if tinted:
        tint = _albedo_spectrum(scene, it, wl)
        transmitted = (dot3(wi, wo) < 0.0) & ~choose_refl
        f = sel(transmitted, f * tint, f)

    # dispersive transmission terminates secondary wavelengths
    terminate = (~choose_refl) & ok if dispersive else jnp.zeros(r, bool)

    wi_t = _nm_from(nm_frame, wi)
    return f, wi_t, pdf, ok, specular, terminate


def _refl_trans_probs(avg_fresnel, thin):
    """(pr, pt); thin surfaces use the geometric-series cumulative R'
    (dielectric.rs:398-412)."""
    r = avg_fresnel
    t = 1.0 - r
    r2 = r * r
    r_thin = jnp.where(r2 > 1.0, 1.0, r + (t * t * r) / jnp.maximum(1.0 - r2, 1e-12))
    pr = jnp.where(thin, r_thin, r)
    pt = t
    return pr, pt


def _dielectric_eval(scene, it, wo_t, wi_t, wl, nm_frame, dispersive: bool,
                     tinted: bool):
    """evaluate + pdf for rough dielectrics (dielectric.rs:532-646);
    zero for smooth (delta)."""
    from . import microfacet as mf
    n_abs = _dielectric_eta(scene, it, wl, dispersive)
    entering = dot3(it.geo_n, it.wo) > 0.0
    thin = scene.materials.thin[it.mat_id] > 0
    alpha = _roughness(scene, it)
    smooth = alpha < SMOOTH_ALPHA

    wo = _nm_to(nm_frame, wo_t)
    wi = _nm_to(nm_frame, wi_t)

    ent = entering | thin
    eta_rel = smap(lambda n: jnp.where(ent, n, 1.0 / n), n_abs)
    eta_scalar = eta_rel.a

    cos_o = wo.z
    cos_i = wi.z
    is_refl = cos_i * cos_o > 0.0

    # generalized half vector (dielectric.rs:195-231)
    etap = jnp.where(is_refl, 1.0, jnp.where(cos_o > 0.0, eta_scalar,
                                             1.0 / eta_scalar))
    wm = wi * etap + wo
    ok = (cos_i != 0.0) & (cos_o != 0.0) & (dot3(wm, wm) > 0.0) & ~smooth
    wm = normalize3(wm)
    wm = sel(wm.z < 0.0, -wm, wm)
    ok = ok & (dot3(wm, wi) * cos_i >= 0.0) & (dot3(wm, wo) * cos_o >= 0.0)

    fres = mf.fresnel_dielectric(jnp.abs(dot3(wo, wm)), eta_rel)
    avg_f = s4_mean(fres)
    pr, pt = _refl_trans_probs(avg_f, thin)
    d = mf.distribution_d(wm, alpha, alpha)
    g = mf.g2(wo, wi, alpha, alpha)
    aco = jnp.maximum(jnp.abs(cos_o), 1e-12)

    f_refl = fres * (d * g / (4.0 * aco))
    denom = (dot3(wi, wm) + dot3(wo, wm) / eta_scalar) ** 2
    f_trans = (1.0 - fres) * (
        d * g * jnp.abs(dot3(wi, wm)) * jnp.abs(dot3(wo, wm))
        / (jnp.maximum(denom, 1e-12) * aco * eta_scalar ** 2))
    f = sel(is_refl, f_refl, f_trans)

    vnd = mf.vndf_pdf(wo, wm, alpha, alpha)
    pdf_refl = vnd / jnp.maximum(4.0 * jnp.abs(dot3(wo, wm)), 1e-12) \
        * pr / jnp.maximum(pr + pt, 1e-12)
    dwm_dwi = jnp.abs(dot3(wi, wm)) / jnp.maximum(denom, 1e-12)
    pdf_trans_solid = vnd * dwm_dwi * pt / jnp.maximum(pr + pt, 1e-12)
    pdf_trans = jnp.where(thin, pt / jnp.maximum(pr + pt, 1e-12),
                          pdf_trans_solid)
    pdf = jnp.where(is_refl, pdf_refl, pdf_trans)

    if tinted:
        tint = _albedo_spectrum(scene, it, wl)
        f = sel(~is_refl, f * tint, f)

    return smap(lambda x: jnp.where(ok, x, 0.0), f), jnp.where(ok, pdf, 0.0)


# ---------------------------------------------------------------------------
# Generalized Schlick (Adobe Fresnel model) — R-only mode, used by PBR + coat
# (ref: bsdf/generalized_schlick.rs:92-116; the RT scatter mode exists in the
# reference but is not reachable from any material, so only R is implemented)
# ---------------------------------------------------------------------------

def _schlick_fresnel(cos_theta, r0: S4, r90: S4, exponent, tint: S4) -> S4:
    """F = r0 + (r90-r0)(1-cos)^exp - a cos (1-cos)^6, Lazanyi dip term
    (generalized_schlick.rs:92-116).  cos_theta: (R,); spectra S4."""
    c = jnp.clip(cos_theta, 0.0, 1.0)
    omc = 1.0 - c
    cos_max = 1.0 / 7.0
    omc_max = 1.0 - cos_max
    base = r0 + (r90 - r0) * omc ** exponent
    f_max = r0 + (r90 - r0) * (omc_max ** exponent)
    a = f_max * (1.0 - tint) * (1.0 / (cos_max * omc_max ** 6))
    return base - a * (c * omc ** 6)


def _schlick_r_sample(wo, uv2, alpha, r0, r90, tint, exponent=5.0):
    """Sample the R-only generalized-Schlick lobe (smooth -> delta).

    Returns (f, wi, pdf, ok, specular) in the local (normal-map) frame.
    """
    from . import microfacet as mf
    smooth = alpha < SMOOTH_ALPHA
    # specular
    wi_s = _mirror(wo)
    f_s = _schlick_fresnel(jnp.abs(wi_s.z), r0, r90, exponent, tint)
    # microfacet torrance-sparrow with Schlick fresnel
    wm = mf.sample_vndf(wo, uv2, alpha, alpha)
    wi_m = mf.reflect(wo, wm)
    same = mf.same_hemisphere(wo, wi_m)
    cos_o = jnp.maximum(jnp.abs(wo.z), 1e-12)
    fres = _schlick_fresnel(jnp.abs(dot3(wo, wm)), r0, r90, exponent, tint)
    d = mf.distribution_d(wm, alpha, alpha)
    g = mf.g2(wo, wi_m, alpha, alpha)
    f_m = fres * (d * g / (4.0 * cos_o))
    pdf_m = mf.vndf_pdf(wo, wm, alpha, alpha) / jnp.maximum(
        4.0 * jnp.abs(dot3(wo, wm)), 1e-12)

    zero4 = smap(jnp.zeros_like, f_m)
    f = sel(smooth, f_s, sel(same, f_m, zero4))
    wi = sel(smooth, wi_s, wi_m)
    pdf = jnp.where(smooth, 1.0, pdf_m)
    ok = (wo.z != 0.0) & (smooth | (same & (pdf_m > 0.0)))
    return f, wi, pdf, ok, smooth


def _schlick_r_eval(wo, wi, alpha, r0, r90, tint, exponent=5.0):
    from . import microfacet as mf
    smooth = alpha < SMOOTH_ALPHA
    wm = wo + wi
    ok = (~smooth) & mf.same_hemisphere(wo, wi) & (dot3(wm, wm) > 0.0) & \
        (wo.z != 0.0) & (wi.z != 0.0)
    wm = normalize3(wm)
    cos_o = jnp.maximum(jnp.abs(wo.z), 1e-12)
    fres = _schlick_fresnel(jnp.abs(dot3(wo, wm)), r0, r90, exponent, tint)
    d = mf.distribution_d(wm, alpha, alpha)
    g = mf.g2(wo, wi, alpha, alpha)
    f = fres * (d * g / (4.0 * cos_o))
    pdf = mf.vndf_pdf(wo, wm, alpha, alpha) / jnp.maximum(
        4.0 * jnp.abs(dot3(wo, wm)), 1e-12)
    return smap(lambda x: jnp.where(ok, x, 0.0), f), jnp.where(ok, pdf, 0.0)


# ---------------------------------------------------------------------------
# SimplePbr: metallic Schlick lobe + dielectric (Schlick specular / Lambert
# diffuse Fresnel-weighted mix) (ref: simple_pbr_material.rs:280-537)
# ---------------------------------------------------------------------------

def _pbr_params(scene, it, wl):
    m = scene.materials
    base = _albedo_spectrum(scene, it, wl)                # S4
    metallic = m.metallic[it.mat_id]
    tex_ids = m.metallic_tex[it.mat_id]
    if len(scene.textures):
        t = tex_mod.sample_indexed(scene.textures, tex_ids, it.uv, 1,
                                   jnp.zeros(1))[:, 0]
        metallic = jnp.where(tex_ids >= 0, t, metallic)
    rough = _roughness(scene, it)
    alpha = rough * rough                                  # :55-57
    ior = m.const_eta[it.mat_id]
    r = (ior - 1.0) / (ior + 1.0)
    r2 = r * r
    r0_diel = S4(r2, r2, r2, r2)                           # :61-64
    return base, metallic, alpha, r0_diel


def _pbr_sample(scene, it, wo_t, uc, uc2, uv2, wl, nm_frame,
                alpha=None, params=None):
    """sample_mixed (simple_pbr_material.rs:379-409): uc<=metallic -> metal
    lobe; else dielectric with Fresnel-weighted specular/diffuse choice.

    uc / uc2 are SEPARATE sampler dimensions for the two sequential
    decisions (metal-vs-dielectric, then specular-vs-diffuse) — the
    reference draws fresh dims per decision via its stateful sampler;
    remapping one dim loses low-discrepancy stratification.  The 2-D lobe
    sample uv2 is shared across the three MUTUALLY EXCLUSIVE lobes (only
    the picked lobe's value is consumed, so no correlation enters)."""
    wo = _nm_to(nm_frame, wo_t)
    base, metallic, alpha_p, r0_diel = params or _pbr_params(scene, it, wl)
    if alpha is None:
        alpha = alpha_p
    one = _s4_ones(wo.z)

    pick_metal = uc <= metallic

    # metal lobe: r0 = base color (:280-296)
    f_m, wi_m, pdf_m, ok_m, spec_m = _schlick_r_sample(wo, uv2, alpha,
                                                       base, one, one)
    # dielectric: specular with prob F̄(wo) else diffuse (:313-376)
    fbar = s4_mean(_schlick_fresnel(jnp.abs(wo.z), r0_diel, one, 5.0, one))
    pick_spec = uc2 < fbar
    f_s, wi_s, pdf_s, ok_s, spec_s = _schlick_r_sample(wo, uv2, alpha,
                                                       r0_diel, one, one)
    pdf_s = pdf_s * fbar
    # diffuse lobe
    wi_d = sample_cosine_hemisphere(uv2)
    wi_d = _flip_z(wi_d, wo.z < 0.0)
    cos_d = jnp.abs(wi_d.z)
    f_d = base * (cos_d * INV_PI * (1.0 - fbar))
    pdf_d = cos_d * INV_PI * (1.0 - fbar)
    ok_d = (wo.z != 0.0) & (wi_d.z != 0.0)

    f = sel(pick_metal, f_m, sel(pick_spec, f_s, f_d))
    wi = sel(pick_metal, wi_m, sel(pick_spec, wi_s, wi_d))
    pdf = jnp.where(pick_metal, pdf_m, jnp.where(pick_spec, pdf_s, pdf_d))
    ok = jnp.where(pick_metal, ok_m, jnp.where(pick_spec, ok_s, ok_d))
    spec = jnp.where(pick_metal, spec_m, jnp.where(pick_spec, spec_s, False))

    wi_t = _nm_from(nm_frame, wi)
    return f, wi_t, pdf, ok, spec


def _pbr_eval(scene, it, wo_t, wi_t, wl, nm_frame, alpha=None, params=None):
    """metallic lerp of metal lobe and (schlick + (1-F̄) lambert)
    (:146-202, :437-537)."""
    wo = _nm_to(nm_frame, wo_t)
    wi = _nm_to(nm_frame, wi_t)
    base, metallic, alpha_p, r0_diel = params or _pbr_params(scene, it, wl)
    if alpha is None:
        alpha = alpha_p
    one = _s4_ones(wo.z)

    f_metal, pdf_metal = _schlick_r_eval(wo, wi, alpha, base, one, one)
    f_spec, pdf_spec = _schlick_r_eval(wo, wi, alpha, r0_diel, one, one)
    fbar = s4_mean(_schlick_fresnel(jnp.abs(wo.z), r0_diel, one, 5.0, one))
    # lambert component
    cos_o, cos_i = wo.z, wi.z
    same = (jnp.sign(cos_o) == jnp.sign(cos_i)) & (cos_o != 0.0) & (cos_i != 0.0)
    f_lamb = base * jnp.where(same, jnp.abs(cos_i) * INV_PI, 0.0)
    pdf_lamb = jnp.where(same, jnp.abs(cos_i) * INV_PI, 0.0)

    f_diel = f_spec + f_lamb * (1.0 - fbar)
    pdf_diel = fbar * pdf_spec + (1.0 - fbar) * pdf_lamb
    return f_metal * metallic + f_diel * (1.0 - metallic), \
        metallic * pdf_metal + (1.0 - metallic) * pdf_diel


# ---------------------------------------------------------------------------
# Clearcoat: Schlick coat over the PBR substrate with Beer-Lambert tint
# (ref: simple_pbr_clearcoat_material.rs:60-846)
# ---------------------------------------------------------------------------

def _coat_params(scene, it, wl):
    m = scene.materials
    thickness = m.coat_thickness[it.mat_id]
    tex_ids = m.coat_thickness_tex[it.mat_id]
    if len(scene.textures):
        t = tex_mod.sample_indexed(scene.textures, tex_ids, it.uv, 1,
                                   jnp.zeros(1))[:, 0]
        thickness = jnp.where(tex_ids >= 0, t, thickness)
    coat_alpha = m.coat_roughness[it.mat_id] ** 2
    ior = m.coat_eta[it.mat_id]
    rr = (ior - 1.0) / (ior + 1.0)
    r2 = rr * rr
    r0 = S4(r2, r2, r2, r2)
    tint = rgb2spec.sigmoid_poly_s4(m.coat_tint_coeff[it.mat_id], wl.lam)
    return thickness, coat_alpha, r0, tint


def _beer_lambert(tint: S4, thickness_mm, cos_theta) -> S4:
    """exp(-sigma L), sigma = -ln(tint)/1mm, L = thickness/cos
    (simple_pbr_clearcoat_material.rs:87-107)."""
    l = thickness_mm * 0.001 / jnp.maximum(cos_theta, 1e-4)
    return smap(lambda t: jnp.exp(jnp.log(jnp.maximum(t, 1e-6))
                                  * (l / 0.001)), tint)


def _clearcoat_sample(scene, it, wo_t, uc, uc2, uc3, uv2, wl, nm_frame):
    """Coat-vs-substrate choice by the coat's directional albedo.

    Deviation (documented): the reference estimates the coat albedo with a
    64-sample thread-rng Monte Carlo per vertex
    (generalized_schlick.rs:893-918) — a determinism and grad hazard; we use
    the analytic Schlick Fresnel at wo, exact for smooth coats and a close
    approximation for the rough coats in scenes 17-18.

    Each sequential decision draws its own sampler dimension: uc picks
    coat vs substrate, uc2 the substrate's metal lobe, uc3 its
    specular-vs-diffuse split (no conditioned-remap reuse).
    """
    wo = _nm_to(nm_frame, wo_t)
    one = _s4_ones(wo.z)
    thickness, coat_alpha, coat_r0, tint = _coat_params(scene, it, wl)
    params = _pbr_params(scene, it, wl)

    e_coat = s4_mean(_schlick_fresnel(jnp.abs(wo.z), coat_r0, one, 5.0, one))
    has_coat = thickness > 0.0
    e_coat = jnp.where(has_coat, e_coat, 0.0)
    pick_coat = uc < e_coat

    f_c, wi_c, pdf_c, ok_c, spec_c = _schlick_r_sample(wo, uv2, coat_alpha,
                                                       coat_r0, one, one)
    pdf_c = pdf_c * e_coat

    f_b, wi_b_t, pdf_b, ok_b, spec_b = _pbr_sample(scene, it, wo_t, uc2,
                                                   uc3, uv2, wl, nm_frame,
                                                   params=params)
    wi_b = _nm_to(nm_frame, wi_b_t)
    att = _beer_lambert(tint, thickness, jnp.abs(wo.z)) * \
        _beer_lambert(tint, thickness, jnp.abs(wi_b.z))
    att = sel(has_coat, att, one)
    f_b = f_b * att
    pdf_b = pdf_b * jnp.where(has_coat, 1.0 - e_coat, 1.0)

    f = sel(pick_coat, f_c, f_b)
    wi = sel(pick_coat, wi_c, wi_b)
    pdf = jnp.where(pick_coat, pdf_c, pdf_b)
    ok = jnp.where(pick_coat, ok_c, ok_b)
    spec = jnp.where(pick_coat, spec_c, spec_b)
    wi_t = _nm_from(nm_frame, wi)
    return f, wi_t, pdf, ok, spec


def _clearcoat_eval(scene, it, wo_t, wi_t, wl, nm_frame):
    """f = f_coat + att*f_substrate; pdf lerped by the coat albedo."""
    wo = _nm_to(nm_frame, wo_t)
    wi = _nm_to(nm_frame, wi_t)
    one = _s4_ones(wo.z)
    thickness, coat_alpha, coat_r0, tint = _coat_params(scene, it, wl)
    has_coat = thickness > 0.0

    f_c, pdf_c = _schlick_r_eval(wo, wi, coat_alpha, coat_r0, one, one)
    e_coat = s4_mean(_schlick_fresnel(jnp.abs(wo.z), coat_r0, one, 5.0, one))
    e_coat = jnp.where(has_coat, e_coat, 0.0)

    f_b, pdf_b = _pbr_eval(scene, it, wo_t, wi_t, wl, nm_frame)
    att = _beer_lambert(tint, thickness, jnp.abs(wo.z)) * \
        _beer_lambert(tint, thickness, jnp.abs(wi.z))
    att = sel(has_coat, att, one)

    zero4 = smap(jnp.zeros_like, f_c)
    f = sel(has_coat, f_c, zero4) + f_b * att
    pdf = e_coat * pdf_c + (1.0 - e_coat) * pdf_b
    return f, pdf


# ---------------------------------------------------------------------------
# Public dispatch API
# ---------------------------------------------------------------------------

def _geo_sidedness(it, frame: Frame, wo_t: V3, wi_t: V3):
    """Opaque materials reject transmission through the geometric normal
    (lambert_material.rs:78-93): sign(wo . ng) must equal sign(wi . ng),
    evaluated in the vertex-tangent frame."""
    ng_t = to_frame(frame, it.geo_n)
    co = dot3(wo_t, ng_t)
    ci = dot3(wi_t, ng_t)
    return jnp.sign(co) == jnp.sign(ci)


def sample_material(scene: SceneData, meta: SceneMeta, it, frame: Frame,
                    wo_t: V3, uc, uv2: V2, wl, uc2=None,
                    uc3=None) -> MaterialSample:
    """Batched BsdfSurfaceMaterial::sample over all rays.

    frame: render->vertex-tangent rotation (utils/vec.Frame).
    uc / uc2 / uc3: independent 1-D draws for up to three SEQUENTIAL lobe
    decisions (mirrors the reference's fresh-dimension-per-decision
    stateful sampler).  The integrator passes real sampler dims; when a
    caller omits uc2/uc3 (unit tests), decorrelated bit-hashes of uc
    stand in.
    """
    r = uc.shape[0]
    if uc2 is None:
        uc2 = _hash_unit(uc, 0x9E3779B9)
    if uc3 is None:
        uc3 = _hash_unit(uc, 0x85EBCA6B)
    mat_type = scene.materials.mat_type[it.mat_id]
    nm_frame = _normal_map_frame(scene, it, wo_t)

    zero = jnp.zeros((r,))
    f = S4(zero, zero, zero, zero)
    wi_t = V3(zero, zero, jnp.ones((r,)))
    pdf = zero
    sampled = jnp.zeros(r, bool)
    specular = jnp.zeros(r, bool)

    terminate = jnp.zeros(r, bool)
    kinds = set(meta.present_mat_kinds)

    def merge(m, kf, kwi, kpdf, kok, kspec):
        nonlocal f, wi_t, pdf, sampled, specular
        f = sel(m, kf, f)
        wi_t = sel(m, kwi, wi_t)
        pdf = jnp.where(m, kpdf, pdf)
        sampled = jnp.where(m, kok, sampled)
        specular = jnp.where(m, kspec, specular)

    if MAT_LAMBERT in kinds:
        lf, lwi, lpdf, lok = _lambert_sample(scene, it, wo_t, uv2, wl, nm_frame)
        merge(mat_type == MAT_LAMBERT, lf, lwi, lpdf, lok, jnp.zeros(r, bool))
    if MAT_METAL in kinds:
        mf_, mwi, mpdf, mok, mspec = _metal_sample(scene, it, wo_t, uv2, wl,
                                                   nm_frame)
        merge(mat_type == MAT_METAL, mf_, mwi, mpdf, mok, mspec)
    if MAT_GLASS in kinds:
        gf, gwi, gpdf, gok, gspec, gterm = _dielectric_sample(
            scene, it, wo_t, uc, uv2, wl, nm_frame, dispersive=True,
            tinted=False)
        m = mat_type == MAT_GLASS
        merge(m, gf, gwi, gpdf, gok, gspec)
        terminate = terminate | (m & gterm)
    if MAT_PLASTIC in kinds:
        pf, pwi, ppdf, pok, pspec, _ = _dielectric_sample(
            scene, it, wo_t, uc, uv2, wl, nm_frame, dispersive=False,
            tinted=True)
        merge(mat_type == MAT_PLASTIC, pf, pwi, ppdf, pok, pspec)
    if MAT_PBR in kinds:
        bf, bwi, bpdf, bok, bspec = _pbr_sample(scene, it, wo_t, uc, uc2,
                                                uv2, wl, nm_frame)
        merge(mat_type == MAT_PBR, bf, bwi, bpdf, bok, bspec)
    if MAT_CLEARCOAT in kinds:
        cf, cwi, cpdf, cok, cspec = _clearcoat_sample(scene, it, wo_t, uc,
                                                      uc2, uc3, uv2, wl,
                                                      nm_frame)
        merge(mat_type == MAT_CLEARCOAT, cf, cwi, cpdf, cok, cspec)

    # dispersion collapse (dielectric.rs:500-502)
    from ..spectrum.sampled import terminate_secondary
    out_wl = terminate_secondary(wl, terminate)

    # geometric sidedness check for the opaque kinds
    opaque = (mat_type == MAT_LAMBERT) | (mat_type == MAT_METAL) | \
        (mat_type == MAT_PBR) | (mat_type == MAT_CLEARCOAT)
    side_ok = _geo_sidedness(it, frame, wo_t, wi_t)
    sampled = sampled & (~opaque | side_ok)

    return MaterialSample(f=f, wi_t=wi_t, pdf=pdf, sampled=sampled,
                          specular=specular, wl=out_wl)


def evaluate_material(scene: SceneData, meta: SceneMeta, it, frame: Frame,
                      wo_t: V3, wi_t: V3, wl):
    """Batched evaluate + pdf (used by NEE).  Returns (f S4, pdf (R,))."""
    r = wo_t.z.shape[0]
    mat_type = scene.materials.mat_type[it.mat_id]
    nm_frame = _normal_map_frame(scene, it, wo_t)

    zero = jnp.zeros((r,))
    f = S4(zero, zero, zero, zero)
    pdf = zero
    kinds = set(meta.present_mat_kinds)

    def merge(m, kf, kpdf):
        nonlocal f, pdf
        f = sel(m, kf, f)
        pdf = jnp.where(m, kpdf, pdf)

    if MAT_LAMBERT in kinds:
        lf, lpdf = _lambert_eval(scene, it, wo_t, wi_t, wl, nm_frame)
        merge(mat_type == MAT_LAMBERT, lf, lpdf)
    if MAT_METAL in kinds:
        mf_, mpdf = _metal_eval(scene, it, wo_t, wi_t, wl, nm_frame)
        merge(mat_type == MAT_METAL, mf_, mpdf)
    if MAT_GLASS in kinds:
        gf, gpdf = _dielectric_eval(scene, it, wo_t, wi_t, wl, nm_frame,
                                    dispersive=True, tinted=False)
        merge(mat_type == MAT_GLASS, gf, gpdf)
    if MAT_PLASTIC in kinds:
        pf, ppdf = _dielectric_eval(scene, it, wo_t, wi_t, wl, nm_frame,
                                    dispersive=False, tinted=True)
        merge(mat_type == MAT_PLASTIC, pf, ppdf)
    if MAT_PBR in kinds:
        bf, bpdf = _pbr_eval(scene, it, wo_t, wi_t, wl, nm_frame)
        merge(mat_type == MAT_PBR, bf, bpdf)
    if MAT_CLEARCOAT in kinds:
        cf, cpdf = _clearcoat_eval(scene, it, wo_t, wi_t, wl, nm_frame)
        merge(mat_type == MAT_CLEARCOAT, cf, cpdf)

    opaque = (mat_type == MAT_LAMBERT) | (mat_type == MAT_METAL) | \
        (mat_type == MAT_PBR) | (mat_type == MAT_CLEARCOAT)
    side_ok = _geo_sidedness(it, frame, wo_t, wi_t)
    keep = ~opaque | side_ok
    return smap(lambda x: jnp.where(keep, x, 0.0), f), jnp.where(keep, pdf, 0.0)


def is_bsdf_material(scene: SceneData, it) -> jnp.ndarray:
    """(R,) bool — material has a BSDF (emissive-only surfaces end paths,
    base_renderer.rs:199-203)."""
    return scene.materials.mat_type[it.mat_id] != MAT_EMISSIVE


def emission_spectral(scene: SceneData, meta: SceneMeta, mat_id, uv: V2,
                      wl) -> S4:
    """Radiance spectrum x intensity for material rows ``mat_id`` at ``uv``,
    S4, no emissive-type gating (ref: emissive_material.rs radiance via
    SpectrumParameter — constant spectrum or RGB texture)."""
    m = scene.materials
    row = m.emission_row[mat_id]
    scale = m.emission_scale[mat_id]
    le_bank = _bank_eval(scene, jnp.maximum(row, 0), wl)
    le = smap(lambda x: jnp.where(row >= 0, x, 0.0), le_bank)
    if meta.has_emission_tex and len(scene.textures):
        tex_ids = m.emission_tex[mat_id]
        rgb = tex_mod.sample_indexed(scene.textures, tex_ids, uv, 3,
                                     jnp.zeros(3))
        # D65 is scene-spectra row 0 (builder invariant)
        d65 = (sgrid.bank_pick(wl.bank, jnp.zeros_like(row))
               if wl.bank is not None else None)
        le_tex = rgb2spec.illuminant_eval_s4(rgb, wl.lam, scene.rs_zn,
                                             scene.rs_coeffs,
                                             scene.spectra[0], d65_vals=d65)
        le = sel(tex_ids >= 0, le_tex, le)
    return le * scale


def emitted_radiance(scene: SceneData, meta: SceneMeta, it, wl) -> S4:
    """Le at an emissive hit, S4 (ref: emissive_material.rs radiance =
    spectrum x intensity via UniformEdf — direction independent)."""
    m = scene.materials
    le = emission_spectral(scene, meta, it.mat_id, it.uv, wl)
    is_emissive = m.mat_type[it.mat_id] == MAT_EMISSIVE
    return smap(lambda x: jnp.where(is_emissive, x, 0.0), le)


def sample_albedo(scene: SceneData, meta: SceneMeta, it, wl) -> S4:
    """sample_albedo_spectrum for the albedo AOV (albedo_renderer.rs:17-70)."""
    return _albedo_spectrum(scene, it, wl)
