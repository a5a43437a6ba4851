"""Material system: batched BSDF sample / evaluate / pdf with tag dispatch.

Replaces the reference's ``Arc<dyn SurfaceMaterial>`` trait objects
(scene/src/material/traits.rs:10-109) with masked evaluation over the
material kinds *present in the scene* (static set from SceneMeta): each
kind's sample/eval runs once over the full ray batch and results merge by
``mat_type`` masks.  With <= 5 kinds per scene this is a bounded constant
factor and keeps everything branch-free for the VPU; ray sorting by material
is a later optimization.

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

import jax.numpy as jnp

from ..scene.types import (MAT_CLEARCOAT, MAT_EMISSIVE, MAT_GLASS,
                           MAT_LAMBERT, MAT_METAL, MAT_PBR, MAT_PLASTIC,
                           SceneData, SceneMeta)
from ..spectrum import grid as sgrid
from ..spectrum import rgb2spec
from ..spectrum.sampled import SampledWavelengths
from ..utils.math import dot, from_frame, make_frame, normalize, to_frame
from . import texture as tex_mod

INV_PI = 1.0 / math.pi


class MaterialSample(NamedTuple):
    """Batched MaterialSample (ref: samples.rs:37-100)."""
    f: jnp.ndarray          # (R, 4) BSDF value (cosine included)
    wi_t: jnp.ndarray       # (R, 3) sampled direction, vertex-tangent space
    pdf: jnp.ndarray        # (R,)
    sampled: jnp.ndarray    # (R,) bool
    specular: jnp.ndarray   # (R,) bool
    wl: SampledWavelengths  # possibly dispersion-terminated wavelengths


# ---------------------------------------------------------------------------
# Shared helpers
# ---------------------------------------------------------------------------

def _albedo_spectrum(scene: SceneData, it, wl) -> jnp.ndarray:
    """Base color/albedo at the hit, as a (R, 4) spectral reflectance.

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
    return rgb2spec.sigmoid_poly(coeff, wl.lam)


def _normal_map_frame(scene: SceneData, it, wo_t):
    """Per-ray normal-map rotation within the vertex-tangent frame.

    Returns a (R, 3, 3) rotation N such that v_nm = N @ v_t, identity where
    the material has no normal map (ref: Transform::from_normal_map,
    math/src/transform.rs:216-245, operating inside tangent space where the
    vertex normal is +Z and the vertex tangent is +X).
    """
    m = scene.materials
    tex_ids = m.normal_tex[it.mat_id]
    r = it.uv.shape[0]
    if not len(scene.textures):
        return None
    raw = tex_mod.sample_indexed(scene.textures, tex_ids, it.uv, 3,
                                 jnp.asarray([0.5, 0.5, 1.0]))
    n = normalize(raw * 2.0 - 1.0)
    n = jnp.where((tex_ids >= 0)[:, None], n, jnp.asarray([0.0, 0.0, 1.0]))
    # frame around the perturbed normal keeping +X as tangent direction
    x_axis = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (r, 3))
    return make_frame(n, x_axis)


def _roughness(scene: SceneData, it) -> jnp.ndarray:
    m = scene.materials
    rough = m.roughness[it.mat_id]
    tex_ids = m.roughness_tex[it.mat_id]
    if len(scene.textures):
        t = tex_mod.sample_indexed(scene.textures, tex_ids, it.uv, 1,
                                   jnp.zeros(1))[:, 0]
        rough = jnp.where(tex_ids >= 0, t, rough)
    return rough


def sample_cosine_hemisphere(uv):
    """(R, 2) -> (R, 3) cosine-weighted +Z hemisphere (bsdf/lambert.rs:12-17)."""
    r = jnp.sqrt(uv[:, 0])
    theta = 2.0 * math.pi * uv[:, 1]
    z = jnp.sqrt(jnp.maximum(1.0 - uv[:, 0], 0.0))
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta), z], axis=-1)


# ---------------------------------------------------------------------------
# Lambert (ref: bsdf/lambert.rs + lambert_material.rs)
# ---------------------------------------------------------------------------

def _lambert_sample(scene, it, wo_t, uv2, wl, nm_frame):
    albedo = _albedo_spectrum(scene, it, wl)              # (R, 4)
    wo_nm = to_frame(nm_frame, wo_t) if nm_frame is not None else wo_t
    wi_nm = sample_cosine_hemisphere(uv2)
    # flip to wo's hemisphere (lambert.rs:45-50)
    flip = wo_nm[:, 2] < 0.0
    wi_nm = jnp.where(flip[:, None], wi_nm * jnp.asarray([1.0, 1.0, -1.0]), wi_nm)
    cos_i = jnp.abs(wi_nm[:, 2])
    f = albedo * (cos_i * INV_PI)[:, None]
    pdf = cos_i * INV_PI
    wi_t = from_frame(nm_frame, wi_nm) if nm_frame is not None else wi_nm
    ok = (wo_nm[:, 2] != 0.0) & (wi_nm[:, 2] != 0.0)
    return f, wi_t, pdf, ok


def _lambert_eval(scene, it, wo_t, wi_t, wl, nm_frame):
    albedo = _albedo_spectrum(scene, it, wl)
    if nm_frame is not None:
        wo_nm = to_frame(nm_frame, wo_t)
        wi_nm = to_frame(nm_frame, wi_t)
    else:
        wo_nm, wi_nm = wo_t, wi_t
    cos_o = wo_nm[:, 2]
    cos_i = wi_nm[:, 2]
    same = (jnp.sign(cos_o) == jnp.sign(cos_i)) & (cos_o != 0.0) & (cos_i != 0.0)
    f = albedo * (jnp.abs(cos_i) * INV_PI)[:, None]
    f = jnp.where(same[:, None], f, 0.0)
    pdf = jnp.where(same, jnp.abs(cos_i) * INV_PI, 0.0)
    return f, pdf


# ---------------------------------------------------------------------------
# Public dispatch API
# ---------------------------------------------------------------------------

def _geo_sidedness(it, frame, wo_t, wi_t):
    """Opaque materials reject transmission through the geometric normal
    (lambert_material.rs:78-93): sign(wo . ng) must equal sign(wi . ng),
    evaluated in the vertex-tangent frame."""
    ng_t = to_frame(frame, it.geo_n)
    co = dot(wo_t, ng_t)
    ci = dot(wi_t, ng_t)
    return jnp.sign(co) == jnp.sign(ci)


def sample_material(scene: SceneData, meta: SceneMeta, it, frame, wo_t,
                    uc, uv2, wl) -> MaterialSample:
    """Batched BsdfSurfaceMaterial::sample over all rays.

    frame: (R, 3, 3) render->vertex-tangent rotation (rows t, b, n).
    """
    r = wo_t.shape[0]
    mat_type = scene.materials.mat_type[it.mat_id]
    nm_frame = _normal_map_frame(scene, it, wo_t)

    f = jnp.zeros((r, 4))
    wi_t = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (r, 3))
    pdf = jnp.zeros(r)
    sampled = jnp.zeros(r, bool)
    specular = jnp.zeros(r, bool)
    out_wl = wl

    kinds = set(meta.present_mat_kinds)
    if MAT_LAMBERT in kinds:
        lf, lwi, lpdf, lok = _lambert_sample(scene, it, wo_t, uv2, wl, nm_frame)
        m = (mat_type == MAT_LAMBERT)
        f = jnp.where(m[:, None], lf, f)
        wi_t = jnp.where(m[:, None], lwi, wi_t)
        pdf = jnp.where(m, lpdf, pdf)
        sampled = jnp.where(m, lok, sampled)
        # lambert is never specular

    # geometric sidedness check for the opaque kinds
    opaque = (mat_type == MAT_LAMBERT) | (mat_type == MAT_METAL) | \
        (mat_type == MAT_PBR) | (mat_type == MAT_CLEARCOAT)
    side_ok = _geo_sidedness(it, frame, wo_t, wi_t)
    sampled = sampled & (~opaque | side_ok)

    return MaterialSample(f=f, wi_t=wi_t, pdf=pdf, sampled=sampled,
                          specular=specular, wl=out_wl)


def evaluate_material(scene: SceneData, meta: SceneMeta, it, frame, wo_t,
                      wi_t, wl):
    """Batched evaluate + pdf (used by NEE).  Returns (f (R,4), pdf (R,))."""
    r = wo_t.shape[0]
    mat_type = scene.materials.mat_type[it.mat_id]
    nm_frame = _normal_map_frame(scene, it, wo_t)

    f = jnp.zeros((r, 4))
    pdf = jnp.zeros(r)
    kinds = set(meta.present_mat_kinds)
    if MAT_LAMBERT in kinds:
        lf, lpdf = _lambert_eval(scene, it, wo_t, wi_t, wl, nm_frame)
        m = (mat_type == MAT_LAMBERT)
        f = jnp.where(m[:, None], lf, f)
        pdf = jnp.where(m, lpdf, pdf)

    opaque = (mat_type == MAT_LAMBERT) | (mat_type == MAT_METAL) | \
        (mat_type == MAT_PBR) | (mat_type == MAT_CLEARCOAT)
    side_ok = _geo_sidedness(it, frame, wo_t, wi_t)
    keep = ~opaque | side_ok
    return jnp.where(keep[:, None], f, 0.0), jnp.where(keep, pdf, 0.0)


def is_bsdf_material(scene: SceneData, it) -> jnp.ndarray:
    """(R,) bool — material has a BSDF (emissive-only surfaces end paths,
    base_renderer.rs:199-203)."""
    return scene.materials.mat_type[it.mat_id] != MAT_EMISSIVE


def emitted_radiance(scene: SceneData, it, wl) -> jnp.ndarray:
    """Le at an emissive hit, (R, 4) (ref: emissive_material.rs radiance =
    spectrum x intensity via UniformEdf — direction independent)."""
    m = scene.materials
    row = m.emission_row[it.mat_id]
    scale = m.emission_scale[it.mat_id]
    spd = scene.spectra[jnp.maximum(row, 0)]              # (R, 470)
    le = sgrid.eval_dense(spd, wl.lam) * scale[:, None]
    is_emissive = (m.mat_type[it.mat_id] == MAT_EMISSIVE) & (row >= 0)
    return jnp.where(is_emissive[:, None], le, 0.0)


def sample_albedo(scene: SceneData, meta: SceneMeta, it, wl) -> jnp.ndarray:
    """sample_albedo_spectrum for the albedo AOV (albedo_renderer.rs:17-70)."""
    return _albedo_spectrum(scene, it, wl)
