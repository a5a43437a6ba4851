"""Light sampling: per-wavelength power CDF, NEE contributions, MIS pdfs.

Replaces the reference's per-NEE-event LightSampler construction
(scene/src/light_sampler.rs:168-220 — rebuilt per shadow ray!) with one
vectorized weight computation per ray batch: phi(lambda) for every light is
an O(K) select over the pre-evaluated wavelength bank, carried as per-light
``(R,)`` component arrays (the light count L is static, so the CDF walk
unrolls into pure elementwise ops — no (R, L) lane-padded table).

The MIS weights here include the light-selection probability on BOTH the
NEE and BSDF sides.  The reference omits the selection probability on the
NEE side (mis_renderer.rs:101 + common.rs:160-171) — an inconsistency that
is invisible for its single-area-light scenes but biased for multi-light
scenes; we implement the consistent estimator (identical results when one
light of a type exists).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from ..ops import trace
from ..scene.types import (LIGHT_AREA, LIGHT_DIRECTIONAL, LIGHT_ENV,
                           LIGHT_POINT, LIGHT_SPOT, SceneData, SceneMeta)
from ..spectrum import grid as sgrid
from ..utils.vec import (S4, V2, V3, dot3, normalize3, s4_mean, sel, smap,
                         to_frame, v3_unstack, s4_stack)
from . import bsdf as bsdf_mod

RAY_EPS_NEE = 1.0e-4   # ref: renderer/src/renderer/common.rs:12
BIG_T = 3.0e38


class NeeResult(NamedTuple):
    contribution: S4
    mis_weight: jnp.ndarray    # (R,)


def _phi_lambda(scene: SceneData, wl, n_l: int):
    """Per-light mean-over-lanes spectral power: list of L (R,) arrays."""
    rows = scene.lights.spectrum_row                      # (L,)
    if wl.bank is not None:
        spectra = wl.bank.spectra
        k = len(spectra)
        means = [s4_mean(s) for s in spectra]             # K x (R,)
        if n_l * k <= 64:
            cols = []
            for s in range(n_l):
                v = jnp.where(rows[s] == 0, means[0], 0.0)
                for i in range(1, k):
                    v = jnp.where(rows[s] == i, means[i], v)
                cols.append(v)
        else:
            # many lights x spectra: one fused one-hot contraction
            stackm = jnp.stack(means, axis=0)             # (K, R)
            cols = []
            for s in range(n_l):
                oh = (rows[s] == jnp.arange(k, dtype=jnp.int32))[:, None]
                cols.append(jnp.sum(jnp.where(oh, stackm, 0.0), axis=0))
    else:
        spd = scene.spectra[rows]                         # (L, 470)
        lam = s4_stack(wl.lam)
        vals = sgrid.eval_dense(spd.T, lam)               # (R, 4, L)
        mean = vals.mean(1)                               # (R, L)
        cols = [mean[:, s] for s in range(n_l)]
    return [c * scene.lights.phi_scale[s] for s, c in enumerate(cols)]


def pick_light(scene: SceneData, meta: SceneMeta, wl, u):
    """Sample a light row per ray from the power CDF.

    Returns (light_row (R,) i32, probability (R,), any_light (R,) bool).
    (ref: LightSampler::sample_light, light_sampler.rs:26-44)
    """
    n_lights = meta.n_lights
    r = u.shape[0]
    if n_lights == 0:
        z = jnp.zeros(r)
        return jnp.zeros(r, jnp.int32), z, jnp.zeros(r, bool)
    w = _phi_lambda(scene, wl, n_lights)                  # L x (R,)
    total = w[0]
    for wi in w[1:]:
        total = total + wi
    inv_total = 1.0 / jnp.maximum(total, 1e-20)
    if n_lights == 1:
        row = jnp.zeros(r, jnp.int32)
        prob = w[0] * inv_total
    else:
        # unrolled CDF walk: row = count of interior cdf entries <= u
        row = jnp.zeros(r, jnp.int32)
        cum = jnp.zeros(r)
        for wi in w[:-1]:
            cum = cum + wi
            row = row + (u >= cum * inv_total).astype(jnp.int32)
        prob = jnp.where(row == 0, w[0], 0.0)
        for i in range(1, n_lights):
            prob = jnp.where(row == i, w[i], prob)
        prob = prob * inv_total
    return row, prob, total > 0.0


def light_probability(scene: SceneData, meta: SceneMeta, wl, light_row):
    """Selection probability of a given light row (ref: probability,
    light_sampler.rs:47-62)."""
    n_lights = meta.n_lights
    if n_lights == 0:
        return jnp.zeros(light_row.shape[0])
    w = _phi_lambda(scene, wl, n_lights)
    total = w[0]
    for wi in w[1:]:
        total = total + wi
    pw = jnp.where(light_row == 0, w[0], 0.0)
    for i in range(1, n_lights):
        pw = jnp.where(light_row == i, w[i], pw)
    return jnp.where(light_row >= 0, pw / jnp.maximum(total, 1e-20), 0.0)


# ---------------------------------------------------------------------------
# NEE
# ---------------------------------------------------------------------------

def _sample_area_point(scene: SceneData, meta: SceneMeta, light_row, s,
                       uv2: V2):
    """Uniform-area point on an area light (emissive_triangle_mesh.rs:176-230).

    The triangle is found by a lower-bound binary search of the light's
    per-light CDF run — ``ceil(log2(meta.max_area_tris))`` static steps, so
    emissive meshes of ANY triangle count sample correctly (no silent cap).

    Returns (p V3, light_normal V3, tri (R,), uv V2)."""
    first = scene.lights.area_first_tri[light_row]
    n_tris = scene.lights.area_n_tris[light_row]
    n_rows = scene.area_tri.shape[0]

    # first k in [0, n) with s < cdf[first + k] (clamped to n - 1);
    # lower-bound binary search needs ceil(log2(n + 1)) halvings to shrink
    # the [lo, hi) interval from length n to 0
    lo = jnp.zeros_like(light_row)
    hi = jnp.maximum(n_tris, 1)
    steps = int(math.ceil(math.log2(meta.max_area_tris + 1)))
    for _ in range(steps):
        mid = (lo + hi) // 2
        c = scene.area_tri_cdf[jnp.clip(first + mid, 0, n_rows - 1)]
        go_right = s >= c
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    at = jnp.clip(lo, 0, jnp.maximum(n_tris - 1, 0))
    gi = jnp.clip(first + at, 0, n_rows - 1)
    tri = scene.area_tri[gi]

    # barycentric warp (emissive_triangle_mesh.rs:199-209)
    u0, u1 = uv2.x, uv2.y
    b0 = jnp.where(u0 < u1, u0 / 2.0, u0 - u1 / 2.0)
    b1 = jnp.where(u0 < u1, u1 - u0 / 2.0, u1 / 2.0)
    b2 = 1.0 - b0 - b1

    vrow = scene.bvh.tri9[tri]                            # (R, 9)
    p0 = v3_unstack(vrow[:, 0:3])
    p1 = v3_unstack(vrow[:, 3:6])
    p2 = v3_unstack(vrow[:, 6:9])
    p = p0 * b0 + p1 * b1 + p2 * b2
    from ..utils.vec import cross3
    n = normalize3(cross3(p1 - p0, p2 - p0))
    arow = scene.tri_attr[tri]                            # (R, 18)
    uv = V2(arow[:, 9] * b0 + arow[:, 11] * b1 + arow[:, 13] * b2,
            arow[:, 10] * b0 + arow[:, 12] * b1 + arow[:, 14] * b2)
    return p, n, tri, uv


def evaluate_nee(scene: SceneData, meta: SceneMeta, it, frame, wo_t: V3, wl,
                 u_light, u_s, u_uv: V2, with_mis: bool) -> NeeResult:
    """One NEE event for every ray (masked by light types present).

    Mirrors evaluate_next_event_estimation[_with_mis]
    (nee_renderer.rs:19-104, mis_renderer.rs:21-123) with ONE shadow-ray
    batch for all rays.
    """
    r = u_light.shape[0]
    zero = jnp.zeros(r)
    zero4 = S4(zero, zero, zero, zero)
    if meta.n_lights == 0:
        return NeeResult(zero4, jnp.ones(r))

    light_row, prob, any_l = pick_light(scene, meta, wl, u_light)
    lt = scene.lights.light_type[light_row]
    l_spec = bsdf_mod._bank_eval(scene,
                                 scene.lights.spectrum_row[light_row], wl)
    l_int = scene.lights.intensity[light_row]

    types = set(meta.light_types)

    # --- shadow ray setup per light type (masked) -------------------------
    wi = V3(zero, zero, jnp.ones(r))
    t_max = jnp.full((r,), BIG_T)
    # radiance factor: the S4 light term before 1/prob and the BSDF
    light_term = zero4
    pdf_dir = jnp.ones(r)   # direction pdf for MIS (area/env)
    is_delta = jnp.ones(r, bool)

    if LIGHT_POINT in types or LIGHT_SPOT in types:
        lp = v3_unstack(scene.lights.position[light_row])
        dvec = lp - it.position
        d2 = jnp.maximum(dot3(dvec, dvec), 1e-12)
        inv_d = 1.0 / jnp.sqrt(d2)
        wdir = dvec * inv_d
        m = (lt == LIGHT_POINT) | (lt == LIGHT_SPOT)
        # point: I*spec/d^2 (common.rs:23-52); spot adds smoothstep falloff
        inten = l_spec * l_int
        if LIGHT_SPOT in types:
            axis = v3_unstack(scene.lights.direction[light_row])
            cos_t = dot3(-wdir, axis)
            ci = scene.lights.cos_inner[light_row]
            co = scene.lights.cos_outer[light_row]
            tt = jnp.clip((cos_t - co) / jnp.maximum(ci - co, 1e-8), 0.0, 1.0)
            falloff = tt * tt * (3.0 - 2.0 * tt)
            inten = sel(lt == LIGHT_SPOT, inten * falloff, inten)
        wi = sel(m, wdir, wi)
        dist = jnp.sqrt(d2)
        t_max = jnp.where(m, dist - 2.0 * RAY_EPS_NEE, t_max)
        light_term = sel(m, inten * (1.0 / d2), light_term)

    if LIGHT_DIRECTIONAL in types:
        m = lt == LIGHT_DIRECTIONAL
        ldir = v3_unstack(scene.lights.direction[light_row])
        wi = sel(m, ldir, wi)
        t_max = jnp.where(m, BIG_T, t_max)
        light_term = sel(m, l_spec * l_int, light_term)

    if LIGHT_AREA in types:
        m = lt == LIGHT_AREA
        p, ln, _tri, uv_l = _sample_area_point(scene, meta, light_row, u_s,
                                               u_uv)
        dvec = p - it.position
        d2 = jnp.maximum(dot3(dvec, dvec), 1e-12)
        wdir = dvec * (1.0 / jnp.sqrt(d2))
        cos_l = jnp.abs(dot3(ln, -wdir))
        area_total = jnp.maximum(scene.lights.area_total[light_row], 1e-12)
        pdf_area = 1.0 / area_total                       # :284-288
        g = cos_l / d2                                    # geometric term
        # radiance = material emission at the sampled point (UniformEdf;
        # textured radiance samples emission_tex, emissive_material.rs:15-80)
        le = bsdf_mod.emission_spectral(
            scene, meta, jnp.maximum(scene.lights.mat_id[light_row], 0),
            uv_l, wl)
        wi = sel(m, wdir, wi)
        t_max = jnp.where(m, jnp.sqrt(d2) - 2.0 * RAY_EPS_NEE, t_max)
        light_term = sel(m, le * (g / pdf_area), light_term)
        pdf_dir_area = pdf_area * d2 / jnp.maximum(cos_l, 1e-8)  # :292
        pdf_dir = jnp.where(m, pdf_dir_area, pdf_dir)
        is_delta = is_delta & ~m

    if LIGHT_ENV in types and scene.env is not None:
        m = lt == LIGHT_ENV
        from .env import sample_env_direction
        wdir, le, p_dir = sample_env_direction(scene, wl, u_uv)
        wi = sel(m, wdir, wi)
        t_max = jnp.where(m, BIG_T, t_max)
        light_term = sel(m, le * (1.0 / jnp.maximum(p_dir, 1e-12)),
                         light_term)
        pdf_dir = jnp.where(m, p_dir, pdf_dir)
        is_delta = is_delta & ~m

    # --- one batched shadow ray ------------------------------------------
    shadow_o = it.position + wi * RAY_EPS_NEE
    occluded = trace.intersect_p_scene(scene, shadow_o, wi, t_max,
                                       active=any_l & it.valid)
    visible = ~occluded & any_l & it.valid

    # --- BSDF factor ------------------------------------------------------
    wi_t = to_frame(frame, wi)
    f, pdf_bsdf = bsdf_mod.evaluate_material(scene, meta, it, frame, wo_t,
                                             wi_t, wl)
    contrib = f * light_term * (1.0 / jnp.maximum(prob, 1e-12))
    contrib = smap(lambda x: jnp.where(visible, x, 0.0), contrib)

    if with_mis:
        w = jnp.where(is_delta, 1.0,
                      _balance(prob * pdf_dir, pdf_bsdf))
        w = jnp.where(visible, w, 1.0)
    else:
        w = jnp.ones(r)
    return NeeResult(contribution=contrib, mis_weight=w)


def _balance(pdf_a, pdf_b):
    """Balance heuristic with 0/0 -> 0 (common.rs:15-20)."""
    s = pdf_a + pdf_b
    return jnp.where(s > 0.0, pdf_a / jnp.where(s > 0.0, s, 1.0), 0.0)


def pdf_light_for_hit(scene: SceneData, meta: SceneMeta, prev_it, next_it, wl):
    """Direction pdf of NEE having sampled the point we hit by BSDF sampling
    — selection probability x area pdf x area->solid-angle Jacobian
    (Scene::pdf_light_sample, scene.rs:156-182).  (R,) zeros for non-light
    hits."""
    return pdf_light_for_hit_pos(scene, meta, prev_it.position, next_it, wl)


def pdf_light_for_hit_pos(scene: SceneData, meta: SceneMeta, prev_pos: V3,
                          next_it, wl):
    """Same as pdf_light_for_hit with the previous vertex given as a bare
    position (the regenerative wavefront carries only the position)."""
    light_row = next_it.light_id
    is_area = (light_row >= 0) & next_it.valid
    prob = light_probability(scene, meta, wl, light_row)
    area_total = jnp.maximum(scene.lights.area_total[jnp.maximum(light_row, 0)],
                             1e-12)
    dvec = prev_pos - next_it.position
    d2 = jnp.maximum(dot3(dvec, dvec), 1e-12)
    cos_l = jnp.abs(dot3(next_it.geo_n, dvec)) / jnp.sqrt(d2)
    pdf_dir = (1.0 / area_total) * d2 / jnp.maximum(cos_l, 1e-8)
    return jnp.where(is_area, prob * pdf_dir, 0.0)


def pdf_env_for_direction(scene: SceneData, meta: SceneMeta, wl,
                          direction: V3):
    """Summed pdf over infinite lights for a BSDF-sampled escape direction
    (Scene::pdf_infinite_light_sample, scene.rs:185-210)."""
    r = direction.x.shape[0]
    if not meta.has_env:
        return jnp.zeros(r)
    from .env import env_pdf_direction
    # the scene builder enforces exactly one env light (builder.add_env_light
    # raises on a second), so the sum over infinite lights is this one term
    env_rows = [i for i, t in enumerate(meta.light_types) if t == LIGHT_ENV]
    pdf = jnp.zeros(r)
    for er in env_rows:
        row = jnp.full((r,), er, jnp.int32)
        prob = light_probability(scene, meta, wl, row)
        pdf = pdf + prob * env_pdf_direction(scene, direction)
    return pdf
