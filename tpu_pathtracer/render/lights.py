"""Light sampling: per-wavelength power CDF, NEE contributions, MIS pdfs.

Replaces the reference's per-NEE-event LightSampler construction
(scene/src/light_sampler.rs:168-220 — rebuilt per shadow ray!) with one
vectorized weight computation per ray batch: phi(lambda) for every light is
a dense-bank gather + multiply, so the (R, L) weight table costs one fused
elementwise pass.

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
from ..spectrum import rgb2spec
from ..utils.math import dot, normalize, select_lane, to_frame
from . import bsdf as bsdf_mod

RAY_EPS_NEE = 1.0e-4   # ref: renderer/src/renderer/common.rs:12
BIG_T = 3.0e38


class NeeResult(NamedTuple):
    contribution: jnp.ndarray  # (R, 4)
    mis_weight: jnp.ndarray    # (R,)


def _phi_lambda(scene: SceneData, wl):
    """(R, L): mean-over-lanes spectral power per light."""
    from ..utils.math import mean_last
    rows = scene.lights.spectrum_row                      # (L,)
    n_l = rows.shape[0]
    if wl.bank is not None:
        k = wl.bank.shape[-1] - 3
        if n_l * k <= 64:
            # per-sample slice: each light's spectrum column picked by an
            # unrolled scalar-cond select (no one-hot reduce — see
            # utils.math.sum_last), then a component-form lane mean
            cols = []
            for s in range(n_l):
                v = jnp.where(rows[s] == 0, wl.bank[..., 3], 0.0)
                for i in range(1, k):
                    v = jnp.where(rows[s] == i, wl.bank[..., 3 + i], v)
                cols.append(mean_last(v))                 # (R,)
            phi = jnp.stack(cols, axis=-1)                # (R, L)
        else:
            # many lights x spectra: a quadratic unroll would bloat the
            # trace; one fused one-hot contraction instead
            mean_bank = mean_last(
                jnp.swapaxes(wl.bank[..., 3:], -1, -2))   # (R, K)
            oh = (rows[:, None] ==
                  jnp.arange(k, dtype=jnp.int32)[None, :])  # (L, K)
            phi = jnp.einsum("rk,lk->rl", mean_bank,
                             oh.astype(mean_bank.dtype))  # (R, L)
    else:
        spd = scene.spectra[rows]                         # (L, 470)
        vals = sgrid.eval_dense(spd.T, wl.lam)            # (R, 4, L)
        phi = vals.mean(1)
    return phi * scene.lights.phi_scale[None, :]          # (R, L)


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
    w = _phi_lambda(scene, wl)                            # (R, L)
    total = w.sum(-1)
    cdf = jnp.cumsum(w, -1) / jnp.maximum(total, 1e-20)[:, None]
    row = jnp.sum((u[:, None] >= cdf[:, :-1]).astype(jnp.int32), -1) \
        if n_lights > 1 else jnp.zeros(r, jnp.int32)
    prob = select_lane(w, row) / jnp.maximum(total, 1e-20)
    return row, prob, total > 0.0


def light_probability(scene: SceneData, meta: SceneMeta, wl, light_row):
    """Selection probability of a given light row (ref: probability,
    light_sampler.rs:47-62)."""
    w = _phi_lambda(scene, wl)
    total = w.sum(-1)
    pw = select_lane(w, jnp.maximum(light_row, 0))
    return jnp.where(light_row >= 0, pw / jnp.maximum(total, 1e-20), 0.0)


# ---------------------------------------------------------------------------
# NEE
# ---------------------------------------------------------------------------

def _sample_area_point(scene: SceneData, meta: SceneMeta, light_row, s, uv2):
    """Uniform-area point on an area light (emissive_triangle_mesh.rs:176-230).

    The triangle is found by a lower-bound binary search of the light's
    per-light CDF run — ``ceil(log2(meta.max_area_tris))`` static steps, so
    emissive meshes of ANY triangle count sample correctly (no silent cap).

    Returns (p (R,3), light_normal (R,3), tri (R,), uv (R,2))."""
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
    u0, u1 = uv2[:, 0], uv2[:, 1]
    b0 = jnp.where(u0 < u1, u0 / 2.0, u0 - u1 / 2.0)
    b1 = jnp.where(u0 < u1, u1 - u0 / 2.0, u1 / 2.0)
    b2 = 1.0 - b0 - b1

    p0 = scene.bvh.p0[tri]
    p1 = scene.bvh.p1[tri]
    p2 = scene.bvh.p2[tri]
    p = b0[:, None] * p0 + b1[:, None] * p1 + b2[:, None] * p2
    n = normalize(jnp.cross(p1 - p0, p2 - p0))
    uv = (b0[:, None] * scene.tri_uv0[tri] + b1[:, None] * scene.tri_uv1[tri]
          + b2[:, None] * scene.tri_uv2[tri])
    return p, n, tri, uv


def evaluate_nee(scene: SceneData, meta: SceneMeta, it, frame, wo_t, wl,
                 u_light, u_s, u_uv, with_mis: bool) -> NeeResult:
    """One NEE event for every ray (masked by light types present).

    Mirrors evaluate_next_event_estimation[_with_mis]
    (nee_renderer.rs:19-104, mis_renderer.rs:21-123) with ONE shadow-ray
    batch for all rays.
    """
    r = wo_t.shape[0]
    zero = NeeResult(jnp.zeros((r, 4)), jnp.ones(r))
    if meta.n_lights == 0:
        return zero

    light_row, prob, any_l = pick_light(scene, meta, wl, u_light)
    lt = scene.lights.light_type[light_row]
    l_spec = bsdf_mod._bank_eval(scene,
                                 scene.lights.spectrum_row[light_row],
                                 wl)                              # (R, 4)
    l_int = scene.lights.intensity[light_row]

    types = set(meta.light_types)

    # --- shadow ray setup per light type (masked) -------------------------
    wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (r, 3))
    t_max = jnp.full((r,), BIG_T)
    dist2 = jnp.ones(r)
    # radiance factor: the (R, 4) light term before 1/prob and the BSDF
    light_term = jnp.zeros((r, 4))
    pdf_dir = jnp.ones(r)   # direction pdf for MIS (area/env)
    is_delta = jnp.ones(r, bool)

    if LIGHT_POINT in types or LIGHT_SPOT in types:
        lp = scene.lights.position[light_row]
        dvec = lp - it.position
        d2 = jnp.maximum(dot(dvec, dvec), 1e-12)
        wdir = dvec / jnp.sqrt(d2)[:, None]
        m = (lt == LIGHT_POINT) | (lt == LIGHT_SPOT)
        # point: I*spec/d^2 (common.rs:23-52); spot adds smoothstep falloff
        inten = l_spec * l_int[:, None]
        if LIGHT_SPOT in types:
            axis = scene.lights.direction[light_row]
            cos_t = dot(-wdir, axis)
            ci = scene.lights.cos_inner[light_row]
            co = scene.lights.cos_outer[light_row]
            tt = jnp.clip((cos_t - co) / jnp.maximum(ci - co, 1e-8), 0.0, 1.0)
            falloff = tt * tt * (3.0 - 2.0 * tt)
            inten = jnp.where((lt == LIGHT_SPOT)[:, None],
                              inten * falloff[:, None], inten)
        wi = jnp.where(m[:, None], wdir, wi)
        dist = jnp.sqrt(d2)
        t_max = jnp.where(m, dist - 2.0 * RAY_EPS_NEE, t_max)
        light_term = jnp.where(m[:, None], inten / d2[:, None], light_term)

    if LIGHT_DIRECTIONAL in types:
        m = lt == LIGHT_DIRECTIONAL
        ldir = scene.lights.direction[light_row]
        wi = jnp.where(m[:, None], ldir, wi)
        t_max = jnp.where(m, BIG_T, t_max)
        light_term = jnp.where(m[:, None], l_spec * l_int[:, None], light_term)

    if LIGHT_AREA in types:
        m = lt == LIGHT_AREA
        p, ln, _tri, uv_l = _sample_area_point(scene, meta, light_row, u_s, u_uv)
        dvec = p - it.position
        d2 = jnp.maximum(dot(dvec, dvec), 1e-12)
        wdir = dvec / jnp.sqrt(d2)[:, None]
        cos_l = jnp.abs(dot(ln, -wdir))
        area_total = jnp.maximum(scene.lights.area_total[light_row], 1e-12)
        pdf_area = 1.0 / area_total                       # :284-288
        g = cos_l / d2                                    # geometric term
        # radiance = material emission at the sampled point (UniformEdf;
        # textured radiance samples emission_tex, emissive_material.rs:15-80)
        le = bsdf_mod.emission_spectral(
            scene, meta, jnp.maximum(scene.lights.mat_id[light_row], 0),
            uv_l, wl)
        wi = jnp.where(m[:, None], wdir, wi)
        t_max = jnp.where(m, jnp.sqrt(d2) - 2.0 * RAY_EPS_NEE, t_max)
        light_term = jnp.where(m[:, None], le * (g / pdf_area)[:, None],
                               light_term)
        pdf_dir_area = pdf_area * d2 / jnp.maximum(cos_l, 1e-8)  # :292
        pdf_dir = jnp.where(m, pdf_dir_area, pdf_dir)
        is_delta = is_delta & ~m

    if LIGHT_ENV in types and scene.env is not None:
        m = lt == LIGHT_ENV
        from .env import sample_env_direction
        wdir, le, p_dir = sample_env_direction(scene, wl, u_uv)
        wi = jnp.where(m[:, None], wdir, wi)
        t_max = jnp.where(m, BIG_T, t_max)
        light_term = jnp.where(m[:, None],
                               le / jnp.maximum(p_dir, 1e-12)[:, None],
                               light_term)
        pdf_dir = jnp.where(m, p_dir, pdf_dir)
        is_delta = is_delta & ~m

    # --- one batched shadow ray ------------------------------------------
    shadow_o = it.position + wi * RAY_EPS_NEE
    occluded = trace.intersect_p(scene.bvh, shadow_o, wi, t_max,
                                 active=any_l & it.valid)
    visible = ~occluded & any_l & it.valid

    # --- BSDF factor ------------------------------------------------------
    wi_t = to_frame(frame, wi)
    f, pdf_bsdf = bsdf_mod.evaluate_material(scene, meta, it, frame, wo_t,
                                             wi_t, wl)
    contrib = f * light_term / jnp.maximum(prob, 1e-12)[:, None]
    contrib = jnp.where(visible[:, None], contrib, 0.0)

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


def pdf_light_for_hit_pos(scene: SceneData, meta: SceneMeta, prev_pos,
                          next_it, wl):
    """Same as pdf_light_for_hit with the previous vertex given as a bare
    position (the regenerative wavefront carries only the position)."""
    light_row = next_it.light_id
    is_area = (light_row >= 0) & next_it.valid
    prob = light_probability(scene, meta, wl, light_row)
    area_total = jnp.maximum(scene.lights.area_total[jnp.maximum(light_row, 0)],
                             1e-12)
    dvec = prev_pos - next_it.position
    d2 = jnp.maximum(dot(dvec, dvec), 1e-12)
    cos_l = jnp.abs(dot(next_it.geo_n, normalize(dvec)))
    pdf_dir = (1.0 / area_total) * d2 / jnp.maximum(cos_l, 1e-8)
    return jnp.where(is_area, prob * pdf_dir, 0.0)


def pdf_env_for_direction(scene: SceneData, meta: SceneMeta, wl, direction):
    """Summed pdf over infinite lights for a BSDF-sampled escape direction
    (Scene::pdf_infinite_light_sample, scene.rs:185-210)."""
    if not meta.has_env:
        return jnp.zeros(direction.shape[0])
    from .env import env_pdf_direction
    # the scene builder enforces exactly one env light (builder.add_env_light
    # raises on a second), so the sum over infinite lights is this one term
    env_rows = [i for i, t in enumerate(meta.light_types) if t == LIGHT_ENV]
    pdf = jnp.zeros(direction.shape[0])
    for er in env_rows:
        row = jnp.full(direction.shape[:1], er, jnp.int32)
        prob = light_probability(scene, meta, wl, row)
        pdf = pdf + prob * env_pdf_direction(scene, direction)
    return pdf
