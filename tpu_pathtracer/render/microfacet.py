"""Trowbridge-Reitz (GGX) microfacet machinery, batched, true-SoA.

The D / Lambda / G1 / G / VNDF functions shared by the conductor, dielectric
and generalized-Schlick BSDFs (the reference duplicates these per BSDF:
conductor.rs:159-250, dielectric.rs:34-132, generalized_schlick.rs).
Anisotropic (alpha_x, alpha_y); all demo materials pass alpha_x == alpha_y.

Directions are ``V3`` component triples in a local shading frame with +Z
the (normal-mapped) normal; spectral quantities are ``S4`` lane quads
(utils/vec.py) — every op here is a full-width (R,) VPU op.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from ..utils.vec import S4, V2, V3, cross3, dot3, normalize3, sel


def _cos2_theta(w: V3):
    return w.z * w.z


def _tan2_theta(w: V3):
    c2 = _cos2_theta(w)
    return jnp.where(c2 > 0.0, (1.0 - c2) / jnp.maximum(c2, 1e-20), jnp.inf)


def _cos_sin_phi(w: V3):
    sin_t = jnp.sqrt(jnp.maximum(1.0 - _cos2_theta(w), 0.0))
    safe = sin_t > 0.0
    inv = 1.0 / jnp.maximum(sin_t, 1e-20)
    cp = jnp.where(safe, jnp.clip(w.x * inv, -1, 1), 1.0)
    sp = jnp.where(safe, jnp.clip(w.y * inv, -1, 1), 0.0)
    return cp, sp


def distribution_d(wm: V3, ax, ay):
    """Trowbridge-Reitz D(wm) (conductor.rs:159-173)."""
    t2 = _tan2_theta(wm)
    c4 = _cos2_theta(wm) ** 2
    cp, sp = _cos_sin_phi(wm)
    e = t2 * (cp * cp / jnp.maximum(ax * ax, 1e-12)
              + sp * sp / jnp.maximum(ay * ay, 1e-12))
    d = 1.0 / (math.pi * ax * ay * jnp.maximum(c4, 1e-20) * (1.0 + e) ** 2)
    return jnp.where(jnp.isfinite(t2) & (c4 > 0), d, 0.0)


def lambda_(w: V3, ax, ay):
    """Smith Lambda (conductor.rs:176-185)."""
    t2 = _tan2_theta(w)
    cp, sp = _cos_sin_phi(w)
    a2 = (cp * ax) ** 2 + (sp * ay) ** 2
    lam = (jnp.sqrt(1.0 + a2 * t2) - 1.0) / 2.0
    return jnp.where(jnp.isfinite(t2), lam, 0.0)


def g1(w: V3, ax, ay):
    return 1.0 / (1.0 + lambda_(w, ax, ay))


def g2(wo: V3, wi: V3, ax, ay):
    """Bidirectional masking-shadowing (conductor.rs:195-202)."""
    return 1.0 / (1.0 + lambda_(wo, ax, ay) + lambda_(wi, ax, ay))


def vndf_pdf(w: V3, wm: V3, ax, ay):
    """Visible normal distribution D_w(wm) (conductor.rs:205-216)."""
    cos_w = jnp.abs(w.z)
    d = g1(w, ax, ay) / jnp.maximum(cos_w, 1e-20) * distribution_d(wm, ax, ay) \
        * jnp.abs(dot3(w, wm))
    return jnp.where(cos_w > 0.0, d, 0.0)


def sample_vndf(w: V3, u: V2, ax, ay) -> V3:
    """Sample the visible normal distribution (conductor.rs:219-250,
    Heitz's ellipsoid warp)."""
    wh = normalize3(V3(ax * w.x, ay * w.y, w.z))
    wh = sel(wh.z < 0.0, -wh, wh)

    # t1 = normalize(cross(+Z, wh)) unless wh ~ +Z
    up_cross = V3(-wh.y, wh.x, jnp.zeros_like(wh.z))
    t1 = sel(wh.z < 0.99999, normalize3(up_cross),
             V3(jnp.ones_like(wh.z), jnp.zeros_like(wh.z),
                jnp.zeros_like(wh.z)))
    t2 = cross3(wh, t1)

    r = jnp.sqrt(u.x)
    phi = 2.0 * math.pi * u.y
    px = r * jnp.cos(phi)
    py = r * jnp.sin(phi)
    h = jnp.sqrt(jnp.maximum(1.0 - px * px, 0.0))
    lerp_f = (1.0 + wh.z) / 2.0
    py = h * (1.0 - lerp_f) + py * lerp_f
    pz = jnp.sqrt(jnp.maximum(1.0 - px * px - py * py, 0.0))
    nh = t1 * px + t2 * py + wh * pz
    return normalize3(V3(ax * nh.x, ay * nh.y, jnp.maximum(nh.z, 1e-6)))


def reflect(wo: V3, n: V3) -> V3:
    """Mirror wo about n (common.rs:60-66)."""
    return n * (2.0 * dot3(wo, n)) - wo


def refract(wi: V3, n: V3, eta):
    """Refraction through n with relative IOR eta (common.rs:110-139).

    Returns (wt, ok) — ok False on total internal reflection.
    """
    cos_i = dot3(wi, n)
    sin2_i = jnp.maximum(1.0 - cos_i * cos_i, 0.0)
    sin2_t = sin2_i / (eta * eta)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    wt = -wi * (1.0 / eta) + n * (cos_i / eta - cos_t)
    ok = ~tir & (dot3(wt, wt) > 1e-12)
    return normalize3(wt), ok


def same_hemisphere(a: V3, b: V3):
    return a.z * b.z > 0.0


def _fresnel_dielectric_lane(ci, eta):
    """(R,) dielectric Fresnel for one wavelength lane (1 on TIR)."""
    sin2_i = 1.0 - ci * ci
    sin2_t = sin2_i / (eta * eta)
    cos_t = jnp.sqrt(jnp.clip(1.0 - sin2_t, 0.0, 1.0))
    r_par = (eta * ci - cos_t) / (eta * ci + cos_t)
    r_per = (ci - eta * cos_t) / (ci + eta * cos_t)
    return 0.5 * (r_par * r_par + r_per * r_per)


def fresnel_dielectric(cos_i, eta: S4) -> S4:
    """Spectral dielectric Fresnel (common.rs:84-107).

    cos_i: (R,); eta: S4 relative IOR -> S4 reflectance (1 on TIR).
    """
    ci = jnp.clip(cos_i, 0.0, 1.0)
    return S4(*(_fresnel_dielectric_lane(ci, e) for e in eta.lanes))


def _fresnel_complex_lane(ci, er, ei):
    """(R,) conductor Fresnel for one lane; explicit real/imag arithmetic
    (no complex dtype: TPU-friendly)."""
    sin2_i = 1.0 - ci * ci

    # sin2_t = sin2_i / eta^2 in complex arithmetic, eta_c = er + i ei
    e2r = er * er - ei * ei
    e2i = 2.0 * er * ei
    den = jnp.maximum(e2r * e2r + e2i * e2i, 1e-20)
    s2t_r = sin2_i * e2r / den
    s2t_i = -sin2_i * e2i / den

    # cos_t = sqrt(1 - sin2_t)
    wr = 1.0 - s2t_r
    wi_ = -s2t_i
    mag = jnp.sqrt(wr * wr + wi_ * wi_)
    ang = jnp.arctan2(wi_, wr) * 0.5
    sq = jnp.sqrt(mag)
    ctr = sq * jnp.cos(ang)
    cti = sq * jnp.sin(ang)

    def cdiv(ar, ai, br, bi):
        d = jnp.maximum(br * br + bi * bi, 1e-20)
        return (ar * br + ai * bi) / d, (ai * br - ar * bi) / d

    # r_parl = (eta*ci - cos_t) / (eta*ci + cos_t)
    pr, pi = cdiv(er * ci - ctr, ei * ci - cti, er * ci + ctr, ei * ci + cti)
    # r_perp = (ci - eta*cos_t) / (ci + eta*cos_t)
    ect_r = er * ctr - ei * cti
    ect_i = er * cti + ei * ctr
    sr, si = cdiv(ci - ect_r, -ect_i, ci + ect_r, ect_i)

    return 0.5 * ((pr * pr + pi * pi) + (sr * sr + si * si))


def fresnel_complex(cos_i, eta: S4, k: S4) -> S4:
    """Spectral conductor Fresnel with complex IOR (conductor.rs:88-121)."""
    ci = jnp.clip(cos_i, 0.0, 1.0)
    return S4(*(_fresnel_complex_lane(ci, er, ei)
                for er, ei in zip(eta.lanes, k.lanes)))
