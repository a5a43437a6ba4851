"""Trowbridge-Reitz (GGX) microfacet machinery, batched.

The D / Lambda / G1 / G / VNDF functions shared by the conductor, dielectric
and generalized-Schlick BSDFs (the reference duplicates these per BSDF:
conductor.rs:159-250, dielectric.rs:34-132, generalized_schlick.rs).
Anisotropic (alpha_x, alpha_y); all demo materials pass alpha_x == alpha_y.

Directions live in a local shading frame with +Z the (normal-mapped) normal.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from ..utils.math import dot, normalize


def _cos2_theta(w):
    return w[..., 2] * w[..., 2]


def _tan2_theta(w):
    c2 = _cos2_theta(w)
    return jnp.where(c2 > 0.0, (1.0 - c2) / jnp.maximum(c2, 1e-20), jnp.inf)


def _cos_sin_phi(w):
    sin_t = jnp.sqrt(jnp.maximum(1.0 - _cos2_theta(w), 0.0))
    safe = sin_t > 0.0
    cp = jnp.where(safe, jnp.clip(w[..., 0] / jnp.maximum(sin_t, 1e-20), -1, 1), 1.0)
    sp = jnp.where(safe, jnp.clip(w[..., 1] / jnp.maximum(sin_t, 1e-20), -1, 1), 0.0)
    return cp, sp


def distribution_d(wm, ax, ay):
    """Trowbridge-Reitz D(wm) (conductor.rs:159-173)."""
    t2 = _tan2_theta(wm)
    c4 = _cos2_theta(wm) ** 2
    cp, sp = _cos_sin_phi(wm)
    e = t2 * (cp * cp / jnp.maximum(ax * ax, 1e-12)
              + sp * sp / jnp.maximum(ay * ay, 1e-12))
    d = 1.0 / (math.pi * ax * ay * jnp.maximum(c4, 1e-20) * (1.0 + e) ** 2)
    return jnp.where(jnp.isfinite(t2) & (c4 > 0), d, 0.0)


def lambda_(w, ax, ay):
    """Smith Lambda (conductor.rs:176-185)."""
    t2 = _tan2_theta(w)
    cp, sp = _cos_sin_phi(w)
    a2 = (cp * ax) ** 2 + (sp * ay) ** 2
    lam = (jnp.sqrt(1.0 + a2 * t2) - 1.0) / 2.0
    return jnp.where(jnp.isfinite(t2), lam, 0.0)


def g1(w, ax, ay):
    return 1.0 / (1.0 + lambda_(w, ax, ay))


def g2(wo, wi, ax, ay):
    """Bidirectional masking-shadowing (conductor.rs:195-202)."""
    return 1.0 / (1.0 + lambda_(wo, ax, ay) + lambda_(wi, ax, ay))


def vndf_pdf(w, wm, ax, ay):
    """Visible normal distribution D_w(wm) (conductor.rs:205-216)."""
    cos_w = jnp.abs(w[..., 2])
    d = g1(w, ax, ay) / jnp.maximum(cos_w, 1e-20) * distribution_d(wm, ax, ay) \
        * jnp.abs(dot(w, wm))
    return jnp.where(cos_w > 0.0, d, 0.0)


def sample_vndf(w, u, ax, ay):
    """Sample the visible normal distribution (conductor.rs:219-250,
    Heitz's ellipsoid warp). u: (R, 2)."""
    wh = normalize(jnp.stack([ax * w[..., 0], ay * w[..., 1], w[..., 2]], -1))
    wh = jnp.where((wh[..., 2] < 0.0)[..., None], -wh, wh)

    up = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), wh.shape)
    t1 = jnp.where((wh[..., 2] < 0.99999)[..., None],
                   normalize(jnp.cross(up, wh)),
                   jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), wh.shape))
    t2 = jnp.cross(wh, t1)

    r = jnp.sqrt(u[..., 0])
    phi = 2.0 * math.pi * u[..., 1]
    px = r * jnp.cos(phi)
    py = r * jnp.sin(phi)
    h = jnp.sqrt(jnp.maximum(1.0 - px * px, 0.0))
    lerp_f = (1.0 + wh[..., 2]) / 2.0
    py = h * (1.0 - lerp_f) + py * lerp_f
    pz = jnp.sqrt(jnp.maximum(1.0 - px * px - py * py, 0.0))
    nh = t1 * px[..., None] + t2 * py[..., None] + wh * pz[..., None]
    wm = jnp.stack([ax * nh[..., 0], ay * nh[..., 1],
                    jnp.maximum(nh[..., 2], 1e-6)], -1)
    return normalize(wm)


def reflect(wo, n):
    """Mirror wo about n (common.rs:60-66)."""
    return n * (2.0 * dot(wo, n, keepdims=True)) - wo


def refract(wi, n, eta):
    """Refraction through n with relative IOR eta (common.rs:110-139).

    Returns (wt, ok) — ok False on total internal reflection.
    """
    cos_i = dot(wi, n)
    sin2_i = jnp.maximum(1.0 - cos_i * cos_i, 0.0)
    sin2_t = sin2_i / (eta * eta)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    wt = -wi / eta[..., None] + n * (cos_i / eta - cos_t)[..., None]
    ok = ~tir & (dot(wt, wt) > 1e-12)
    return normalize(wt), ok


def same_hemisphere(a, b):
    return a[..., 2] * b[..., 2] > 0.0


def fresnel_dielectric(cos_i, eta):
    """Spectral dielectric Fresnel (common.rs:84-107).

    cos_i: (R,); eta: (R, 4) relative IOR -> (R, 4) reflectance (1 on TIR).
    """
    ci = jnp.clip(cos_i, 0.0, 1.0)[..., None]
    sin2_i = 1.0 - ci * ci
    sin2_t = sin2_i / (eta * eta)
    cos_t = jnp.sqrt(jnp.clip(1.0 - sin2_t, 0.0, 1.0))
    r_par = (eta * ci - cos_t) / (eta * ci + cos_t)
    r_per = (ci - eta * cos_t) / (ci + eta * cos_t)
    return 0.5 * (r_par * r_par + r_per * r_per)


def fresnel_complex(cos_i, eta, k):
    """Spectral conductor Fresnel with complex IOR (conductor.rs:88-121).

    cos_i: (R,); eta, k: (R, 4) -> (R, 4).  Explicit real/imag arithmetic
    (no complex dtype: TPU-friendly).
    """
    ci = jnp.clip(cos_i, 0.0, 1.0)[..., None]
    sin2_i = 1.0 - ci * ci

    # sin2_t = sin2_i / eta^2 in complex arithmetic, eta_c = eta + i k
    er, ei = eta, k
    e2r = er * er - ei * ei
    e2i = 2.0 * er * ei
    den = e2r * e2r + e2i * e2i
    s2t_r = sin2_i * e2r / jnp.maximum(den, 1e-20)
    s2t_i = -sin2_i * e2i / jnp.maximum(den, 1e-20)

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
    ar, ai = er * ci - ctr, ei * ci - cti
    br, bi = er * ci + ctr, ei * ci + cti
    pr, pi = cdiv(ar, ai, br, bi)
    # r_perp = (ci - eta*cos_t) / (ci + eta*cos_t)
    ect_r = er * ctr - ei * cti
    ect_i = er * cti + ei * ctr
    ar2, ai2 = ci - ect_r, -ect_i
    br2, bi2 = ci + ect_r, ect_i
    sr, si = cdiv(ar2, ai2, br2, bi2)

    return 0.5 * ((pr * pr + pi * pi) + (sr * sr + si * si))
