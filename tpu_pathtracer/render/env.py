"""Environment (infinite) light: equirect mapping, CDF importance sampling.

Equivalent of the reference's EnvironmentLight
(scene/src/primitive/impls/environment_light.rs:18-351): luminance*sin(theta)
two-stage CDF built at scene compile (builder.py), binary-search sampling,
texel pdf with the W*H/(2*pi^2*sin(theta)) solid-angle Jacobian (:234-259),
and per-lookup RGB -> illuminant-spectrum upsampling through the device
sigmoid-polynomial table (:304-316).

Direction convention: y-up; u = phi/2pi with phi = atan2(-z, x), v = theta/pi
with theta measured from +y (v=0 at the zenith, standard equirect).
Directions/UVs are V3/V2 component structures (utils/vec.py); the wide
(R, K) CDF compare-reduces keep their 2-D form (K spans full lanes there).
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from ..scene.types import SceneData
from ..spectrum import grid as sgrid
from ..spectrum import rgb2spec
from ..utils.vec import S4, V2, V3
from . import texture as tex_mod


def dir_to_uv(d: V3, rotation=0.0) -> V2:
    """Unit dirs -> uv (environment_light.rs:87-116).

    ``rotation`` is the map's azimuth rotation (radians): the uv returned is
    where direction d lands on the rotated map."""
    theta = jnp.arccos(jnp.clip(d.y, -1.0, 1.0))
    phi = jnp.arctan2(-d.z, d.x)
    u = ((phi - rotation) / (2.0 * math.pi)) % 1.0
    v = theta / math.pi
    return V2(u, v)


def uv_to_dir(uv: V2, rotation=0.0) -> V3:
    theta = uv.y * math.pi
    phi = uv.x * 2.0 * math.pi + rotation
    sin_t = jnp.sin(theta)
    return V3(sin_t * jnp.cos(phi), jnp.cos(theta), -sin_t * jnp.sin(phi))


def env_radiance(scene: SceneData, wl, d: V3) -> S4:
    """Escape radiance for directions d: bilinear texel -> spectrum (S4).

    (ref: direction_radiance, environment_light.rs:304-316)
    """
    env = scene.env
    uv = dir_to_uv(d, env.rotation)
    # note: sample_bilinear flips v; the env map stores v=0 at the top which
    # is already this orientation, so flip back
    uv = V2(uv.x, 1.0 - uv.y)
    rgb = tex_mod.sample_bilinear(env.rgb, uv)
    d65 = (sgrid.bank_pick(wl.bank, jnp.zeros_like(uv.x, jnp.int32))
           if wl.bank is not None else None)
    return rgb2spec.illuminant_eval_s4(rgb, wl.lam, scene.rs_zn,
                                       scene.rs_coeffs, scene.spectra[0],
                                       d65_vals=d65)


def _cell_probs(cdf):
    return jnp.diff(cdf, prepend=0.0)


def _searchsorted_right(cdf, u):
    """Count of cdf entries <= u along cdf's last axis, batched per ray.

    cdf: (K,) or (R, K); u: (R,).  Compare-count instead of
    jnp.searchsorted: the binary search gathers per element per step,
    which TPU executes as a scalar loop; one fused (R, K) compare-reduce
    is effectively free at CDF sizes (K <= ~2048).
    """
    if cdf.ndim == 1:
        le = cdf[None, :] <= u[:, None]
    else:
        le = cdf <= u[:, None]
    return jnp.sum(le.astype(jnp.int32), axis=-1)


def _pick(values, idx):
    """values (K,) or (R, K) selected per ray at idx (R,) — gather-free."""
    k = values.shape[-1]
    oh = idx[:, None] == jnp.arange(k, dtype=jnp.int32)
    if values.ndim == 1:
        return jnp.sum(jnp.where(oh, values[None, :], 0), axis=-1)
    return jnp.sum(jnp.where(oh, values, 0), axis=-1)


def sample_env_direction(scene: SceneData, wl, u_uv: V2):
    """Importance-sample the env map (environment_light.rs:218-259).

    Returns (dir V3, radiance S4, pdf_dir (R,)).
    """
    env = scene.env
    h, w = env.rgb.shape[0], env.rgb.shape[1]
    row = jnp.clip(_searchsorted_right(env.marginal_cdf, u_uv.x), 0, h - 1)
    cond_rows = env.conditional_cdf[row]                  # (R, W) row gather
    col = jnp.clip(_searchsorted_right(cond_rows, u_uv.y), 0, w - 1)

    # cell probabilities
    p_row = _pick(_cell_probs(env.marginal_cdf), row)
    p_col = _pick(_cell_probs(cond_rows), col)

    # jitter within the selected texel: the CDF remainder of the search value
    # is uniform in [0,1) conditioned on the cell, so it is free stratified
    # jitter (the pdf is the piecewise-constant density over the whole cell)
    cdf_row_lo = jnp.where(row > 0,
                           _pick(env.marginal_cdf, jnp.maximum(row - 1, 0)), 0.0)
    jv = jnp.clip((u_uv.x - cdf_row_lo) / jnp.maximum(p_row, 1e-20), 0.0, 1.0)
    cdf_col_lo = jnp.where(col > 0,
                           _pick(cond_rows, jnp.maximum(col - 1, 0)), 0.0)
    ju = jnp.clip((u_uv.y - cdf_col_lo) / jnp.maximum(p_col, 1e-20), 0.0, 1.0)

    u = (col.astype(jnp.float32) + ju) / w
    v = (row.astype(jnp.float32) + jv) / h
    d = uv_to_dir(V2(u, v), env.rotation)

    theta = v * math.pi
    sin_t = jnp.maximum(jnp.sin(theta), 1e-6)
    # texel -> solid angle Jacobian (environment_light.rs:234-259)
    pdf = p_row * p_col * (w * h) / (2.0 * math.pi * math.pi * sin_t)

    rad = env_radiance(scene, wl, d)
    return d, rad, pdf


def env_pdf_direction(scene: SceneData, d: V3):
    """pdf of sampling direction d (BSDF-side MIS, :234-259)."""
    env = scene.env
    h, w = env.rgb.shape[0], env.rgb.shape[1]
    uv = dir_to_uv(d, env.rotation)
    col = jnp.clip((uv.x * w).astype(jnp.int32), 0, w - 1)
    row = jnp.clip((uv.y * h).astype(jnp.int32), 0, h - 1)
    p_row = _pick(_cell_probs(env.marginal_cdf), row)
    p_col = _pick(_cell_probs(env.conditional_cdf[row]), col)
    sin_t = jnp.maximum(jnp.sin(uv.y * math.pi), 1e-6)
    return p_row * p_col * (w * h) / (2.0 * math.pi * math.pi * sin_t)
