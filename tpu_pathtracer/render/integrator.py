"""Wavefront path-tracing integrators: PT / NEE / MIS + AOV renderers.

TPU-native restructuring of the reference's per-pixel recursive loop
(BaseSrgbRenderer::render, renderer/src/renderer/base_renderer.rs:146-280):
ALL pixels trace together; the depth loop is a bounded ``lax.while_loop``
with per-ray alive masks; the PT/NEE/MIS strategy trait
(renderer/src/renderer.rs:43-80) becomes branch-free weight selection
resolved at trace time (``strategy`` is a static string).

All loop-carried state is **true SoA** (utils/vec.py): positions and
directions are V3 component triples, spectra are S4 lane quads, the film
accumulator rides as three (R,) planes — no (R, C) minor axes, so no
T(8, 128) lane padding anywhere in the hot loop (the round-4 measured
ceiling: padded (R,3)/(R,4) buffers cost ~42x their logical size/bandwidth,
PERF.md).

Bookkeeping matches the reference exactly per ray:
  * contribution at a BSDF-sampled emissive hit uses the throughput BEFORE
    the f/pdf update (base_renderer.rs:231-264);
  * NEE fires only at non-specular vertices, before the throughput update;
  * NEE-strategy counts emissive hits only after specular bounces
    (nee_renderer.rs:129-148) and ignores BSDF-sampled env hits (:150-163);
  * Russian roulette on max-lane throughput after each bounce
    (base_renderer.rs:76-92);
  * self-intersection offsets: 1e-5 along the signed geometric normal plus
    1e-5 along the ray (base_renderer.rs:34,111-121).

Sampler dimension layout (lockstep across rays; each bounce consumes a
fixed window so Sobol dims are deterministic per (pixel, sample)):
  dim 0: hero-wavelength u;  dims 1-2: film uv;
  per bounce b: base = 3 + 10*b —
    +0 uc (primary lobe decision), +1..2 uv2 (lobe 2-D, shared across
    mutually exclusive lobes), +3 uc2 / +4 uc3 (second/third sequential
    lobe decisions: pbr spec-vs-diffuse, clearcoat substrate choices),
    +5 nee light u, +6 nee s, +7..8 nee uv, +9 russian roulette.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..scene.types import SceneData, SceneMeta
from ..ops import trace
from ..spectrum import grid as sgrid
from ..spectrum import sampled as swl
from ..utils.vec import (S4, V3, dot3, from_frame, make_frame, sel, smap,
                         to_frame, v3_stack)
from . import bsdf as bsdf_mod
from . import film as film_mod
from . import lights as lights_mod
from .camera import Camera
from .sampler import make_sampler
from .surface import make_interaction

RAY_EPS = 1.0e-5   # base_renderer.rs:34
DIMS_PER_BOUNCE = 10
BIG_T = 3.0e38


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    width: int
    height: int
    spp: int = 64
    max_depth: int = 16
    strategy: str = "mis"          # pt | nee | mis | albedo | normal
    sampler: str = "sobol"         # random | sobol
    seed: int = 0
    exposure: float = 1.0
    tone_map: str = "reinhard"     # matches main.rs:191-222
    eotf: str = "srgb"
    gamut: str = "srgb"            # output color space (ref Sensor<G,T,E>)
    # film tiling: max rays in flight per wavefront (bounds HBM footprint;
    # large frames render as a sequential lax.map over pixel tiles)
    tile_rays: int = 1 << 18
    # forward-only renders stop bouncing once every ray is dead (while_loop);
    # the differentiable pass sets False to keep the loop reverse-mode safe
    early_exit: bool = True
    # exact-sign (Dekker-compensated) watertight traversal in the pallas
    # kernel (~3x the hit-test flops).  None defers to the
    # TPT_PRECISE_TRACE env default; the fast default's deviation is
    # bounded by the statistical agreement gate in tests/test_bvh.py
    precise: bool | None = None


def _out_gamut(cfg):
    from .. import color
    return color.by_name(cfg.gamut)


def _spectral_table(scene):
    """(470, 3+K) stacked dense spectra: CIE CMFs (cols 0..2) + the scene's
    spectra bank as columns.  Evaluated ONCE per sample at the path's 4
    wavelengths (``SampledWavelengths.bank``); wavelengths are fixed for a
    path's whole life, so every later spectral lookup is an O(K) select."""
    cmf = jnp.asarray(film_mod._cmf_stack())
    return jnp.concatenate([cmf, scene.spectra.T.astype(cmf.dtype)], axis=1)


def _attach_bank(scene, wl):
    return wl._replace(bank=sgrid.lambda_slice_bank(_spectral_table(scene),
                                                    wl.lam))


def _pixel_grid(width, height):
    xs, ys = np.meshgrid(np.arange(width), np.arange(height))
    return jnp.asarray(np.stack([xs.reshape(-1), ys.reshape(-1)], -1), jnp.int32)


def _offset_origin(position: V3, geo_n: V3, direction: V3) -> V3:
    """Signed-normal offset + forward epsilon (base_renderer.rs:111-121)."""
    sign = jnp.where(dot3(geo_n, direction) < 0.0, -RAY_EPS, RAY_EPS)
    return position + geo_n * sign + direction * RAY_EPS


def _env_escape_radiance(scene, meta, wl, direction: V3) -> S4:
    """Scene::evaluate_infinite_light_radiance (scene.rs:213-230)."""
    if not meta.has_env:
        z = jnp.zeros_like(direction.x)
        return S4(z, z, z, z)
    from .env import env_radiance
    return env_radiance(scene, wl, direction)


def _madd(acc: S4, mask, term: S4) -> S4:
    """acc + where(mask, term, 0) over S4 lanes."""
    return S4(acc.a + jnp.where(mask, term.a, 0.0),
              acc.b + jnp.where(mask, term.b, 0.0),
              acc.c + jnp.where(mask, term.c, 0.0),
              acc.d + jnp.where(mask, term.d, 0.0))


def trace_sample(scene: SceneData, meta: SceneMeta, camera: Camera,
                 cfg: RenderConfig, sampler, pixel_xy, sample_idx,
                 max_depth_dyn=None, with_ray_count=False):
    """Trace one spectral sample for every pixel; returns (rgb (R, 3)).

    max_depth_dyn: optional TRACED scalar bounding the bounce loop.  When
    given, the while_loop's trip count is opaque to XLA — required on TPU,
    where a statically-boundable trip count >= 14 flips the whole loop nest
    into a ~10000x slower compilation mode (measured on v5e: 4.5ms at
    depth 13 -> 42.5s at depth 14 for the identical body).

    with_ray_count: when True also return the scalar number of rays this
    sample actually traced (camera + continuation + NEE shadow rays, i.e.
    the masks that gate trace.intersect / intersect_p calls) so the
    benchmark's Mray/s denominator comes from the real render loop rather
    than a duplicated probe.
    """
    r = pixel_xy.shape[0]
    strategy = cfg.strategy
    trace.set_precise(cfg.precise)

    # wavelengths + camera ray (base_renderer.rs:160-176)
    u_l = sampler.get_1d(pixel_xy, sample_idx, 0)
    wl = _attach_bank(scene, swl.sample_uniform(u_l))
    uv_film = sampler.get_2d(pixel_xy, sample_idx, 1)
    ray_o, ray_d, weight = camera.generate_rays(pixel_xy, uv_film)
    throughput = S4(weight, weight, weight, weight)
    zero = jnp.zeros((r,))
    radiance = S4(zero, zero, zero, zero)

    ray_o = ray_o + ray_d * RAY_EPS
    hit = trace.intersect_scene(scene, ray_o, ray_d, jnp.asarray(BIG_T))
    it = make_interaction(scene, hit, ray_o, ray_d)

    # camera-ray miss -> env radiance (base_renderer.rs:180-186)
    miss = ~it.valid
    if meta.has_env:
        env_l = _env_escape_radiance(scene, meta, wl, ray_d)
        radiance = _madd(radiance, miss, throughput * env_l)

    # first-hit emissive (base_renderer.rs:189-194)
    le = bsdf_mod.emitted_radiance(scene, meta, it, wl)
    radiance = _madd(radiance, it.valid, throughput * le)

    if strategy == "albedo":
        # albedo AOV: reflectance x D65 white (albedo_renderer.rs:17-70)
        alb = bsdf_mod.sample_albedo(scene, meta, it, wl)
        d65 = wl.bank.spectra[0]     # D65 is scene-spectra row 0
        mask = it.valid & bsdf_mod.is_bsdf_material(scene, it)
        aov = smap(lambda x: jnp.where(mask, x, 0.0), alb * d65)
        return v3_stack(film_mod.spectral_to_rgb(
            aov, wl, gamut=_out_gamut(cfg), exposure=cfg.exposure))
    if strategy == "normal":
        # normal AOV handled in rgb directly (normal_renderer.rs:14-76)
        n = smap(lambda x: jnp.where(it.valid, x * 0.5 + 0.5, 0.0),
                 it.shading_n)
        return v3_stack(n)

    alive = it.valid & bsdf_mod.is_bsdf_material(scene, it)

    state = dict(it=it, wl=wl, throughput=throughput, radiance=radiance,
                 alive=alive, n_rays=jnp.asarray(float(r), jnp.float32))

    def bounce(depth, s):
        it, wl = s["it"], s["wl"]
        throughput, radiance, alive = s["throughput"], s["radiance"], s["alive"]
        n_rays = s["n_rays"]
        base = 3 + DIMS_PER_BOUNCE * depth

        frame = make_frame(it.shading_n, it.tangent)   # render -> tangent
        wo_t = to_frame(frame, it.wo)

        uc = sampler.get_1d(pixel_xy, sample_idx, base)
        uv2 = sampler.get_2d(pixel_xy, sample_idx, base + 1)
        uc2 = sampler.get_1d(pixel_xy, sample_idx, base + 3)
        uc3 = sampler.get_1d(pixel_xy, sample_idx, base + 4)
        ms = bsdf_mod.sample_material(scene, meta, it, frame, wo_t, uc, uv2,
                                      wl, uc2=uc2, uc3=uc3)
        wl = ms.wl

        # --- NEE at non-specular vertices (base_renderer.rs:218-228) ------
        if strategy in ("nee", "mis"):
            u_light = sampler.get_1d(pixel_xy, sample_idx, base + 5)
            u_s = sampler.get_1d(pixel_xy, sample_idx, base + 6)
            u_uv = sampler.get_2d(pixel_xy, sample_idx, base + 7)
            nee_it = it._replace(valid=alive & ms.sampled & ~ms.specular)
            nee = lights_mod.evaluate_nee(scene, meta, nee_it, frame, wo_t, wl,
                                          u_light, u_s, u_uv,
                                          with_mis=(strategy == "mis"))
            radiance = _madd(radiance, nee_it.valid,
                             throughput * nee.contribution * nee.mis_weight)
            if with_ray_count:
                n_rays = n_rays + jnp.sum(nee_it.valid.astype(jnp.float32))

        # --- BSDF-sampled continuation ray (process_bsdf_sampling) --------
        wi = from_frame(frame, ms.wi_t)
        next_o = _offset_origin(it.position, it.geo_n, wi)
        cont = alive & ms.sampled & (ms.pdf > 0.0)
        if with_ray_count:
            n_rays = n_rays + jnp.sum(cont.astype(jnp.float32))
        hit2 = trace.intersect_scene(scene, next_o, wi, jnp.asarray(BIG_T),
                                     active=cont)
        it2 = make_interaction(scene, hit2, next_o, wi)

        inv_pdf = jnp.where(ms.pdf > 0.0, 1.0 / jnp.where(ms.pdf > 0.0, ms.pdf, 1.0), 0.0)
        f_over_pdf = ms.f * inv_pdf

        # emissive radiance of the next hit
        le2 = bsdf_mod.emitted_radiance(scene, meta, it2, wl)
        emit_contrib = throughput * f_over_pdf * le2      # S4

        if strategy == "pt":
            w_emit = jnp.ones(r)
        elif strategy == "nee":
            # only after specular bounces (nee_renderer.rs:129-148)
            w_emit = jnp.where(ms.specular, 1.0, 0.0)
        else:  # mis (mis_renderer.rs:151-181)
            pdf_light = lights_mod.pdf_light_for_hit(scene, meta, it, it2, wl)
            w_mis = lights_mod._balance(ms.pdf, pdf_light)
            w_emit = jnp.where(ms.specular, 1.0, w_mis)
        radiance = _madd(radiance, cont & it2.valid, emit_contrib * w_emit)

        # --- BSDF-sampled escape to the environment -----------------------
        if meta.has_env and strategy in ("pt", "mis"):
            env_l = _env_escape_radiance(scene, meta, wl, wi)
            esc = cont & ~it2.valid
            if strategy == "pt":
                w_env = jnp.ones(r)
            else:
                pdf_env = lights_mod.pdf_env_for_direction(scene, meta, wl, wi)
                w_env = jnp.where(ms.specular, 1.0,
                                  lights_mod._balance(ms.pdf, pdf_env))
            radiance = _madd(radiance, esc,
                             throughput * f_over_pdf * env_l * w_env)

        throughput = sel(cont, throughput * f_over_pdf, throughput)
        alive = cont & it2.valid & bsdf_mod.is_bsdf_material(scene, it2)

        # --- Russian roulette (base_renderer.rs:76-92) --------------------
        p_rr = swl.max_value(throughput)
        u_rr = sampler.get_1d(pixel_xy, sample_idx, base + 9)
        survive = (p_rr >= 1.0) | (u_rr < p_rr)
        throughput = sel(p_rr < 1.0,
                         throughput * (1.0 / jnp.maximum(p_rr, 1e-12)),
                         throughput)
        alive = alive & survive

        return dict(it=it2, wl=wl, throughput=throughput, radiance=radiance,
                    alive=alive, n_rays=n_rays)

    if cfg.early_exit:
        # the depth loop ends as soon as the whole wavefront is dead
        # (russian roulette kills most paths well before max_depth)
        max_depth = (max_depth_dyn if max_depth_dyn is not None
                     else cfg.max_depth)

        def w_cond(c):
            depth, s = c
            return (depth < max_depth) & jnp.any(s["alive"])

        def w_body(c):
            depth, s = c
            return depth + 1, bounce(depth, s)

        _, state = jax.lax.while_loop(w_cond, w_body, (0, state))
    else:
        state = jax.lax.fori_loop(0, cfg.max_depth, bounce, state)
    rgb = film_mod.spectral_to_rgb(state["radiance"], state["wl"],
                                   gamut=_out_gamut(cfg),
                                   exposure=cfg.exposure)
    if with_ray_count:
        return v3_stack(rgb), state["n_rays"]
    return v3_stack(rgb)


# ---------------------------------------------------------------------------
# Host-driven render loop.
#
# A render is NOT one device program.  Two hard platform facts (measured on
# the target chip, round 3) force the structure:
#
#   1. The TPU worker kills any single device execution that runs longer
#      than roughly a minute ("UNAVAILABLE: TPU worker crashed / kernel
#      fault") and the chip stays poisoned for minutes afterwards.  A
#      1024x1024x64spp render is minutes of device time, so the spp and
#      tile loops MUST live on the host, with each device call bounded to a
#      few seconds of work.
#   2. ``Array.block_until_ready()`` does not actually wait on this
#      platform; only host materialization (``np.asarray``) does.  All
#      timing/driver code must materialize, not "block".
#
# Each device call accumulates CHUNK_SPP samples for one pixel tile into a
# donated on-device film buffer; the host loop just enqueues calls (they
# dispatch asynchronously and execute back-to-back on device) and
# materializes once at the end.  The sample index rides in as a traced
# scalar so every (tile, chunk) call reuses ONE compiled program.
# ---------------------------------------------------------------------------

# paths (pixel-samples) per device call: big enough to amortize dispatch,
# small enough that a call stays well under the execution watchdog
CALL_PATH_BUDGET = 1 << 18


@partial(jax.jit, static_argnums=(1, 2, 3, 4), donate_argnums=(7,))
def _accum_chunk(scene, meta, camera, cfg, chunk_spp, px_tile, spp_base,
                 accum, max_depth_dyn):
    """accum += sum of linear-RGB estimates for chunk_spp samples."""
    sampler = make_sampler(cfg.sampler, cfg.seed, cfg.spp,
                           (cfg.width, cfg.height))

    def body(i, acc):
        return acc + trace_sample(scene, meta, camera, cfg, sampler, px_tile,
                                  spp_base + i, max_depth_dyn=max_depth_dyn)

    return jax.lax.fori_loop(0, chunk_spp, body, accum)


def render_plan(cfg: RenderConfig):
    """(tile_px, chunk_spp) device-call sizing for a config."""
    n_px = cfg.width * cfg.height
    tile = min(cfg.tile_rays, n_px, max(CALL_PATH_BUDGET, 1))
    chunk_spp = max(1, min(cfg.spp, CALL_PATH_BUDGET // tile))
    return tile, chunk_spp


def render_accum(scene: SceneData, meta: SceneMeta, camera: Camera,
                 cfg: RenderConfig, spp_start: int = 0,
                 spp_end: int | None = None, accum_init=None):
    """Linear-RGB film sum over samples [spp_start, spp_end) -> (H*W, 3).

    The host loop drives (tile, spp-chunk) device calls; the film stays on
    device (donated buffer) and is only materialized by the caller.
    Deterministic: samples depend only on (pixel, sample index, dim), so
    any chunking produces bit-identical results.
    """
    spp_end = cfg.spp if spp_end is None else spp_end
    if cfg.strategy in ("pt", "nee", "mis"):
        # the regenerative wavefront produces the identical film
        # (per-sample streams and accumulation order match trace_sample)
        # at ~E[depth]/max_depth of the device time
        return render_wavefront(scene, meta, camera, cfg,
                                spp_start=spp_start, spp_end=spp_end,
                                accum_init=accum_init)
    n_px = cfg.width * cfg.height
    pixel_xy = _pixel_grid(cfg.width, cfg.height)
    md = jnp.asarray(cfg.max_depth, jnp.int32)
    tile, chunk_spp = render_plan(cfg)
    n_tiles = -(-n_px // tile)

    pad = n_tiles * tile - n_px
    if pad:
        pixel_xy = jnp.concatenate(
            [pixel_xy, jnp.zeros((pad, 2), jnp.int32)], 0)

    tiles_px = [pixel_xy[k * tile:(k + 1) * tile] for k in range(n_tiles)]
    if accum_init is not None:
        ai = jnp.asarray(accum_init)
        if pad:
            ai = jnp.concatenate([ai, jnp.zeros((pad, 3), ai.dtype)], 0)
        accums = [ai[k * tile:(k + 1) * tile] for k in range(n_tiles)]
    else:
        accums = [jnp.zeros((tile, 3)) for _ in range(n_tiles)]

    for s in range(spp_start, spp_end, chunk_spp):
        n_s = min(chunk_spp, spp_end - s)
        for k in range(n_tiles):
            accums[k] = _accum_chunk(scene, meta, camera, cfg, n_s,
                                     tiles_px[k], jnp.asarray(s, jnp.int32),
                                     accums[k], md)
    return jnp.concatenate(accums, 0)[:n_px]


# ---------------------------------------------------------------------------
# Regenerative wavefront ("path regeneration").
#
# trace_sample keeps every lane on the same (sample, depth) — after russian
# roulette kills most paths by depth ~4, the remaining 12 depth iterations
# run at full lane width doing mostly nothing (~3-4x waste at max_depth 16).
# The regenerative wavefront instead gives each lane (pixel) its own
# (sample, depth) cursor: when a path dies the lane immediately starts its
# pixel's next sample, so lanes stay ~100% occupied until the tail.
#
# Per-sample math is IDENTICAL to trace_sample: every random draw is a pure
# function of (pixel, sample, dim) with the same dim layout, contributions
# are summed per sample in the same order, and each sample's RGB conversion
# happens once at termination — so the accumulated film is bit-compatible
# with the trace_sample path (gated by tests/test_render.py).
#
# One state flag has no trace_sample equivalent: ``last_seg`` marks a ray
# whose HIT still contributes emissive/env radiance but whose vertex gets
# no NEE and no continuation — this reproduces trace_sample's ordering
# where russian roulette (and the depth bound) kill a path AFTER the
# bounce ray's own hit was counted (base_renderer.rs:76-92 runs after the
# emissive lookup of the traced ray).
#
# Weight ordering (matches trace_sample / base_renderer.rs:76-92,231-264):
# the Le/env of a traced hit is weighted by the throughput BEFORE that
# segment's russian-roulette 1/p boost, while NEE at the hit's vertex and
# all later bounces use the boosted throughput.  The wavefront therefore
# carries TWO throughputs: ``thr_emit`` (pre-boost, feeds only the hit's
# emissive / env-escape terms) and ``throughput`` (boosted, feeds NEE and
# the next f/pdf update).
# ---------------------------------------------------------------------------

def _s4_zeros(r):
    z = jnp.zeros((r,))
    return S4(z, z, z, z)


def _wavefront_init(r: int, spp_start: int, accum):
    # NOTE every leaf gets its own freshly-allocated buffer: the state is
    # donated into _wavefront_chunk, and donating one buffer from two
    # pytree leaves is an XLA error
    def zeros():
        return jnp.zeros((r,))

    def s4z():
        return S4(zeros(), zeros(), zeros(), zeros())

    accum = jnp.asarray(accum)
    return dict(
        sample=jnp.full((r,), spp_start - 1, jnp.int32),
        depth=jnp.zeros((r,), jnp.int32),
        tracing=jnp.zeros((r,), bool),
        last_seg=jnp.zeros((r,), bool),
        is_cam=jnp.zeros((r,), bool),
        prev_spec=jnp.zeros((r,), bool),
        prev_pdf=zeros(),
        prev_pos=V3(zeros(), zeros(), zeros()),
        ray_o=V3(zeros(), zeros(), zeros()),
        ray_d=V3(jnp.ones((r,)), jnp.ones((r,)), jnp.ones((r,))),
        # explicit dtype: a weak-typed leaf here would make the SECOND
        # _wavefront_chunk call (whose state leaves are strong-typed
        # outputs) a different trace — doubling the ~80 s cold compile
        lam=S4(*(jnp.full((r,), 550.0, jnp.float32) for _ in range(4))),
        pdf=s4z(),
        throughput=s4z(),
        thr_emit=s4z(),
        radiance=s4z(),
        accum=V3(accum[:, 0] + 0.0, accum[:, 1] + 0.0, accum[:, 2] + 0.0),
        n_rays=jnp.zeros((), jnp.float32),
    )


def _wavefront_step(scene, meta, camera, cfg, sampler, px, spp_end, s,
                    max_depth_dyn):
    strategy = cfg.strategy
    r = px.shape[0]
    trace.set_precise(cfg.precise)

    # ---- regenerate terminated lanes ------------------------------------
    regen = ~s["tracing"] & (s["sample"] + 1 < spp_end)
    sample = jnp.where(regen, s["sample"] + 1, s["sample"])
    u_l = sampler.get_1d(px, sample, 0)
    wl_new = swl.sample_uniform(u_l)
    uv_film = sampler.get_2d(px, sample, 1)
    cam_o, cam_d, weight = camera.generate_rays(px, uv_film)
    cam_o = cam_o + cam_d * RAY_EPS

    lam = sel(regen, wl_new.lam, s["lam"])
    pdf_l = sel(regen, wl_new.pdf, s["pdf"])
    ray_o = sel(regen, cam_o, s["ray_o"])
    ray_d = sel(regen, cam_d, s["ray_d"])
    w4 = S4(weight, weight, weight, weight)
    throughput = sel(regen, w4, s["throughput"])
    thr_emit = sel(regen, w4, s["thr_emit"])
    radiance = sel(regen, _s4_zeros(r), s["radiance"])
    depth = jnp.where(regen, 0, s["depth"])
    is_cam = jnp.where(regen, True, s["is_cam"])
    prev_spec = jnp.where(regen, True, s["prev_spec"])
    prev_pdf = jnp.where(regen, 0.0, s["prev_pdf"])
    prev_pos = sel(regen, cam_o, s["prev_pos"])
    last_seg = jnp.where(regen, False, s["last_seg"])
    tracing = s["tracing"] | regen
    # per-step spectral slice: one flat row-gather over the stacked table
    # feeds every downstream lookup (film CMFs, emission, light power, eta
    # banks) — recomputed full-width each step because regenerated lanes
    # change wavelengths (cheaper than carrying the bank as state)
    wl = swl.SampledWavelengths(
        lam=lam, pdf=pdf_l,
        bank=sgrid.lambda_slice_bank(_spectral_table(scene), lam))

    # ---- trace the in-flight rays ---------------------------------------
    hit = trace.intersect_scene(scene, ray_o, ray_d, jnp.asarray(BIG_T),
                                active=tracing)
    it = make_interaction(scene, hit, ray_o, ray_d)
    valid = it.valid & tracing
    n_rays = s["n_rays"] + jnp.sum(tracing.astype(jnp.float32))

    # ---- emissive radiance of this hit ----------------------------------
    le = bsdf_mod.emitted_radiance(scene, meta, it, wl)
    if strategy == "pt":
        w_emit = jnp.ones(r)
    elif strategy == "nee":
        # only after specular bounces; camera rays count as specular
        # (nee_renderer.rs:129-148)
        w_emit = jnp.where(prev_spec, 1.0, 0.0)
    else:  # mis (mis_renderer.rs:151-181)
        pdf_light = lights_mod.pdf_light_for_hit_pos(scene, meta, prev_pos,
                                                     it, wl)
        w_emit = jnp.where(prev_spec, 1.0,
                           lights_mod._balance(prev_pdf, pdf_light))
    # pre-RR-boost weight: base_renderer.rs counts the traced ray's Le
    # BEFORE roulette boosts the carried throughput (rs:76-92,231-264)
    radiance = _madd(radiance, valid, thr_emit * le * w_emit)

    # ---- escape to the environment --------------------------------------
    if meta.has_env:
        env_l = _env_escape_radiance(scene, meta, wl, ray_d)
        esc = tracing & ~it.valid
        if strategy == "pt":
            w_env = jnp.ones(r)
        elif strategy == "nee":
            # BSDF-sampled escapes are ignored; camera misses count
            # (base_renderer.rs:180-186, nee_renderer.rs:150-163)
            w_env = jnp.where(is_cam, 1.0, 0.0)
        else:
            pdf_env = lights_mod.pdf_env_for_direction(scene, meta, wl,
                                                       ray_d)
            w_env = jnp.where(prev_spec, 1.0,
                              lights_mod._balance(prev_pdf, pdf_env))
        radiance = _madd(radiance, esc, thr_emit * env_l * w_env)

    # ---- continue from this vertex? -------------------------------------
    alive = valid & bsdf_mod.is_bsdf_material(scene, it) & ~last_seg

    frame = make_frame(it.shading_n, it.tangent)
    wo_t = to_frame(frame, it.wo)
    base = 3 + DIMS_PER_BOUNCE * depth                 # per-lane dim window
    uc = sampler.get_1d(px, sample, base)
    uv2 = sampler.get_2d(px, sample, base + 1)
    uc2 = sampler.get_1d(px, sample, base + 3)
    uc3 = sampler.get_1d(px, sample, base + 4)
    ms = bsdf_mod.sample_material(scene, meta, it, frame, wo_t, uc, uv2, wl,
                                  uc2=uc2, uc3=uc3)
    wl = ms.wl

    if strategy in ("nee", "mis"):
        u_light = sampler.get_1d(px, sample, base + 5)
        u_s = sampler.get_1d(px, sample, base + 6)
        u_uv = sampler.get_2d(px, sample, base + 7)
        nee_it = it._replace(valid=alive & ms.sampled & ~ms.specular)
        nee = lights_mod.evaluate_nee(scene, meta, nee_it, frame, wo_t, wl,
                                      u_light, u_s, u_uv,
                                      with_mis=(strategy == "mis"))
        radiance = _madd(radiance, nee_it.valid,
                         throughput * nee.contribution * nee.mis_weight)
        n_rays = n_rays + jnp.sum(nee_it.valid.astype(jnp.float32))

    wi = from_frame(frame, ms.wi_t)
    next_o = _offset_origin(it.position, it.geo_n, wi)
    cont = alive & ms.sampled & (ms.pdf > 0.0)
    inv_pdf = jnp.where(ms.pdf > 0.0,
                        1.0 / jnp.where(ms.pdf > 0.0, ms.pdf, 1.0), 0.0)
    new_thr_emit = sel(cont, throughput * ms.f * inv_pdf, throughput)

    # russian roulette decides whether the NEXT hit becomes the last
    # contributing segment (base_renderer.rs:76-92); the 1/p boost applies
    # only to the carried throughput (NEE + later bounces), never to the
    # next hit's own Le — that uses new_thr_emit
    p_rr = swl.max_value(new_thr_emit)
    u_rr = sampler.get_1d(px, sample, base + 9)
    survive = (p_rr >= 1.0) | (u_rr < p_rr)
    new_thr = sel(p_rr < 1.0,
                  new_thr_emit * (1.0 / jnp.maximum(p_rr, 1e-12)),
                  new_thr_emit)
    new_last = ~survive | (depth + 1 >= max_depth_dyn)

    # ---- lane bookkeeping -----------------------------------------------
    new_tracing = cont
    finalize = tracing & ~new_tracing
    rgb = film_mod.spectral_to_rgb(radiance, wl, gamut=_out_gamut(cfg),
                                   exposure=cfg.exposure)
    accum = V3(s["accum"].x + jnp.where(finalize, rgb.x, 0.0),
               s["accum"].y + jnp.where(finalize, rgb.y, 0.0),
               s["accum"].z + jnp.where(finalize, rgb.z, 0.0))

    return dict(
        sample=sample,
        depth=jnp.where(new_tracing, depth + 1, depth),
        tracing=new_tracing,
        last_seg=jnp.where(new_tracing, new_last, last_seg),
        is_cam=jnp.where(new_tracing, False, is_cam),
        prev_spec=jnp.where(new_tracing, ms.specular, prev_spec),
        prev_pdf=jnp.where(new_tracing, ms.pdf, prev_pdf),
        prev_pos=sel(new_tracing, it.position, prev_pos),
        ray_o=sel(new_tracing, next_o, ray_o),
        ray_d=sel(new_tracing, wi, ray_d),
        lam=wl.lam,
        pdf=wl.pdf,
        throughput=sel(new_tracing, new_thr, throughput),
        thr_emit=sel(new_tracing, new_thr_emit, thr_emit),
        radiance=radiance,
        accum=accum,
        n_rays=n_rays,
    )


@partial(jax.jit, static_argnums=(1, 2, 3, 4), donate_argnums=(7,))
def _wavefront_chunk(scene, meta, camera, cfg, iters, spp_end, px_tile,
                     state, max_depth_dyn):
    """Run up to ``iters`` wavefront steps; stops early when every lane is
    done.  Returns (state, all_done scalar)."""
    sampler = make_sampler(cfg.sampler, cfg.seed, cfg.spp,
                           (cfg.width, cfg.height))

    def done(s):
        return jnp.all(~s["tracing"] & (s["sample"] + 1 >= spp_end))

    def cond(c):
        k, s = c
        return (k < iters) & ~done(s)

    def body(c):
        k, s = c
        return k + 1, _wavefront_step(scene, meta, camera, cfg, sampler,
                                      px_tile, spp_end, s, max_depth_dyn)

    _, state = jax.lax.while_loop(cond, body, (0, state))
    return state, done(state)


# wavefront steps per device call: each step costs about one bounce of the
# whole lane array; this bounds a call well under the platform's ~1 min
# execution watchdog at the largest tile size
WAVEFRONT_ITERS = 48


def render_wavefront(scene: SceneData, meta: SceneMeta, camera: Camera,
                     cfg: RenderConfig, spp_start: int = 0,
                     spp_end: int | None = None, accum_init=None,
                     with_ray_count: bool = False):
    """Linear-RGB film sum over samples [spp_start, spp_end) -> (H*W, 3)
    via the regenerative wavefront.  Deterministic and chunk-invariant."""
    import numpy as np

    spp_end = cfg.spp if spp_end is None else spp_end
    n_px = cfg.width * cfg.height
    pixel_xy = _pixel_grid(cfg.width, cfg.height)
    md = jnp.asarray(cfg.max_depth, jnp.int32)
    tile, _ = render_plan(cfg)
    n_tiles = -(-n_px // tile)
    pad = n_tiles * tile - n_px
    if pad:
        pixel_xy = jnp.concatenate(
            [pixel_xy, jnp.zeros((pad, 2), jnp.int32)], 0)
    if accum_init is not None:
        ai = jnp.asarray(accum_init)
        if pad:
            ai = jnp.concatenate([ai, jnp.zeros((pad, 3), ai.dtype)], 0)
    else:
        ai = jnp.zeros((n_tiles * tile, 3))

    outs = []
    n_rays = 0.0
    for k in range(n_tiles):
        px_tile = pixel_xy[k * tile:(k + 1) * tile]
        state = _wavefront_init(tile, spp_start, ai[k * tile:(k + 1) * tile])
        while True:
            state, all_done = _wavefront_chunk(
                scene, meta, camera, cfg, WAVEFRONT_ITERS,
                jnp.asarray(spp_end, jnp.int32), px_tile, state, md)
            if bool(np.asarray(all_done)):
                break
        outs.append(v3_stack(state["accum"]))
        n_rays += float(np.asarray(state["n_rays"]))
    accum = jnp.concatenate(outs, 0)[:n_px]
    if with_ray_count:
        return accum, n_rays
    return accum


def render(scene: SceneData, meta: SceneMeta, camera: Camera,
           cfg: RenderConfig):
    """Full render -> (H, W, 3) display-encoded image."""
    accum = render_accum(scene, meta, camera, cfg)
    img = film_mod.finalize(
        accum, cfg.spp,
        tone_map=cfg.tone_map if cfg.strategy in ("pt", "nee", "mis") else "none",
        eotf=cfg.eotf if cfg.strategy in ("pt", "nee", "mis", "albedo") else "linear")
    return img.reshape(cfg.height, cfg.width, 3)


def count_rays_one_spp(scene: SceneData, meta: SceneMeta, camera: Camera,
                       cfg: RenderConfig) -> float:
    """Rays actually traced for sample 0 of every pixel (camera +
    continuation + NEE shadow rays).

    Drives the benchmark's Mray/s denominator.  Uses the exact render loop
    (``trace_sample`` with ``with_ray_count=True``) and the same tiling as
    ``render``, so it cannot drift from what the timed render does; one spp
    of a ``cfg.spp``-sample render is a faithful per-spp count because the
    sampler decorrelates bounces, not the expected path length.
    """
    import numpy as np

    n_px = cfg.width * cfg.height
    pixel_xy = _pixel_grid(cfg.width, cfg.height)
    md = jnp.asarray(cfg.max_depth, jnp.int32)
    tile, _ = render_plan(cfg)
    n_tiles = -(-n_px // tile)
    pad = n_tiles * tile - n_px
    if pad:
        pixel_xy = jnp.concatenate(
            [pixel_xy, jnp.zeros((pad, 2), jnp.int32)], 0)
    counts = [_count_tile_jit(scene, meta, camera, cfg, tile_px, md)
              for tile_px in (pixel_xy[k * tile:(k + 1) * tile]
                              for k in range(n_tiles))]
    total = float(np.sum([np.asarray(c) for c in counts]))
    if pad:
        # padded rows duplicate pixel 0; subtract their share
        n_pad = float(np.asarray(_count_tile_jit(
            scene, meta, camera, cfg, pixel_xy[n_px:], md)))
        total -= n_pad
    return total


@partial(jax.jit, static_argnums=(1, 2, 3))
def _count_tile_jit(scene, meta, camera, cfg, px_tile, max_depth_dyn):
    sampler = make_sampler(cfg.sampler, cfg.seed, cfg.spp,
                           (cfg.width, cfg.height))
    _, n = trace_sample(scene, meta, camera, cfg, sampler, px_tile, 0,
                        max_depth_dyn=max_depth_dyn, with_ray_count=True)
    return n
