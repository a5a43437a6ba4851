"""Benchmark: scene 17 (clearcoat PBR dragon) MIS + Sobol on one chip.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "Mray/s", "vs_baseline": N}

The reference publishes no numbers (its README is images-only), so
vs_baseline compares against the same workload measured once on this
machine's CPU backend (committed in BENCH_baseline.json).  Ray count =
camera rays + continuation rays + NEE shadow rays actually traced, counted
by the render loop itself (integrator.count_rays_one_spp instruments the
exact trace_sample path) and scaled by spp.

Every stage is individually fenced: if the ray-count pass fails the bench
falls back to a coarse analytic estimate; if the timed render fails at the
requested resolution it retries at half size.  The JSON line is always
printed (rc 0) unless even the smallest fallback render fails.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time


def estimate_rays_fallback(cfg) -> float:
    """Coarse ray estimate when the counting pass is unavailable: each path
    traces 1 camera ray and, with ~0.6 mean survival per bounce under
    Russian roulette, ~2.5 bounces each issuing a continuation + NEE shadow
    ray.  Deliberately conservative (underestimates on bright scenes)."""
    return cfg.width * cfg.height * (1.0 + 2.5 * 2.0)


def run(cfg, scene, meta, cam, profile_dir=None):
    """Returns (mrays, rays_per_spp, dt, note)."""
    from tpu_pathtracer.render.integrator import render, count_rays_one_spp

    note = ""
    try:
        rays_per_spp = count_rays_one_spp(scene, meta, cam, cfg)
    except Exception as e:  # pragma: no cover - device-failure fencing
        rays_per_spp = estimate_rays_fallback(cfg)
        note = f"ray-count pass failed ({type(e).__name__}); analytic estimate"

    img = render(scene, meta, cam, cfg)   # warm-up compile
    img.block_until_ready()

    if profile_dir:
        import jax
        jax.profiler.start_trace(profile_dir)
    t0 = time.perf_counter()
    img = render(scene, meta, cam, cfg)
    img.block_until_ready()
    dt = time.perf_counter() - t0
    if profile_dir:
        import jax
        jax.profiler.stop_trace()

    total_rays = rays_per_spp * cfg.spp
    return total_rays / dt / 1e6, rays_per_spp, dt, note


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--scene", type=int, default=17)
    ap.add_argument("--max-depth", type=int, default=16)
    ap.add_argument("--table-res", type=int, default=64)
    ap.add_argument("--profile-dir", default=None,
                    help="write a jax.profiler trace of the timed render")
    ap.add_argument("--record-baseline", action="store_true",
                    help="write the measured number to BENCH_baseline.json")
    args = ap.parse_args()

    from tpu_pathtracer.render.integrator import RenderConfig
    from tpu_pathtracer.scenes import load_scene

    cfg = RenderConfig(width=args.width, height=args.height, spp=args.spp,
                       max_depth=args.max_depth, strategy="mis",
                       sampler="sobol", seed=0)
    scene, meta, cam = load_scene(args.scene, args.width, args.height,
                                  table_res=args.table_res)

    mrays = None
    note = ""
    # fallback ladder: requested size -> half size -> quarter size.  A
    # smaller measurement is still a Mray/s number (throughput is roughly
    # resolution-independent once the wavefront fills the chip).
    for shrink in (1, 2, 4):
        c = dataclasses.replace(cfg, width=cfg.width // shrink,
                                height=cfg.height // shrink)
        try:
            mrays, rays_per_spp, dt, n = run(c, scene, meta, cam,
                                             profile_dir=args.profile_dir)
            note = n + (f"; measured at 1/{shrink} size" if shrink > 1 else "")
            break
        except Exception as e:  # pragma: no cover - device-failure fencing
            note = f"render failed at 1/{shrink} size: {type(e).__name__}: {e}"
            print(f"bench: {note}", file=sys.stderr)

    if mrays is None:
        print(json.dumps({
            "metric": f"scene{args.scene} MIS+Sobol rays/sec/chip",
            "value": 0.0, "unit": "Mray/s", "vs_baseline": 0.0,
            "note": note}))
        return

    if args.record_baseline:
        with open("BENCH_baseline.json", "w") as f:
            json.dump({"mrays_cpu": mrays,
                       "config": dataclasses.asdict(cfg)}, f)

    baseline = None
    try:
        with open("BENCH_baseline.json") as f:
            baseline = json.load(f).get("mrays_cpu")
    except Exception:
        pass
    vs = (mrays / baseline) if baseline else 1.0

    out = {
        "metric": f"scene{args.scene} MIS+Sobol rays/sec/chip "
                  f"({args.width}x{args.height}x{args.spp}spp, "
                  f"depth {args.max_depth})",
        "value": round(mrays, 3),
        "unit": "Mray/s",
        "vs_baseline": round(vs, 3),
    }
    if note:
        out["note"] = note
    print(json.dumps(out))


if __name__ == "__main__":
    main()
