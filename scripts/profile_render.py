"""Per-stage device-time breakdown of the render loop (VERDICT r3 item 2).

Times each wavefront stage standalone with its real inputs on the current
backend, then one full wavefront step and one full trace_sample spp, and
prints a JSON breakdown.  All timings materialize via np.asarray (the only
reliable sync on the axon tunnel).

Usage:  python scripts/profile_render.py [WIDTH] [SCENE]
Writes: stdout JSON lines + PROFILE.json next to the repo root.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
W = int(sys.argv[1]) if len(sys.argv) > 1 else 512
SCENE = int(sys.argv[2]) if len(sys.argv) > 2 else 17

import numpy as np
import jax
import jax.numpy as jnp

RESULTS = {}


def _tree_scalar(tree):
    """Reduce any pytree to one f32 scalar (forces full computation but
    keeps the host transfer at 4 bytes — the axon tunnel moves bulk data at
    ~40 MB/s, so returning real outputs times the WIRE, not the chip)."""
    tot = jnp.zeros((), jnp.float32)
    for leaf in jax.tree.leaves(tree):
        tot = tot + jnp.sum(leaf.astype(jnp.float32))
    return tot


def timeit(name, fn, n=4):
    """Time jit(scalar-reduced fn); returns nothing (use run() to get real
    outputs for stage chaining)."""
    f = jax.jit(lambda: _tree_scalar(fn()))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(f())
        ts.append(time.perf_counter() - t0)
    best = min(ts[1:]) if len(ts) > 1 else ts[0]
    RESULTS[name] = round(best, 4)
    print(f"{name}: {best*1e3:.1f} ms   (all: "
          + " ".join(f"{t*1e3:.0f}" for t in ts) + ")", flush=True)


def run(fn):
    """Materialize fn's real outputs (untimed) and push back to device."""
    r = jax.tree.map(np.asarray, jax.jit(fn)())
    return jax.tree.map(jnp.asarray, r)


def main():
    from tpu_pathtracer.render.integrator import (
        RenderConfig, _pixel_grid, trace_sample, _wavefront_init,
        _wavefront_step)
    from tpu_pathtracer.render.sampler import make_sampler
    from tpu_pathtracer.render import bsdf as bsdf_mod
    from tpu_pathtracer.render import film as film_mod
    from tpu_pathtracer.render import lights as lights_mod
    from tpu_pathtracer.render.surface import make_interaction
    from tpu_pathtracer.scenes import load_scene
    from tpu_pathtracer.spectrum import sampled as swl
    from tpu_pathtracer.ops import trace
    from tpu_pathtracer.utils.vec import make_frame, smap, to_frame

    cfg = RenderConfig(width=W, height=W, spp=64, max_depth=16,
                       strategy="mis", sampler="sobol", seed=0)
    scene, meta, cam = load_scene(SCENE, W, W)
    px = _pixel_grid(W, W)
    r = px.shape[0]
    RESULTS["n_rays"] = r
    RESULTS["n_tris"] = int(scene.bvh.tri9.shape[0])
    RESULTS["backend"] = jax.default_backend()
    print(f"scene {SCENE}: {r} rays, {RESULTS['n_tris']} tris, "
          f"backend {RESULTS['backend']}", flush=True)

    sampler = make_sampler(cfg.sampler, cfg.seed, cfg.spp, (W, W))

    # chip sanity
    x = jnp.ones((4096, 4096), jnp.bfloat16)
    timeit("sanity_matmul_4096_bf16", lambda: x @ x)

    # --- stage inputs (materialized between stages) -----------------------
    def gen():
        u_l = sampler.get_1d(px, 0, 0)
        wl = swl.sample_uniform(u_l)
        uv = sampler.get_2d(px, 0, 1)
        o, d, wgt = cam.generate_rays(px, uv)
        return wl, o, d

    timeit("camera_rays_and_wl", gen)
    wl, o, d = run(gen)

    timeit("intersect", lambda: trace.intersect_scene(scene, o, d,
                                                      jnp.asarray(3.0e38)))
    hit = run(lambda: trace.intersect_scene(scene, o, d, jnp.asarray(3.0e38)))

    timeit("make_interaction", lambda: make_interaction(scene, hit, o, d))
    it = run(lambda: make_interaction(scene, hit, o, d))

    def mk_frame():
        frame = make_frame(it.shading_n, it.tangent)
        return frame, to_frame(frame, it.wo)

    timeit("make_frame", mk_frame)
    frame, wo_t = run(mk_frame)

    def draws():
        return [sampler.get_1d(px, 0, 3), sampler.get_2d(px, 0, 4),
                sampler.get_1d(px, 0, 6), sampler.get_1d(px, 0, 7),
                sampler.get_2d(px, 0, 8), sampler.get_1d(px, 0, 10)]

    timeit("sampler_6_draws_1bounce", draws)
    uc, uv2, u_light, u_s, u_uv, u_rr = run(draws)

    timeit("sample_material",
           lambda: bsdf_mod.sample_material(scene, meta, it, frame, wo_t,
                                            uc, uv2, wl))
    ms = run(lambda: bsdf_mod.sample_material(scene, meta, it, frame, wo_t,
                                              uc, uv2, wl))

    timeit("emitted_radiance",
           lambda: bsdf_mod.emitted_radiance(scene, meta, it, wl))

    timeit("evaluate_nee_mis",
           lambda: lights_mod.evaluate_nee(scene, meta, it, frame, wo_t, wl,
                                           u_light, u_s, u_uv, with_mis=True))

    timeit("pdf_light_for_hit",
           lambda: lights_mod.pdf_light_for_hit_pos(scene, meta, o, it, wl))

    rad = smap(jnp.abs, ms.f)
    timeit("film_spectral_to_rgb", lambda: film_mod.spectral_to_rgb(rad, wl))

    # --- one full wavefront step and full sample --------------------------
    state = _wavefront_init(r, 0, jnp.zeros((r, 3)))

    timeit("wavefront_step_full",
           lambda: _wavefront_step(scene, meta, cam, cfg, sampler, px,
                                   jnp.asarray(64, jnp.int32), state,
                                   jnp.asarray(16, jnp.int32)))

    timeit("trace_sample_full_spp",
           lambda: trace_sample(scene, meta, cam, cfg, sampler, px, 0,
                                max_depth_dyn=jnp.asarray(16, jnp.int32)))

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE.json")
    with open(out, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
