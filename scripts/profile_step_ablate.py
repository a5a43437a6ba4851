"""In-context cost of each wavefront-step component, by ablation.

Times the REAL _wavefront_step, then re-times it with one component
stubbed out (monkeypatched to a cheap constant of the right shape); the
delta is that component's cost inside the fused step — the only honest
attribution on a platform with ~25 ms per-call RPC overhead and heavy XLA
fusion (standalone stage timings undercount by 3x, see PROFILE.json).

Usage: python scripts/profile_step_ablate.py [WIDTH] [SCENE]
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


def bench(fn, n=4):
    f = jax.jit(fn)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(f())
        ts.append(time.perf_counter() - t0)
    return min(ts[1:])


def main():
    from tpu_pathtracer.render import integrator as intg
    from tpu_pathtracer.render import bsdf as bsdf_mod
    from tpu_pathtracer.render import film as film_mod
    from tpu_pathtracer.render import lights as lights_mod
    from tpu_pathtracer.render.sampler import make_sampler
    from tpu_pathtracer.scenes import load_scene
    from tpu_pathtracer.ops import trace

    cfg = intg.RenderConfig(width=W, height=W, spp=64, max_depth=16,
                            strategy="mis", sampler="sobol", seed=0)
    scene, meta, cam = load_scene(SCENE, W, W)
    px = intg._pixel_grid(W, W)
    r = px.shape[0]
    sampler = make_sampler(cfg.sampler, cfg.seed, cfg.spp, (W, W))
    print(f"scene {SCENE}: {r} rays, {scene.bvh.tri9.shape[0]} tris, "
          f"backend {jax.default_backend()}", flush=True)

    # a mid-flight state (2 steps in) so ablations see realistic masks
    state0 = intg._wavefront_init(r, 0, jnp.zeros((r, 3)))

    def step(s):
        return intg._wavefront_step(scene, meta, cam, cfg, sampler, px,
                                    jnp.asarray(64, jnp.int32), s,
                                    jnp.asarray(16, jnp.int32))

    state = jax.tree.map(jnp.asarray, jax.jit(
        lambda: step(step(state0)))())

    def scalar(tree):
        tot = jnp.zeros((), jnp.float32)
        for leaf in jax.tree.leaves(tree):
            tot = tot + jnp.sum(leaf.astype(jnp.float32))
        return tot

    results = {}

    def timed(name):
        results[name] = round(bench(lambda: scalar(step(state))), 4)
        print(f"{name}: {results[name]*1e3:.1f} ms", flush=True)

    timed("full_step")

    saves = {}

    def stub(mod, attr, repl):
        saves[(mod, attr)] = getattr(mod, attr)
        setattr(mod, attr, repl)

    def restore():
        for (mod, attr), v in saves.items():
            setattr(mod, attr, v)
        saves.clear()

    # --- no NEE -----------------------------------------------------------
    stub(lights_mod, "evaluate_nee",
         lambda *a, **k: lights_mod.NeeResult(jnp.zeros((r, 4)), jnp.ones(r)))
    timed("minus_nee")
    restore()

    # --- no traversal (fixed miss-ish hit) --------------------------------
    real_intersect = trace.intersect

    def fake_intersect(bvh, o, d, t_max=None, active=None, **k):
        n = o.shape[0]
        return trace.Hit(t=jnp.full((n,), 1.0),
                         tri=(jnp.arange(n, dtype=jnp.int32) % 7),
                         b1=jnp.full((n,), 0.3), b2=jnp.full((n,), 0.3),
                         hit=jnp.ones((n,), bool))

    stub(trace, "intersect", fake_intersect)
    timed("minus_trace")
    restore()

    # --- no shadow ray ----------------------------------------------------
    stub(trace, "intersect_p", lambda bvh, o, d, t, active=None, **k:
         jnp.zeros(o.shape[0], bool))
    timed("minus_shadowray")
    restore()

    # --- no material sample ----------------------------------------------
    def fake_sample(scene_, meta_, it, frame, wo_t, uc, uv2, wl):
        return bsdf_mod.MaterialSample(
            f=jnp.full((r, 4), 0.5), wi_t=jnp.broadcast_to(
                jnp.asarray([0.0, 0.0, 1.0]), (r, 3)),
            pdf=jnp.full((r,), 0.5), sampled=jnp.ones(r, bool),
            specular=jnp.zeros(r, bool), wl=wl)

    stub(bsdf_mod, "sample_material", fake_sample)
    timed("minus_sample_material")
    restore()

    # --- no NEE-side material evaluate -----------------------------------
    stub(bsdf_mod, "evaluate_material",
         lambda *a, **k: (jnp.full((r, 4), 0.1), jnp.full((r,), 0.3)))
    timed("minus_evaluate_material")
    restore()

    # --- no emissive lookup ----------------------------------------------
    stub(bsdf_mod, "emitted_radiance", lambda *a, **k: jnp.zeros((r, 4)))
    timed("minus_emitted_radiance")
    restore()

    # --- no MIS light pdf -------------------------------------------------
    stub(lights_mod, "pdf_light_for_hit_pos",
         lambda *a, **k: jnp.zeros(r))
    timed("minus_pdf_light")
    restore()

    # --- no film conversion ----------------------------------------------
    stub(film_mod, "spectral_to_rgb",
         lambda c, wl, **k: c[:, :3] * 0.1)
    stub(intg.film_mod, "spectral_to_rgb",
         lambda c, wl, **k: c[:, :3] * 0.1)
    timed("minus_film")
    restore()

    # --- free sampler draws ----------------------------------------------
    class FakeSampler:
        def get_1d(self, p, s, d):
            return jnp.full((r,), 0.4)

        def get_2d(self, p, s, d):
            return jnp.full((r, 2), 0.4)

    def fake_make(*a, **k):
        return FakeSampler()

    results["minus_sampler"] = round(bench(
        lambda: scalar(intg._wavefront_step(scene, meta, cam, cfg,
                                            FakeSampler(), px,
                                            jnp.asarray(64, jnp.int32),
                                            state,
                                            jnp.asarray(16, jnp.int32)))), 4)
    print(f"minus_sampler: {results['minus_sampler']*1e3:.1f} ms", flush=True)

    full = results["full_step"]
    print("\n--- attribution (full - ablated) ---")
    for k, v in results.items():
        if k != "full_step":
            print(f"{k[6:]}: {1e3*(full - v):.1f} ms")

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE_STEP.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
