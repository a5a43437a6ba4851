"""Time one full wavefront step (and trace_sample) on the current backend.

Quick end-to-end check after each optimization; complements the ablation
profiler.  Usage: python scripts/profile_step_quick.py [WIDTH] [SCENE]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
W = int(sys.argv[1]) if len(sys.argv) > 1 else 512
SCENE = int(sys.argv[2]) if len(sys.argv) > 2 else 17

import numpy as np
import jax
import jax.numpy as jnp


def bench(name, fn, n=4):
    f = jax.jit(fn)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(f())
        ts.append(time.perf_counter() - t0)
    best = min(ts[1:])
    print(f"{name}: {best*1e3:.1f} ms (compile+first {ts[0]:.1f}s)",
          flush=True)
    return best


def main():
    from tpu_pathtracer.render import integrator as intg
    from tpu_pathtracer.render.sampler import make_sampler
    from tpu_pathtracer.scenes import load_scene

    cfg = intg.RenderConfig(width=W, height=W, spp=64, max_depth=16,
                            strategy="mis", sampler="sobol", seed=0)
    scene, meta, cam = load_scene(SCENE, W, W)
    px = intg._pixel_grid(W, W)
    r = px.shape[0]
    sampler = make_sampler(cfg.sampler, cfg.seed, cfg.spp, (W, W))
    print(f"scene {SCENE}: {r} rays, backend {jax.default_backend()}",
          flush=True)

    state0 = intg._wavefront_init(r, 0, jnp.zeros((r, 3)))

    def step(s):
        return intg._wavefront_step(scene, meta, cam, cfg, sampler, px,
                                    jnp.asarray(64, jnp.int32), s,
                                    jnp.asarray(16, jnp.int32))

    state = jax.tree.map(jnp.asarray, jax.jit(lambda: step(step(state0)))())

    def scalar(tree):
        tot = jnp.zeros((), jnp.float32)
        for leaf in jax.tree.leaves(tree):
            tot = tot + jnp.sum(leaf.astype(jnp.float32))
        return tot

    bench("full_step", lambda: scalar(step(state)))


if __name__ == "__main__":
    main()
