"""Wall-clock of the traversal kernels alone, looped on device.

Runs N closest-hit (and any-hit) traversals back-to-back inside one jitted
while_loop over realistic bounce-state rays, so per-call RPC overhead
amortizes away and the number is the kernel's true in-loop wall cost.

Usage: python scripts/probe_traversal_wall.py [WIDTH] [SCENE] [ITERS]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
W = int(sys.argv[1]) if len(sys.argv) > 1 else 512
SCENE = int(sys.argv[2]) if len(sys.argv) > 2 else 17
N = int(sys.argv[3]) if len(sys.argv) > 3 else 24

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from tpu_pathtracer.render import integrator as intg
    from tpu_pathtracer.render.sampler import make_sampler
    from tpu_pathtracer.scenes import load_scene
    from tpu_pathtracer.ops import trace
    from tpu_pathtracer.utils.vec import v3_stack

    cfg = intg.RenderConfig(width=W, height=W, spp=64, max_depth=16,
                            strategy="mis", sampler="sobol", seed=0)
    scene, meta, cam = load_scene(SCENE, W, W)
    px = intg._pixel_grid(W, W)
    r = px.shape[0]
    sampler = make_sampler(cfg.sampler, cfg.seed, cfg.spp, (W, W))
    print(f"scene {SCENE}: {r} rays, {scene.bvh.tri9.shape[0]} tris, "
          f"{scene.bvh.blk_min.shape[0]} blocks", flush=True)

    # realistic post-bounce ray state: run 2 wavefront steps from init
    state0 = intg._wavefront_init(r, 0, jnp.zeros((r, 3)))

    def step(s):
        return intg._wavefront_step(scene, meta, cam, cfg, sampler, px,
                                    jnp.asarray(64, jnp.int32), s,
                                    jnp.asarray(16, jnp.int32))

    state = jax.tree.map(jnp.asarray, jax.jit(lambda: step(step(state0)))())
    ray_o = v3_stack(state["ray_o"])
    ray_d = v3_stack(state["ray_d"])
    active = state["tracing"]
    print(f"active: {int(np.asarray(active).sum())}", flush=True)

    def timeit(name, body):
        def loop():
            def w_body(c):
                k, x = c
                return k + 1, body(x)
            _, out = jax.lax.while_loop(lambda c: c[0] < N, w_body,
                                        (0, jnp.zeros((r,))))
            return jnp.sum(out)

        f = jax.jit(loop)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f())
            ts.append(time.perf_counter() - t0)
        best = min(ts[1:])
        print(f"{name}: {best/N*1e3:.1f} ms/iter (compile+first {ts[0]:.1f}s)",
              flush=True)

    def closest(x):
        h = trace.intersect(scene.bvh, ray_o + x[:, None] * 0.0, ray_d,
                            jnp.asarray(3.0e38), active=active)
        return h.t + x * 0.0

    def anyhit(x):
        occ = trace.intersect_p(scene.bvh, ray_o + x[:, None] * 0.0, ray_d,
                                jnp.full((r,), 10.0), active=active)
        return occ.astype(jnp.float32) + x * 0.0

    timeit("closest", closest)
    timeit("anyhit", anyhit)


if __name__ == "__main__":
    main()
