"""In-loop wall clock of _wavefront_chunk (48 steps in ONE device call).

Separates per-call RPC overhead from the real per-step cost the bench sees.
Usage: python scripts/probe_chunk_wall.py [WIDTH] [SCENE] [ITERS]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
W = int(sys.argv[1]) if len(sys.argv) > 1 else 512
SCENE = int(sys.argv[2]) if len(sys.argv) > 2 else 17
N = int(sys.argv[3]) if len(sys.argv) > 3 else 48

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from tpu_pathtracer.render import integrator as intg
    from tpu_pathtracer.scenes import load_scene

    cfg = intg.RenderConfig(width=W, height=W, spp=64, max_depth=16,
                            strategy="mis", sampler="sobol", seed=0)
    scene, meta, cam = load_scene(SCENE, W, W)
    px = intg._pixel_grid(W, W)
    r = px.shape[0]
    spp_end = jnp.asarray(64, jnp.int32)
    md = jnp.asarray(16, jnp.int32)

    # run chunks back to back like render_wavefront does; time each call.
    # spp_end=64 keeps every lane regenerating, so every chunk is a full
    # N-step execution (no early done)
    state = intg._wavefront_init(r, 0, jnp.zeros((r, 3)))
    times = []
    for k in range(5):
        t0 = time.perf_counter()
        state, done = intg._wavefront_chunk(scene, meta, cam, cfg, N,
                                            spp_end, px, state, md)
        done = bool(np.asarray(done))
        times.append(time.perf_counter() - t0)
    print(f"chunk times: {[round(t,2) for t in times]} (first = compile)")
    best = min(times[1:])
    print(f"per-step in-loop wall: {best/N*1e3:.1f} ms "
          f"({r} lanes, {N} steps/call)")


if __name__ == "__main__":
    main()
