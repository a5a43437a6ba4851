"""Isolate where render time goes: raw chip sanity, one traverse call,
one full bounce, one spp — all truthfully materialized.

Usage: python scripts/probe_parts.py [WIDTH]
Env: TPT_TRAVERSAL
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
w = int(sys.argv[1]) if len(sys.argv) > 1 else 256

import numpy as np
import jax
import jax.numpy as jnp


def timeit(name, fn, n=3):
    outs = []
    for i in range(n):
        t0 = time.perf_counter()
        r = fn()
        r = jax.tree.map(np.asarray, r)
        outs.append(time.perf_counter() - t0)
    print(f"{name}: " + " ".join(f"{t:.3f}s" for t in outs), flush=True)
    return r


# 0. chip sanity: big matmul
x = jnp.ones((4096, 4096), jnp.bfloat16)
mm = jax.jit(lambda a: a @ a)
timeit("matmul 4096^3 bf16", lambda: mm(x))

from tpu_pathtracer.render.integrator import RenderConfig, _pixel_grid, trace_sample
from tpu_pathtracer.render.sampler import make_sampler
from tpu_pathtracer.scenes import load_scene
from tpu_pathtracer.ops import trace

cfg = RenderConfig(width=w, height=w, spp=64, max_depth=16,
                   strategy="mis", sampler="sobol", seed=0)
scene, meta, cam = load_scene(17, w, w)
px = _pixel_grid(w, w)
print("n_tris:", scene.bvh.tri9.shape[0], "blocks:", scene.bvh.blk_min.shape[0],
      flush=True)

# 1. camera rays
sampler = make_sampler(cfg.sampler, cfg.seed, cfg.spp, (w, w))


@jax.jit
def camrays():
    uv = sampler.get_2d(px, 0, 1)
    o, d, wgt = cam.generate_rays(px, uv)
    return o, d


o, d = timeit("camera rays", camrays)
o = jnp.asarray(o)
d = jnp.asarray(d)

# 2. one traversal call over the full ray batch
method = os.environ.get("TPT_TRAVERSAL") or "pallas"
isect = jax.jit(lambda o, d: trace.intersect(scene.bvh, o, d, method=method))
timeit(f"intersect x1 ({method}, {w*w} rays)", lambda: isect(o, d))

# 3. 16 sequential dependent traversals (approximates the depth loop's trace cost)
@jax.jit
def isect16(o, d):
    def body(k, carry):
        o, d, acc = carry
        h = trace.intersect(scene.bvh, o, d, method=method)
        return o + 1e-9, d, acc + h.t * 0.0 + h.b1
    _, _, acc = jax.lax.fori_loop(0, 16, body, (o, d, jnp.zeros(o.shape[0])))
    return acc


timeit("intersect x16 (fori)", lambda: isect16(o, d))

# 4. one full spp (trace_sample)
@jax.jit
def one_spp():
    return trace_sample(scene, meta, cam, cfg, sampler, px, 0,
                        max_depth_dyn=jnp.asarray(16, jnp.int32))


timeit("trace_sample x1 (full MIS spp)", one_spp)
