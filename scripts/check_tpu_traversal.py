"""On-chip pallas-vs-brute traversal equivalence check.

Run with the ambient TPU env (PYTHONPATH=/root/repo:/root/.axon_site).
The CPU test suite exercises the pallas kernel only in interpret mode,
which executes dot_general in full f32 — a Mosaic-side precision bug
(e.g. the default bf16 matmul truncation that silently killed hits in
round 4) can ONLY be caught on real hardware.  Expected: hit agreement
1.0, tri match > 0.9999, rel t err < 1e-5, b1 err < 1e-3.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from tpu_pathtracer.render import integrator as intg
from tpu_pathtracer.render.sampler import make_sampler
from tpu_pathtracer.scenes import load_scene
from tpu_pathtracer.ops import trace

W = 256
scene, meta, cam = load_scene(17, W, W)
px = intg._pixel_grid(W, W)
sampler = make_sampler("sobol", 0, 64, (W, W))

@jax.jit
def rays():
    from tpu_pathtracer.utils.vec import v3_stack
    uv = sampler.get_2d(px, 0, 1)
    o, d, _ = cam.generate_rays(px, uv)
    return v3_stack(o), v3_stack(d)

o, d = jax.tree.map(jnp.asarray, jax.tree.map(np.asarray, rays()))

h_pal = jax.jit(lambda: trace.intersect(scene.bvh, o, d, method="pallas"))()
h_brt = jax.jit(lambda: trace.intersect(scene.bvh, o, d, method="brute"))()
hp = jax.tree.map(np.asarray, h_pal)
hb = jax.tree.map(np.asarray, h_brt)
agree = (hp.hit == hb.hit)
both = hp.hit & hb.hit
print("hit agreement:", agree.mean())
print("hit rate pallas/brute:", hp.hit.mean(), hb.hit.mean())
print("tri match (both hit):", (hp.tri[both] == hb.tri[both]).mean())
dt = np.abs(hp.t[both] - hb.t[both]) / np.maximum(hb.t[both], 1e-6)
print("rel t err p50/p99/max:", np.percentile(dt, 50), np.percentile(dt, 99), dt.max())
db = np.abs(hp.b1[both] - hb.b1[both])
print("b1 abs err p99/max:", np.percentile(db, 99), db.max())
