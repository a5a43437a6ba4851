"""Truthful single-chunk timing: N spp of scene17 MIS+Sobol, materialized.

Usage: python scripts/probe_spp.py WIDTH SPP_CHUNK [N_CALLS] [DEPTH]
Env: TPT_TRAVERSAL=pallas|brute|bvh
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

w = int(sys.argv[1])
chunk = int(sys.argv[2])
n_calls = int(sys.argv[3]) if len(sys.argv) > 3 else 3
depth = int(sys.argv[4]) if len(sys.argv) > 4 else 16

import numpy as np
import jax.numpy as jnp

from tpu_pathtracer.render.integrator import RenderConfig
from tpu_pathtracer.render.progressive import _chunk_accum
from tpu_pathtracer.render.integrator import _pixel_grid
from tpu_pathtracer.scenes import load_scene

cfg = RenderConfig(width=w, height=w, spp=64, max_depth=depth,
                   strategy="mis", sampler="sobol", seed=0)
scene, meta, cam = load_scene(17, w, w)
px = _pixel_grid(w, w)
md = jnp.asarray(depth, jnp.int32)

for i in range(n_calls):
    t0 = time.perf_counter()
    acc = _chunk_accum(scene, meta, cam, cfg, px, i * chunk,
                       (i + 1) * chunk, md)
    a = np.asarray(acc)
    dt = time.perf_counter() - t0
    print(f"call {i}: {dt:.3f}s  mean={a.mean():.5f}  "
          f"({w*w*chunk/dt/1e6:.2f} Mpath/s)", flush=True)
