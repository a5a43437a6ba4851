"""Ablate per-spp cost drivers at 256^2 scene17, truthfully materialized.

Usage: python scripts/ablate.py [WIDTH]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
w = int(sys.argv[1]) if len(sys.argv) > 1 else 256

import numpy as np
import jax.numpy as jnp

from tpu_pathtracer.render.integrator import (RenderConfig, _pixel_grid,
                                              _accum_chunk)
from tpu_pathtracer.scenes import load_scene

scene, meta, cam = load_scene(17, w, w, table_res=16)
px = _pixel_grid(w, w)


def run(tag, **kw):
    cfg = RenderConfig(width=w, height=w, spp=8, sampler="sobol", seed=0,
                       **kw)
    md = jnp.asarray(cfg.max_depth, jnp.int32)
    acc = jnp.zeros((w * w, 3))
    t0 = time.perf_counter()
    acc = _accum_chunk(scene, meta, cam, cfg, 1, px, jnp.asarray(0), acc, md)
    np.asarray(acc)
    tc = time.perf_counter() - t0
    times = []
    for i in range(1, 3):
        acc = jnp.zeros((w * w, 3))
        t0 = time.perf_counter()
        acc = _accum_chunk(scene, meta, cam, cfg, 1, px, jnp.asarray(i), acc,
                           md)
        np.asarray(acc)
        times.append(time.perf_counter() - t0)
    print(f"{tag:40s} {min(times)*1000:8.1f} ms/spp  (compile+1st {tc:.1f}s)",
          flush=True)


CONFIGS = {
    "mis16": dict(strategy="mis", max_depth=16),
    "pt16": dict(strategy="pt", max_depth=16),
    "nee16": dict(strategy="nee", max_depth=16),
    "mis8": dict(strategy="mis", max_depth=8),
    "mis4": dict(strategy="mis", max_depth=4),
    "mis2": dict(strategy="mis", max_depth=2),
    "mis1": dict(strategy="mis", max_depth=1),
    "albedo": dict(strategy="albedo", max_depth=1),
    "mis16rand": dict(strategy="mis", max_depth=16, sampler="random"),
}

names = sys.argv[2:] or list(CONFIGS)
for name in names:
    run(name, **CONFIGS[name])
