"""Run one render config in this process; print PASS/FAIL + timing.

Usage: python scripts/bisect_fault.py WIDTH SPP [MAX_DEPTH] [TILE_RAYS]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

w = int(sys.argv[1])
spp = int(sys.argv[2])
depth = int(sys.argv[3]) if len(sys.argv) > 3 else 16
tile = int(sys.argv[4]) if len(sys.argv) > 4 else (1 << 18)

from tpu_pathtracer.render.integrator import RenderConfig, render
from tpu_pathtracer.scenes import load_scene

cfg = RenderConfig(width=w, height=w, spp=spp, max_depth=depth,
                   strategy="mis", sampler="sobol", seed=0, tile_rays=tile)
scene, meta, cam = load_scene(17, w, w)

import numpy as np

t0 = time.perf_counter()
img = render(scene, meta, cam, cfg)
td = time.perf_counter()
print(f"dispatched at {td-t0:.2f}s", flush=True)
m0 = float(np.asarray(img).mean())
t1 = time.perf_counter()
print(f"first call done {t1-t0:.2f}s (compile+run)", flush=True)
img = render(scene, meta, cam, cfg)
m1 = float(np.asarray(img).mean())
t2 = time.perf_counter()
img = render(scene, meta, cam, cfg)
m2 = float(np.asarray(img).mean())
t3 = time.perf_counter()
print(f"PASS {w}x{w}x{spp}spp d{depth} tile{tile}: "
      f"compile+run {t1-t0:.2f}s, run {t2-t1:.3f}s, run {t3-t2:.3f}s, "
      f"mean {m0:.5f}/{m1:.5f}/{m2:.5f}", flush=True)
