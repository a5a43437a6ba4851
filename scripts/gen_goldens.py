"""Generate the committed golden-image regression set.

The reference gates 42 golden-image tests (renderer/tests/
regression_test.rs:43-659: scenes {0,3,6,7,8,9,10} x {pt,nee,mis} x
{random,sobol} at 200x150); its PNGs are git-LFS stubs in this checkout,
so this script renders OUR OWN goldens once they are trusted (the
consistency matrix, the NumPy oracle and the furnace/anchor gates all
pass) and commits them under tpu_pathtracer/data/goldens/.

Determinism: every sample is a pure function of (pixel, sample, dim,
seed), so a golden re-render at identical settings is bit-stable up to
backend float rounding — tests/test_goldens.py gates a display-space
RMSE of 0.01, far below any estimator-level change but above PNG
quantization + backend noise.

Usage: PYTHONPATH=. python scripts/gen_goldens.py [--spp 64] [--only ...]
Regenerate deliberately (and say so in the commit) when the estimator
changes on purpose.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCENES = [0, 3, 6, 7, 8, 9, 10]
STRATS = ["pt", "nee", "mis"]
SAMPLERS = ["random", "sobol"]
W, H = 200, 150


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--only", default=None,
                    help="comma list like 0:mis:sobol")
    args = ap.parse_args()

    from PIL import Image

    from tpu_pathtracer.render.integrator import RenderConfig, render
    from tpu_pathtracer.scenes import load_scene

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "tpu_pathtracer", "data", "goldens")
    os.makedirs(out_dir, exist_ok=True)
    only = set(args.only.split(",")) if args.only else None

    for sid in SCENES:
        scene, meta, cam = load_scene(sid, W, H, table_res=32)
        for strat in STRATS:
            for sampler in SAMPLERS:
                key = f"{sid}:{strat}:{sampler}"
                if only and key not in only:
                    continue
                t0 = time.time()
                cfg = RenderConfig(width=W, height=H, spp=args.spp,
                                   max_depth=8, strategy=strat,
                                   sampler=sampler, seed=0)
                img = np.asarray(render(scene, meta, cam, cfg))
                u8 = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
                name = f"scene{sid}_{strat}_{sampler}.png"
                Image.fromarray(u8).save(os.path.join(out_dir, name))
                print(f"{name}: {time.time()-t0:.1f}s mean={img.mean():.4f}",
                      flush=True)


if __name__ == "__main__":
    main()
