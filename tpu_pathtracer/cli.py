"""Command-line renderer (ref: renderer/src/main.rs:20-53).

    python -m tpu_pathtracer.cli --scene 0 --renderer mis --sampler sobol \
        --width 800 --height 600 --spp 64 -o output.png

Mirrors the reference CLI surface: scene 0-19, spp, seed, filter (box),
sampler (random|sobol), renderer (albedo|normal|pt|nee|mis), width, height,
max-depth, PNG output.  Timing prints match main.rs:103-109,166-172.
"""
from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(prog="tpu_pathtracer")
    ap.add_argument("--scene", type=int, default=0, help="scene number (0-19)")
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--filter", default="box", choices=["box"])
    ap.add_argument("--sampler", default="sobol", choices=["random", "sobol"])
    ap.add_argument("--renderer", default="mis",
                    choices=["albedo", "normal", "pt", "nee", "mis"])
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--max-depth", type=int, default=16)
    ap.add_argument("--table-res", type=int, default=64,
                    help="rgb2spec table resolution (32 for fast CPU runs)")
    ap.add_argument("--gamut", default="srgb",
                    help="output color space (srgb, display_p3, adobe_rgb, "
                         "rec709, rec2020, aces_cg, aces_2065_1)")
    ap.add_argument("--eotf", default="srgb",
                    help="output transfer function")
    ap.add_argument("--precise", action="store_true",
                    help="exact-sign watertight traversal (~3x hit-test "
                         "cost; default is the statistically-gated fast "
                         "path)")
    ap.add_argument("-o", "--output", default="output.png")
    args = ap.parse_args(argv)

    import numpy as np

    from .render.integrator import RenderConfig, render
    from .scenes import load_scene

    t0 = time.time()
    scene, meta, cam = load_scene(args.scene, args.width, args.height,
                                  table_res=args.table_res)
    print(f"Scene build: {time.time() - t0:.2f}s "
          f"({meta.n_tris} triangles, {meta.n_lights} lights)")

    cfg = RenderConfig(width=args.width, height=args.height, spp=args.spp,
                       max_depth=args.max_depth, strategy=args.renderer,
                       sampler=args.sampler, seed=args.seed,
                       gamut=args.gamut, eotf=args.eotf,
                       precise=True if args.precise else None)
    t0 = time.time()
    img = np.asarray(render(scene, meta, cam, cfg))
    dt = time.time() - t0
    rays = args.width * args.height * args.spp
    print(f"Render: {dt:.2f}s ({rays / dt / 1e6:.2f} Mpaths/s)")

    from PIL import Image
    arr = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(args.output)
    print(f"Saved {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
