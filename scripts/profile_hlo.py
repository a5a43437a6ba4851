"""hlo_stats profile of one wavefront step (op-level device self-time).

Usage: python scripts/profile_hlo.py [WIDTH] [SCENE] [OUTCSV]
Writes the per-op table to OUTCSV (default /tmp/hlo_stats.csv) and prints
a category rollup.  Recipe per PERF.md: jax.profiler.trace works through
the axon tunnel; parse the xplane with xprof's hlo_stats converter.
"""
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
W = int(sys.argv[1]) if len(sys.argv) > 1 else 512
SCENE = int(sys.argv[2]) if len(sys.argv) > 2 else 17
OUT = sys.argv[3] if len(sys.argv) > 3 else "/tmp/hlo_stats.csv"

import numpy as np
import jax
import jax.numpy as jnp


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

    f = jax.jit(lambda s: scalar(step(s)))
    np.asarray(f(state))  # compile

    tdir = "/tmp/xprof_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(3):
            np.asarray(f(state))

    pbs = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    assert pbs, "no xplane captured"
    from xprof.convert import raw_to_tool_data as r2t
    data, _ = r2t.xspace_to_tool_data([pbs[-1]], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    with open(OUT, "w") as fh:
        fh.write(data)
    # rollup by category / program
    import csv as csvmod
    import io
    rows = list(csvmod.DictReader(io.StringIO(data)))
    cats = {}
    total = 0.0
    for row in rows:
        t = float(row.get("Total Time (us)", row.get("total_time_us", 0)) or 0)
        cat = row.get("HLO Category", row.get("category", "?"))
        cats[cat] = cats.get(cat, 0.0) + t
        total += t
    print(f"total self time: {total/1e3/3:.1f} ms/step (3 steps)")
    for c, t in sorted(cats.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {t/1e3/3:8.2f} ms  {c}")
    print(f"full table -> {OUT}")


if __name__ == "__main__":
    main()
