"""Benchmark: the full BASELINE.json config ladder on one chip.

Prints ONE JSON line whose headline (metric/value/vs_baseline) is the
flagship scene-17 MIS+Sobol sustained render, with every other BASELINE
config's measurement nested under "configs" and a differentiable-pass
grad-step wall clock under "grad_step":

    {"metric": "...", "value": N, "unit": "Mray/s", "vs_baseline": N,
     "configs": {...}, "grad_step": {...}}

Measurement rules learned the hard way on this platform (round 3):
  * ``block_until_ready()`` does NOT wait on the axon TPU tunnel — every
    timing boundary here is a host materialization (``np.asarray``).
  * A single device execution longer than ~1 minute gets the TPU worker
    killed and poisons the chip for minutes.  The render loop is therefore
    host-chunked (integrator.render_accum) and each config runs in a FRESH
    SUBPROCESS so a dead worker cannot poison the next config.
  * Timings vary run-to-run (shared tunnel); each config times one
    sustained full-spp render (the regenerative wavefront's 1-spp window
    is its worst case — the drain tail amortizes over a real render).

Ray count = camera + continuation + NEE shadow rays actually traced,
counted by the real render loop (integrator.count_rays_one_spp) and scaled
by spp.  vs_baseline compares against BENCH_baseline.json (a CPU
measurement of the same workload committed in-repo; the reference itself
publishes no numbers — its README is images-only).

The film's non-finite value count rides along per config (observability
parity with the reference's sensor NaN warnings, sensor.rs:41-42).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

FLAG = "--child-json"

# The BASELINE.json ladder.  spp_measured trims device time for the big
# configs; the metric is a sustained RATE, which the drain-tail
# amortization makes spp-invariant past ~16 spp (measured r4).
LADDER = [
    # name,              scene, strategy, sampler, w, h, spp_base, spp_meas
    ("s3_pt_random",     3,  "pt",  "random", 256,  256,  16,  16),
    ("s6_nee_random",    6,  "nee", "random", 512,  512,  64,  64),
    ("s8_mis_sobol",     8,  "mis", "sobol",  512,  512,  128, 128),
    ("s10_mis_sobol",    10, "mis", "sobol",  1024, 1024, 256, 64),
    ("s17_mis_sobol",    17, "mis", "sobol",  1024, 1024, 512, 64),
]
HEADLINE = "s17_mis_sobol"


def child_render(args) -> None:
    """Measure one config in this process; print one JSON line on stdout."""
    import numpy as np

    from tpu_pathtracer.render.integrator import (RenderConfig, render_accum,
                                                  render_wavefront)
    from tpu_pathtracer.scenes import load_scene

    cfg = RenderConfig(width=args.width, height=args.height, spp=args.spp,
                       max_depth=args.max_depth, strategy=args.strategy,
                       sampler=args.sampler, seed=0)
    scene, meta, cam = load_scene(args.scene, args.width, args.height,
                                  table_res=args.table_res)

    note = ""
    # ray count comes from the SAME wavefront program the timed render
    # runs (with_ray_count sums the tracing + NEE masks), so it cannot
    # drift from the measured loop AND the call doubles as compile+warmup
    t0 = time.perf_counter()
    _, rays_per_spp = render_wavefront(scene, meta, cam, cfg,
                                       spp_start=0, spp_end=1,
                                       with_ray_count=True)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(render_accum(scene, meta, cam, cfg, spp_start=0, spp_end=1))
    per_spp = time.perf_counter() - t0

    times = []
    accum = None
    for _ in range(args.windows):
        t0 = time.perf_counter()
        accum = np.asarray(render_accum(scene, meta, cam, cfg,
                                        spp_start=0, spp_end=cfg.spp))
        times.append(time.perf_counter() - t0)

    best = min(times)
    mrays = rays_per_spp * cfg.spp / best / 1e6
    print(json.dumps({
        "mrays": round(mrays, 3),
        "rays_per_spp": rays_per_spp,
        "spp": cfg.spp,
        "window_times_s": [round(t, 3) for t in times],
        "per_spp_s": round(per_spp, 3),
        "compile_s": round(warm - per_spp, 1),
        "nonfinite_film_values": int(np.sum(~np.isfinite(accum))),
        "note": note}))


def child_grad(args) -> None:
    """Time one differentiable-pass step (loss + psum'd param grads)."""
    import numpy as np

    from tpu_pathtracer import parallel
    from tpu_pathtracer.render.integrator import RenderConfig
    from tpu_pathtracer.scenes import load_scene

    cfg = RenderConfig(width=args.width, height=args.height, spp=args.spp,
                       max_depth=args.max_depth, strategy="mis",
                       sampler="sobol", seed=0)
    scene, meta, cam = load_scene(args.scene, args.width, args.height,
                                  table_res=args.table_res)
    mesh = parallel.make_mesh()
    params = parallel.extract_params(scene)
    target = np.zeros((cfg.width * cfg.height, 3), np.float32)

    def step():
        loss, grads = parallel.loss_and_grads(params, scene, meta, cam, cfg,
                                              target, mesh)
        np.asarray(loss)
        return float(np.asarray(loss)), grads

    t0 = time.perf_counter()
    loss, grads = step()
    compile_and_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    loss, _ = step()
    step_s = time.perf_counter() - t0
    n_finite = int(sum(np.isfinite(np.asarray(g)).sum()
                       for g in __import__("jax").tree.leaves(grads)))
    print(json.dumps({
        "step_s": round(step_s, 3),
        "compile_s": round(compile_and_first - step_s, 1),
        "loss": loss,
        "finite_grad_values": n_finite,
        "config": f"scene{args.scene} {args.width}x{args.height}x{args.spp}spp"
                  f" depth {args.max_depth}"}))


def _run_child(extra, timeout):
    here = os.path.dirname(os.path.abspath(__file__))
    cmd = [sys.executable, os.path.abspath(__file__), FLAG] + extra
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout, cwd=here)
        lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if p.returncode == 0 and lines:
            return json.loads(lines[-1]), ""
        tail = (p.stderr or "").strip().splitlines()[-1:] or ["no output"]
        return None, f"rc={p.returncode}: {tail[0][:200]}"
    except subprocess.TimeoutExpired:
        return None, f"timed out after {timeout:.0f}s"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-depth", type=int, default=16)
    ap.add_argument("--table-res", type=int, default=64)
    ap.add_argument("--windows", type=int, default=1)
    ap.add_argument("--timeout", type=float, default=1500.0,
                    help="per-config subprocess timeout")
    ap.add_argument("--only", default=None,
                    help="comma-separated config names (default: all)")
    ap.add_argument("--skip-grad", action="store_true")
    ap.add_argument("--record-baseline", action="store_true",
                    help="write the headline number to BENCH_baseline.json")
    # child-mode args
    ap.add_argument(FLAG, dest="child", default=None,
                    choices=["render", "grad"], help=argparse.SUPPRESS)
    ap.add_argument("--scene", type=int, default=17)
    ap.add_argument("--strategy", default="mis")
    ap.add_argument("--sampler", default="sobol")
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--spp", type=int, default=64)
    args = ap.parse_args()

    if args.child == "render":
        child_render(args)
        return
    if args.child == "grad":
        child_grad(args)
        return

    here = os.path.dirname(os.path.abspath(__file__))
    only = set(args.only.split(",")) if args.only else None
    configs = {}
    headline = None
    for name, scene, strat, sampler, w, h, spp_base, spp_meas in LADDER:
        if only and name not in only:
            continue
        result = None
        note = ""
        # fallback ladder in FRESH subprocesses: a TPU worker killed at one
        # size poisons that process, never the next attempt
        for shrink in (1, 2, 4):
            res, err = _run_child(
                ["render", "--scene", str(scene), "--strategy", strat,
                 "--sampler", sampler, "--width", str(w // shrink),
                 "--height", str(h // shrink), "--spp", str(spp_meas),
                 "--max-depth", str(args.max_depth),
                 "--table-res", str(args.table_res),
                 "--windows", str(args.windows)], args.timeout)
            if res is not None:
                result = res
                if shrink > 1:
                    note = f"measured at 1/{shrink} size"
                break
            note = f"attempt 1/{shrink} failed {err}"
            print(f"bench[{name}]: {note}", file=sys.stderr)
        entry = {"scene": scene, "strategy": strat, "sampler": sampler,
                 "size": f"{w}x{h}", "spp_baseline": spp_base,
                 "spp_measured": spp_meas}
        if result is None:
            entry.update({"mrays": 0.0, "note": note})
        else:
            entry.update(result)
            if note:
                entry["note"] = "; ".join(
                    x for x in (note, result.get("note", "")) if x)
            elif not entry.get("note"):
                entry.pop("note", None)
        configs[name] = entry
        if name == HEADLINE:
            headline = entry
        print(f"bench[{name}]: {entry.get('mrays', 0.0)} Mray/s",
              file=sys.stderr)

    grad = None
    if not args.skip_grad and (only is None or "grad" in only
                               or HEADLINE in (only or ())):
        grad, err = _run_child(
            ["grad", "--scene", "17", "--width", "128", "--height", "128",
             "--spp", "2", "--max-depth", "8",
             "--table-res", str(args.table_res)], args.timeout)
        if grad is None:
            grad = {"step_s": 0.0, "note": f"grad child failed {err}"}
        print(f"bench[grad]: {grad.get('step_s')}s/step", file=sys.stderr)

    if headline is None:
        # --only without the headline: report the first measured config
        headline = next(iter(configs.values()), {"mrays": 0.0})

    mrays = headline.get("mrays", 0.0)
    if args.record_baseline:
        with open(os.path.join(here, "BENCH_baseline.json"), "w") as f:
            json.dump({"mrays_cpu": mrays, "config": HEADLINE}, f)
    baseline = None
    try:
        with open(os.path.join(here, "BENCH_baseline.json")) as f:
            baseline = json.load(f).get("mrays_cpu")
    except Exception:
        pass

    out = {
        "metric": (f"scene17 MIS+Sobol rays/sec/chip "
                   f"({headline.get('size', '1024x1024')}x"
                   f"{headline.get('spp_measured', 64)}spp, "
                   f"depth {args.max_depth}); full BASELINE ladder nested"),
        "value": mrays,
        "unit": "Mray/s",
        "vs_baseline": round(mrays / baseline, 3) if baseline else 1.0,
        "configs": configs,
    }
    if grad is not None:
        out["grad_step"] = grad
    print(json.dumps(out))


if __name__ == "__main__":
    main()
