"""Run the full consistency matrix + DeltaE sweep; write CONSISTENCY_r05.json.

VERDICT r4 weak #4/#5: the slow-tier evidence must be a committed artifact,
and PT needs a dedicated mean-bias detector (the PT mean was dropped from
the cross-check because it is heavy-tailed at CI spp).  This script:

  1. renders the full matrix {3,6,8,9,10,17} x {random,sobol} x
     {pt,nee,mis} (64x48, --spp), recording per-pair median-filtered RMSEs
     against the same calibrated gates the test uses;
  2. records HIGH-SPP PT MEAN ANCHORS per matrix scene (two seeds) into
     tpu_pathtracer/data/pt_mean_anchors.json — the default-tier test
     tests/test_consistency_matrix.py::test_pt_mean_anchors compares a
     fresh moderate-spp PT render against these, restoring PT-bias
     detection (the round-3 failure class) without flaking;
  3. runs the all-7-color-spaces DeltaE round-trip sweep.

Usage: PYTHONPATH=. python scripts/run_matrix.py [--spp 128]
       [--anchor-spp 512] [--skip-delta-e] [--out CONSISTENCY_r05.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=128)
    ap.add_argument("--anchor-spp", type=int, default=512)
    ap.add_argument("--out", default="CONSISTENCY_r05.json")
    ap.add_argument("--skip-delta-e", action="store_true")
    ap.add_argument("--scenes", default="3,6,8,9,10,17")
    args = ap.parse_args()

    from tpu_pathtracer.render.integrator import RenderConfig, render
    from tpu_pathtracer.scenes import load_scene
    from scipy.ndimage import median_filter

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    w, h = 64, 48
    scenes = [int(s) for s in args.scenes.split(",")]
    out = {"config": {"size": [w, h], "spp": args.spp,
                      "anchor_spp": args.anchor_spp,
                      "seeds": [0, 101], "max_depth": 8},
           "matrix": [], "pt_mean_anchors": {}, "delta_e": {}}

    def render_lin(scene, meta, cam, spp, strat, sampler, seed=0):
        cfg = RenderConfig(width=w, height=h, spp=spp, strategy=strat,
                           sampler=sampler, seed=seed, max_depth=8,
                           tone_map="none", eotf="linear")
        return np.asarray(render(scene, meta, cam, cfg))

    anchors = {}
    for sid in scenes:
        t0 = time.time()
        scene, meta, cam = load_scene(sid, w, h, table_res=32)
        for sampler in ("random", "sobol"):
            raw = {s: render_lin(scene, meta, cam, args.spp, s, sampler)
                   for s in ("pt", "nee", "mis")}
            med = {s: median_filter(v, size=(3, 3, 1))
                   for s, v in raw.items()}
            pt_b = median_filter(
                render_lin(scene, meta, cam, args.spp, "pt", sampler,
                           seed=101), size=(3, 3, 1))
            scale = max(float(med["nee"].mean()), 1e-6)
            noise = float(np.sqrt(np.mean((med["pt"] - pt_b) ** 2))) / scale
            row = {"scene": sid, "sampler": sampler, "noise_rel": noise,
                   "means": {s: float(raw[s].mean()) for s in raw},
                   "pairs": {}}
            ok = True
            gate = 0.02 + 2.0 * noise
            for a, b in (("pt", "nee"), ("pt", "mis"), ("nee", "mis")):
                rmse = float(np.sqrt(np.mean((med[a] - med[b]) ** 2))) / scale
                row["pairs"][f"{a}_vs_{b}"] = rmse
                ok = ok and (rmse < gate)
            row["gate"] = gate
            row["pass"] = bool(ok)
            out["matrix"].append(row)
            print(f"scene {sid} {sampler}: "
                  f"{ {k: round(v, 4) for k, v in row['pairs'].items()} } "
                  f"gate {gate:.4f} pass={ok}", flush=True)

        # high-spp PT mean anchors (sobol; two seeds bound the seed noise)
        m0 = float(render_lin(scene, meta, cam, args.anchor_spp, "pt",
                              "sobol", seed=0).mean())
        m1 = float(render_lin(scene, meta, cam, args.anchor_spp, "pt",
                              "sobol", seed=101).mean())
        anchors[str(sid)] = {
            "mean": 0.5 * (m0 + m1), "seed_means": [m0, m1],
            "rel_seed_diff": abs(m0 - m1) / max(0.5 * (m0 + m1), 1e-9),
            "size": [w, h], "spp": args.anchor_spp, "max_depth": 8}
        print(f"scene {sid} PT anchor: {anchors[str(sid)]['mean']:.5f} "
              f"(seed diff {anchors[str(sid)]['rel_seed_diff']:.4f}) "
              f"[{time.time()-t0:.0f}s]", flush=True)

    out["pt_mean_anchors"] = anchors
    with open(os.path.join(here, "tpu_pathtracer", "data",
                           "pt_mean_anchors.json"), "w") as f:
        json.dump(anchors, f, indent=1)

    if not args.skip_delta_e:
        sys.path.insert(0, os.path.join(here, "tests"))
        import test_spectrum as ts
        for gname, (subset_only, gate) in sorted(ts._GAMUT_GATES.items()):
            de, in_srgb = ts._delta_e_sweep(gname, 64, 17)
            if subset_only:
                de = de[in_srgb]
            stats = {"p99": float(np.percentile(de, 99)),
                     "mean": float(de.mean()), "gate": gate,
                     "pass": bool(np.percentile(de, 99) < gate)}
            out["delta_e"][gname] = stats
            print(f"delta_e {gname}: {stats}", flush=True)

    out["all_pass"] = bool(all(r["pass"] for r in out["matrix"]))
    with open(os.path.join(here, args.out), "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}; all_pass={out['all_pass']}")


if __name__ == "__main__":
    main()
