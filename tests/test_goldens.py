"""Golden-image regression gates (the reference's regression_test.rs role).

The reference pins 42 goldens (scenes {0,3,6,7,8,9,10} x {pt,nee,mis} x
{random,sobol}, 200x150, renderer/tests/regression_test.rs:43-659); its
PNGs are LFS stubs here, so the goldens are OUR OWN renders
(scripts/gen_goldens.py), committed once the absolute gates (NumPy
oracle, furnace, consistency matrix, PT anchors) trust the estimator.

Because the samplers are pure functions of (pixel, sample, dim, seed), a
re-render at identical settings reproduces the golden up to backend float
rounding + 8-bit quantization — the display-space RMSE gate of 0.01 is
~5x above that floor and ~5x below any estimator-level change, so ANY
change to sampling streams, estimator weights, or the spectral chain
trips it (regenerate deliberately when a change is intended).

Default tier: three contrasting combos; slow tier: the full 42.
"""
import os

import numpy as np
import pytest

from tpu_pathtracer.render.integrator import RenderConfig, render
from tpu_pathtracer.scenes import load_scene

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tpu_pathtracer",
                          "data", "goldens")
W, H, SPP = 200, 150, 64


def _check_golden(sid, strat, sampler, rmse_gate=0.01):
    from PIL import Image

    path = os.path.join(GOLDEN_DIR, f"scene{sid}_{strat}_{sampler}.png")
    if not os.path.exists(path):
        pytest.skip(f"no committed golden for {sid}/{strat}/{sampler} "
                    "(run scripts/gen_goldens.py)")
    golden = np.asarray(Image.open(path), np.float32) / 255.0
    scene, meta, cam = load_scene(sid, W, H, table_res=32)
    cfg = RenderConfig(width=W, height=H, spp=SPP, max_depth=8,
                       strategy=strat, sampler=sampler, seed=0)
    img = np.clip(np.asarray(render(scene, meta, cam, cfg)), 0.0, 1.0)
    rmse = float(np.sqrt(np.mean((img - golden) ** 2)))
    assert rmse < rmse_gate, (f"scene{sid} {strat}/{sampler}: display RMSE "
                              f"{rmse:.5f} vs golden (gate {rmse_gate})")


# --- default tier: three contrasting combos -------------------------------

def test_golden_scene0_mis_sobol():
    _check_golden(0, "mis", "sobol")


def test_golden_scene8_glass_mis_sobol():
    _check_golden(8, "mis", "sobol")


def test_golden_scene3_pt_random():
    _check_golden(3, "pt", "random")


# --- slow tier: the full 42-combo matrix ----------------------------------

@pytest.mark.slow
@pytest.mark.parametrize("sampler", ["random", "sobol"])
@pytest.mark.parametrize("strat", ["pt", "nee", "mis"])
@pytest.mark.parametrize("sid", [0, 3, 6, 7, 8, 9, 10])
def test_golden_matrix(sid, strat, sampler):
    _check_golden(sid, strat, sampler)
