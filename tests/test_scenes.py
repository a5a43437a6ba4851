"""Scene matrix smoke tests: every demo scene must build and render finite.

Mirrors the breadth of the reference's regression matrix
(renderer/tests/regression_test.rs runs scenes x integrators x samplers
against goldens; the goldens are LFS stubs, so the gate here is build +
finite + nonzero + basic layout checks).
"""
import numpy as np
import pytest

from tpu_pathtracer.render.integrator import RenderConfig, render
from tpu_pathtracer.scenes import available_scenes, load_scene

FAST_SCENES = (0, 6, 8, 15, 19)
ALL_SCENES = tuple(available_scenes())


def _render_scene(n, spp=2, w=48, h=36, strategy="mis"):
    scene, meta, cam = load_scene(n, w, h, table_res=32)
    cfg = RenderConfig(width=w, height=h, spp=spp, strategy=strategy,
                       sampler="sobol", max_depth=4)
    return np.asarray(render(scene, meta, cam, cfg))


def test_all_20_scenes_available():
    assert ALL_SCENES == tuple(range(20))


@pytest.mark.parametrize("n", FAST_SCENES)
def test_scene_smoke(n):
    img = _render_scene(n)
    assert np.isfinite(img).all()
    assert img.mean() > 0.02, f"scene {n} black"
    assert img.max() <= 1.0 + 1e-5


@pytest.mark.slow
@pytest.mark.parametrize("n", [s for s in ALL_SCENES if s not in FAST_SCENES])
def test_scene_smoke_full(n):
    img = _render_scene(n)
    assert np.isfinite(img).all()
    assert img.mean() > 0.02, f"scene {n} black"


def test_env_scene_sky_visible():
    img = _render_scene(19, spp=4)
    # upper rows see the sky: blue channel dominates for the typical pixel
    # (median; the sun disk itself is warm and can enter the view)
    top = np.median(img[:6].reshape(-1, 3), axis=0)
    assert top[2] > top[0]
    assert img.mean() > 0.2
