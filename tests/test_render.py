"""End-to-end render tests: smoke renders + integrator consistency.

Mirrors the reference's test strategy (SURVEY §4): the reference compares
against golden PNGs (LFS stubs here, so unavailable) and cross-checks
integrators at high spp with a median filter
(renderer_consistency_test.rs:7,155-165).  We keep the cross-consistency
gate and add physics gates the reference lacks (furnace test).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pathtracer.render.camera import default_camera
from tpu_pathtracer.render.integrator import RenderConfig, render
from tpu_pathtracer.scene.builder import Emissive, Lambert, SceneBuilder
from tpu_pathtracer.scene import mesh
from tpu_pathtracer.scenes import load_scene

TABLE_RES = 32


def _median3(img):
    from scipy.ndimage import median_filter
    return median_filter(img, size=(3, 3, 1))


def test_scene0_smoke_renders():
    scene, meta, cam = load_scene(0, 64, 48, table_res=TABLE_RES)
    cfg = RenderConfig(width=64, height=48, spp=4, strategy="nee",
                       sampler="random", max_depth=4)
    img = np.asarray(render(scene, meta, cam, cfg))
    assert img.shape == (48, 64, 3)
    assert np.isfinite(img).all()
    assert img.mean() > 0.05  # lit scene
    # left wall red-ish, right wall green-ish
    left = img[20:30, :6].mean((0, 1))
    right = img[20:30, -6:].mean((0, 1))
    assert left[0] > left[1] and right[1] > right[0]


def test_aov_renderers():
    scene, meta, cam = load_scene(0, 48, 36, table_res=TABLE_RES)
    alb = np.asarray(render(scene, meta, cam, RenderConfig(
        width=48, height=36, spp=2, strategy="albedo", sampler="random")))
    nrm = np.asarray(render(scene, meta, cam, RenderConfig(
        width=48, height=36, spp=2, strategy="normal", sampler="random")))
    assert np.isfinite(alb).all() and np.isfinite(nrm).all()
    assert alb.mean() > 0.1          # albedo AOV is bright
    assert 0.0 <= nrm.min() and nrm.max() <= 1.0


def test_furnace():
    """Furnace test (not in the reference): a closed white box with uniform
    emission converges to a finite uniform field; with albedo rho and
    emitted radiance Le everywhere, steady state is Le/(1-rho)."""
    sb = SceneBuilder(table_res=TABLE_RES)
    # a box whose walls are all emissive AND there is a lambert ball inside
    from tpu_pathtracer.scenes.common import add_cornell_box
    m_e = sb.add_material(Emissive(spectrum=(1.0, 1.0, 1.0), intensity=1.0))
    s = 2.0
    for q in mesh.box_interior(s, s).values():
        # shift interior box up so floor is at y=0 like the cornell helper
        sb.add_mesh(q, m_e, np.asarray([[1, 0, 0, 0], [0, 1, 0, s], [0, 0, 1, 0], [0, 0, 0, 1.0]]))
    cam = default_camera(32, 24).look_to((0.0, 2.0, 1.0), (0.0, 0.0, -1.0))
    scene, meta = sb.build(cam.position)
    cfg = RenderConfig(width=32, height=24, spp=8, strategy="pt",
                       sampler="random", max_depth=2, tone_map="none",
                       eotf="linear")
    img = np.asarray(render(scene, meta, cam, cfg))
    # every wall is a pure emitter: radiance = Le everywhere -> the mean must
    # be exactly the emitted level (1.0); per-pixel scatter is the (large)
    # chroma variance of 4-wavelength hero sampling, so gate the mean tightly
    # and the scatter loosely
    assert np.isfinite(img).all()
    assert abs(img.mean() - 1.0) < 0.05
    assert img.std() / img.mean() < 0.45


@pytest.mark.slow
def test_integrator_consistency_scene0():
    """pt/nee/mis agree within the reference's 1.3% gate
    (renderer_consistency_test.rs:7) — reduced res/spp for CPU CI."""
    W, H, SPP = 64, 48, 96
    scene, meta, cam = load_scene(0, W, H, table_res=TABLE_RES)
    imgs = {}
    means = {}
    for strat in ("pt", "nee", "mis"):
        cfg = RenderConfig(width=W, height=H, spp=SPP, strategy=strat,
                           sampler="sobol", max_depth=6)
        lin = np.clip(np.asarray(render(scene, meta, cam, cfg)), 0, 1) ** 2.2
        imgs[strat] = _median3(lin)
        means[strat] = lin.mean()
    # PT pairs carry PT's noise floor at this spp (the reference tests at
    # 2048 spp); nee<->mis share the NEE estimator and get the reference's
    # tight 1.3% gate.  PT's *mean* must still agree to <2%.
    for a, b, gate in (("pt", "nee", 0.05), ("pt", "mis", 0.05),
                       ("nee", "mis", 0.013)):
        rmse = float(np.sqrt(np.mean((imgs[a] - imgs[b]) ** 2)))
        assert rmse < gate, f"{a} vs {b}: rmse {rmse}"
        rel = abs(means[a] - means[b]) / means[b]
        # pt's image mean is heavy-tailed at this spp; 3% bounds it while
        # still catching the round-3 class of bias (+43%)
        assert rel < 0.03, f"{a} vs {b}: mean diff {rel}"


def test_sampler_determinism():
    scene, meta, cam = load_scene(0, 32, 24, table_res=TABLE_RES)
    cfg = RenderConfig(width=32, height=24, spp=2, strategy="nee",
                       sampler="sobol", seed=7)
    a = np.asarray(render(scene, meta, cam, cfg))
    b = np.asarray(render(scene, meta, cam, cfg))
    assert (a == b).all()
    cfg2 = RenderConfig(width=32, height=24, spp=2, strategy="nee",
                        sampler="sobol", seed=8)
    c = np.asarray(render(scene, meta, cam, cfg2))
    assert not (a == c).all()


def test_point_light_scene():
    scene, meta, cam = load_scene(2, 48, 36, table_res=TABLE_RES)
    cfg = RenderConfig(width=48, height=36, spp=8, strategy="nee",
                       sampler="random", max_depth=3)
    img = np.asarray(render(scene, meta, cam, cfg))
    assert np.isfinite(img).all() and img.mean() > 0.05


def test_random_sampler_decorrelates_pixels():
    """Disjoint pixel tiles must draw different random streams (round-1 bug:
    the threefry key ignored the pixel, so every tile repeated the same
    noise pattern)."""
    from tpu_pathtracer.render.sampler import make_sampler
    s = make_sampler("random", seed=0, spp=4, resolution=(64, 64))
    tile_a = jnp.asarray([[0, 0], [1, 0], [2, 0], [3, 0]], jnp.int32)
    tile_b = jnp.asarray([[0, 32], [1, 32], [2, 32], [3, 32]], jnp.int32)
    ua = np.asarray(s.get_1d(tile_a, 0, 5))
    ub = np.asarray(s.get_1d(tile_b, 0, 5))
    assert not np.allclose(ua, ub)
    # and a pixel's draw does not depend on which batch it rides in
    mixed = jnp.concatenate([tile_b[2:], tile_a[:2]], 0)
    um = np.asarray(s.get_1d(mixed, 0, 5))
    np.testing.assert_array_equal(um[2:], ua[:2])
    np.testing.assert_array_equal(um[:2], ub[2:])


def test_tiled_render_matches_untiled_random():
    """cfg.tile_rays tiling must be invisible for BOTH samplers."""
    import dataclasses
    scene, meta, cam = load_scene(1, 16, 12, table_res=16)
    for sampler in ("random", "sobol"):
        cfg = RenderConfig(width=16, height=12, spp=2, strategy="pt",
                           sampler=sampler, max_depth=2)
        full = np.asarray(render(scene, meta, cam, cfg))
        tiled = np.asarray(render(scene, meta, cam,
                                  dataclasses.replace(cfg, tile_rays=64)))
        np.testing.assert_array_equal(full, tiled, err_msg=sampler)


def test_wavefront_matches_trace_sample_film():
    """The regenerative wavefront must reproduce the lockstep trace_sample
    film: same per-(pixel, sample) streams, same accumulation order."""
    from tpu_pathtracer.render import integrator as integ

    scene, meta, cam = load_scene(0, 32, 24, table_res=16)
    for strategy in ("pt", "nee", "mis"):
        cfg = RenderConfig(width=32, height=24, spp=4, max_depth=5,
                           strategy=strategy, sampler="sobol", seed=0)
        # lockstep reference path (bypasses the wavefront dispatch)
        px = integ._pixel_grid(32, 24)
        md = jnp.asarray(cfg.max_depth, jnp.int32)
        acc_ref = jnp.zeros((32 * 24, 3))
        acc_ref = integ._accum_chunk(scene, meta, cam, cfg, cfg.spp, px,
                                     jnp.asarray(0, jnp.int32), acc_ref, md)
        acc_wf = integ.render_wavefront(scene, meta, cam, cfg)
        np.testing.assert_allclose(np.asarray(acc_wf), np.asarray(acc_ref),
                                   rtol=2e-5, atol=2e-6,
                                   err_msg=f"strategy={strategy}")


def test_wavefront_chunk_invariance():
    """Film is identical regardless of spp chunking (progressive resume)."""
    from tpu_pathtracer.render import integrator as integ

    scene, meta, cam = load_scene(0, 16, 12, table_res=16)
    cfg = RenderConfig(width=16, height=12, spp=6, max_depth=4,
                       strategy="mis", sampler="sobol", seed=3)
    full = integ.render_wavefront(scene, meta, cam, cfg)
    part = integ.render_wavefront(scene, meta, cam, cfg, spp_start=0,
                                  spp_end=2)
    part = integ.render_wavefront(scene, meta, cam, cfg, spp_start=2,
                                  spp_end=6, accum_init=part)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(part))
