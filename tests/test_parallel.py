"""Multi-chip sharding gates on the spoofed 8-device CPU mesh (conftest).

The reference has no distributed backend (SURVEY §2.8); these tests gate the
new capability: sharded render == single-device render, and psum'd gradients
are independent of the mesh size.
"""
import jax
import jax.numpy as jnp
import numpy as np

from tpu_pathtracer import parallel
from tpu_pathtracer.render.integrator import RenderConfig, render
from tpu_pathtracer.scenes import load_scene

W, H = 32, 24


def _cfg(**kw):
    kw.setdefault("strategy", "mis")
    kw.setdefault("sampler", "sobol")
    return RenderConfig(width=W, height=H, spp=2, max_depth=3, **kw)


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_sharded_render_matches_single_device():
    scene, meta, cam = load_scene(1, W, H, table_res=16)
    cfg = _cfg()
    img1 = np.asarray(render(scene, meta, cam, cfg))
    img8 = np.asarray(parallel.render_sharded(scene, meta, cam, cfg,
                                              mesh=parallel.make_mesh(8)))
    assert img8.shape == img1.shape
    np.testing.assert_allclose(img8, img1, atol=2e-5, rtol=1e-4)


def test_grads_independent_of_mesh_size():
    scene, meta, cam = load_scene(1, W, H, table_res=16)
    cfg = _cfg(strategy="pt")
    params = parallel.extract_params(scene)
    target = jnp.zeros((W * H, 3))

    l1, g1 = parallel.loss_and_grads(params, scene, meta, cam, cfg, target,
                                     mesh=parallel.make_mesh(1))
    l8, g8 = parallel.loss_and_grads(params, scene, meta, cam, cfg, target,
                                     mesh=parallel.make_mesh(8))
    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g8[k]),
                                   atol=1e-6, rtol=1e-4, err_msg=k)


def test_uneven_pixel_count_pads():
    """W*H not divisible by the mesh size must still work (padding)."""
    scene, meta, cam = load_scene(1, 9, 7, table_res=16)
    cfg = RenderConfig(width=9, height=7, spp=1, max_depth=2,
                       strategy="pt", sampler="random")
    img = np.asarray(parallel.render_sharded(scene, meta, cam, cfg,
                                             mesh=parallel.make_mesh(8)))
    assert img.shape == (7, 9, 3)
    assert np.isfinite(img).all()


def test_sharded_render_matches_single_device_random_sampler():
    """The random sampler is pixel-keyed, so sharding must not change the
    image (round-1 bug: every shard drew identical streams)."""
    scene, meta, cam = load_scene(1, W, H, table_res=16)
    cfg = _cfg(sampler="random", strategy="pt")
    img1 = np.asarray(render(scene, meta, cam, cfg))
    img8 = np.asarray(parallel.render_sharded(scene, meta, cam, cfg,
                                              mesh=parallel.make_mesh(8)))
    np.testing.assert_allclose(img8, img1, atol=2e-5, rtol=1e-4)
