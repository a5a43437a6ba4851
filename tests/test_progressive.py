"""Progressive render + checkpoint/resume gates."""
import os

import numpy as np

from tpu_pathtracer.render.integrator import RenderConfig, render
from tpu_pathtracer.render.progressive import FilmState, render_progressive
from tpu_pathtracer.scenes import load_scene

W, H = 24, 18


def _cfg(spp=8):
    return RenderConfig(width=W, height=H, spp=spp, max_depth=3,
                        strategy="mis", sampler="sobol")


def test_progressive_matches_one_shot(tmp_path):
    scene, meta, cam = load_scene(1, W, H, table_res=16)
    cfg = _cfg()
    img_ref = np.asarray(render(scene, meta, cam, cfg))
    img_pro = render_progressive(scene, meta, cam, cfg,
                                 checkpoint_path=str(tmp_path / "ckpt.npz"),
                                 chunk_spp=3)
    np.testing.assert_allclose(img_pro, img_ref, atol=2e-5, rtol=1e-4)


def test_resume_from_checkpoint(tmp_path):
    scene, meta, cam = load_scene(1, W, H, table_res=16)
    cfg = _cfg()
    ckpt = str(tmp_path / "ckpt.npz")

    # simulate preemption: stop after the first chunk
    class Stop(Exception):
        pass

    def bail(state):
        if state.spp_done >= 3:
            raise Stop

    try:
        render_progressive(scene, meta, cam, cfg, checkpoint_path=ckpt,
                           chunk_spp=3, on_chunk=bail)
        raise AssertionError("expected simulated preemption")
    except Stop:
        pass
    assert os.path.exists(ckpt)
    st = FilmState.load(ckpt)
    assert 0 < st.spp_done < cfg.spp

    # resume must finish and match the one-shot image
    img = render_progressive(scene, meta, cam, cfg, checkpoint_path=ckpt,
                             chunk_spp=3)
    img_ref = np.asarray(render(scene, meta, cam, cfg))
    np.testing.assert_allclose(img, img_ref, atol=2e-5, rtol=1e-4)


def test_stale_checkpoint_ignored(tmp_path):
    scene, meta, cam = load_scene(1, W, H, table_res=16)
    ckpt = str(tmp_path / "ckpt.npz")
    render_progressive(scene, meta, cam, _cfg(spp=4), checkpoint_path=ckpt,
                       chunk_spp=2)
    # different config -> checkpoint must be discarded, not mixed in
    img = render_progressive(scene, meta, cam, _cfg(spp=6),
                             checkpoint_path=ckpt, chunk_spp=2)
    img_ref = np.asarray(render(scene, meta, cam, _cfg(spp=6)))
    np.testing.assert_allclose(img, img_ref, atol=2e-5, rtol=1e-4)
