"""Two-level instancing gates (VERDICT r4 missing #1).

Scene 7 (four gold bunnies) now stores the bunny soup + acceleration
tables ONCE with four per-instance affines; these tests gate

  * memory: the instanced build holds exactly one canonical copy;
  * intersection equivalence: closest hits / occlusion vs the flattened
    duplicated-triangle build (the old path, kept behind ``flatten=True``);
  * render equivalence: identical sampler streams => images agree within
    float rounding of the object-space transform round trip;
  * correctness of finite-t_max clamping through the instance pass.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tpu_pathtracer.ops import trace
from tpu_pathtracer.render.camera import default_camera
from tpu_pathtracer.render.integrator import RenderConfig, render
from tpu_pathtracer.scene.builder import Emissive, Metal, SceneBuilder
from tpu_pathtracer.scenes import load_scene
from tpu_pathtracer.utils.vec import v3_unstack

TABLE_RES = 16
W, H = 48, 36


def _builds():
    import tpu_pathtracer.scenes as scenes_mod
    out = {}
    for flatten in (False, True):
        sb = SceneBuilder(table_res=TABLE_RES)
        cam = default_camera(W, H)
        scenes_mod.add_cornell_box(sb)
        mats = [sb.add_material(Metal(kind="gold", roughness=r))
                for r in (0.05, 0.25, 0.5, 0.75)]
        scenes_mod._four_on_floor(sb, mats, flatten=flatten)
        cam = cam.look_to(scenes_mod.CAMERA_POS, scenes_mod.CAMERA_DIR)
        scene, meta = sb.build(cam.position)
        out[flatten] = (scene, meta, cam)
    return out[False], out[True], cam


def test_instanced_build_stores_mesh_once():
    (inst, meta_i, _), (flat, meta_f, _), _ = _builds()
    assert len(inst.instanced) == 1
    g = inst.instanced[0]
    n_bunny = g.bvh.tri9.shape[0]
    # flattened build carries 4 copies; instanced main soup carries none
    assert flat.bvh.tri9.shape[0] == inst.bvh.tri9.shape[0] + 4 * n_bunny
    assert g.fwd.shape == (4, 12)
    # per-instance materials rode through (4 distinct gold-roughness rows)
    assert len(set(np.asarray(g.mat_id).tolist())) == 4


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    # rays from around the box aimed inward (box is ~[-2,2]^3 z in [-4,0])
    o = rng.uniform([-1.8, 0.2, -3.6], [1.8, 3.6, -0.4], size=(n, 3))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return (v3_unstack(jnp.asarray(o, jnp.float32)),
            v3_unstack(jnp.asarray(d, jnp.float32)))


def test_instanced_intersect_matches_flattened():
    (inst, _, _), (flat, _, _), _ = _builds()
    o, d = _rays(4096)
    hi = trace.intersect_scene(inst, o, d, jnp.asarray(3.0e38))
    hf = trace.intersect_scene(flat, o, d, jnp.asarray(3.0e38))
    hit_i, hit_f = np.asarray(hi.hit), np.asarray(hf.hit)
    agree = (hit_i == hit_f).mean()
    assert agree > 0.999, agree
    both = hit_i & hit_f
    dt = np.abs(np.asarray(hi.t)[both] - np.asarray(hf.t)[both])
    rel = dt / np.maximum(np.asarray(hf.t)[both], 1e-3)
    assert np.quantile(rel, 0.999) < 1e-3, np.quantile(rel, 0.999)


def test_instanced_occlusion_matches_flattened():
    (inst, _, _), (flat, _, _), _ = _builds()
    o, d = _rays(4096, seed=3)
    t_max = jnp.full((4096,), 1.5)
    oi = np.asarray(trace.intersect_p_scene(inst, o, d, t_max))
    of = np.asarray(trace.intersect_p_scene(flat, o, d, t_max))
    assert (oi == of).mean() > 0.999


def test_instanced_finite_tmax_contract():
    """Hits reported by the instance pass must respect a finite t_max."""
    (inst, _, _), _, _ = _builds()
    o, d = _rays(2048, seed=5)
    h_far = trace.intersect_scene(inst, o, d, jnp.asarray(3.0e38))
    t_short = jnp.full((2048,), 0.8)
    h_near = trace.intersect_scene(inst, o, d, t_short)
    t = np.asarray(h_near.t)[np.asarray(h_near.hit)]
    assert (t <= 0.8 + 1e-5).all()
    # rays whose true hit is nearer than 0.8 must still hit
    near_true = np.asarray(h_far.hit) & (np.asarray(h_far.t) < 0.75)
    assert np.asarray(h_near.hit)[near_true].all()


def test_instanced_render_matches_flattened():
    """Same sampler streams, same geometry => images agree to float noise
    (hit ids differ; radiometry must not)."""
    (inst, meta_i, cam), (flat, meta_f, _), _ = _builds()
    cfg = RenderConfig(width=W, height=H, spp=12, strategy="mis",
                       sampler="sobol", max_depth=5, tone_map="none",
                       eotf="linear")
    img_i = np.asarray(render(inst, meta_i, cam, cfg))
    img_f = np.asarray(render(flat, meta_f, cam, cfg))
    scale = max(img_f.mean(), 1e-6)
    rmse = float(np.sqrt(np.mean((img_i - img_f) ** 2))) / scale
    # not bit-identical (object-space transform changes rounding; a few
    # grazing hits flip), but far below any estimator-level difference
    assert rmse < 0.02, rmse
    assert abs(img_i.mean() - img_f.mean()) / scale < 0.005


def test_instanced_scene7_smoke():
    """The registered scene 7 now builds instanced and renders finite."""
    scene, meta, cam = load_scene(7, W, H, table_res=TABLE_RES)
    assert len(scene.instanced) == 1
    cfg = RenderConfig(width=W, height=H, spp=4, strategy="nee",
                       sampler="sobol", max_depth=4)
    img = np.asarray(render(scene, meta, cam, cfg))
    assert np.isfinite(img).all()
    assert img.mean() > 0.01


def test_emissive_instances_rejected():
    sb = SceneBuilder(table_res=TABLE_RES)
    m = sb.add_material(Emissive(spectrum=(1.0, 1.0, 1.0)))
    from tpu_pathtracer.scene import mesh as mesh_mod
    q = mesh_mod.quad([-1, 0, 1], [1, 0, 1], [1, 0, -1], [-1, 0, -1])
    with pytest.raises(ValueError):
        sb.add_instances(q, [(np.eye(4), m)])
