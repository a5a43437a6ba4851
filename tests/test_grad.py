"""Differentiable-pass gates: autodiff pixel gradients vs finite differences.

New capability vs the reference (nothing there is differentiable, SURVEY §4
item d): the pixel loss must backprop to material parameters through the
full wavefront integrator, with BVH hits / lobe choices / RR treated as
fixed sample decisions (ops/trace.py custom zero-vjp).
"""
import jax
import jax.numpy as jnp
import numpy as np

from tpu_pathtracer import parallel
from tpu_pathtracer.render.camera import default_camera
from tpu_pathtracer.render.integrator import RenderConfig
from tpu_pathtracer.scene.builder import Emissive, Lambert, SceneBuilder
from tpu_pathtracer.scene import mesh
from tpu_pathtracer.spectrum import illum_d6500

W, H = 16, 12


def _tiny_scene(albedo=(0.85, 0.6, 0.4), intensity=8.0):
    """Floor + back wall + ceiling emitter: 6 triangles, all paths smooth."""
    sb = SceneBuilder(table_res=16)
    m = sb.add_material(Lambert(albedo=albedo))
    m_light = sb.add_material(Emissive(spectrum=illum_d6500(),
                                       intensity=intensity))
    s = 2.0
    sb.add_mesh(mesh.quad([-s, 0, s], [s, 0, s], [s, 0, -s], [-s, 0, -s]), m)
    sb.add_mesh(mesh.quad([-s, 0, -s], [s, 0, -s], [s, 4, -s], [-s, 4, -s]), m)
    e = 1.0
    sb.add_mesh(mesh.quad([-e, 3.98, e], [e, 3.98, e], [e, 3.98, -e],
                          [-e, 3.98, -e]), m_light)
    cam = default_camera(W, H).look_to((0.0, 2.0, 5.0), (0.0, -0.3, -1.0))
    data, meta = sb.build(cam.position)
    return data, meta, cam


def _cfg(**kw):
    kw.setdefault("strategy", "mis")
    kw.setdefault("sampler", "sobol")
    kw.setdefault("spp", 4)
    kw.setdefault("max_depth", 3)
    return RenderConfig(width=W, height=H, **kw)


def _one_bounce_scene(desc, intensity=8.0):
    """Floor of ``desc`` + ceiling emitter; gradients gated at ONE bounce.

    With strategy="nee" and max_depth=1 every contribution is the direct
    NEE term f_eval(wo, wi_light; params) * L / prob — a fully continuous
    function of the material parameters (the BSDF-*sampled* direction
    feeds no radiance: NEE-strategy counts emissive hits only after
    specular bounces and these lobes are rough).  That makes FD-vs-AD an
    exact gate on the microfacet derivative math (D/G/Fresnel/pdf chains),
    independent of the VNDF sample-motion estimator question (see
    render/bsdf.py "Differentiation stance").
    """
    sb = SceneBuilder(table_res=16)
    m = sb.add_material(desc)
    m_light = sb.add_material(Emissive(spectrum=illum_d6500(),
                                       intensity=intensity))
    s = 2.0
    sb.add_mesh(mesh.quad([-s, 0, s], [s, 0, s], [s, 0, -s], [-s, 0, -s]), m)
    e = 1.0
    sb.add_mesh(mesh.quad([-e, 3.98, e], [e, 3.98, e], [e, 3.98, -e],
                          [-e, 3.98, -e]), m_light)
    cam = default_camera(W, H).look_to((0.0, 2.0, 5.0), (0.0, -0.3, -1.0))
    data, meta = sb.build(cam.position)
    return data, meta, cam


def _fd_gate(scene, meta, cam, probes, cfg=None, tol=0.06, spp=8):
    cfg = cfg or _cfg(strategy="nee", spp=spp, max_depth=1)
    mesh1 = parallel.make_mesh(1)
    target = jnp.zeros((W * H, 3))
    params = parallel.extract_params(scene)
    _, grads = parallel.loss_and_grads(params, scene, meta, cam, cfg, target,
                                       mesh=mesh1)

    def loss_at(p):
        l, _ = parallel.loss_and_grads(p, scene, meta, cam, cfg, target,
                                       mesh=mesh1)
        return float(l)

    checked = {}
    for name, idx in probes:
        g_ad = float(grads[name][idx])
        eps = 2e-3 * max(1.0, abs(float(params[name][idx])))
        p_hi = dict(params)
        p_hi[name] = params[name].at[idx].add(eps)
        p_lo = dict(params)
        p_lo[name] = params[name].at[idx].add(-eps)
        g_fd = (loss_at(p_hi) - loss_at(p_lo)) / (2 * eps)
        assert np.isfinite(g_ad), f"{name}{idx} non-finite AD grad"
        assert abs(g_ad - g_fd) <= tol * max(abs(g_fd), abs(g_ad)) + 1e-6, \
            f"{name}{idx}: ad={g_ad:.6g} fd={g_fd:.6g}"
        checked[(name, idx)] = (g_ad, g_fd)
    return checked


def test_rough_conductor_roughness_grad_matches_fd():
    """VNDF/microfacet chain: d(loss)/d(roughness) on a rough gold floor
    (VERDICT r4 weak #2: the microfacet params were never FD-checked)."""
    from tpu_pathtracer.scene.builder import Metal
    scene, meta, cam = _one_bounce_scene(Metal(kind="gold", roughness=0.45))
    got = _fd_gate(scene, meta, cam, [("roughness", (0,))])
    # the gradient must actually be informative, not zero
    assert abs(got[("roughness", (0,))][0]) > 1e-6


def test_pbr_metallic_and_roughness_grads_match_fd():
    """SimplePbr mixture: metallic lerp + schlick/lambert mix derivatives."""
    from tpu_pathtracer.scene.builder import Pbr
    scene, meta, cam = _one_bounce_scene(
        Pbr(base_color=(0.7, 0.4, 0.3), metallic=0.5, roughness=0.5))
    got = _fd_gate(scene, meta, cam,
                   [("metallic", (0,)), ("roughness", (0,))])
    assert abs(got[("metallic", (0,))][0]) > 1e-6
    assert abs(got[("roughness", (0,))][0]) > 1e-6


def test_clearcoat_grads_match_fd():
    """Scene-17-style coat: Beer-Lambert tint + rough coat lobe derivatives
    (coat_tint_coeff, coat_roughness — the params the flagship BASELINE
    config actually trains)."""
    from tpu_pathtracer.scene.builder import Clearcoat
    scene, meta, cam = _one_bounce_scene(
        Clearcoat(base_color=(0.6, 0.5, 0.4), metallic=1.0, roughness=0.3,
                  coat_tint=(0.4, 0.5, 0.9), coat_thickness=0.8,
                  coat_roughness=0.3))
    got = _fd_gate(scene, meta, cam,
                   [("coat_tint_coeff", (0, 0)), ("coat_tint_coeff", (0, 2)),
                    ("coat_roughness", (0,))])
    assert abs(got[("coat_tint_coeff", (0, 2))][0]) > 1e-7
    assert abs(got[("coat_roughness", (0,))][0]) > 1e-7


def test_grads_match_finite_differences():
    scene, meta, cam = _tiny_scene()
    cfg = _cfg()
    mesh1 = parallel.make_mesh(1)
    target = jnp.zeros((W * H, 3))
    params = parallel.extract_params(scene)

    _, grads = parallel.loss_and_grads(params, scene, meta, cam, cfg, target,
                                       mesh=mesh1)

    def loss_at(p):
        l, _ = parallel.loss_and_grads(p, scene, meta, cam, cfg, target,
                                       mesh=mesh1)
        return float(l)

    # probe a handful of coordinates across two parameter families
    probes = [("base_coeff", (0, 0)), ("base_coeff", (0, 2)),
              ("emission_scale", (1,))]
    for name, idx in probes:
        g_ad = float(grads[name][idx])
        eps = 2e-3 * max(1.0, abs(float(params[name][idx])))
        p_hi = dict(params)
        p_hi[name] = params[name].at[idx].add(eps)
        p_lo = dict(params)
        p_lo[name] = params[name].at[idx].add(-eps)
        g_fd = (loss_at(p_hi) - loss_at(p_lo)) / (2 * eps)
        assert np.isfinite(g_ad)
        assert abs(g_ad - g_fd) <= 0.05 * max(abs(g_fd), abs(g_ad)) + 1e-6, \
            f"{name}{idx}: ad={g_ad:.6g} fd={g_fd:.6g}"


def test_emission_grad_sign_and_descent():
    """Darker target => emission gradient positive; an SGD step reduces loss."""
    scene, meta, cam = _tiny_scene()
    cfg = _cfg()
    mesh1 = parallel.make_mesh(1)
    target = jnp.zeros((W * H, 3))
    params = parallel.extract_params(scene)

    loss0, grads = parallel.loss_and_grads(params, scene, meta, cam, cfg,
                                           target, mesh=mesh1)
    # brighter emitter -> larger MSE vs black target
    assert float(grads["emission_scale"][1]) > 0.0

    new_params, _ = parallel.train_step(params, scene, meta, cam, cfg, target,
                                        lr=0.5, mesh=mesh1)
    loss1, _ = parallel.loss_and_grads(new_params, scene, meta, cam, cfg,
                                       target, mesh=mesh1)
    assert float(loss1) < float(loss0)


def test_grad_nonzero_through_nee_and_bsdf():
    """Albedo grads exist (light transport touches the floor material)."""
    scene, meta, cam = _tiny_scene()
    cfg = _cfg()
    params = parallel.extract_params(scene)
    _, grads = parallel.loss_and_grads(params, scene, meta, cam, cfg,
                                       jnp.zeros((W * H, 3)),
                                       mesh=parallel.make_mesh(1))
    assert float(jnp.abs(grads["base_coeff"][0]).max()) > 0.0


def test_adam_fit_recovers_albedo_and_resumes_bitexact(tmp_path):
    """End-to-end fit (VERDICT r3 missing #6): perturb the floor albedo,
    fit it back toward a target render with Adam, and verify (a) the loss
    falls substantially with a mostly-monotone trajectory, (b) an
    interrupted run resumed from the optimizer checkpoint lands bit-exact
    on the uninterrupted trajectory."""
    scene_t, meta, cam = _tiny_scene(albedo=(0.85, 0.6, 0.4))
    cfg = _cfg(strategy="pt", spp=2, max_depth=2)
    mesh1 = parallel.make_mesh(1)

    # deterministic target: the true scene's linear render
    from tpu_pathtracer.render.integrator import render_accum
    target = jnp.asarray(np.asarray(
        render_accum(scene_t, meta, cam, cfg)) / cfg.spp)

    # perturbed start: darker floor
    scene_0, _, _ = _tiny_scene(albedo=(0.3, 0.25, 0.2))
    n_steps = 20
    state = parallel.make_train_state(scene_0, lr=0.08)
    losses = []
    ckpt = str(tmp_path / "train.npz")
    mid_state = None
    for k in range(n_steps):
        state, loss = parallel.train_step_adam(state, scene_0, meta, cam,
                                               cfg, target, mesh=mesh1)
        losses.append(float(loss))
        if k == 9:
            state.save(ckpt)
    assert np.isfinite(losses).all()
    # strong decrease; deterministic loss (fixed sampler streams), so the
    # trajectory is smooth — allow a few Adam overshoot steps
    assert losses[-1] < 0.4 * losses[0], losses
    drops = sum(b <= a for a, b in zip(losses, losses[1:]))
    assert drops >= int(0.7 * (n_steps - 1)), losses

    # resume from the step-10 checkpoint: steps 10..20 must reproduce the
    # uninterrupted trajectory bit-exactly
    resumed = parallel.TrainState.load(ckpt, scene_0)
    assert resumed.step == 10
    for _ in range(n_steps - 10):
        resumed, _ = parallel.train_step_adam(resumed, scene_0, meta, cam,
                                              cfg, target, mesh=mesh1)
    for k in resumed.params:
        assert (np.asarray(resumed.params[k])
                == np.asarray(state.params[k])).all(), k
