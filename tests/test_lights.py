"""Light-sampling gates: many-triangle area lights, textured emission,
environment rotation + jittered importance sampling.

These cover the round-1 gaps: the NEE area sampler used to scan a fixed
8-triangle window (silent bias for bigger emitters), emission textures were
stored but never sampled, and the env map's rotation parameter was dead.
"""
import math

import jax.numpy as jnp
import numpy as np

from tpu_pathtracer.render.camera import default_camera
from tpu_pathtracer.render.integrator import RenderConfig, render
from tpu_pathtracer.scene.builder import Emissive, Lambert, SceneBuilder, Texture
from tpu_pathtracer.scene import mesh

TABLE_RES = 16


def _lift(y):
    return np.asarray([[1, 0, 0, 0], [0, 1, 0, y], [0, 0, 1, 0],
                       [0, 0, 0, 1.0]])


def _floor_scene(emissive_desc, emitter_mesh, emitter_y=2.0):
    sb = SceneBuilder(table_res=TABLE_RES)
    m_e = sb.add_material(emissive_desc)
    m_d = sb.add_material(Lambert(albedo=(0.7, 0.7, 0.7)))
    sb.add_mesh(mesh.quad([-4, 0, 4], [4, 0, 4], [4, 0, -4], [-4, 0, -4]),
                m_d, np.eye(4))
    sb.add_mesh(emitter_mesh, m_e, _lift(emitter_y))
    cam = default_camera(32, 24).look_to((0.0, 2.0, 6.0), (0.0, -0.25, -1.0))
    scene, meta = sb.build(cam.position)
    return scene, meta, cam


def test_many_triangle_area_light_nee_matches_pt():
    """An emissive sphere with ~100 triangles (>> the old 8-tri cap): NEE's
    CDF binary search must produce an unbiased estimate — its mean must agree
    with brute-force PT."""
    sphere = mesh.uv_sphere(0.6, 6, 10)
    assert len(sphere.indices) > 64
    scene, meta, cam = _floor_scene(
        Emissive(spectrum=(1.0, 0.9, 0.8), intensity=4.0), sphere)
    means = {}
    for strat in ("pt", "nee"):
        cfg = RenderConfig(width=32, height=24, spp=48, strategy=strat,
                           sampler="sobol", max_depth=3, tone_map="none",
                           eotf="linear")
        img = np.asarray(render(scene, meta, cam, cfg))
        assert np.isfinite(img).all()
        means[strat] = img.mean()
    assert means["nee"] > 0.01
    assert abs(means["pt"] - means["nee"]) / means["nee"] < 0.08, means


def test_textured_emission_direct_view():
    """A half-red/half-green emission texture must render with matching
    spatial variation (emission_tex was previously never sampled)."""
    tex = np.zeros((1, 8, 3), np.float32)
    tex[:, :4, 0] = 1.0   # left half red
    tex[:, 4:, 1] = 1.0   # right half green
    sb = SceneBuilder(table_res=TABLE_RES)
    m_e = sb.add_material(Emissive(spectrum=Texture(tex), intensity=3.0))
    q = mesh.quad([-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0])
    sb.add_mesh(q, m_e, np.eye(4))
    cam = default_camera(32, 24).look_to((0.0, 0.0, 2.5), (0.0, 0.0, -1.0))
    scene, meta = sb.build(cam.position)
    assert meta.has_emission_tex
    cfg = RenderConfig(width=32, height=24, spp=16, strategy="pt",
                       sampler="sobol", max_depth=2, tone_map="none",
                       eotf="linear")
    img = np.asarray(render(scene, meta, cam, cfg))
    left = img[8:16, 4:10].mean((0, 1))
    right = img[8:16, -10:-4].mean((0, 1))
    assert left[0] > 2.0 * left[1], left    # red side
    assert right[1] > 2.0 * right[0], right  # green side


def test_textured_emission_nee_consistent():
    """NEE must evaluate the emission texture at the sampled light point:
    nee and pt means agree for a textured emitter over a floor."""
    tex = np.zeros((2, 2, 3), np.float32)
    tex[0, 0] = [4.0, 0.0, 0.0]
    tex[1, 1] = [0.0, 0.0, 4.0]
    q = mesh.quad([-1, 0, 1], [1, 0, 1], [1, 0, -1], [-1, 0, -1])
    scene, meta, cam = _floor_scene(
        Emissive(spectrum=Texture(tex), intensity=2.0), q)
    means = {}
    for strat in ("pt", "nee"):
        cfg = RenderConfig(width=32, height=24, spp=48, strategy=strat,
                           sampler="sobol", max_depth=3, tone_map="none",
                           eotf="linear")
        means[strat] = np.asarray(render(scene, meta, cam, cfg)).mean()
    assert means["nee"] > 0.005
    assert abs(means["pt"] - means["nee"]) / means["nee"] < 0.10, means


def _env_scene(rotation_deg):
    img = np.full((8, 16, 3), 0.05, np.float32)
    img[3:5, 0:2] = [8.0, 0.2, 0.2]   # one bright red block near u=0
    sb = SceneBuilder(table_res=TABLE_RES)
    m = sb.add_material(Lambert(albedo=(0.5, 0.5, 0.5)))
    # a tiny triangle out of view so the scene has geometry
    sb.add_triangle([50, -1, 50], [51, -1, 50], [50, -1, 51], m)
    sb.add_env_light(img, rotation_deg=rotation_deg)
    cam = default_camera(16, 12).look_to((0.0, 0.0, 0.0), (1.0, 0.0, 0.0))
    scene, meta = sb.build(cam.position)
    return scene, meta


def test_env_rotation_moves_radiance():
    """env rotation: radiance of the rotated map at direction d equals the
    unrotated map at d rotated back around +y."""
    from tpu_pathtracer.render.env import env_radiance
    from tpu_pathtracer.spectrum.sampled import sample_uniform
    from tpu_pathtracer.utils.vec import s4_stack, v3_unstack

    s0, _ = _env_scene(0.0)
    s90, _ = _env_scene(90.0)
    wl = sample_uniform(jnp.asarray([0.3, 0.7]))
    d = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.2, -1.0]])
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    # rotate d by -90 deg around +y: phi' = phi - pi/2 with
    # x = cos(phi)sin(t), z = -sin(phi)sin(t)
    rot = -math.pi / 2.0
    x, y, z = d[:, 0], d[:, 1], d[:, 2]
    d_back = jnp.stack([x * math.cos(rot) + z * math.sin(rot), y,
                        -x * math.sin(rot) + z * math.cos(rot)], axis=-1)
    r_rot = np.asarray(s4_stack(env_radiance(s90, wl, v3_unstack(d))))
    r_ref = np.asarray(s4_stack(env_radiance(s0, wl, v3_unstack(d_back))))
    np.testing.assert_allclose(r_rot, r_ref, rtol=1e-4, atol=1e-6)
    # and rotation actually changes the lookup
    r0 = np.asarray(s4_stack(env_radiance(s0, wl, v3_unstack(d))))
    assert np.abs(r0 - r_rot).max() > 1e-3


def test_env_importance_sampling_integrates():
    """sample_env_direction with in-texel jitter: the importance-sampled
    estimate of the mean spectral radiance over the sphere must match the
    uniform-direction estimate (validates the pdf against the jitter)."""
    from tpu_pathtracer.render.env import env_radiance, sample_env_direction
    from tpu_pathtracer.spectrum.sampled import sample_uniform
    from tpu_pathtracer.utils.vec import s4_stack, v2_unstack, v3_unstack

    scene, _ = _env_scene(0.0)
    n = 65536
    rng = np.random.default_rng(3)
    wl = sample_uniform(jnp.asarray(rng.uniform(size=n), jnp.float32))
    u_uv = v2_unstack(jnp.asarray(rng.uniform(size=(n, 2)), jnp.float32))
    d, le, pdf = sample_env_direction(scene, wl, u_uv)
    est_is = float(np.mean(np.asarray(s4_stack(le)).mean(-1)
                           / np.asarray(pdf))) / (4 * math.pi)

    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    le_u = np.asarray(s4_stack(env_radiance(
        scene, wl, v3_unstack(jnp.asarray(dirs, jnp.float32)))))
    est_uni = float(le_u.mean(-1).mean())
    assert est_is > 0.0
    assert abs(est_is - est_uni) / est_uni < 0.05, (est_is, est_uni)
