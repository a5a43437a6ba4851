"""Color subsystem tests (gamuts, EOTFs, tone maps)."""
import numpy as np
import pytest

from tpu_pathtracer import color
from tpu_pathtracer.color import eotf, tone_map


def test_srgb_matrix_matches_standard():
    ref = np.array([[0.4124564, 0.3575761, 0.1804375],
                    [0.2126729, 0.7151522, 0.0721750],
                    [0.0193339, 0.1191920, 0.9503041]])
    assert np.abs(color.SRGB.rgb_to_xyz - ref).max() < 5e-4


def test_white_maps_to_whitepoint():
    # RGB (1,1,1) must map to the gamut's white point with Y=1
    for g in color.GAMUTS.values():
        xyz = g.rgb_to_xyz @ np.ones(3)
        assert abs(xyz[1] - 1.0) < 1e-6, g.name
        xy = xyz[:2] / xyz.sum()
        assert abs(xy[0] - g.w_xy[0]) < 1e-6 and abs(xy[1] - g.w_xy[1]) < 1e-6


def test_matrices_inverse():
    for g in color.GAMUTS.values():
        assert np.abs(g.rgb_to_xyz @ g.xyz_to_rgb - np.eye(3)).max() < 1e-6


@pytest.mark.parametrize("name", eotf.EOTF_NAMES)
def test_eotf_round_trip(name):
    x = np.linspace(0.0, 1.0, 101, dtype=np.float32)
    y = np.asarray(eotf.decode(eotf.encode(x, name), name))
    assert np.abs(y - x).max() < 1e-5


def test_gamut_conversion_round_trip():
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0.1, 0.9, (64, 3)).astype(np.float32)
    out = color.convert_gamut(
        color.convert_gamut(rgb, color.SRGB, color.REC2020),
        color.REC2020, color.SRGB)
    assert np.abs(np.asarray(out) - rgb).max() < 1e-4  # two f32 3x3 chains


def test_reinhard_tone_map():
    x = np.array([0.0, 1.0, 3.0], dtype=np.float32)
    y = np.asarray(tone_map.apply(x, "reinhard"))
    assert np.allclose(y, x / (1 + x))
    back = np.asarray(tone_map.invert(y, "reinhard"))
    assert np.abs(back - x).max() < 1e-4


def test_scene_gamut_invariance():
    """A scene built in a different WORKING gamut (rec2020 table, colors
    converted) must render the same sRGB image — the per-gamut tables and
    texture color metadata agree end-to-end (ref: per-gamut table blobs
    rgb_to_spec/src/lib.rs:1-32 + TypedRgbTexture rgb_texture.rs:18-281)."""
    import numpy as np
    from tpu_pathtracer import color as color_mod
    from tpu_pathtracer.render.camera import default_camera
    from tpu_pathtracer.render.integrator import RenderConfig, render
    from tpu_pathtracer.scene import mesh
    from tpu_pathtracer.scene.builder import (Emissive, Lambert, SceneBuilder,
                                              Texture)

    w, h = 24, 18
    rgb_srgb = np.asarray([0.7, 0.35, 0.2], np.float32)
    # an rgb texture authored in sRGB with sRGB encoding
    tex_data = np.tile(np.asarray([[0.6, 0.4, 0.3]], np.float32), (4, 4, 1))
    from tpu_pathtracer.color import eotf as eotf_mod
    tex_encoded = np.asarray(eotf_mod.encode(tex_data, "srgb"))

    def build(gamut_name):
        sb = SceneBuilder(table_res=32, gamut=gamut_name)
        col = rgb_srgb
        if gamut_name != "srgb":
            col = np.asarray(color_mod.convert_gamut(
                rgb_srgb, color_mod.SRGB, color_mod.by_name(gamut_name)))
        m = sb.add_material(Lambert(albedo=tuple(float(c) for c in col)))
        m_tex = sb.add_material(Lambert(albedo=Texture(
            tex_encoded, kind="rgb", gamut="srgb", eotf="srgb")))
        m_l = sb.add_material(Emissive(spectrum=(1.0, 1.0, 1.0),
                                       intensity=6.0))
        s = 2.0
        sb.add_mesh(mesh.quad([-s, 0, s], [s, 0, s], [s, 0, -s], [-s, 0, -s]), m)
        sb.add_mesh(mesh.quad([-s, 0, -s], [s, 0, -s], [s, 4, -s],
                              [-s, 4, -s]), m_tex)
        e = 1.0
        sb.add_mesh(mesh.quad([-e, 3.98, e], [e, 3.98, e], [e, 3.98, -e],
                              [-e, 3.98, -e]), m_l)
        cam = default_camera(w, h).look_to((0.0, 2.0, 5.0), (0.0, -0.3, -1.0))
        data, meta = sb.build(cam.position)
        return data, meta, cam

    cfg = RenderConfig(width=w, height=h, spp=16, strategy="nee",
                       sampler="sobol", max_depth=3)
    img_srgb = np.asarray(render(*build("srgb"), cfg))
    img_2020 = np.asarray(render(*build("rec2020"), cfg))
    # same physical scene, same estimator -> small residual from the two
    # tables' independent fits
    err = np.abs(img_srgb - img_2020).mean()
    assert err < 0.02, f"gamut-invariance error {err}"
