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
