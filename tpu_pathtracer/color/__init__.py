"""Color subsystem: gamuts, transfer functions, tone maps, XYZ conversions.

Replaces the reference's type-level ``ColorImpl<G, T, E>`` phantom-type design
(color/src/color.rs:44-146) with explicit named conversions over arrays: a
"color" here is just a ``(..., 3)`` array plus the (static) names of its
gamut / tone-map / EOTF state, tracked by the caller.  The type-safety the
reference gets from phantom types we get from keeping all conversions in one
tiny module with explicit from/to arguments.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import eotf, tone_map
from .gamut import (ACES_2065_1, ACES_CG, ADOBE_RGB, DISPLAY_P3, GAMUTS,
                    P3_D65, REC709, REC2020, SRGB, Gamut, by_name)

__all__ = [
    "Gamut", "SRGB", "DISPLAY_P3", "P3_D65", "ADOBE_RGB", "REC709", "REC2020",
    "ACES_CG", "ACES_2065_1", "GAMUTS", "by_name", "eotf", "tone_map",
    "xyz_to_rgb", "rgb_to_xyz", "convert_gamut",
]


def xyz_to_rgb(xyz, gamut: Gamut):
    """XYZ -> linear RGB in ``gamut`` (ref: color/src/color.rs:26-33)."""
    xyz = jnp.asarray(xyz)
    m = jnp.asarray(gamut.xyz_to_rgb, dtype=xyz.dtype)
    return xyz @ m.T


def rgb_to_xyz(rgb, gamut: Gamut):
    """linear RGB in ``gamut`` -> XYZ."""
    rgb = jnp.asarray(rgb)
    m = jnp.asarray(gamut.rgb_to_xyz, dtype=rgb.dtype)
    return rgb @ m.T


def convert_gamut(rgb, src: Gamut, dst: Gamut):
    """Cross-gamut conversion via XYZ (ref ``ColorImpl::from``, color/src/color.rs:121-137)."""
    rgb = jnp.asarray(rgb)
    if src is dst:
        return rgb
    m = jnp.asarray(dst.xyz_to_rgb @ src.rgb_to_xyz, dtype=rgb.dtype)
    return rgb @ m.T
