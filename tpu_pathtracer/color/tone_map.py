"""Tone mapping operators.

Equivalent of the reference's ``ToneMap`` trait + ``NoneToneMap``
(color/src/tone_map.rs:6-31) and the renderer's ``ReinhardToneMap``
(renderer/src/tone_map.rs:20-29).  Branchless array functions.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["apply", "TONE_MAP_NAMES"]

TONE_MAP_NAMES = ("none", "reinhard")


def apply(rgb, tone_map: str):
    """Apply a named tone map to linear RGB (leading batch dims, last dim 3)."""
    if tone_map == "none":
        return rgb
    if tone_map == "reinhard":
        # rgb / (1 + rgb) (ref: renderer/src/tone_map.rs:26-28)
        return rgb / (1.0 + rgb)
    raise ValueError(f"unknown tone map {tone_map!r}")


def invert(rgb, tone_map: str):
    """Inverse tone map (reference ``InvertibleToneMap``)."""
    if tone_map == "none":
        return rgb
    if tone_map == "reinhard":
        return rgb / jnp.maximum(1.0 - rgb, 1e-7)
    raise ValueError(f"unknown tone map {tone_map!r}")
