"""EOTF / inverse-EOTF transfer functions, vectorized over JAX arrays.

TPU-native equivalent of the reference's ``Eotf`` trait and its seven
implementations (reference: color/src/eotf.rs:4-127).  Convention matches the
reference: ``encode`` (= reference ``transform``) maps linear -> display
encoded; ``decode`` (= ``inverse_transform``) maps encoded -> linear.

These run both on host (numpy arrays work fine through jnp) and inside jitted
pipelines.  All are branchless (``jnp.where``) — no data-dependent control
flow, so they fuse into surrounding XLA programs.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["encode", "decode", "EOTF_NAMES"]

EOTF_NAMES = (
    "linear", "gamma2_2", "gamma2_4", "gamma2_6", "srgb", "adobe_rgb", "rec709",
)


def _safe_pow(x, p):
    # Guards pow against negative bases; all encoders clamp at 0 like the
    # reference's usage (values reaching the EOTF are clipped >= 0 by the
    # sensor, renderer/src/sensor.rs:83).
    return jnp.power(jnp.maximum(x, 0.0), p)


def encode(x, eotf: str):
    """linear -> encoded (ref ``Eotf::transform``, color/src/eotf.rs)."""
    if eotf == "linear":
        return x
    if eotf == "gamma2_2":
        return _safe_pow(x, 1.0 / 2.2)
    if eotf == "gamma2_4":
        return _safe_pow(x, 1.0 / 2.4)
    if eotf == "gamma2_6":
        return _safe_pow(x, 1.0 / 2.6)
    if eotf == "srgb":
        # piecewise sRGB (ref: color/src/eotf.rs:53-61)
        return jnp.where(x <= 0.0031308, 12.92 * x, 1.055 * _safe_pow(x, 1.0 / 2.4) - 0.055)
    if eotf == "adobe_rgb":
        return _safe_pow(x, 256.0 / 563.0)  # gamma 563/256 (ref :79-87)
    if eotf == "rec709":
        return jnp.where(x < 0.018, 4.5 * x, 1.099 * _safe_pow(x, 0.45) - 0.099)
    raise ValueError(f"unknown eotf {eotf!r}")


def decode(x, eotf: str):
    """encoded -> linear (ref ``Eotf::inverse_transform``)."""
    if eotf == "linear":
        return x
    if eotf == "gamma2_2":
        return _safe_pow(x, 2.2)
    if eotf == "gamma2_4":
        return _safe_pow(x, 2.4)
    if eotf == "gamma2_6":
        return _safe_pow(x, 2.6)
    if eotf == "srgb":
        return jnp.where(x <= 0.04045, x / 12.92, _safe_pow((x + 0.055) / 1.055, 2.4))
    if eotf == "adobe_rgb":
        return _safe_pow(x, 563.0 / 256.0)
    if eotf == "rec709":
        return jnp.where(x < 0.081, x / 4.5, _safe_pow((x + 0.099) / 1.099, 1.0 / 0.45))
    raise ValueError(f"unknown eotf {eotf!r}")
