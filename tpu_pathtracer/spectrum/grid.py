"""The 1nm dense spectral grid and vectorized spectrum evaluation.

Equivalent of the reference's ``DenselySampledSpectrum`` (470 bins at 1nm
over [360, 830), spectrum/src/spectrum/densely_sampled_spectrum.rs:9-88) —
here a dense spectrum is simply a ``(470,)`` f32 array, and evaluation at a
batch of wavelengths is a vectorized gather with the same floor-index lookup
semantics (no interpolation inside a bin, zero outside the range).

All preset spectra (CIE curves, illuminants, metal IORs, glass dispersion)
are baked onto this grid once at import time; sampling N rays x 4 hero
wavelengths is then a single gather per spectrum.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

LAMBDA_MIN = 360.0
LAMBDA_MAX = 830.0
N_DENSE = int(LAMBDA_MAX - LAMBDA_MIN)  # 470 (ref: densely_sampled_spectrum.rs:9)

# The dense grid wavelengths (bin i covers [360+i, 361+i); value sampled at the
# left edge like the reference's DenselySampledSpectrum::from).
DENSE_LAMBDA = np.arange(N_DENSE, dtype=np.float64) + LAMBDA_MIN


def eval_dense(values, lam):
    """Evaluate a dense spectrum at wavelengths ``lam``.

    values: (..., 470) or (470,) array.
    lam: (...,) wavelengths in nm.
    Returns values with floor-index lookup; 0 outside [360, 830]
    (ref: densely_sampled_spectrum.rs:57-67).
    """
    idx = jnp.floor(lam - LAMBDA_MIN).astype(jnp.int32)
    in_range = (lam >= LAMBDA_MIN) & (lam <= LAMBDA_MAX)
    idx = jnp.clip(idx, 0, N_DENSE - 1)
    if values.ndim == 1:
        v = jnp.take(values, idx, axis=-1)
    else:
        # values (..., 470) with idx (..., L): gather along the last axis
        v = jnp.take_along_axis(values, idx, axis=-1)
    return jnp.where(in_range, v, 0.0)


def bake_piecewise(lambdas, values) -> np.ndarray:
    """Bake a piecewise-linear (lambda, value) spectrum onto the dense grid.

    Host-side (numpy).  Matches PiecewiseLinearSpectrum::value's lerp with
    clamp-to-end-values outside the knot range
    (ref: piecewise_linear_spectrum.rs:68-100) sampled at 1nm like
    DenselySampledSpectrum::from (densely_sampled_spectrum.rs:42-55).
    """
    lambdas = np.asarray(lambdas, dtype=np.float64)
    values = np.asarray(values, dtype=np.float64)
    order = np.argsort(lambdas)
    return np.interp(DENSE_LAMBDA, lambdas[order], values[order])


def inner_product(a: np.ndarray, b: np.ndarray) -> float:
    """1nm Riemann inner product of two dense spectra (ref: spectrum.rs:69-81)."""
    return float(np.sum(np.asarray(a, np.float64) * np.asarray(b, np.float64)))
