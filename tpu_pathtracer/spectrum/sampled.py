"""Hero-wavelength sampling: SoA SampledWavelengths / SampledSpectrum ops.

The reference's ``SampledSpectrum`` is a 4-lane value struct and
``SampledWavelengths`` carries (lambda, pdf) per lane
(spectrum/src/sampled_spectrum.rs:11-366).  Here a sampled spectrum is just a
``(..., 4)`` array and the wavelength state is a pair of ``(..., 4)`` arrays
carried through the wavefront loop — both map directly onto VPU lanes.

``terminate_secondary`` (dispersion collapse) is a pdf mask update instead of
mutation: pdf lanes 1..3 -> 0 and pdf lane 0 /= 4
(ref: sampled_spectrum.rs:351-360).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .grid import LAMBDA_MAX, LAMBDA_MIN

N_SPECTRUM_SAMPLES = 4  # ref: spectrum/src/sampled_spectrum.rs:11


class SampledWavelengths(NamedTuple):
    """Per-path hero wavelength state.

    lam: (..., 4) wavelengths in nm.
    pdf: (..., 4) per-lane sampling pdf (0 marks a terminated lane).
    bank: optional (..., 4, 3+K) per-lane spectral slice — every scene
        spectrum (CIE x/y/z CMFs in columns 0..2, the scene's dense spectra
        bank in columns 3..) pre-evaluated at this path's wavelengths.  The
        wavelengths never change after sampling (dispersion termination only
        zeroes pdfs), so the integrator computes this ONCE per sample and
        every downstream spectral lookup becomes an O(K) column select
        instead of an O(470) dense evaluation (the shading hot-spot found by
        scripts/profile_step_ablate.py).  None = consumers fall back to
        dense evaluation.
    """
    lam: jnp.ndarray
    pdf: jnp.ndarray
    bank: jnp.ndarray | None = None

    @property
    def secondary_terminated(self):
        """(...,) bool — lanes 1..3 dead (ref: sampled_spectrum.rs:363-365)."""
        return jnp.all(self.pdf[..., 1:] == 0.0, axis=-1)


def sample_uniform(u, lambda_min: float = LAMBDA_MIN,
                   lambda_max: float = LAMBDA_MAX) -> SampledWavelengths:
    """Stratified hero wavelengths with wraparound.

    u: (...,) uniforms. Matches ``SampledWavelengths::new_uniform_range``
    (ref: sampled_spectrum.rs:318-336): lane 0 at min + u*range, lanes k at
    +k*range/4 with wraparound, pdf = 1/range everywhere.
    """
    span = lambda_max - lambda_min
    lam0 = lambda_min + u * span
    offsets = jnp.arange(N_SPECTRUM_SAMPLES, dtype=lam0.dtype) * (span / N_SPECTRUM_SAMPLES)
    lam = lam0[..., None] + offsets
    lam = jnp.where(lam >= lambda_max, lam - span, lam)
    pdf = jnp.full_like(lam, 1.0 / span)
    return SampledWavelengths(lam=lam, pdf=pdf)


def terminate_secondary(wl: SampledWavelengths, do_terminate) -> SampledWavelengths:
    """Collapse to the hero wavelength where ``do_terminate`` is True.

    do_terminate: (...,) bool.  No-op for already-terminated paths
    (ref: sampled_spectrum.rs:351-360).
    """
    already = wl.secondary_terminated
    fire = do_terminate & ~already
    lane0 = wl.pdf[..., :1] / jnp.where(fire[..., None], float(N_SPECTRUM_SAMPLES), 1.0)
    rest = jnp.where(fire[..., None], 0.0, wl.pdf[..., 1:])
    return SampledWavelengths(lam=wl.lam,
                              pdf=jnp.concatenate([lane0, rest], axis=-1),
                              bank=wl.bank)


def safe_div(a, b):
    """Elementwise a/b with 0 where b == 0 (ref: sampled_spectrum.rs:59-81)."""
    return jnp.where(b == 0.0, 0.0, a / jnp.where(b == 0.0, 1.0, b))


def average(s):
    """Mean over the 4 lanes (ref ``SampledSpectrum::average``)."""
    return jnp.mean(s, axis=-1)


def max_value(s):
    """Max over the 4 lanes (ref ``SampledSpectrum::max_value``)."""
    return jnp.max(s, axis=-1)
