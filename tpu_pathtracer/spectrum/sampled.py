"""Hero-wavelength sampling: SoA SampledWavelengths / SampledSpectrum ops.

The reference's ``SampledSpectrum`` is a 4-lane value struct and
``SampledWavelengths`` carries (lambda, pdf) per lane
(spectrum/src/sampled_spectrum.rs:11-366).  Here a sampled spectrum is an
``S4`` — four separate ``(R,)`` component arrays (utils/vec.py) so every
spectral op is a full-width VPU op with no lane padding — and the
wavelength state is a pair of S4s carried through the wavefront loop.

``terminate_secondary`` (dispersion collapse) is a pdf mask update instead
of mutation: pdf lanes 1..3 -> 0 and pdf lane 0 /= 4
(ref: sampled_spectrum.rs:351-360).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from ..utils.vec import S4, s4_max, s4_mean
from .grid import LAMBDA_MAX, LAMBDA_MIN

N_SPECTRUM_SAMPLES = 4  # ref: spectrum/src/sampled_spectrum.rs:11


class Bank(NamedTuple):
    """Per-sample pre-evaluated spectral slice.

    Every scene spectrum (CIE x/y/z CMFs + the scene's dense spectra bank)
    evaluated ONCE at this path's 4 wavelengths; wavelengths never change
    after sampling (dispersion termination only zeroes pdfs), so every
    downstream spectral lookup is an O(K) select over these S4 columns
    instead of an O(470) dense evaluation."""
    cmf_x: S4
    cmf_y: S4
    cmf_z: S4
    spectra: Tuple[S4, ...]     # scene spectra bank columns (row 0 = D65)


class SampledWavelengths(NamedTuple):
    """Per-path hero wavelength state (all S4 = 4x (R,) components)."""
    lam: S4
    pdf: S4
    bank: Optional[Bank] = None

    # NamedTuple keeps _replace; the S4/Bank members are dataclass pytrees
    @property
    def secondary_terminated(self):
        """(R,) bool — lanes 1..3 dead (ref: sampled_spectrum.rs:363-365)."""
        p = self.pdf
        return (p.b == 0.0) & (p.c == 0.0) & (p.d == 0.0)


def sample_uniform(u, lambda_min: float = LAMBDA_MIN,
                   lambda_max: float = LAMBDA_MAX) -> SampledWavelengths:
    """Stratified hero wavelengths with wraparound.

    u: (R,) uniforms. Matches ``SampledWavelengths::new_uniform_range``
    (ref: sampled_spectrum.rs:318-336): lane 0 at min + u*range, lanes k at
    +k*range/4 with wraparound, pdf = 1/range everywhere.
    """
    span = lambda_max - lambda_min
    lam0 = lambda_min + u * span
    step = span / N_SPECTRUM_SAMPLES

    def lane(k):
        lk = lam0 + k * step
        return jnp.where(lk >= lambda_max, lk - span, lk)

    lam = S4(lam0, lane(1), lane(2), lane(3))
    p = jnp.full_like(lam0, 1.0 / span)
    return SampledWavelengths(lam=lam, pdf=S4(p, p, p, p))


def terminate_secondary(wl: SampledWavelengths,
                        do_terminate) -> SampledWavelengths:
    """Collapse to the hero wavelength where ``do_terminate`` is True.

    do_terminate: (R,) bool.  No-op for already-terminated paths
    (ref: sampled_spectrum.rs:351-360).
    """
    fire = do_terminate & ~wl.secondary_terminated
    p = wl.pdf
    zero = jnp.zeros_like(p.a)
    pdf = S4(jnp.where(fire, p.a * (1.0 / N_SPECTRUM_SAMPLES), p.a),
             jnp.where(fire, zero, p.b),
             jnp.where(fire, zero, p.c),
             jnp.where(fire, zero, p.d))
    return SampledWavelengths(lam=wl.lam, pdf=pdf, bank=wl.bank)


def safe_div(a: S4, b: S4) -> S4:
    """Elementwise a/b with 0 where b == 0 (ref: sampled_spectrum.rs:59-81)."""
    import jax
    return jax.tree.map(
        lambda x, y: jnp.where(y == 0.0, 0.0, x / jnp.where(y == 0.0, 1.0, y)),
        a, b)


def average(s: S4):
    """Mean over the 4 lanes (ref ``SampledSpectrum::average``)."""
    return s4_mean(s)


def max_value(s: S4):
    """Max over the 4 lanes (ref ``SampledSpectrum::max_value``)."""
    return s4_max(s)
