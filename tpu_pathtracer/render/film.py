"""Film / sensor: spectral sample -> XYZ -> RGB accumulation.

Equivalent of the reference ``Sensor<G, T, E>`` (renderer/src/sensor.rs:
12-89), vectorized over all pixels: a spectral contribution (R, 4) with its
hero wavelengths becomes XYZ via the CIE CMFs evaluated at the 1nm-floored
wavelength, each lane weighted by 1/(pdf * 4); terminated lanes carry pdf=0
and so contribute nothing — which reproduces the reference's count=1
special case exactly (sensor.rs:45-49 + the pdf[0]/=4 of
terminate_secondary).
"""
from __future__ import annotations

import os
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from .. import color
from ..color import eotf as eotf_mod
from ..color import tone_map as tm_mod
from ..spectrum import cie, grid

# NaN/Inf observability (ref warns at the sensor: sensor.rs:41-42,
# sampled_spectrum.rs:284-299).  Set TPT_DEBUG_NANS=1 to replace
# non-finite spectral contributions with 0 AND report them via
# jax.debug.print (works under jit); production leaves the check out of
# the compiled graph entirely.  jax.config.update("jax_debug_nans", True)
# remains the heavier stock option for localizing the producing op.
DEBUG_NANS = os.environ.get("TPT_DEBUG_NANS", "") not in ("", "0")


@lru_cache(maxsize=None)
def _cmf_stack() -> np.ndarray:
    return np.stack([cie.cie_x(), cie.cie_y(), cie.cie_z()], axis=-1).astype(np.float32)


def spectral_to_rgb(contribution, wl, gamut=color.SRGB, exposure: float = 1.0):
    """One sample's spectral contribution -> linear RGB as a V3 of (R,).

    contribution: S4; wl: SampledWavelengths with S4 lam/pdf.
    Mirrors Sensor::add_sample (sensor.rs:41-78) in component form: the
    3x3 gamut matrix entries are compile-time scalars, so XYZ -> RGB is
    nine fused multiply-adds over (R,) arrays.
    """
    from ..utils.vec import S4, V3, s4_dot, smap

    if DEBUG_NANS:
        import jax

        bad = smap(lambda x: ~jnp.isfinite(x), contribution)
        n_bad = sum(jnp.sum(b) for b in bad.lanes)
        jax.lax.cond(
            n_bad > 0,
            lambda n: jax.debug.print(
                "film: {n} non-finite spectral contributions zeroed", n=n),
            lambda n: None, n_bad)
        contribution = S4(*(jnp.where(b, 0.0, x) for b, x in
                            zip(bad.lanes, contribution.lanes)))
    if wl.bank is not None:
        cx, cy, cz = wl.bank.cmf_x, wl.bank.cmf_y, wl.bank.cmf_z
    else:
        cmf = jnp.asarray(_cmf_stack())  # (470, 3)
        vals = [grid.eval_dense(cmf, lane) for lane in wl.lam.lanes]
        cx = S4(*(v[:, 0] for v in vals))
        cy = S4(*(v[:, 1] for v in vals))
        cz = S4(*(v[:, 2] for v in vals))
    inv_pdf = smap(
        lambda p: jnp.where(p > 0.0, 1.0 / jnp.where(p > 0.0, p, 1.0), 0.0),
        wl.pdf)
    w = contribution * inv_pdf * 0.25                    # S4
    x = s4_dot(w, cx)
    y = s4_dot(w, cy)
    z = s4_dot(w, cz)
    m = np.asarray(gamut.xyz_to_rgb, np.float32)         # (3, 3) constants
    e = float(exposure)
    return V3(
        (m[0, 0] * x + m[0, 1] * y + m[0, 2] * z) * e,
        (m[1, 0] * x + m[1, 1] * y + m[1, 2] * z) * e,
        (m[2, 0] * x + m[2, 1] * y + m[2, 2] * z) * e)


def finalize(accum_rgb, spp: int, tone_map: str = "none", eotf: str = "srgb"):
    """Accumulated RGB -> display-encoded image (Sensor::to_rgb,
    sensor.rs:81-88): average, clamp >= 0, tone map, EOTF encode."""
    avg = jnp.maximum(accum_rgb / float(spp), 0.0)
    return eotf_mod.encode(tm_mod.apply(avg, tone_map), eotf)
