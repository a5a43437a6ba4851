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
    """One sample's spectral contribution -> linear RGB (R, 3).

    contribution: (R, 4); wl: SampledWavelengths with (R, 4) lam/pdf.
    Mirrors Sensor::add_sample (sensor.rs:41-78).
    """
    if DEBUG_NANS:
        import jax

        bad = ~jnp.isfinite(contribution)
        n_bad = jnp.sum(bad)
        jax.lax.cond(
            n_bad > 0,
            lambda n: jax.debug.print(
                "film: {n} non-finite spectral contributions zeroed", n=n),
            lambda n: None, n_bad)
        contribution = jnp.where(bad, 0.0, contribution)
    if wl.bank is not None:
        # pre-evaluated per-sample spectral slice: CMFs are columns 0..2
        cmf_vals = wl.bank[..., :3]                      # (R, 4, 3)
    else:
        cmf = jnp.asarray(_cmf_stack())  # (470, 3)
        # one-hot contraction, not cmf[idx]: a (R, 4)-indexed gather is a
        # TPU scalar loop; sampled lam always lies in [360, 830) so
        # eval_dense's out-of-range zeroing matches the old clip behavior
        cmf_vals = grid.eval_dense(cmf, wl.lam)          # (R, 4, 3)
    inv_pdf = jnp.where(wl.pdf > 0.0, 1.0 / jnp.where(wl.pdf > 0.0, wl.pdf, 1.0), 0.0)
    w = contribution * inv_pdf / 4.0                     # (R, 4)
    xyz = jnp.einsum("rl,rlc->rc", w, cmf_vals)
    rgb = color.xyz_to_rgb(xyz, gamut)
    return rgb * exposure


def finalize(accum_rgb, spp: int, tone_map: str = "none", eotf: str = "srgb"):
    """Accumulated RGB -> display-encoded image (Sensor::to_rgb,
    sensor.rs:81-88): average, clamp >= 0, tone map, EOTF encode."""
    avg = jnp.maximum(accum_rgb / float(spp), 0.0)
    return eotf_mod.encode(tm_mod.apply(avg, tone_map), eotf)
