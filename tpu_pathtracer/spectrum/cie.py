"""CIE colorimetric data and physical spectra presets (clean-room).

Equivalent of the reference's ``presets`` module (spectrum/src/presets.rs:
238-459 + data tables :460-2978).  The reference embeds measured data tables;
this module instead *derives* every curve from public analytic models and
compact anchor tables, because (a) the framework must be self-contained and
(b) only self-consistency matters for the render/test pipeline (the sensor,
the RGB->spectrum fitter and the round-trip tests all use THESE curves).

Sources of the analytic models (all public):
  * CIE 1931 color matching functions: multi-lobe piecewise-Gaussian fit of
    Wyman, Sloan & Shirley, "Simple Analytic Approximations to the CIE XYZ
    Color Matching Functions", JCGT 2(2), 2013.  (<1% absolute error.)
  * Illuminant A: the CIE analytic Planck formula at 2856 K.
  * D-series illuminants: the CIE daylight model S0/S1/S2 at 10nm
    (standard table), with the CCT->chromaticity polynomial — same model the
    reference uses for ``cie_d`` (presets.rs:263-296).
  * D65: the standard CIE 5nm relative SPD anchor table.
  * F-series: three-band Gaussian + mercury-line approximation (documented
    approximation; the reference embeds the measured tables).
  * Glass dispersion: Schott catalog Sellmeier coefficients (public).
  * Metal complex IOR: smooth anchors after Johnson & Christy / Palik.

All functions return dense (470,) numpy arrays on the grid of
``spectrum.grid`` unless noted.  Illuminants marked *normalized* are divided
by their inner product with ybar, matching
``PiecewiseLinearSpectrum::from_interleaved(..., true)``
(piecewise_linear_spectrum.rs:47-63).
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

from .grid import DENSE_LAMBDA, bake_piecewise, inner_product

__all__ = [
    "cie_x", "cie_y", "cie_z", "cie_y_integral", "blackbody",
    "illum_a", "illum_d5000", "illum_d60", "illum_d6500", "illum_f",
    "cie_d", "metal_eta_k", "glass_eta", "METALS", "GLASSES",
]


# ---------------------------------------------------------------------------
# CIE 1931 color matching functions (Wyman-Sloan-Shirley analytic fit)
# ---------------------------------------------------------------------------

def _pw_gauss(lam, alpha, mu, s1, s2):
    """Piecewise Gaussian with split std-dev (Wyman et al. eq. 2)."""
    t = (lam - mu) * np.where(lam < mu, s1, s2)
    return alpha * np.exp(-0.5 * t * t)


@lru_cache(maxsize=None)
def cie_x() -> np.ndarray:
    lam = DENSE_LAMBDA
    return (_pw_gauss(lam, 0.362, 442.0, 0.0624, 0.0374)
            + _pw_gauss(lam, 1.056, 599.8, 0.0264, 0.0323)
            + _pw_gauss(lam, -0.065, 501.1, 0.0490, 0.0382))


@lru_cache(maxsize=None)
def cie_y() -> np.ndarray:
    lam = DENSE_LAMBDA
    return (_pw_gauss(lam, 0.821, 568.8, 0.0213, 0.0247)
            + _pw_gauss(lam, 0.286, 530.9, 0.0613, 0.0322))


@lru_cache(maxsize=None)
def cie_z() -> np.ndarray:
    lam = DENSE_LAMBDA
    return (_pw_gauss(lam, 1.217, 437.0, 0.0845, 0.0278)
            + _pw_gauss(lam, 0.681, 459.0, 0.0385, 0.0725))


@lru_cache(maxsize=None)
def cie_y_integral() -> float:
    """1nm Riemann sum of ybar over the grid (~106.9 for the true CMF)."""
    return float(np.sum(cie_y()))


# ---------------------------------------------------------------------------
# Black body + illuminant A
# ---------------------------------------------------------------------------

_H = 6.62607015e-34
_C = 2.99792458e8
_KB = 1.380649e-23


def blackbody(temperature_k: float, normalize: bool = True) -> np.ndarray:
    """Planck spectral radiance on the dense grid.

    Matches BlackBodySpectrum (black_body_spectrum.rs:9-50): when
    ``normalize`` the curve is scaled so its peak (Wien) value is 1.
    """
    lam_m = DENSE_LAMBDA * 1e-9
    le = (2.0 * _H * _C * _C) / (lam_m ** 5 * (np.exp(_H * _C / (lam_m * _KB * temperature_k)) - 1.0))
    if normalize:
        lam_max = 2.8977721e-3 / temperature_k
        peak = (2.0 * _H * _C * _C) / (lam_max ** 5 * (np.exp(_H * _C / (lam_max * _KB * temperature_k)) - 1.0))
        le = le / peak
    return le


def _normalize_illum(dense: np.ndarray) -> np.ndarray:
    """Divide by <illum, ybar> (ref: piecewise_linear_spectrum.rs:47-63)."""
    y_self = inner_product(dense, cie_y())
    if y_self == 0.0:
        return np.zeros_like(dense)
    return dense / y_self


@lru_cache(maxsize=None)
def illum_a() -> np.ndarray:
    """CIE standard illuminant A: Planck at 2856 K (normalized)."""
    return _normalize_illum(blackbody(2856.0, normalize=False))


# ---------------------------------------------------------------------------
# CIE daylight model (S0/S1/S2) and the D-series illuminants
# ---------------------------------------------------------------------------

# Standard CIE daylight components at 10nm from 300 to 830 nm.
_S_LAMBDA = np.arange(300.0, 840.0, 10.0)
_S0 = np.array([
    0.04, 6.0, 29.6, 55.3, 57.3, 61.8, 61.5, 68.8, 63.4, 65.8,
    94.8, 104.8, 105.9, 96.8, 113.9, 125.6, 125.5, 121.3, 121.3, 113.5,
    113.1, 110.8, 106.5, 108.8, 105.3, 104.4, 100.0, 96.0, 95.1, 89.1,
    90.5, 90.3, 88.4, 84.0, 85.1, 81.9, 82.6, 84.9, 81.3, 71.9,
    74.3, 76.4, 63.3, 71.7, 77.0, 65.2, 47.7, 68.6, 65.0, 66.0,
    61.0, 53.3, 58.9, 61.9])
_S1 = np.array([
    0.02, 4.5, 22.4, 42.0, 40.6, 41.6, 38.0, 42.4, 38.5, 35.0,
    43.4, 46.3, 43.9, 37.1, 36.7, 35.9, 32.6, 27.9, 24.3, 20.1,
    16.2, 13.2, 8.6, 6.1, 4.2, 1.9, 0.0, -1.6, -3.5, -3.5,
    -5.8, -7.2, -8.6, -9.5, -10.9, -10.7, -12.0, -14.0, -13.6, -12.0,
    -13.3, -12.9, -10.6, -11.6, -12.2, -10.2, -7.8, -11.2, -10.4, -10.6,
    -9.7, -8.3, -9.3, -9.8])
_S2 = np.array([
    0.0, 2.0, 4.0, 8.5, 7.8, 6.7, 5.3, 6.1, 3.0, 1.2,
    -1.1, -0.5, -0.7, -1.2, -2.6, -2.9, -2.8, -2.6, -2.6, -1.8,
    -1.5, -1.3, -1.2, -1.0, -0.5, -0.3, 0.0, 0.2, 0.5, 2.1,
    3.2, 4.1, 4.7, 5.1, 6.7, 7.3, 8.6, 9.8, 10.2, 8.3,
    9.6, 8.5, 7.0, 7.6, 8.0, 6.7, 5.2, 7.4, 6.8, 7.0,
    6.4, 5.5, 6.1, 6.5])


def cie_d(temperature: float, normalized: bool = True) -> np.ndarray:
    """CIE D-series daylight at the given nominal temperature.

    Mirrors the reference's ``cie_d`` (presets.rs:263-296) including its
    1.4388/1.4380 CCT rescale and the <4000K blackbody fallback.
    """
    cct = temperature / 1.4388 * 1.4380
    if cct < 4000.0:
        dense = blackbody(cct)
        return _normalize_illum(dense) if normalized else dense
    if cct < 7000.0:
        x = -4.607e9 / cct**3 + 2.9678e6 / cct**2 + 0.09911e3 / cct + 0.244063
    else:
        x = -2.0064e9 / cct**3 + 1.9018e6 / cct**2 + 0.24748e3 / cct + 0.23704
    y = -3.0 * x * x + 2.870 * x - 0.275
    m = 0.0241 + 0.2562 * x - 0.7341 * y
    m1 = (-1.3515 - 1.7703 * x + 5.9114 * y) / m
    m2 = (0.0300 - 31.4424 * x + 30.0717 * y) / m
    spd = (_S0 + m1 * _S1 + m2 * _S2) * 0.01
    dense = bake_piecewise(_S_LAMBDA, spd)
    return _normalize_illum(dense) if normalized else dense


# CIE D65 standard relative SPD, 5nm anchors 300-830 nm (standard table).
_D65_LAMBDA = np.arange(300.0, 835.0, 5.0)
_D65 = np.array([
    0.0341, 1.6643, 3.2945, 11.7652, 20.2360, 28.6447, 37.0535, 38.5011,
    39.9488, 42.4302, 44.9117, 45.7750, 46.6383, 49.3637, 52.0891, 51.0323,
    49.9755, 52.3118, 54.6482, 68.7015, 82.7549, 87.1204, 91.4860, 92.4589,
    93.4318, 90.0570, 86.6823, 95.7736, 104.8650, 110.9360, 117.0080, 117.4100,
    117.8120, 116.3360, 114.8610, 115.3920, 115.9230, 112.3670, 108.8110,
    109.0820, 109.3540, 108.5780, 107.8020, 106.2960, 104.7900, 106.2390,
    107.6890, 106.0470, 104.4050, 104.2250, 104.0460, 102.0230, 100.0000,
    98.1671, 96.3342, 96.0611, 95.7880, 92.2368, 88.6856, 89.3459, 90.0062,
    89.8026, 89.5991, 88.6489, 87.6987, 85.4936, 83.2886, 83.4939, 83.6992,
    81.8630, 80.0268, 80.1207, 80.2146, 81.2462, 82.2778, 80.2810, 78.2842,
    74.0027, 69.7213, 70.6652, 71.6091, 72.9790, 74.3490, 67.9765, 61.6040,
    65.7448, 69.8856, 72.4863, 75.0870, 69.3398, 63.5927, 55.0054, 46.4182,
    56.6118, 66.8054, 65.0941, 63.3828, 63.8434, 64.3040, 61.8779, 59.4519,
    55.7054, 51.9590, 54.6998, 57.4406, 58.8765, 60.3125])


@lru_cache(maxsize=None)
def illum_d6500() -> np.ndarray:
    """CIE D65 from the standard anchor table (normalized)."""
    return _normalize_illum(bake_piecewise(_D65_LAMBDA, _D65))


@lru_cache(maxsize=None)
def illum_d5000() -> np.ndarray:
    return cie_d(5000.0)


@lru_cache(maxsize=None)
def illum_d60() -> np.ndarray:
    """ACES nominal white: D-series at 6000K (the reference embeds the
    measured ACES_ILLUM_D60 table, presets.rs)."""
    return cie_d(6000.0)


# ---------------------------------------------------------------------------
# F-series fluorescents (approximation)
# ---------------------------------------------------------------------------

# (broadband1_mu, broadband1_sigma, w1, broadband2_mu, broadband2_sigma, w2,
#  mercury line weight) per F index; chosen to reproduce the qualitative
# CCT/shape of each CIE F illuminant (F1 daylight 6430K ... F12 tri-band 3000K).
_F_PARAMS = {
    1: (440.0, 45.0, 0.50, 560.0, 70.0, 0.75, 0.35),
    2: (440.0, 40.0, 0.35, 580.0, 65.0, 0.85, 0.35),
    3: (440.0, 38.0, 0.25, 590.0, 62.0, 0.90, 0.35),
    4: (440.0, 36.0, 0.18, 600.0, 60.0, 0.95, 0.35),
    5: (440.0, 45.0, 0.45, 560.0, 70.0, 0.72, 0.30),
    6: (440.0, 40.0, 0.30, 585.0, 62.0, 0.88, 0.30),
    7: (445.0, 50.0, 0.50, 565.0, 75.0, 0.75, 0.25),   # broadband, D65-like
    8: (450.0, 52.0, 0.45, 575.0, 78.0, 0.80, 0.22),   # broadband, D50-like
    9: (450.0, 50.0, 0.38, 590.0, 75.0, 0.85, 0.22),
    10: (436.0, 14.0, 0.55, 545.0, 12.0, 1.00, 0.45),  # tri-band
    11: (436.0, 13.0, 0.48, 545.0, 11.0, 1.00, 0.45),
    12: (436.0, 12.0, 0.35, 545.0, 10.0, 0.95, 0.45),
}
_HG_LINES = ((404.7, 3.0, 0.35), (435.8, 3.0, 1.0), (546.1, 3.0, 0.9), (577.8, 4.0, 0.5))


@lru_cache(maxsize=None)
def illum_f(index: int) -> np.ndarray:
    """Approximate CIE F1..F12 fluorescent SPD (normalized).

    The reference embeds the measured CIE tables (presets.rs data); this is a
    documented analytic stand-in: two phosphor bands + mercury emission lines.
    Red tri-band phosphor at 611nm is added for the tri-band family F10-F12.
    """
    mu1, s1, w1, mu2, s2, w2, wline = _F_PARAMS[index]
    lam = DENSE_LAMBDA
    spd = w1 * np.exp(-0.5 * ((lam - mu1) / s1) ** 2)
    spd = spd + w2 * np.exp(-0.5 * ((lam - mu2) / s2) ** 2)
    if index >= 10:
        spd = spd + 0.95 * np.exp(-0.5 * ((lam - 611.0) / 6.0) ** 2)
    for mu, s, w in _HG_LINES:
        spd = spd + wline * w * np.exp(-0.5 * ((lam - mu) / s) ** 2)
    return _normalize_illum(spd)


# ---------------------------------------------------------------------------
# Metal complex IOR (eta, k) anchors — smooth fits after Johnson&Christy/Palik
# ---------------------------------------------------------------------------

_METAL_ANCHORS = {
    # lambda(nm): list of (lam, eta, k)
    "au": [(400, 1.47, 1.95), (450, 1.40, 1.88), (500, 0.84, 1.90),
           (550, 0.43, 2.46), (600, 0.25, 2.99), (650, 0.19, 3.48),
           (700, 0.16, 3.95), (750, 0.16, 4.34), (800, 0.17, 4.70)],
    "ag": [(400, 0.054, 2.20), (450, 0.046, 2.66), (500, 0.050, 3.13),
           (550, 0.059, 3.59), (600, 0.055, 3.92), (650, 0.057, 4.27),
           (700, 0.075, 4.62), (750, 0.086, 5.00), (800, 0.090, 5.30)],
    "cu": [(400, 1.18, 2.21), (450, 1.15, 2.40), (500, 1.12, 2.60),
           (550, 1.04, 2.59), (600, 0.47, 2.95), (650, 0.26, 3.43),
           (700, 0.21, 3.85), (750, 0.22, 4.24), (800, 0.24, 4.62)],
    "al": [(400, 0.49, 4.86), (450, 0.62, 5.47), (500, 0.77, 6.08),
           (550, 0.96, 6.69), (600, 1.20, 7.26), (650, 1.47, 7.79),
           (700, 1.83, 8.31), (750, 2.40, 8.62), (800, 2.80, 8.45)],
    # Brass: Cu-like with a Zn shift toward yellow (approximation).
    "cuzn": [(400, 1.25, 1.95), (450, 1.20, 2.10), (500, 1.05, 2.30),
             (550, 0.75, 2.55), (600, 0.45, 2.95), (650, 0.38, 3.35),
             (700, 0.37, 3.72), (750, 0.38, 4.05), (800, 0.40, 4.35)],
    # MgO and TiO2 are (almost) lossless dielectrics in the visible.
    "mgo": [(400, 1.762, 0.0), (500, 1.744, 0.0), (600, 1.735, 0.0),
            (700, 1.730, 0.0), (800, 1.727, 0.0)],
    "tio2": [(400, 2.97, 0.0), (450, 2.80, 0.0), (500, 2.70, 0.0),
             (550, 2.64, 0.0), (600, 2.59, 0.0), (700, 2.54, 0.0),
             (800, 2.50, 0.0)],
}

METALS = tuple(_METAL_ANCHORS.keys())


@lru_cache(maxsize=None)
def metal_eta_k(name: str):
    """(eta_dense, k_dense) for a metal preset (ref: presets.rs AG_ETA etc.)."""
    anchors = _METAL_ANCHORS[name]
    lam = [a[0] for a in anchors]
    eta = bake_piecewise(lam, [a[1] for a in anchors])
    k = bake_piecewise(lam, [a[2] for a in anchors])
    return eta, k


# ---------------------------------------------------------------------------
# Glass dispersion via Schott Sellmeier coefficients (public catalog data)
# ---------------------------------------------------------------------------

_SELLMEIER = {
    # name: (B1, B2, B3, C1, C2, C3)  [C in um^2]
    "bk7": (1.03961212, 0.231792344, 1.01046945,
            0.00600069867, 0.0200179144, 103.560653),
    "baf10": (1.5851495, 0.143559385, 1.08521269,
              0.00926681282, 0.0424489805, 105.613573),
    "fk51a": (0.971247817, 0.216901417, 0.904651666,
              0.00472301995, 0.0153575612, 168.68133),
    "lasf9": (2.00029547, 0.298926886, 1.80691843,
              0.0121426017, 0.0538736236, 156.530829),
    "sf5": (1.52481889, 0.187085527, 1.42729015,
            0.011254756, 0.0588995392, 129.141675),
    "sf10": (1.62153902, 0.256287842, 1.64447552,
             0.0122241457, 0.0595736775, 147.468793),
    "sf11": (1.73759695, 0.313747346, 1.89878101,
             0.013188707, 0.0623068142, 155.23629),
}

GLASSES = tuple(_SELLMEIER.keys())


@lru_cache(maxsize=None)
def glass_eta(name: str) -> np.ndarray:
    """Dense refractive index curve for a glass (ref: presets.rs GLASS_*_ETA)."""
    b1, b2, b3, c1, c2, c3 = _SELLMEIER[name]
    lam_um2 = (DENSE_LAMBDA * 1e-3) ** 2
    n2 = 1.0 + b1 * lam_um2 / (lam_um2 - c1) + b2 * lam_um2 / (lam_um2 - c2) \
        + b3 * lam_um2 / (lam_um2 - c3)
    return np.sqrt(n2)
