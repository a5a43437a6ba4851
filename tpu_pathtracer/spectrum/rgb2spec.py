"""RGB -> spectrum sigmoid-polynomial tables: fitting and batched lookup.

Equivalent of the reference's ``rgb_to_spec`` crate + ``RgbSigmoidPolynomial``
(spectrum/src/rgb_sigmoid_polynomial.rs:16-275).  The reference ships
PyTorch-fitted binary tables (LFS blobs) and loads them at runtime
(rgb_to_spec/src/lib.rs:1-32); this module *regenerates* the tables with a
vectorized Gauss-Newton fit in JAX (there are no blobs to load, and fitting
is itself a nicely TPU-shaped workload: the residual evaluation is one
(cells x 470) x (470 x 3) matmul per iteration).

Table layout matches the reference semantically:
  z_nodes: (res,) monotone max-component nodes, double-smoothstep spaced;
  coeffs:  (3, res, res, res, 3) — [max_component][zi][yi][xi][c0,c1,c2]
  (ref: rgb_sigmoid_polynomial.rs:35-84).

A spectrum is reconstructed as
  s(lambda) = sigmoid(c0*t^2 + c1*t + c2),  t = (lambda-360)/470
(ref: rgb_sigmoid_polynomial.rs:178-185).

Pre-fitted tables ship in ``tpu_pathtracer/data/rgb2spec`` (versioned, all 7
gamuts at res 32 + 64); new fits land in ``.cache/rgb2spec`` (ephemeral)
keyed by gamut + res so a fit runs once per machine.
"""
from __future__ import annotations

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..color.gamut import Gamut
from . import cie
from .grid import LAMBDA_MAX, LAMBDA_MIN, N_DENSE
from ..utils.math import select_lane

DEFAULT_RES = 64  # ref TABLE_SIZE (rgb_sigmoid_polynomial.rs:16)

# shipped pre-fitted tables (in-repo, versioned)
_DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "data", "rgb2spec")
# fallback cache for freshly-fitted tables (ephemeral, gitignored)
_CACHE_DIR = os.environ.get(
    "TPU_PT_CACHE", os.path.join(os.path.dirname(__file__), "..", "..", ".cache", "rgb2spec"))


def sigmoid_poly(c, lam):
    """Evaluate sigmoid(c0 t^2 + c1 t + c2) at wavelengths ``lam``.

    c: (..., 3); lam: broadcastable to (..., L) or (...,).
    """
    t = (lam - LAMBDA_MIN) / (LAMBDA_MAX - LAMBDA_MIN)
    # c broadcasts against lam's trailing axis: (..., 1) * (..., L)
    c0, c1, c2 = c[..., 0:1], c[..., 1:2], c[..., 2:3]
    p = c0 * t * t + c1 * t + c2
    return jax.nn.sigmoid(p)


def sigmoid_poly_max_value(c):
    """Analytic max over [LAMBDA_MIN, LAMBDA_MAX] (ref: :187-194)."""
    def val(lam):
        t = (lam - LAMBDA_MIN) / (LAMBDA_MAX - LAMBDA_MIN)
        return jax.nn.sigmoid(c[..., 0] * t * t + c[..., 1] * t + c[..., 2])
    result = jnp.maximum(val(jnp.asarray(LAMBDA_MIN)), jnp.asarray(val(LAMBDA_MAX)))
    tc = -c[..., 1] / (2.0 * c[..., 0])
    lam_c = tc * (LAMBDA_MAX - LAMBDA_MIN) + LAMBDA_MIN
    interior = (lam_c >= LAMBDA_MIN) & (lam_c <= LAMBDA_MAX)
    return jnp.where(interior, jnp.maximum(result, val(lam_c)), result)


# ---------------------------------------------------------------------------
# Fitting
# ---------------------------------------------------------------------------

def _smoothstep(x):
    return 3.0 * x * x - 2.0 * x * x * x


def z_nodes(res: int) -> np.ndarray:
    """Double-smoothstep z spacing (denser near 0 and 1), like the
    reference's fitted tables (rgb_to_spec/python/main.py config)."""
    k = np.arange(res) / (res - 1)
    return _smoothstep(_smoothstep(k))


def _lab_from_xyz(xyz, white):
    eps = (6.0 / 29.0) ** 3
    kap = (29.0 / 6.0) ** 2 / 3.0
    r = xyz / white
    f = jnp.where(r > eps, jnp.cbrt(jnp.maximum(r, 1e-12)), kap * r + 4.0 / 29.0)
    L = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return jnp.stack([L, a, b], axis=-1)


def _fit_slice(c_init, rgb_targets, a_matrix, xyz_to_rgb, rgb_to_xyz, white, t_grid):
    """Damped Gauss-Newton fit of sigmoid-polynomial coeffs for one z-slice.

    c_init: (cells, 3) warm start. rgb_targets: (cells, 3) linear rgb.
    a_matrix: (470, 3) CMF x D65 (albedo-normalized).
    Residuals are CIELAB deltas like the reference fitter's perceptual loss.
    """
    lab_target = _lab_from_xyz(rgb_targets @ rgb_to_xyz.T, white)
    # t^0, t^1, t^2 basis rows for the analytic Jacobian
    t_pows = jnp.stack([t_grid * t_grid, t_grid, jnp.ones_like(t_grid)], 0)  # (3,470)

    def spectrum_and_xyz(c):
        s = jax.nn.sigmoid(c[..., 0:1] * t_grid * t_grid + c[..., 1:2] * t_grid + c[..., 2:3])
        return s, s @ a_matrix  # (cells,470), (cells,3)

    def residual(c):
        _, xyz = spectrum_and_xyz(c)
        return _lab_from_xyz(xyz, white) - lab_target

    eps = (6.0 / 29.0) ** 3
    kap = (29.0 / 6.0) ** 2 / 3.0

    def gn_step(c, lam_damp):
        s, xyz = spectrum_and_xyz(c)
        r = _lab_from_xyz(xyz, white) - lab_target        # (cells, 3)
        # dxyz/dc_k = (s(1-s) * t^k) @ A   — 3 matmuls, no autodiff blowup
        ds = s * (1.0 - s)                                # (cells, 470)
        dxyz_dc = jnp.einsum("kl,cl,lj->cjk", t_pows, ds, a_matrix)  # (cells,3xyz,3c)
        # dLab/dxyz via f'(xyz/white)/white
        ratio = xyz / white
        fp = jnp.where(ratio > eps,
                       (1.0 / 3.0) * jnp.maximum(ratio, 1e-12) ** (-2.0 / 3.0),
                       kap) / white                       # (cells, 3)
        # rows of dLab/dxyz: L=116 f'(y) e_y; a=500(f'(x)e_x - f'(y)e_y); b=200(f'(y)e_y - f'(z)e_z)
        zero = jnp.zeros_like(fp[..., 0])
        dlab = jnp.stack([
            jnp.stack([zero, 116.0 * fp[..., 1], zero], -1),
            jnp.stack([500.0 * fp[..., 0], -500.0 * fp[..., 1], zero], -1),
            jnp.stack([zero, 200.0 * fp[..., 1], -200.0 * fp[..., 2]], -1),
        ], -2)                                            # (cells, 3lab, 3xyz)
        j = jnp.einsum("cli,cik->clk", dlab, dxyz_dc)     # (cells, 3lab, 3c)
        jtj = jnp.einsum("cij,cik->cjk", j, j)
        jtr = jnp.einsum("cij,ci->cj", j, r)
        damp = lam_damp * jnp.eye(3)
        delta = jnp.linalg.solve(jtj + damp, jtr[..., None])[..., 0]
        c_new = c - delta
        better = (jnp.sum(residual(c_new) ** 2, -1) < jnp.sum(r ** 2, -1))
        return jnp.where(better[:, None], c_new, c)

    def body(c, _):
        c = gn_step(c, 1e-4)
        return c, None

    c, _ = jax.lax.scan(body, c_init, None, length=25)
    return c


def fit_table(gamut: Gamut, res: int = DEFAULT_RES, verbose: bool = False):
    """Fit the full (3, res, res, res, 3) coefficient table for ``gamut``.

    Marches z-slices outward from the middle with warm starts, the classic
    rgb2spec strategy, but each slice is one vectorized Gauss-Newton solve
    over all 3*res^2 cells at once.
    """
    zn = z_nodes(res)
    d65 = cie.illum_d6500()  # normalized: integral with ybar == 1
    cmf = np.stack([cie.cie_x(), cie.cie_y(), cie.cie_z()], axis=-1)  # (470,3)
    a_matrix = jnp.asarray(cmf * d65[:, None], dtype=jnp.float32)
    xyz_to_rgb = jnp.asarray(gamut.xyz_to_rgb)
    rgb_to_xyz = jnp.asarray(gamut.rgb_to_xyz)
    white = jnp.asarray(gamut.rgb_to_xyz @ np.ones(3))
    t_grid = jnp.asarray((np.arange(N_DENSE) + 0.0) / (LAMBDA_MAX - LAMBDA_MIN), dtype=jnp.float32)

    fit = jax.jit(partial(_fit_slice, a_matrix=a_matrix, xyz_to_rgb=xyz_to_rgb,
                          rgb_to_xyz=rgb_to_xyz, white=white, t_grid=t_grid))

    # Cell rgb targets for one z-slice: for max-component m, the other two
    # channels sweep [0, z] on a res x res grid (ref: :118-121 inverse map).
    xy = np.stack(np.meshgrid(np.arange(res), np.arange(res), indexing="ij"), -1)  # (res,res,2) [y,x]
    frac = xy[..., ::-1] / (res - 1)  # x, y fractions

    def slice_targets(zi):
        z = max(zn[zi], 1e-4)
        rgbs = []
        for m in range(3):
            rgb = np.zeros((res, res, 3))
            rgb[..., m] = z
            rgb[..., (m + 1) % 3] = frac[..., 0] * z
            rgb[..., (m + 2) % 3] = frac[..., 1] * z
            rgbs.append(rgb.reshape(-1, 3))
        return np.concatenate(rgbs, 0)  # (3*res*res, 3)

    coeffs = np.zeros((3, res, res, res, 3))
    mid = res // 2
    c_start = np.tile(np.array([0.0, 0.0, 0.0]), (3 * res * res, 1))

    order_up = list(range(mid, res))
    order_down = list(range(mid - 1, -1, -1))

    for order in (order_up, order_down):
        c_warm = jnp.asarray(c_start, dtype=jnp.float32)
        for zi in order:
            targets = jnp.asarray(slice_targets(zi), dtype=jnp.float32)
            c_warm = fit(c_warm, targets)
            arr = np.asarray(c_warm).reshape(3, res, res, 3)
            coeffs[:, zi] = arr
            if zi == mid:
                c_start = np.asarray(c_warm)
            if verbose:
                print(f"  slice {zi} done")
    return zn.astype(np.float32), coeffs.astype(np.float32)


@lru_cache(maxsize=None)
def get_table(gamut_name: str, res: int = DEFAULT_RES):
    """Load (or fit once and cache) the table for a gamut by name."""
    from ..color.gamut import by_name
    gamut = by_name(gamut_name)
    os.makedirs(_CACHE_DIR, exist_ok=True)
    # v2: refit against the standard CIE 1931 1nm CMF tables (cie_cmf_data)
    fname = f"{gamut_name}_{res}_v2.npz"
    for d in (_DATA_DIR, _CACHE_DIR):
        path = os.path.join(d, fname)
        if os.path.exists(path):
            data = np.load(path)
            return data["z_nodes"], data["coeffs"]
    path = os.path.join(_CACHE_DIR, fname)
    # fit on the host CPU backend: through a tunneled TPU the fit's many
    # small host<->device transfers are ~60x slower than plain CPU
    import jax
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        zn, coeffs = fit_table(gamut, res)
    np.savez_compressed(path, z_nodes=zn, coeffs=coeffs)
    return zn, coeffs


# ---------------------------------------------------------------------------
# Lookup (batched, jittable)
# ---------------------------------------------------------------------------

def lookup_coeffs(rgb, zn, coeffs):
    """Batched coefficient lookup with trilinear interpolation.

    rgb: (..., 3) LINEAR rgb in [0,1] (callers EOTF-decode first, like the
    reference's ``get`` does via invert_eotf, rgb_sigmoid_polynomial.rs:94).
    zn: (res,) z_nodes;  coeffs: (3, res, res, res, 3).
    Returns (..., 3) sigmoid-poly coefficients.

    Differences from the reference: out-of-range rgb is clamped to [0,1]
    instead of panicking (:101-109) — a jitted pipeline cannot panic; the
    scene compiler validates eagerly instead.
    """
    res = zn.shape[0]
    zn = jnp.asarray(zn)
    coeffs = jnp.asarray(coeffs)
    rgb = jnp.clip(rgb, 0.0, 1.0)

    maxc = jnp.argmax(rgb, axis=-1)
    z = jnp.max(rgb, axis=-1)
    c1 = select_lane(rgb, ((maxc + 1) % 3).astype(jnp.int32))
    c2 = select_lane(rgb, ((maxc + 2) % 3).astype(jnp.int32))
    zsafe = jnp.maximum(z, 1e-8)
    x = c1 * (res - 1.0) / zsafe
    y = c2 * (res - 1.0) / zsafe

    xi = jnp.clip(x.astype(jnp.int32), 0, res - 2)
    yi = jnp.clip(y.astype(jnp.int32), 0, res - 2)
    # first zi with zn[zi+1] > z (ref: :127-130); compare-count instead of
    # searchsorted, and one-hot selects for the z-node values — both avoid
    # per-element gathers (TPU scalar loop)
    zi = jnp.clip(jnp.sum((zn <= z[..., None]).astype(jnp.int32), -1) - 1,
                  0, res - 2)
    dx = x - xi
    dy = y - yi
    zn_lo = select_lane(jnp.broadcast_to(zn, zi.shape + (res,)), zi)
    zn_hi = select_lane(jnp.broadcast_to(zn, zi.shape + (res,)), zi + 1)
    dz = (z - zn_lo) / jnp.maximum(zn_hi - zn_lo, 1e-12)

    # corner fetches as flat ROW gathers (slice_sizes {1, 3}) — fast path on
    # TPU, unlike the 4-D-indexed per-element form
    cflat = coeffs.reshape(-1, coeffs.shape[-1])

    def gather(ddx, ddy, ddz):
        flat = ((maxc * res + (zi + ddz)) * res + (yi + ddy)) * res + (xi + ddx)
        return cflat[flat]                                # (..., 3)

    def lerp(a, b, t):
        return a + (b - a) * t[..., None]

    c = lerp(
        lerp(lerp(gather(0, 0, 0), gather(1, 0, 0), dx),
             lerp(gather(0, 1, 0), gather(1, 1, 0), dx), dy),
        lerp(lerp(gather(0, 0, 1), gather(1, 0, 1), dx),
             lerp(gather(0, 1, 1), gather(1, 1, 1), dx), dy),
        dz)

    # Uniform rgb -> constant spectrum sigmoid^-1(v) (ref: :112-114).
    uniform = (rgb[..., 0] == rgb[..., 1]) & (rgb[..., 1] == rgb[..., 2])
    v = jnp.clip(rgb[..., 0], 1e-5, 1.0 - 1e-5)
    const_c = jnp.stack(
        [jnp.zeros_like(v), jnp.zeros_like(v), jnp.log(v / (1.0 - v))], axis=-1)
    return jnp.where(uniform[..., None], const_c, c)


def albedo_eval(rgb, lam, zn, coeffs):
    """RgbAlbedoSpectrum: rgb in [0,1] -> reflectance at ``lam``
    (ref: spectrum/src/spectrum/rgb_albedo_spectrum.rs:16-50).

    rgb: (..., 3); lam: (..., L). Returns (..., L).
    """
    c = lookup_coeffs(rgb, zn, coeffs)
    return sigmoid_poly(c, lam)


def unbounded_eval(rgb, lam, zn, coeffs):
    """RgbUnboundedSpectrum: scale = 2*max(rgb), poly of rgb/scale
    (ref: rgb_unbounded_spectrum.rs:16-44)."""
    scale = 2.0 * jnp.max(rgb, axis=-1, keepdims=True)
    rgb_n = jnp.where(scale > 0, rgb / jnp.maximum(scale, 1e-12), 0.0)
    c = lookup_coeffs(rgb_n, zn, coeffs)
    return scale * sigmoid_poly(c, lam)


def illuminant_eval(rgb, lam, zn, coeffs, d65_dense, d65_vals=None):
    """RgbIlluminantSpectrum: unbounded poly x D65 illuminant
    (ref: rgb_illuminant_spectrum.rs:17-50).

    d65_vals: optional pre-evaluated D65 at ``lam`` (same shape) — skips
    the dense evaluation when the caller carries a wavelength bank."""
    from .grid import eval_dense
    base = unbounded_eval(rgb, lam, zn, coeffs)
    if d65_vals is not None:
        return base * d65_vals
    return base * eval_dense(jnp.asarray(d65_dense, base.dtype), lam)


# ---------------------------------------------------------------------------
# SoA (S4 component) variants — the hot-path forms (see utils/vec.py)
# ---------------------------------------------------------------------------

def sigmoid_poly_s4(c, lam):
    """sigmoid_poly with S4 wavelengths: c (R, 3) coeffs -> S4 value."""
    from ..utils.vec import S4
    c0, c1, c2 = c[..., 0], c[..., 1], c[..., 2]
    scale = 1.0 / (LAMBDA_MAX - LAMBDA_MIN)

    def lane(l):
        t = (l - LAMBDA_MIN) * scale
        return jax.nn.sigmoid((c0 * t + c1) * t + c2)

    return S4(*(lane(l) for l in lam.lanes))


def unbounded_eval_s4(rgb, lam, zn, coeffs):
    """unbounded_eval with S4 wavelengths (rgb_unbounded_spectrum.rs:16-44)."""
    scale = 2.0 * jnp.max(rgb, axis=-1)
    rgb_n = jnp.where(scale[:, None] > 0,
                      rgb / jnp.maximum(scale[:, None], 1e-12), 0.0)
    c = lookup_coeffs(rgb_n, zn, coeffs)
    return sigmoid_poly_s4(c, lam) * scale


def illuminant_eval_s4(rgb, lam, zn, coeffs, d65_dense, d65_vals=None):
    """illuminant_eval with S4 wavelengths; d65_vals: optional S4."""
    from .grid import eval_dense_s4
    base = unbounded_eval_s4(rgb, lam, zn, coeffs)
    if d65_vals is not None:
        return base * d65_vals
    return base * eval_dense_s4(jnp.asarray(d65_dense, jnp.float32), lam)
