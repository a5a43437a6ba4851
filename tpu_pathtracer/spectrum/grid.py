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

import jax
import jax.numpy as jnp
import numpy as np

LAMBDA_MIN = 360.0
LAMBDA_MAX = 830.0
N_DENSE = int(LAMBDA_MAX - LAMBDA_MIN)  # 470 (ref: densely_sampled_spectrum.rs:9)

# The dense grid wavelengths (bin i covers [360+i, 361+i); value sampled at the
# left edge like the reference's DenselySampledSpectrum::from).
DENSE_LAMBDA = np.arange(N_DENSE, dtype=np.float64) + LAMBDA_MIN


def _lam_index(lam):
    idx = jnp.floor(lam - LAMBDA_MIN).astype(jnp.int32)
    in_range = (lam >= LAMBDA_MIN) & (lam <= LAMBDA_MAX)
    return jnp.clip(idx, 0, N_DENSE - 1), in_range


def _use_onehot() -> bool:
    # TPU executes per-element (2-D-indexed) gathers scalar-by-scalar
    # (~10 ms for 64k rays x 4 lanes, measured); a one-hot contraction is
    # fused onto the VPU/MXU and is effectively free.  CPU keeps the
    # gather (the contraction would be 500 MFLOP per eval there).
    import jax
    return jax.default_backend() == "tpu"


def eval_dense(values, lam):
    """Evaluate a dense spectrum at wavelengths ``lam``.

    values: (470,) single spectrum or (470, K) stacked spectra.
    lam: (..., L) wavelengths in nm.
    Returns (..., L) or (..., L, K) with floor-index lookup; 0 outside
    [360, 830] (ref: densely_sampled_spectrum.rs:57-67).
    """
    idx, in_range = _lam_index(lam)
    if values.ndim == 1:
        if _use_onehot() and idx.ndim >= 1:
            # exact one-hot where-reduce: compiles in seconds (a HIGHEST-
            # precision dot triggers a ~500 s XLA pass, measured) and is
            # bit-exact unlike a default-precision (bf16) contraction
            flat = idx.reshape(-1)
            oh = flat[:, None] == jnp.arange(N_DENSE, dtype=jnp.int32)[None, :]
            v = jnp.sum(jnp.where(oh, values[None, :], 0.0), axis=-1)
            v = v.reshape(idx.shape)
        else:
            v = jnp.take(values, idx, axis=-1)
        return jnp.where(in_range, v, 0.0)
    # values (470, K): evaluate every column at every wavelength
    assert values.ndim == 2
    # guard the incompatible pre-r3 (R, 470) per-ray-spectra convention:
    # a stale caller must fail loudly, not silently gather wrong values
    assert values.shape[0] == N_DENSE, (
        f"eval_dense 2-D expects (470, K) stacked columns, got {values.shape}")
    flat = idx.reshape(-1)
    if _use_onehot():
        oh = flat[:, None] == jnp.arange(N_DENSE, dtype=jnp.int32)[None, :]
        v = jnp.sum(jnp.where(oh[:, :, None], values[None, :, :], 0.0), axis=1)
    else:
        v = values[flat]
    v = v.reshape(idx.shape + (values.shape[1],))
    return jnp.where(in_range[..., None], v, 0.0)


def eval_bank(banks, row, lam):
    """Per-ray spectrum bank evaluation: out[r, l] = banks[row[r], idx[r, l]].

    banks: (B, 470) dense spectra; row: (R,) i32; lam: (R, L) nm.
    TPU-native replacement for ``banks[row]`` + ``take_along_axis`` —
    both lower to per-element gathers; here the wavelength lookup is a
    one-hot contraction against ALL banks followed by a one-hot bank
    select (all fused, no gather).  Same floor/out-of-range semantics as
    ``eval_dense``.
    """
    idx, in_range = _lam_index(lam)
    if not _use_onehot():
        v = jnp.take_along_axis(banks[row], idx, axis=-1)
        return jnp.where(in_range, v, 0.0)
    # one-hot bank select (exact), then per-lane one-hot wavelength reduce
    b = banks.shape[0]
    sel = row[:, None] == jnp.arange(b, dtype=jnp.int32)[None, :]   # (R, B)
    rows = jnp.sum(jnp.where(sel[:, :, None], banks[None, :, :], 0.0),
                   axis=1)                               # (R, 470)
    i470 = jnp.arange(N_DENSE, dtype=jnp.int32)
    outs = []
    for l in range(lam.shape[-1]):
        oh = idx[:, l][:, None] == i470[None, :]
        outs.append(jnp.sum(jnp.where(oh, rows, 0.0), axis=-1))
    v = jnp.stack(outs, axis=-1)                         # (R, L)
    return jnp.where(in_range, v, 0.0)


def lambda_slice(table, lam, use_gather: bool | None = None):
    """Evaluate EVERY column of a stacked dense-spectrum table at ``lam``.

    table: (470, C) — C spectra as columns; lam: (..., L) nm.
    Returns (..., L, C).  This is the once-per-sample producer of
    ``SampledWavelengths.bank``: one pass over the 470-bin axis shared by
    all downstream consumers, instead of one dense evaluation per lookup
    site (film CMFs, emission bank, light power, eta/k banks).

    use_gather: force the flat row-gather path (``table[idx]``, the TPU
    fast-gather form texture sampling relies on) or the one-hot contraction
    (exact same semantics); None = gather on TPU, take on CPU.
    """
    idx, in_range = _lam_index(lam)
    flat = idx.reshape(-1)
    if use_gather is None:
        use_gather = True          # flat row gather is the fast path on both
    if use_gather:
        v = table[flat]                                   # (n, C) row gather
    else:
        oh = flat[:, None] == jnp.arange(N_DENSE, dtype=jnp.int32)[None, :]
        v = jnp.sum(jnp.where(oh[:, :, None], table[None, :, :], 0.0), axis=1)
    v = v.reshape(idx.shape + (table.shape[-1],))
    return jnp.where(in_range[..., None], v, 0.0)


def bank_select(bank, row, first_col: int = 3):
    """Select one pre-evaluated spectrum per ray from a wavelength bank.

    bank: (R, L, 3+K) from ``lambda_slice`` (cols 0..2 = CMFs, 3.. = scene
    spectra); row: (R,) i32 scene-spectra row. Returns (R, L) — the O(K)
    replacement for ``eval_bank`` when the bank is pre-computed.
    """
    k = bank.shape[-1] - first_col
    if k <= 16:
        # unrolled slice+where chain, not a one-hot reduce: summing over the
        # tiny minor axis lowers to a slow cross-lane shuffle on TPU (~4 ms
        # per call at 256k rays, measured)
        out = jnp.where((row == 0)[:, None], bank[..., first_col], 0.0)
        for i in range(1, k):
            out = jnp.where((row == i)[:, None], bank[..., first_col + i], out)
        return out
    # large banks: one one-hot contraction instead of K unrolled selects
    oh = (row[:, None] == jnp.arange(k, dtype=jnp.int32)[None, :])  # (R, K)
    return jnp.einsum("rlk,rk->rl", bank[..., first_col:],
                      oh.astype(bank.dtype))


# ---------------------------------------------------------------------------
# SoA (component-form) bank: the hot-path replacement for lambda_slice /
# bank_select.  See utils/vec.py for why (R, 4, C) buffers are poison on TPU.
# ---------------------------------------------------------------------------

def lambda_slice_bank(table, lam):
    """Evaluate every column of a stacked dense-spectrum table at S4 ``lam``.

    table: (470, 3+K) — CIE CMFs in columns 0..2, scene spectra after.
    lam: S4 of (R,) wavelengths.  Returns a ``sampled.Bank``: one flat
    row-gather per lane (the TPU fast-gather form), columns split into
    (R,)-component S4s so every downstream op is full-width.
    """
    from ..utils.vec import S4
    from .sampled import Bank

    k = table.shape[-1]
    cols = [[], [], [], []]   # per table column c: 4 lanes
    per_lane = []
    for lane in lam.lanes if hasattr(lam, "lanes") else (
            lam.a, lam.b, lam.c, lam.d):
        idx, in_range = _lam_index(lane)
        rows = table[idx]                                  # (R, 3+K) gather
        rows = jnp.where(in_range[:, None], rows, 0.0)
        per_lane.append(rows)
    def col(c):
        return S4(*(rows[:, c] for rows in per_lane))
    return Bank(cmf_x=col(0), cmf_y=col(1), cmf_z=col(2),
                spectra=tuple(col(3 + i) for i in range(k - 3)))


def bank_pick(bank, row):
    """Select one pre-evaluated scene spectrum per ray -> S4.

    bank: ``sampled.Bank``; row: (R,) i32 scene-spectra row.  Unrolled
    where-chain for small K (pure elementwise selects), one-hot
    contraction past 16 columns.
    """
    from ..utils.vec import S4
    spectra = bank.spectra
    k = len(spectra)
    if k == 0:
        z = jnp.zeros_like(bank.cmf_x.a)
        return S4(z, z, z, z)
    if k <= 16:
        out = [jnp.where(row == 0, s, 0.0) for s in spectra[0].lanes]
        for i in range(1, k):
            si = spectra[i]
            out = [jnp.where(row == i, lane_v, o)
                   for lane_v, o in zip(si.lanes, out)]
        return S4(*out)
    lanes = []
    for l in range(4):
        stackv = jnp.stack([s.lanes[l] for s in spectra], axis=0)   # (K, R)
        oh = (row[None, :] == jnp.arange(k, dtype=jnp.int32)[:, None])
        lanes.append(jnp.sum(jnp.where(oh, stackv, 0.0), axis=0))
    return S4(*lanes)


def eval_dense_s4(values, lam):
    """``eval_dense`` for a single (470,) spectrum at S4 wavelengths."""
    from ..utils.vec import S4
    outs = []
    for lane in (lam.a, lam.b, lam.c, lam.d):
        outs.append(eval_dense(values, lane))
    return S4(*outs)


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
