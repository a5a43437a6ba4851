"""Samplers: counter-based random and vectorized Z-order Sobol.

Replaces the reference's stateful ``Sampler`` trait
(renderer/src/sampler.rs:13-21) with *stateless pure functions* of
``(pixel, sample_index, dimension)`` — the integrator tracks the dimension
index through its wavefront loop, so no sampler state crosses device
boundaries (SURVEY §2.8 design note).

Random sampler: threefry (jax.random) keyed by (seed, sample, dim) with the
pixel's Morton code folded in per lane.  Unlike the reference's ThreadRng
(which ignores the seed and is non-deterministic, random_sampler.rs:25-29)
ours is deterministic — a strict improvement covered by the same statistical
RMSE tests.

ZSobol sampler: faithful vectorization of the PBRT-v4 Z-order Sobol scheme
(z_sobol_sampler.rs:32-235): Morton-interleaved (pixel, sample) index,
base-4 digit permutation by hashed higher digits, first two Sobol matrices,
FastOwen scrambling.  Two deliberate deviations (documented because there
are no golden images to bit-match, only statistical tests):
  * the 64-bit MurmurHash/mix_bits finalizers become 32-bit fmix32
    finalizers (TPUs have no native u64; quality is equivalent);
  * the Sobol matrices are generated, not tabled: dimension 0 is the
    identity, dimension 1 is v_k = v_{k-1} ^ (v_{k-1} >> 1) — verified to
    reproduce the reference's SOBOL_MATRICES_32 rows 0..103 exactly
    (sobol_matrices.rs:7).
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.math import morton2

# ---------------------------------------------------------------------------
# 32-bit mixers
# ---------------------------------------------------------------------------

def _fmix32(h):
    """MurmurHash3 finalizer (replaces the reference's 64-bit mix_bits)."""
    h = h.astype(jnp.uint32)
    h ^= h >> 16
    h *= jnp.uint32(0x85EBCA6B)
    h ^= h >> 13
    h *= jnp.uint32(0xC2B2AE35)
    h ^= h >> 16
    return h


def _hash2(dimension, seed):
    """Two independent 32-bit scrambler seeds from (dimension, seed)
    (replaces z_sobol_sampler.rs:76-99's 64-bit MurmurHash)."""
    base = _fmix32(dimension.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
                   + jnp.uint32(seed))
    return base, _fmix32(base + jnp.uint32(0x632BE59B))


def _reverse_bits32(n):
    n = (n << 16) | (n >> 16)
    n = ((n & jnp.uint32(0x00FF00FF)) << 8) | ((n & jnp.uint32(0xFF00FF00)) >> 8)
    n = ((n & jnp.uint32(0x0F0F0F0F)) << 4) | ((n & jnp.uint32(0xF0F0F0F0)) >> 4)
    n = ((n & jnp.uint32(0x33333333)) << 2) | ((n & jnp.uint32(0xCCCCCCCC)) >> 2)
    n = ((n & jnp.uint32(0x55555555)) << 1) | ((n & jnp.uint32(0xAAAAAAAA)) >> 1)
    return n


def _fast_owen(v, scramble_seed):
    """FastOwenScrambler::randomize (z_sobol_sampler.rs:3-29), exact."""
    v = _reverse_bits32(v)
    v ^= v * jnp.uint32(0x3D20ADEA)
    v += scramble_seed
    v *= (scramble_seed >> 16) | jnp.uint32(1)
    v ^= v * jnp.uint32(0x05526C56)
    v ^= v * jnp.uint32(0x53A22864)
    return _reverse_bits32(v)


# ---------------------------------------------------------------------------
# Sobol matrices (generated; verified against the reference's table)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _sobol_matrices() -> np.ndarray:
    """(2, 32) u32 — dims 0 and 1, the only ones the scheme uses
    (z_sobol_sampler.rs:203-230 always samples Sobol dims 0/1)."""
    dim0 = np.array([0x80000000 >> k for k in range(32)], np.uint32)
    dim1 = np.zeros(32, np.uint32)
    v = np.uint32(0x80000000)
    for k in range(32):
        dim1[k] = v
        v = v ^ (v >> np.uint32(1))
    return np.stack([dim0, dim1])


# base-4 digit permutations (z_sobol_sampler.rs:104-129) — mathematical
# enumeration of the 24 permutations of {0,1,2,3} in PBRT's fixed order.
_PERMUTATIONS = np.array([
    [0, 1, 2, 3], [0, 1, 3, 2], [0, 2, 1, 3], [0, 2, 3, 1],
    [0, 3, 2, 1], [0, 3, 1, 2], [1, 0, 2, 3], [1, 0, 3, 2],
    [1, 2, 0, 3], [1, 2, 3, 0], [1, 3, 2, 0], [1, 3, 0, 2],
    [2, 1, 0, 3], [2, 1, 3, 0], [2, 0, 1, 3], [2, 0, 3, 1],
    [2, 3, 0, 1], [2, 3, 1, 0], [3, 1, 2, 0], [3, 1, 0, 2],
    [3, 2, 1, 0], [3, 2, 0, 1], [3, 0, 2, 1], [3, 0, 1, 2]], np.int32)

# each permutation packed as an 8-bit code (digit d at bits 2d..2d+1) so the
# per-ray lookup is a one-hot select over 24 codes + a shift — a 2-D
# ``perms[p, digit]`` element gather costs ~1 ms per call on TPU and this
# runs ~65x per bounce
_PERM_CODES = np.sum(_PERMUTATIONS.astype(np.uint32)
                     << (2 * np.arange(4, dtype=np.uint32))[None, :], axis=1)

_ONE_MINUS_EPS = np.float32(np.nextafter(1.0, 0.0))


def _sobol_u32(index, matrix_row: np.ndarray):
    """XOR-accumulate the Sobol matrix columns selected by index bits."""
    v = jnp.zeros_like(index, dtype=jnp.uint32)
    for k in range(32):
        bit = (index >> jnp.uint32(k)) & jnp.uint32(1)
        v = v ^ (bit * jnp.uint32(int(matrix_row[k])))
    return v


def _u32_to_unit_float(v):
    return jnp.minimum(v.astype(jnp.float32) * np.float32(2.0 ** -32),
                       _ONE_MINUS_EPS)


# ---------------------------------------------------------------------------
# Sampler objects
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class RandomSampler:
    """Counter-based uniform sampler (deterministic ThreadRng replacement).

    Every draw is a pure function of (seed, pixel, sample, dim): the pixel's
    Morton code is folded into the threefry key, so disjoint pixel tiles and
    mesh shards draw decorrelated streams — a tile-sized render of pixel
    block B is bitwise identical to the same pixels inside a full-frame
    render (required by integrator tiling and parallel.render_sharded).
    """
    seed: int
    spp: int
    resolution: tuple  # (w, h) — unused, kept for API parity

    def _keys(self, pixel_xy, sample_idx, dim):
        """sample_idx and dim may be scalars or per-lane (R,) arrays (the
        regenerative wavefront has every lane at its own sample/depth);
        scalar inputs produce bitwise the same streams as before."""
        k = jax.random.PRNGKey(self.seed)
        m = morton2(pixel_xy[:, 0].astype(jnp.uint32),
                    pixel_xy[:, 1].astype(jnp.uint32))
        r = m.shape[0]
        d = jnp.broadcast_to(jnp.asarray(dim, jnp.uint32), (r,))
        s = jnp.broadcast_to(jnp.asarray(sample_idx, jnp.uint32), (r,))

        def mk(di, si, mi):
            return jax.random.fold_in(
                jax.random.fold_in(jax.random.fold_in(k, di), si), mi)

        return jax.vmap(mk)(d, s, m)

    def get_1d(self, pixel_xy, sample_idx, dim):
        """pixel_xy: (R, 2) int pixel coords -> (R,) uniforms."""
        keys = self._keys(pixel_xy, sample_idx, dim)
        return jax.vmap(lambda k: jax.random.uniform(k, ()))(keys)

    def get_2d(self, pixel_xy, sample_idx, dim):
        from ..utils.vec import V2
        keys = self._keys(pixel_xy, sample_idx, dim)
        uv = jax.vmap(lambda k: jax.random.uniform(k, (2,)))(keys)
        return V2(uv[:, 0], uv[:, 1])


@dataclasses.dataclass(frozen=True)
class ZSobolSampler:
    """Vectorized PBRT-v4 Z-order Sobol (z_sobol_sampler.rs:32-235)."""
    seed: int
    spp: int
    resolution: tuple  # (w, h)

    @property
    def log2_spp(self) -> int:
        return max(int(self.spp - 1).bit_length(), 0)

    @property
    def n_base4_digits(self) -> int:
        res = max(self.resolution)
        log2_res = max(int(res - 1).bit_length(), 0)
        return log2_res + (self.log2_spp + 1) // 2

    def _morton(self, px, py, sample_idx):
        """start_pixel_sample (z_sobol_sampler.rs:198-201)."""
        m = morton2(px.astype(jnp.uint32), py.astype(jnp.uint32))
        return (m << jnp.uint32(self.log2_spp)) | sample_idx.astype(jnp.uint32)

    def _sample_index(self, morton_index, dim):
        """Permuted base-4 digit scramble (z_sobol_sampler.rs:101-156)."""
        dim = dim.astype(jnp.uint32)
        codes = jnp.asarray(_PERM_CODES)                  # (24,) u32
        lanes = jnp.arange(24, dtype=jnp.uint32)
        pow2 = (self.log2_spp & 1) == 1
        last_digit = 1 if pow2 else 0
        sample_index = jnp.zeros_like(morton_index, dtype=jnp.uint32)
        for i in range(self.n_base4_digits - 1, last_digit - 1, -1):
            digit_shift = jnp.uint32(2 * i - (1 if pow2 else 0))
            digit = (morton_index >> digit_shift) & jnp.uint32(3)
            higher = morton_index >> (digit_shift + jnp.uint32(2))
            p = (_fmix32(higher ^ (jnp.uint32(0x55555555) * dim)) >> jnp.uint32(24)) % jnp.uint32(24)
            # gather-free permutation: one-hot select the packed code, then
            # extract the 2-bit digit slot
            code = jnp.sum(jnp.where(p[:, None] == lanes[None, :],
                                     codes[None, :], jnp.uint32(0)), axis=-1)
            permuted = (code >> (jnp.uint32(2) * digit)) & jnp.uint32(3)
            sample_index = sample_index | (permuted << digit_shift)
        if pow2:
            digit = morton_index & jnp.uint32(1)
            flip = _fmix32((morton_index >> jnp.uint32(1))
                           ^ (jnp.uint32(0x55555555) * dim)) & jnp.uint32(1)
            sample_index = sample_index | (digit ^ flip)
        return sample_index

    def get_1d(self, pixel_xy, sample_idx, dim):
        """pixel_xy: (R, 2) int pixel coords; dim: scalar int (traced ok)."""
        dim = jnp.asarray(dim, jnp.uint32)
        morton = self._morton(pixel_xy[:, 0], pixel_xy[:, 1], jnp.asarray(sample_idx))
        idx = self._sample_index(morton, dim)
        # NOTE reference order: permutation uses dim, scrambler hash uses dim+1
        # (get_1d increments dimension before hashing, :214-221)
        s0, _ = _hash2(dim + jnp.uint32(1), self.seed)
        m = _sobol_matrices()
        v = _sobol_u32(idx, m[0])
        return _u32_to_unit_float(_fast_owen(v, s0))

    def get_2d(self, pixel_xy, sample_idx, dim):
        from ..utils.vec import V2
        dim = jnp.asarray(dim, jnp.uint32)
        morton = self._morton(pixel_xy[:, 0], pixel_xy[:, 1], jnp.asarray(sample_idx))
        idx = self._sample_index(morton, dim)
        # reference get_2d hashes dimension+2 (:223-235)
        s0, s1 = _hash2(dim + jnp.uint32(2), self.seed)
        m = _sobol_matrices()
        u = _u32_to_unit_float(_fast_owen(_sobol_u32(idx, m[0]), s0))
        v = _u32_to_unit_float(_fast_owen(_sobol_u32(idx, m[1]), s1))
        return V2(u, v)


def make_sampler(kind: str, seed: int, spp: int, resolution):
    if kind == "random":
        return RandomSampler(seed=seed, spp=spp, resolution=tuple(resolution))
    if kind == "sobol":
        return ZSobolSampler(seed=seed, spp=spp, resolution=tuple(resolution))
    raise ValueError(f"unknown sampler {kind!r}")
