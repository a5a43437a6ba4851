"""Pallas TPU traversal kernel: VMEM-resident clustered intersect, v2.

Why this shape and not a stack BVH walk: the BVH's inner loop is pure
data-dependent gathers (node rows, leaf triangles, per-ray stack), and on
the target chip XLA executes per-element gathers as a scalar loop.  A
TPU-native traversal must be dense: the whole triangle soup (BVH leaf
order, so spatially coherent) stays resident in VMEM and BLOCK-sized
triangle runs stream through 2-D (rays x block) watertight tests — every
intermediate a (sublane x lane) vector op, zero HBM traffic inside the
loop.

v2 structure (replaces the v1 all-blocks loop + SMEM-prefetch counts):

  1. XLA cull pass: a dense (rays x blocks) slab test builds, per 128-ray
     tile, a COMPACT FRONT-TO-BACK LIST of the blocks any ray in the tile
     touches (``_block_lists``).  Lists ride into the kernel through
     per-program SMEM blocks — no global scalar-prefetch table, so there
     is no SMEM budget to overflow and no ray-chunking ``lax.map``.
  2. The kernel loops over ONLY the tile's listed blocks (dynamic trip
     count from SMEM).  A tile of terminated rays has an empty list and
     costs nothing.
  3. Rays are optionally pre-sorted by a coherence key (direction octant
     + origin Morton code, dead rays last) so tiles stay spatially tight
     after the first bounce — tile-granularity culling works for
     secondary rays too.  Sorting uses ``lax.sort`` with the rays as
     payload (a sorting network; no slow gathers) and results are
     scattered back through a 1-D row gather (TPU fast path).
  4. Edge functions default to plain f32 (``precise=False``); the
     Dekker-compensated exact-sign form of utils/math.py costs ~3x the
     flops and is kept for oracle-exact testing (TPT_PRECISE_TRACE=1).
  5. An any-hit variant serves occlusion queries without the
     closest-hit bookkeeping.

Semantics match ``ops.trace.intersect`` (closest hit, watertight in
precise mode); equivalence is gated by tests/test_bvh.py.  Ref for
behavior: /root/reference/scene/src/bvh.rs:344-513.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

RAY_TILE = 128   # rays per program (sublanes of the test arrays)
BLOCK = 128      # triangles per block (lanes) — must match trace.BLOCK
BIG_T = 3.0e38

_PRECISE_DEFAULT = os.environ.get("TPT_PRECISE_TRACE", "") not in ("", "0")


def available() -> bool:
    if jax.default_backend() == "cpu":
        return False
    try:
        from jax.experimental import pallas as pl            # noqa: F401
        from jax.experimental.pallas import tpu as pltpu     # noqa: F401
        return True
    except Exception:  # pragma: no cover
        return False


# imported lazily so the module imports cleanly where pallas is unavailable
try:  # pragma: no cover - trivial import guard
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None
    pltpu = None


def _diff_of_products(a, b, c, d, precise: bool):
    """a*b - c*d; Dekker-compensated exact sign when ``precise``."""
    if not precise:
        return a * b - c * d
    split = 4097.0

    def two_prod(x, y):
        p = x * y
        xs = split * x
        x_hi = xs - (xs - x)
        x_lo = x - x_hi
        ys = split * y
        y_hi = ys - (ys - y)
        y_lo = y - y_hi
        err = ((x_hi * y_hi - p) + x_hi * y_lo + x_lo * y_hi) + x_lo * y_lo
        return p, err

    p, pe = two_prod(a, b)
    q, qe = two_prod(c, d)
    return (p - q) + (pe - qe)


def _ray_setup(rays_ref):
    """Shear-transform constants for the tile's rays (PBRT watertight)."""
    ox = rays_ref[:, 0:1]
    oy = rays_ref[:, 1:2]
    oz = rays_ref[:, 2:3]
    dx = rays_ref[:, 3:4]
    dy = rays_ref[:, 4:5]
    dz = rays_ref[:, 5:6]
    t_max = rays_ref[:, 6:7]

    adx, ady, adz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
    kz = jnp.where(adx > ady,
                   jnp.where(adx >= adz, 0, 2),
                   jnp.where(ady >= adz, 1, 2)).astype(jnp.int32)
    kx = (kz + 1) % 3
    ky = (kz + 2) % 3

    def ray_sel(k, x, y, z):
        return jnp.where(k == 0, x, jnp.where(k == 1, y, z))

    dpz = ray_sel(kz, dx, dy, dz)
    sx = -ray_sel(kx, dx, dy, dz) / dpz
    sy = -ray_sel(ky, dx, dy, dz) / dpz
    sz = 1.0 / dpz
    opx = ray_sel(kx, ox, oy, oz)
    opy = ray_sel(ky, ox, oy, oz)
    opz = ray_sel(kz, ox, oy, oz)
    return kx, ky, kz, sx, sy, sz, opx, opy, opz, t_max


def _block_test(tri_ref, blk, setup, best_t, precise: bool, n_real: int):
    """Watertight test of the tile's rays vs one triangle block.

    Returns (t (R,B), e1*inv_det, e2*inv_det, hit mask).  Lanes past
    ``n_real`` (zero-padding triangles) are masked out explicitly: with
    uncompensated edge functions the compiler's mul-sub->FMA contraction
    gives identical-vertex triangles tiny nonzero edge values of one sign,
    i.e. padding could otherwise record arbitrary false hits."""
    kx, ky, kz, sx, sy, sz, opx, opy, opz, _ = setup
    tri = tri_ref[:, pl.ds(blk * BLOCK, BLOCK)]            # (9, BLOCK)

    def tri_sel(v, kaxis):
        c0 = tri[3 * v + 0, :][None, :]
        c1 = tri[3 * v + 1, :][None, :]
        c2 = tri[3 * v + 2, :][None, :]
        return jnp.where(kaxis == 0, c0, jnp.where(kaxis == 1, c1, c2))

    pxs, pys, pzs = [], [], []
    for v in range(3):
        vx = tri_sel(v, kx) - opx
        vy = tri_sel(v, ky) - opy
        vz = tri_sel(v, kz) - opz
        pxs.append(vx + sx * vz)
        pys.append(vy + sy * vz)
        pzs.append(sz * vz)

    e0 = _diff_of_products(pxs[1], pys[2], pys[1], pxs[2], precise)
    e1 = _diff_of_products(pxs[2], pys[0], pys[2], pxs[0], precise)
    e2 = _diff_of_products(pxs[0], pys[1], pys[0], pxs[1], precise)

    same_side = (((e0 <= 0) & (e1 <= 0) & (e2 <= 0))
                 | ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)))
    det = e0 + e1 + e2
    det_ok = det != 0.0
    t_scaled = e0 * pzs[0] + e1 * pzs[1] + e2 * pzs[2]
    neg = det < 0.0
    # logical blend, not jnp.where: Mosaic cannot select i1 vectors
    t_ok = ((neg & (t_scaled <= 0.0) & (t_scaled > best_t * det))
            | (~neg & (t_scaled >= 0.0) & (t_scaled < best_t * det)))
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    t = t_scaled * inv_det
    hit = same_side & det_ok & t_ok & (t > 1e-6)
    lane = jax.lax.broadcasted_iota(jnp.int32, hit.shape, 1)
    hit = hit & (blk * BLOCK + lane < n_real)
    return t, e1 * inv_det, e2 * inv_det, hit


def _kernel_closest(list_ref, rays_ref, tri_ref,
                    t_ref, tri_out_ref, b1_ref, b2_ref, *, precise: bool,
                    n_real: int):
    # list_ref: (8, 1 + C) SMEM rows for 8 consecutive programs;
    # row layout: [count, blk0, blk1, ...] front-to-back
    row = pl.program_id(0) % 8
    setup = _ray_setup(rays_ref)
    t_max = setup[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (RAY_TILE, BLOCK), 1)

    def body(j, carry):
        best_t, best_tri, best_b1, best_b2 = carry
        blk = list_ref[row, 1 + j]
        t, b1, b2, hit = _block_test(tri_ref, blk, setup, best_t,
                                     precise, n_real)
        t = jnp.where(hit, t, BIG_T)
        tmin = jnp.min(t, axis=1, keepdims=True)           # (R, 1)
        jmin = jnp.min(jnp.where(t == tmin, lane, BLOCK), axis=1,
                       keepdims=True)
        better = tmin < best_t
        pick = jnp.where(lane == jmin, 1.0, 0.0)
        b1w = jnp.sum(b1 * pick, axis=1, keepdims=True)
        b2w = jnp.sum(b2 * pick, axis=1, keepdims=True)
        best_b1 = jnp.where(better, b1w, best_b1)
        best_b2 = jnp.where(better, b2w, best_b2)
        best_tri = jnp.where(better, blk * BLOCK + jmin, best_tri)
        best_t = jnp.where(better, tmin, best_t)
        return best_t, best_tri, best_b1, best_b2

    init = (t_max + 0.0,
            jnp.full((RAY_TILE, 1), -1, jnp.int32),
            jnp.zeros((RAY_TILE, 1), jnp.float32),
            jnp.zeros((RAY_TILE, 1), jnp.float32))
    best_t, best_tri, best_b1, best_b2 = jax.lax.fori_loop(
        0, list_ref[row, 0], body, init)
    t_ref[:, :] = best_t
    tri_out_ref[:, :] = best_tri
    b1_ref[:, :] = best_b1
    b2_ref[:, :] = best_b2


def _kernel_anyhit(list_ref, rays_ref, tri_ref, occ_ref, *,
                   precise: bool, n_real: int):
    row = pl.program_id(0) % 8
    setup = _ray_setup(rays_ref)
    t_max = setup[-1]

    def body(j, occ):
        blk = list_ref[row, 1 + j]
        # per-block skip once the whole tile is resolved would need a
        # vector->scalar reduce per step; instead occluded rays get
        # best_t = -BIG_T so later tests are trivially all-false.
        # occ is carried as i32: Mosaic cannot legalize i1 vector carries.
        t, _, _, hit = _block_test(tri_ref, blk, setup,
                                   jnp.where(occ > 0, -BIG_T, t_max),
                                   precise, n_real)
        return jnp.maximum(occ, jnp.max(hit.astype(jnp.int32), axis=1,
                                        keepdims=True))

    occ = jax.lax.fori_loop(0, list_ref[row, 0],
                            body, jnp.zeros((RAY_TILE, 1), jnp.int32))
    occ_ref[:, :] = occ


def _block_lists(blk_min, blk_max, ray_o, ray_d, t_max, n_prog):
    """Per-tile compact, front-to-back block lists from a dense cull pass.

    Returns (cnt (n_prog, 1) i32, lists (n_prog, C) i32): the first
    cnt[i] entries of lists[i] are the blocks whose AABB at least one
    live ray of tile i hits, ordered by the tile's nearest slab entry.
    """
    c = blk_min.shape[0]
    inv = 1.0 / ray_d                                      # (R, 3)
    tn = jnp.full((ray_o.shape[0], c), -jnp.inf)
    tf = jnp.full((ray_o.shape[0], c), jnp.inf)
    for a in range(3):
        lo = (blk_min[:, a][None, :] - ray_o[:, a:a + 1]) * inv[:, a:a + 1]
        hi = (blk_max[:, a][None, :] - ray_o[:, a:a + 1]) * inv[:, a:a + 1]
        tn = jnp.maximum(tn, jnp.minimum(lo, hi))
        tf = jnp.minimum(tf, jnp.maximum(lo, hi))
    hit = (tn <= tf) & (tf > 0.0) & (tn < t_max[:, None])
    hitp = hit.reshape(n_prog, RAY_TILE, c)
    any_hit = hitp.any(axis=1)                             # (n_prog, C)
    entry = jnp.where(hitp, jnp.maximum(tn, 0.0).reshape(n_prog, RAY_TILE, c),
                      jnp.inf).min(axis=1)                 # (n_prog, C)
    key = jnp.where(any_hit, entry, jnp.inf)
    ids = jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32)[None, :],
                           key.shape)
    # lax.sort, not argsort: jnp.argsort takes ~2 min to compile on this
    # toolchain; the key-value sort compiles in seconds
    _, order = jax.lax.sort([key, ids], num_keys=1, dimension=1)
    cnt = any_hit.sum(axis=1, dtype=jnp.int32)[:, None]
    # merged row layout [count, blk...]: Mosaic requires SMEM block dims
    # (8, full), so 8 programs share one block, selected by program_id % 8
    return jnp.concatenate([cnt, order], axis=1)


def _coherence_keys(ray_o, ray_d, t0):
    """Sort key: direction octant (major) then origin Morton; dead last."""
    from ..utils.math import morton2
    lo = jnp.min(ray_o, axis=0)
    hi = jnp.max(ray_o, axis=0)
    scale = 1023.0 / jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip(((ray_o - lo) * scale), 0.0, 1023.0).astype(jnp.uint32)
    # 10-bit morton over x/y + 5 bits of z: 25 bits
    m = morton2(q[:, 0], q[:, 1]) | ((q[:, 2] >> jnp.uint32(5))
                                     << jnp.uint32(20))
    oct_ = ((ray_d[:, 0] < 0).astype(jnp.uint32)
            | ((ray_d[:, 1] < 0).astype(jnp.uint32) << 1)
            | ((ray_d[:, 2] < 0).astype(jnp.uint32) << 2))
    key = (oct_ << jnp.uint32(25)) | (m & jnp.uint32((1 << 25) - 1))
    return jnp.where(t0 < 0.0, jnp.uint32(0xFFFFFFFF), key).astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("n_real", "any_hit", "precise",
                                    "interpret"))
def _traverse_pallas(tri_t, blk_min, blk_max, ray_o, ray_d, t_max,
                     n_real, any_hit=False, precise=False, interpret=False):
    r = ray_o.shape[0]
    n_prog = r // RAY_TILE
    c = tri_t.shape[1] // BLOCK
    lists = _block_lists(blk_min, blk_max, ray_o, ray_d, t_max, n_prog)
    rays = jnp.concatenate(
        [ray_o, ray_d, t_max[:, None], jnp.zeros((r, 1))], axis=1)

    in_specs = [
        pl.BlockSpec((8, 1 + c), lambda i: (i // 8, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((RAY_TILE, 8), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),   # whole (9, C*BLOCK)
    ]
    if any_hit:
        occ = pl.pallas_call(
            functools.partial(_kernel_anyhit, precise=precise,
                              n_real=n_real),
            grid_spec=pl.GridSpec(
                grid=(n_prog,), in_specs=in_specs,
                out_specs=pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)),
            out_shape=jax.ShapeDtypeStruct((r, 1), jnp.int32),
            interpret=interpret,
        )(lists, rays, tri_t)
        return occ[:, 0] != 0
    out_spec = pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    t, tri, b1, b2 = pl.pallas_call(
        functools.partial(_kernel_closest, precise=precise, n_real=n_real),
        grid_spec=pl.GridSpec(grid=(n_prog,), in_specs=in_specs,
                              out_specs=[out_spec] * 4),
        out_shape=[
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
            jax.ShapeDtypeStruct((r, 1), jnp.int32),
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
        ],
        interpret=interpret,
    )(lists, rays, tri_t)
    return t[:, 0], tri[:, 0], b1[:, 0], b2[:, 0]


def traverse(bvh, ray_o, ray_d, t_max, active=None, any_hit=False,
             interpret=False, sort=True, precise=None):
    """Closest-hit (Hit) or occlusion ((R,) bool) query via the kernel.

    Pads the ray batch to whole RAY_TILE programs; inactive rays carry
    t_max = -1, fall out of every cull list, and can never record a hit.
    ``sort`` orders rays by a coherence key first (stable, exact — each
    ray's result is independent) so post-bounce tiles stay cullable.
    """
    from .trace import Hit

    if precise is None:
        precise = _PRECISE_DEFAULT
    r = ray_o.shape[0]
    t0 = jnp.broadcast_to(jnp.asarray(t_max, ray_o.dtype), (r,)) + 0.0
    if active is not None:
        t0 = jnp.where(active, t0, -1.0)

    pad = (-r) % (8 * RAY_TILE)   # 8 programs share one SMEM list block
    if pad:
        ray_o = jnp.concatenate([ray_o, jnp.zeros((pad, 3))], 0)
        ray_d = jnp.concatenate([ray_d, jnp.ones((pad, 3))], 0)
        t0 = jnp.concatenate([t0, jnp.full((pad,), -1.0)], 0)

    if sort and r > RAY_TILE:
        keys = _coherence_keys(ray_o, ray_d, t0)
        idx = jnp.arange(ray_o.shape[0], dtype=jnp.int32)
        _, perm = jax.lax.sort([keys, idx], num_keys=1, is_stable=True)
        ray_o = ray_o[perm]
        ray_d = ray_d[perm]
        t0 = t0[perm]
        _, inv = jax.lax.sort([perm, idx], num_keys=1, is_stable=True)
    else:
        inv = None

    tri_t = jnp.swapaxes(bvh.tri9p, 0, 1)
    out = _traverse_pallas(tri_t, bvh.blk_min, bvh.blk_max, ray_o, ray_d,
                           t0, n_real=bvh.tri9.shape[0], any_hit=any_hit,
                           precise=precise, interpret=interpret)
    if any_hit:
        occ = out if inv is None else out[inv]
        return occ[:r]
    t, tri, b1, b2 = out
    if inv is not None:
        t, tri, b1, b2 = t[inv], tri[inv], b1[inv], b2[inv]
    t, tri, b1, b2 = t[:r], tri[:r], b1[:r], b2[:r]
    # padded degenerate triangles can never hit; ids past the real count
    # cannot appear, but clamp defensively for downstream gathers
    n_real = bvh.tri9.shape[0]
    tri = jnp.where(tri >= n_real, -1, tri)
    hit = tri >= 0
    return Hit(t=jnp.where(hit, t, BIG_T), tri=tri, b1=b1, b2=b2, hit=hit)
