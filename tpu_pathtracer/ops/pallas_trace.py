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
  3. Rays are pre-sorted by a coherence key (direction octant + origin
     Morton code, dead rays last) so tiles stay spatially tight after the
     first bounce — tile-granularity culling works for secondary rays
     too.  Ray components ride INTO sorted order as ``lax.sort`` payload
     columns and results ride BACK by sorting on the carried original
     index; no permute gathers anywhere (each costs ~2.3 ms on this
     chip's ~45 GB/s gather path vs ~0.2-0.6 ms per payload sort).
  4. The fast closest-hit kernel carries ONE packed int32 key per ray
     (positive-f32 t bit pattern with the winning lane in the low 7
     mantissa bits) + the winning block; the winner's exact t/u/v are
     recomputed outside the kernel from one tri_m12 row gather.
  5. Hit tests default to the plain-f32 unit-triangle transform
     (``precise=False``, MXU matmuls at HIGHEST precision); the
     Dekker-compensated exact-sign shear form costs ~3x the flops and is
     opt-in (RenderConfig.precise / TPT_PRECISE_TRACE=1).
  6. An any-hit variant serves occlusion queries without the
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

# rays per program: each program walks RAY_TILE/SUB cull subtiles
# sequentially.  Larger tiles amortize the ~7us fixed per-program cost
# (SMEM/VMEM block setup, measured r5 via an all-dead-ray floor of
# 14.5 ms at 2048 programs) without touching cull quality (lists stay
# per-SUB).
RAY_TILE = 512
# rays per culling subtile.  Sweep (r5, scene17 bounce rays, ms/iter
# closest/any-hit): SUB=128 37.8/27.0, SUB=64 33.1/24.3, SUB=32 34.6/26.3,
# SUB=8 (r4) control-bound.  64 balances list tightness against per-block
# control overhead (~0.4us: SMEM reads, while cond, dynamic slices).
SUB = 64
SUB_PER_PROG = RAY_TILE // SUB
BLOCK = 128      # triangles per block (lanes) — must match trace.BLOCK
EXIT_GROUP = 4   # blocks tested between front-to-back early-exit checks
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


def _ray_setup(rays, t_max):
    """Shear-transform constants for the tile's rays (PBRT watertight).

    rays: (R, 8) = [ox oy oz 1 dx dy dz 0]; t_max: (R, 1)."""
    ox = rays[:, 0:1]
    oy = rays[:, 1:2]
    oz = rays[:, 2:3]
    dx = rays[:, 4:5]
    dy = rays[:, 5:6]
    dz = rays[:, 6:7]

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


def _block_test_fast(tri_m_ref, blk, rays, best_t, n_real: int):
    """Unit-triangle-transform test: the per-pair bilinear part rides the
    MXU.

    rays: (R, 8) = [o, 1, d, 0].  tri_m_ref: (4, C*3*BLOCK) transforms
    (trace.BVHArrays.tri_m).  [o, 1] @ M gives the ray origin in each
    triangle's coordinates (u, v, w); [d, 0] @ M the direction.  The plane
    hit t = -o_w / d_w is the WORLD-space ray parameter (affine maps
    preserve it), and (u, v) at t are the barycentrics of (p1, p2)
    directly.  ~25 VPU ops per pair vs ~95 for the shear test; the two
    (R, 4) x (4, 3*BLOCK) matmuls are MXU work.  Degenerate/padding
    triangles have all-zero columns -> t = 0 * inf = NaN -> every compare
    false -> no hit.
    """
    cols = tri_m_ref[:, pl.ds(blk * (3 * BLOCK), 3 * BLOCK)]   # (4, 3B)
    # HIGHEST precision: the default TPU matmul truncates f32 operands to
    # bf16 (7-bit mantissa) — transform offsets then wipe out the hit
    # coordinates and paths die at the first bounce (observed: rays/spp
    # dropped 3.5x on chip while exact CPU interpret tests stayed green)
    oc = jax.lax.dot_general(rays[:, 0:4], cols,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    dc = jax.lax.dot_general(rays[:, 4:8], cols,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    o_u, o_v, o_w = oc[:, :BLOCK], oc[:, BLOCK:2 * BLOCK], oc[:, 2 * BLOCK:]
    d_u, d_v, d_w = dc[:, :BLOCK], dc[:, BLOCK:2 * BLOCK], dc[:, 2 * BLOCK:]
    t = -o_w / d_w
    u = o_u + t * d_u
    v = o_v + t * d_v
    hit = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
           & (t > 1e-6) & (t < best_t))
    lane = jax.lax.broadcasted_iota(jnp.int32, hit.shape, 1)
    hit = hit & (blk * BLOCK + lane < n_real)
    # zero non-hit lanes: NaNs from degenerate/parallel lanes would
    # otherwise poison the caller's pick-sum (NaN * 0 == NaN)
    u = jnp.where(hit, u, 0.0)
    v = jnp.where(hit, v, 0.0)
    return t, u, v, hit


# --- packed closest-hit bookkeeping (fast path) ---------------------------
# Positive f32 order as their int32 bit patterns, so a hit's (t, lane) pair
# packs into ONE int key: clear t's low 7 mantissa bits, OR in the lane
# (BLOCK = 128 fits 7 bits).  The per-block update is then a single lane
# min-reduce + two selects instead of 4 reductions + 2 pick-sums, and the
# winner's exact t/u/v are recomputed OUTSIDE the kernel from one
# tri_m12 row gather.  Cost: t comparisons lose 7 mantissa bits (relative
# ~1.5e-5 tie window, same order as the f32 test noise the statistical
# gate in tests/test_bvh.py already bounds).
_KEY_LANE_MASK = 0x7F
_KEY_DEAD = -2147483647


def _t_key_bound(key):
    """Conservative float bound encoded by a packed key."""
    return jax.lax.bitcast_convert_type(
        key & jnp.int32(~_KEY_LANE_MASK), jnp.float32)


def _key_of_tmax(t0):
    """Initial key for a per-ray search bound t0 (dead when t0 <= 0)."""
    raw = jax.lax.bitcast_convert_type(t0.astype(jnp.float32), jnp.int32)
    live = (raw & jnp.int32(~_KEY_LANE_MASK)) | jnp.int32(_KEY_LANE_MASK)
    return jnp.where(t0 > 0.0, live, jnp.int32(_KEY_DEAD))


def _kernel_closest_fast(list_ref, entry_ref, rays_ref, tmax_ref, tri_ref,
                         key_ref, blk_ref, *, n_real: int,
                         progs_per_block: int):
    """Closest-hit with packed (t | lane) keys; returns (key, block)."""
    row0 = (pl.program_id(0) % progs_per_block) * SUB_PER_PROG
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, BLOCK), 1)

    def subtile(s_, _):
        s = row0 + s_
        rays = rays_ref[pl.ds(s_ * SUB, SUB), :]
        t_max = tmax_ref[pl.ds(s_ * SUB, SUB), :]
        cnt = list_ref[s, 0]

        def cond(carry):
            j, best_key, _ = carry
            return (j < cnt) & (entry_ref[s, j]
                                < jnp.max(_t_key_bound(best_key)))

        def one_block(j, carry):
            best_key, best_blk = carry
            blk = list_ref[s, 1 + j]
            bound = _t_key_bound(best_key)
            t, _u, _v, hit = _block_test_fast(tri_ref, blk, rays, bound,
                                              n_real)
            traw = jax.lax.bitcast_convert_type(t, jnp.int32)
            tkey = jnp.where(
                hit, (traw & jnp.int32(~_KEY_LANE_MASK)) | lane,
                jnp.int32(0x7FFFFFFF))
            kmin = jnp.min(tkey, axis=1, keepdims=True)     # (SUB, 1)
            better = kmin < best_key
            best_blk = jnp.where(better, blk, best_blk)
            best_key = jnp.where(better, kmin, best_key)
            return best_key, best_blk

        def body(carry):
            j, *inner = carry
            for k in range(EXIT_GROUP):
                inner = one_block(j + k, tuple(inner))
            return (j + EXIT_GROUP, *inner)

        init = (jnp.int32(0), _key_of_tmax(t_max),
                jnp.zeros((SUB, 1), jnp.int32))
        _, best_key, best_blk = jax.lax.while_loop(cond, body, init)
        key_ref[pl.ds(s_ * SUB, SUB), :] = best_key
        blk_ref[pl.ds(s_ * SUB, SUB), :] = best_blk
        return 0

    jax.lax.fori_loop(0, SUB_PER_PROG, subtile, 0)


def _kernel_closest(list_ref, entry_ref, rays_ref, tmax_ref, tri_ref,
                    t_ref, tri_out_ref, b1_ref, b2_ref, *, precise: bool,
                    n_real: int, progs_per_block: int):
    # list_ref: SMEM rows, one per subtile; row layout
    # [count, blk0, blk1, ...] front-to-back.  Mosaic needs >= 8 SMEM
    # rows per block, so ``progs_per_block`` consecutive programs share
    # one block (selected by program_id).
    # entry_ref: matching per-block slab-entry t rows.
    # The program walks its subtiles sequentially; each subtile tests only
    # ITS block list.
    row0 = (pl.program_id(0) % progs_per_block) * SUB_PER_PROG
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, BLOCK), 1)

    def subtile(s_, _):
        s = row0 + s_
        rays = rays_ref[pl.ds(s_ * SUB, SUB), :]
        t_max = tmax_ref[pl.ds(s_ * SUB, SUB), :]
        setup = _ray_setup(rays, t_max) if precise else None
        cnt = list_ref[s, 0]

        def cond(carry):
            # front-to-back early exit, checked once per GROUP of blocks:
            # once EVERY ray's best hit is nearer than the next block's
            # slab entry, no later block can improve.  Group granularity
            # keeps the vector->scalar reduce off the per-block critical
            # path (a per-block check serialized the loop, measured +10%).
            j, best_t, _, _, _ = carry
            return (j < cnt) & (entry_ref[s, j] < jnp.max(best_t))

        def one_block(j, carry):
            best_t, best_tri, best_b1, best_b2 = carry
            blk = list_ref[s, 1 + j]
            if precise:
                t, b1, b2, hit = _block_test(tri_ref, blk, setup, best_t,
                                             True, n_real)
            else:
                t, b1, b2, hit = _block_test_fast(tri_ref, blk, rays,
                                                  best_t, n_real)
            t = jnp.where(hit, t, BIG_T)
            tmin = jnp.min(t, axis=1, keepdims=True)       # (SUB, 1)
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

        def body(carry):
            # EXIT_GROUP consecutive blocks per exit check; the list/entry
            # tables are padded with EXIT_GROUP never-hit columns so the
            # unguarded j+k reads stay in bounds (re-testing a padded
            # block id is a no-op: its AABB failed the subtile's cull)
            j, *inner = carry
            for k in range(EXIT_GROUP):
                inner = one_block(j + k, tuple(inner))
            return (j + EXIT_GROUP, *inner)

        init = (jnp.int32(0), t_max + 0.0,
                jnp.full((SUB, 1), -1, jnp.int32),
                jnp.zeros((SUB, 1), jnp.float32),
                jnp.zeros((SUB, 1), jnp.float32))
        _, best_t, best_tri, best_b1, best_b2 = jax.lax.while_loop(
            cond, body, init)
        t_ref[pl.ds(s_ * SUB, SUB), :] = best_t
        tri_out_ref[pl.ds(s_ * SUB, SUB), :] = best_tri
        b1_ref[pl.ds(s_ * SUB, SUB), :] = best_b1
        b2_ref[pl.ds(s_ * SUB, SUB), :] = best_b2
        return 0

    jax.lax.fori_loop(0, SUB_PER_PROG, subtile, 0)


def _kernel_anyhit(list_ref, entry_ref, rays_ref, tmax_ref, tri_ref,
                   occ_ref, *, precise: bool, n_real: int,
                   progs_per_block: int):
    row0 = (pl.program_id(0) % progs_per_block) * SUB_PER_PROG

    def subtile(s_, _):
        s = row0 + s_
        rays = rays_ref[pl.ds(s_ * SUB, SUB), :]
        t_max = tmax_ref[pl.ds(s_ * SUB, SUB), :]
        setup = _ray_setup(rays, t_max) if precise else None
        cnt = list_ref[s, 0]

        def cond(carry):
            # stop as soon as every live ray of the subtile is occluded
            j, occ = carry
            return (j < cnt) & (jnp.min(occ) == 0)

        def one_block(j, occ):
            blk = list_ref[s, 1 + j]
            # occluded rays get best_t = -BIG_T so later tests are
            # trivially all-false.  occ is carried as i32: Mosaic cannot
            # legalize i1 vector carries.
            bound = jnp.where(occ > 0, -BIG_T, t_max)
            if precise:
                t, _, _, hit = _block_test(tri_ref, blk, setup, bound,
                                           True, n_real)
            else:
                t, _, _, hit = _block_test_fast(tri_ref, blk, rays, bound,
                                                n_real)
            return jnp.maximum(
                occ, jnp.max(hit.astype(jnp.int32), axis=1, keepdims=True))

        def body(carry):
            j, occ = carry
            for k in range(EXIT_GROUP):
                occ = one_block(j + k, occ)
            return j + EXIT_GROUP, occ

        # dead rays (t_max < 0) start as "occluded" so a mixed subtile can
        # still early-exit; masked back to 0 on output (contract: inactive
        # rays never report a hit)
        dead = (t_max < 0.0).astype(jnp.int32)
        _, occ = jax.lax.while_loop(cond, body, (jnp.int32(0), dead + 0))
        occ_ref[pl.ds(s_ * SUB, SUB), :] = occ * (1 - dead)
        return 0

    jax.lax.fori_loop(0, SUB_PER_PROG, subtile, 0)


def _block_lists(blk_min, blk_max, ray_o, ray_d, t_max, n_sub):
    """Per-SUBTILE compact, front-to-back block lists from a dense cull.

    Returns (lists (n_sub, 1+C+pad) i32, entries (n_sub, C+pad) f32): the
    first lists[i, 0] entries of lists[i, 1:] are the blocks whose AABB at
    least one live ray of 8-ray subtile i hits, ordered by the subtile's
    nearest slab entry (entries carries those distances for the kernels'
    early exit).
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
    hitp = hit.reshape(n_sub, SUB, c)
    any_hit = hitp.any(axis=1)                             # (n_sub, C)
    entry = jnp.where(hitp, jnp.maximum(tn, 0.0).reshape(n_sub, SUB, c),
                      jnp.inf).min(axis=1)                 # (n_sub, C)
    key = jnp.where(any_hit, entry, jnp.inf)
    ids = jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32)[None, :],
                           key.shape)
    # lax.sort, not argsort: jnp.argsort takes ~2 min to compile on this
    # toolchain; the key-value sort compiles in seconds
    key_sorted, order = jax.lax.sort([key, ids], num_keys=1, dimension=1)
    cnt = any_hit.sum(axis=1, dtype=jnp.int32)[:, None]
    # merged row layout [count, blk...] per subtile; SUB_PER_PROG rows form
    # one program's SMEM block.  key_sorted doubles as the front-to-back
    # slab-entry table (inf for blocks past cnt), feeding the kernels'
    # early-exit condition.  Both tables get EXIT_GROUP pad columns
    # (block 0 / entry inf) so the kernels' unguarded grouped reads stay
    # in bounds.
    pad_blk = jnp.zeros((n_sub, EXIT_GROUP), jnp.int32)
    pad_ent = jnp.full((n_sub, EXIT_GROUP), jnp.inf)
    return (jnp.concatenate([cnt, order, pad_blk], axis=1),
            jnp.concatenate([key_sorted, pad_ent], axis=1))


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
    # int32-safe dead-ray sentinel: real keys use bits 0..27 only, so
    # INT32_MAX sorts strictly AFTER every live key (0xFFFFFFFF would cast
    # to -1 and sort the dead rays FIRST, splitting live tiles)
    return jnp.where(t0 < 0.0, jnp.int32(0x7FFFFFFF),
                     key.astype(jnp.int32))


def _coherence_keys_cols(o_cols, d_cols, t0):
    """Component-form ``_coherence_keys`` (o_cols/d_cols: 3x (R,))."""
    from ..utils.math import morton2
    ox, oy, oz = o_cols
    dx, dy, dz = d_cols

    def quant(c):
        lo = jnp.min(c)
        hi = jnp.max(c)
        scale = 1023.0 / jnp.maximum(hi - lo, 1e-12)
        return jnp.clip((c - lo) * scale, 0.0, 1023.0).astype(jnp.uint32)

    qx, qy, qz = quant(ox), quant(oy), quant(oz)
    m = morton2(qx, qy) | ((qz >> jnp.uint32(5)) << jnp.uint32(20))
    oct_ = ((dx < 0).astype(jnp.uint32)
            | ((dy < 0).astype(jnp.uint32) << 1)
            | ((dz < 0).astype(jnp.uint32) << 2))
    key = (oct_ << jnp.uint32(25)) | (m & jnp.uint32((1 << 25) - 1))
    return jnp.where(t0 < 0.0, jnp.int32(0x7FFFFFFF), key.astype(jnp.int32))


@functools.partial(jax.jit,
                   static_argnames=("n_real", "any_hit", "precise",
                                    "interpret"))
def _traverse_pallas(tri_t, blk_min, blk_max, rays, t_max,
                     n_real, any_hit=False, precise=False, interpret=False):
    r = rays.shape[0]
    n_prog = r // RAY_TILE
    n_sub = r // SUB
    c = blk_min.shape[0]
    lists, entries = _block_lists(blk_min, blk_max, rays[:, 0:3],
                                  rays[:, 4:7], t_max, n_sub)
    tmax_col = t_max[:, None]

    # Mosaic SMEM blocks need >= 8 rows; when a program owns fewer subtile
    # rows, consecutive programs share one block (selected by program_id)
    progs_per_block = max(1, 8 // SUB_PER_PROG)
    smem_rows = SUB_PER_PROG * progs_per_block

    in_specs = [
        pl.BlockSpec((smem_rows, 1 + c + EXIT_GROUP),
                     lambda i: (i // progs_per_block, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((smem_rows, c + EXIT_GROUP),
                     lambda i: (i // progs_per_block, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((RAY_TILE, 8), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),   # whole triangle table
    ]
    if any_hit:
        occ = pl.pallas_call(
            functools.partial(_kernel_anyhit, precise=precise,
                              n_real=n_real,
                              progs_per_block=progs_per_block),
            grid_spec=pl.GridSpec(
                grid=(n_prog,), in_specs=in_specs,
                out_specs=pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)),
            out_shape=jax.ShapeDtypeStruct((r, 1), jnp.int32),
            interpret=interpret,
        )(lists, entries, rays, tmax_col, tri_t)
        return occ[:, 0] != 0
    out_spec = pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    if not precise:
        key, blk = pl.pallas_call(
            functools.partial(_kernel_closest_fast, n_real=n_real,
                              progs_per_block=progs_per_block),
            grid_spec=pl.GridSpec(grid=(n_prog,), in_specs=in_specs,
                                  out_specs=[out_spec] * 2),
            out_shape=[
                jax.ShapeDtypeStruct((r, 1), jnp.int32),
                jax.ShapeDtypeStruct((r, 1), jnp.int32),
            ],
            interpret=interpret,
        )(lists, entries, rays, tmax_col, tri_t)
        return key[:, 0], blk[:, 0]
    t, tri, b1, b2 = pl.pallas_call(
        functools.partial(_kernel_closest, precise=precise, n_real=n_real,
                          progs_per_block=progs_per_block),
        grid_spec=pl.GridSpec(grid=(n_prog,), in_specs=in_specs,
                              out_specs=[out_spec] * 4),
        out_shape=[
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
            jax.ShapeDtypeStruct((r, 1), jnp.int32),
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
        ],
        interpret=interpret,
    )(lists, entries, rays, tmax_col, tri_t)
    return t[:, 0], tri[:, 0], b1[:, 0], b2[:, 0]


def traverse(bvh, ray_o, ray_d, t_max, active=None, any_hit=False,
             interpret=False, sort=True, precise=None):
    """Closest-hit (Hit) or occlusion ((R,) bool) query via the kernel.

    Pads the ray batch to whole RAY_TILE programs; inactive rays carry
    t_max = -1, fall out of every cull list, and can never record a hit.
    ``sort`` orders rays by a coherence key first (stable, exact — each
    ray's result is independent) so post-bounce tiles stay cullable.

    Permutation strategy: rays ride INTO coherent order as extra sort
    payload columns, and results ride BACK by sorting on the carried
    original index — lax.sort is a vectorized sorting network (~0.2-0.6 ms
    at 256k rows), while each avoided permute gather costs ~2.2-2.5 ms on
    this chip (the gather path runs ~45 GB/s; measured r5, the single
    biggest fixed cost of a traverse after the SoA refactor).
    """
    from .trace import Hit

    if precise is None:
        precise = _PRECISE_DEFAULT
    r = ray_o.shape[0]
    t0 = jnp.broadcast_to(jnp.asarray(t_max, ray_o.dtype), (r,)) + 0.0
    if active is not None:
        t0 = jnp.where(active, t0, -1.0)

    cols = [ray_o[:, 0], ray_o[:, 1], ray_o[:, 2],
            ray_d[:, 0], ray_d[:, 1], ray_d[:, 2], t0]

    # whole SMEM row-blocks: programs sharing one list block must all exist
    pad = (-r) % (RAY_TILE * max(1, 8 // SUB_PER_PROG))
    if pad:
        pad_vals = (0.0, 0.0, 0.0, 1.0, 1.0, 1.0, -1.0)
        cols = [jnp.concatenate([c, jnp.full((pad,), v, c.dtype)], 0)
                for c, v in zip(cols, pad_vals)]

    if sort and r > RAY_TILE:
        keys = _coherence_keys_cols(cols[0:3], cols[3:6], cols[6])
        idx = jnp.arange(cols[0].shape[0], dtype=jnp.int32)
        sorted_ = jax.lax.sort([keys] + cols + [idx], num_keys=1,
                               is_stable=True)
        cols = list(sorted_[1:8])
        perm = sorted_[8]
    else:
        perm = None

    ox, oy, oz, dx, dy, dz, t0 = cols
    one = jnp.ones_like(ox)
    rays = jnp.stack([ox, oy, oz, one, dx, dy, dz, one * 0.0], axis=1)

    # triangle table: shear-test layout for precise, unit-triangle affine
    # transforms (MXU fast path) otherwise
    tri_t = jnp.swapaxes(bvh.tri9p, 0, 1) if precise else bvh.tri_m
    out = _traverse_pallas(tri_t, bvh.blk_min, bvh.blk_max, rays,
                           t0, n_real=bvh.tri9.shape[0], any_hit=any_hit,
                           precise=precise, interpret=interpret)
    if any_hit:
        if perm is not None:
            # un-permute by sorting on the carried original index
            _, occ = jax.lax.sort([perm, out.astype(jnp.int32)], num_keys=1,
                                  is_stable=True)
            return (occ != 0)[:r]
        return out[:r]
    if not precise:
        # decode the packed (t | lane, block) winner and recompute its
        # exact t/u/v from ONE tri_m12 row gather (see _kernel_closest_fast)
        key, blk = out
        found = key < _key_of_tmax(t0)
        tri = blk * BLOCK + (key & jnp.int32(_KEY_LANE_MASK))
        tri = jnp.where(found, tri, 0)
        rows = bvh.tri_m12[jnp.clip(tri, 0, bvh.tri_m12.shape[0] - 1)]
        ou = ox * rows[:, 0] + oy * rows[:, 1] + oz * rows[:, 2] + rows[:, 3]
        ov = ox * rows[:, 4] + oy * rows[:, 5] + oz * rows[:, 6] + rows[:, 7]
        ow = ox * rows[:, 8] + oy * rows[:, 9] + oz * rows[:, 10] + rows[:, 11]
        du = dx * rows[:, 0] + dy * rows[:, 1] + dz * rows[:, 2]
        dv = dx * rows[:, 4] + dy * rows[:, 5] + dz * rows[:, 6]
        dw = dx * rows[:, 8] + dy * rows[:, 9] + dz * rows[:, 10]
        t = -ow / jnp.where(dw == 0.0, 1.0, dw)
        b1 = jnp.where(found, ou + t * du, 0.0)
        b2 = jnp.where(found, ov + t * dv, 0.0)
        t = jnp.where(found, t, BIG_T)
        tri = jnp.where(found, tri, -1)
        out = (t, tri, b1, b2)
    t, tri, b1, b2 = out
    if perm is not None:
        _, t, tri, b1, b2 = jax.lax.sort([perm, t, tri, b1, b2], num_keys=1,
                                         is_stable=True)
    t, tri, b1, b2 = t[:r], tri[:r], b1[:r], b2[:r]
    # padded degenerate triangles can never hit; ids past the real count
    # cannot appear, but clamp defensively for downstream gathers
    n_real = bvh.tri9.shape[0]
    tri = jnp.where(tri >= n_real, -1, tri)
    hit = tri >= 0
    return Hit(t=jnp.where(hit, t, BIG_T), tri=tri, b1=b1, b2=b2, hit=hit)
