"""Pallas TPU traversal kernel: VMEM-resident clustered brute-force.

Why this shape and not a stack BVH walk: the BVH's inner loop is pure
data-dependent gathers (node rows, leaf triangles, per-ray stack), and on
the target chip XLA executes such gathers at ~0.5 GB/s — measured 6 ms PER
ITERATION for a 16k-ray batch (ops/trace.py docstring).  A TPU-native
traversal must therefore be dense: this kernel keeps the whole triangle
soup (leaf-ordered, so spatially coherent) resident in VMEM and streams
BLOCK-sized triangle runs through 2-D (rays x block) watertight tests —
every intermediate a (sublane x lane) vector op, zero HBM traffic inside
the loop.  Block-level culling happens in two stages:

  1. XLA precomputes, per (ray-tile, block), how many rays hit the block's
     AABB (dense 2-D slab test — cheap); the counts ride into the kernel
     through SMEM.
  2. The kernel skips a block's 128-wide triangle test entirely
     (``pl.when``) when no ray in the tile touches it — camera-coherent
     tiles cull the vast majority of blocks.

Semantically identical to ``ops.trace.intersect`` (closest hit, watertight,
same Dekker-compensated edge functions as utils/math.py); equivalence is
gated by the same brute-force oracle tests as the BVH
(tests/test_bvh.py).  Ref for behavior: /root/reference/scene/src/bvh.rs:344-513.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

RAY_TILE = 128   # rays per program (sublanes of the test arrays)
BLOCK = 128      # triangles per block (lanes) — must match trace.BLOCK
BIG_T = 3.0e38


def available() -> bool:
    if jax.default_backend() == "cpu":
        return False
    try:
        from jax.experimental import pallas as pl            # noqa: F401
        from jax.experimental.pallas import tpu as pltpu     # noqa: F401
        return True
    except Exception:  # pragma: no cover
        return False


def _diff_of_products(a, b, c, d):
    """a*b - c*d, Dekker-compensated (exact sign) — utils/math.py semantics."""
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


def _kernel(cnt_ref, rays_ref, tri_ref, t_ref, tri_out_ref, b1_ref, b2_ref,
            *, n_blocks: int):
    """One ray tile vs all triangle blocks.

    rays_ref: (RAY_TILE, 8) f32 [ox oy oz dx dy dz t_max pad]
    tri_ref:  (9, C*BLOCK) f32 — transposed packed vertices
    cnt_ref:  (n_prog * C,) i32 scalar-prefetch — rays-in-tile hitting each
              block's AABB, row-major by program
    outputs:  (RAY_TILE, 1) each — t, tri id, b1, b2
    """
    cnt_base = pl.program_id(0) * n_blocks
    ox = rays_ref[:, 0:1]
    oy = rays_ref[:, 1:2]
    oz = rays_ref[:, 2:3]
    dx = rays_ref[:, 3:4]
    dy = rays_ref[:, 4:5]
    dz = rays_ref[:, 5:6]
    t_max = rays_ref[:, 6:7]

    # per-ray axis permutation: kz = argmax |d|
    adx, ady, adz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
    kz = jnp.where(adx > ady,
                   jnp.where(adx >= adz, 0, 2),
                   jnp.where(ady >= adz, 1, 2)).astype(jnp.int32)
    kx = (kz + 1) % 3
    ky = (kz + 2) % 3

    def ray_sel(k, x, y, z):
        return jnp.where(k == 0, x, jnp.where(k == 1, y, z))

    dpx = ray_sel(kx, dx, dy, dz)
    dpy = ray_sel(ky, dx, dy, dz)
    dpz = ray_sel(kz, dx, dy, dz)
    opx = ray_sel(kx, ox, oy, oz)
    opy = ray_sel(ky, ox, oy, oz)
    opz = ray_sel(kz, ox, oy, oz)
    sx = -dpx / dpz
    sy = -dpy / dpz
    sz = 1.0 / dpz

    lane = jax.lax.broadcasted_iota(jnp.int32, (RAY_TILE, BLOCK), 1)

    def body(k, carry):
        best_t, best_tri, best_b1, best_b2 = carry

        def tested(carry):
            best_t, best_tri, best_b1, best_b2 = carry
            blk = tri_ref[:, pl.ds(k * BLOCK, BLOCK)]       # (9, BLOCK)

            def tri_sel(v, kaxis):
                c0 = blk[3 * v + 0, :][None, :]
                c1 = blk[3 * v + 1, :][None, :]
                c2 = blk[3 * v + 2, :][None, :]
                return jnp.where(kaxis == 0, c0,
                                 jnp.where(kaxis == 1, c1, c2))

            pxs, pys, pzs = [], [], []
            for v in range(3):
                vx = tri_sel(v, kx) - opx
                vy = tri_sel(v, ky) - opy
                vz = tri_sel(v, kz) - opz
                pxs.append(vx + sx * vz)
                pys.append(vy + sy * vz)
                pzs.append(sz * vz)

            e0 = _diff_of_products(pxs[1], pys[2], pys[1], pxs[2])
            e1 = _diff_of_products(pxs[2], pys[0], pys[2], pxs[0])
            e2 = _diff_of_products(pxs[0], pys[1], pys[0], pxs[1])

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

            t = jnp.where(hit, t, BIG_T)
            tmin = jnp.min(t, axis=1, keepdims=True)        # (R, 1)
            jmin = jnp.min(jnp.where(t == tmin, lane, BLOCK), axis=1,
                           keepdims=True)                   # (R, 1)
            better = tmin < best_t
            # barycentrics of the winning lane via masked row reduction
            # (first-minimum lane wins: mask to jmin exactly)
            pick = jnp.where(lane == jmin, 1.0, 0.0)
            b1w = jnp.sum(e1 * inv_det * pick, axis=1, keepdims=True)
            b2w = jnp.sum(e2 * inv_det * pick, axis=1, keepdims=True)
            best_b1 = jnp.where(better, b1w, best_b1)
            best_b2 = jnp.where(better, b2w, best_b2)
            best_tri = jnp.where(better, k * BLOCK + jmin, best_tri)
            best_t = jnp.where(better, tmin, best_t)
            return best_t, best_tri, best_b1, best_b2

        return jax.lax.cond(cnt_ref[cnt_base + k] > 0, tested, lambda c: c,
                            carry)

    init = (t_max + 0.0,
            jnp.full((RAY_TILE, 1), -1, jnp.int32),
            jnp.zeros((RAY_TILE, 1), jnp.float32),
            jnp.zeros((RAY_TILE, 1), jnp.float32))
    best_t, best_tri, best_b1, best_b2 = jax.lax.fori_loop(
        0, n_blocks, body, init)
    t_ref[:, :] = best_t
    tri_out_ref[:, :] = best_tri
    b1_ref[:, :] = best_b1
    b2_ref[:, :] = best_b2


# imported lazily so the module imports cleanly where pallas is unavailable
try:  # pragma: no cover - trivial import guard
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None
    pltpu = None


def _block_cull_counts(blk_min, blk_max, ray_o, ray_d, t_max, n_prog):
    """(n_prog, C) i32: rays per tile whose slab test hits each block AABB."""
    inv = 1.0 / ray_d                                      # (R, 3)
    tn = jnp.full((ray_o.shape[0], blk_min.shape[0]), -jnp.inf)
    tf = jnp.full((ray_o.shape[0], blk_min.shape[0]), jnp.inf)
    for a in range(3):
        lo = (blk_min[:, a][None, :] - ray_o[:, a:a + 1]) * inv[:, a:a + 1]
        hi = (blk_max[:, a][None, :] - ray_o[:, a:a + 1]) * inv[:, a:a + 1]
        tn = jnp.maximum(tn, jnp.minimum(lo, hi))
        tf = jnp.minimum(tf, jnp.maximum(lo, hi))
    hit = (tn <= tf) & (tf > 0.0) & (tn < t_max[:, None])
    return hit.reshape(n_prog, RAY_TILE, -1).sum(1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _traverse_pallas(tri_t, blk_min, blk_max, ray_o, ray_d, t_max,
                     interpret=False):
    r = ray_o.shape[0]
    n_prog = r // RAY_TILE
    n_blocks = tri_t.shape[1] // BLOCK
    cnt = _block_cull_counts(blk_min, blk_max, ray_o, ray_d, t_max, n_prog)
    rays = jnp.concatenate(
        [ray_o, ray_d, t_max[:, None], jnp.zeros((r, 1))], axis=1)

    kern = functools.partial(_kernel, n_blocks=n_blocks)
    out_shape = [
        jax.ShapeDtypeStruct((r, 1), jnp.float32),
        jax.ShapeDtypeStruct((r, 1), jnp.int32),
        jax.ShapeDtypeStruct((r, 1), jnp.float32),
        jax.ShapeDtypeStruct((r, 1), jnp.float32),
    ]
    out_spec = pl.BlockSpec((RAY_TILE, 1), lambda i, cnt: (i, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((RAY_TILE, 8), lambda i, cnt: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # whole (9, C*BLOCK)
        ],
        out_specs=[out_spec] * 4,
    )
    t, tri, b1, b2 = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(cnt.reshape(-1), rays, tri_t)
    return t[:, 0], tri[:, 0], b1[:, 0], b2[:, 0]


# SMEM budget for the scalar-prefetch cull table: n_prog * n_blocks i32
# entries ride into SMEM per pallas_call.  Exceeding the chip's scalar
# memory hard-faults the TPU worker (observed at 2048 programs x 97 blocks,
# ~800 KB), so large ray batches are split across sequential calls whose
# table stays under this budget (512 x 97 ~ 200 KB is proven safe).
_SMEM_CNT_BUDGET_BYTES = 192 * 1024


def traverse(bvh, ray_o, ray_d, t_max, active=None, interpret=False):
    """Closest-hit query via the Pallas kernel; Hit-compatible result.

    Pads the ray batch to a whole number of RAY_TILE programs; inactive
    rays carry t_max = -1 so they can never record a hit.  Batches whose
    scalar-prefetch cull table would overflow SMEM are traced as a
    sequential ``lax.map`` over ray chunks.
    """
    from .trace import Hit

    r = ray_o.shape[0]
    t0 = jnp.broadcast_to(jnp.asarray(t_max, ray_o.dtype), (r,)) + 0.0
    if active is not None:
        t0 = jnp.where(active, t0, -1.0)

    n_blocks = bvh.tri9p.shape[0] // BLOCK
    max_prog = max(1, _SMEM_CNT_BUDGET_BYTES // (4 * n_blocks))
    chunk = max_prog * RAY_TILE

    pad = (-r) % (RAY_TILE if r <= chunk else chunk)
    if pad:
        ray_o = jnp.concatenate([ray_o, jnp.zeros((pad, 3))], 0)
        ray_d = jnp.concatenate([ray_d, jnp.ones((pad, 3))], 0)
        t0 = jnp.concatenate([t0, jnp.full((pad,), -1.0)], 0)

    tri_t = jnp.swapaxes(bvh.tri9p, 0, 1)
    if ray_o.shape[0] <= chunk:
        t, tri, b1, b2 = _traverse_pallas(
            tri_t, bvh.blk_min, bvh.blk_max, ray_o, ray_d, t0,
            interpret=interpret)
    else:
        n_chunks = ray_o.shape[0] // chunk

        def one(args):
            o, d, tm = args
            return _traverse_pallas(tri_t, bvh.blk_min, bvh.blk_max,
                                    o, d, tm, interpret=interpret)

        t, tri, b1, b2 = jax.lax.map(
            one, (ray_o.reshape(n_chunks, chunk, 3),
                  ray_d.reshape(n_chunks, chunk, 3),
                  t0.reshape(n_chunks, chunk)))
        t, tri, b1, b2 = (t.reshape(-1), tri.reshape(-1),
                          b1.reshape(-1), b2.reshape(-1))
    t, tri, b1, b2 = t[:r], tri[:r], b1[:r], b2[:r]
    # padded degenerate triangles can never hit; ids past the real count
    # cannot appear, but clamp defensively for downstream gathers
    n_real = bvh.tri9.shape[0]
    tri = jnp.where(tri >= n_real, -1, tri)
    hit = tri >= 0
    return Hit(t=jnp.where(hit, t, BIG_T), tri=tri, b1=b1, b2=b2, hit=hit)
