"""Ray traversal: batched BVH intersect / occlusion on device.

TPU-native replacement for the reference's recursive CPU traversal
(scene/src/bvh.rs:344-513).  All rays advance in lockstep through one
``lax.while_loop``; each iteration every live ray pops one entry from its
private traversal stack and either (a) tests the two child AABBs stored in
the popped internal node and pushes the surviving children near-first, or
(b) tests the <= MAX_LEAF triangles of a popped leaf.  Compared to the
reference this adds near-child ordering and current-best-t pruning (the
reference visits both children unconditionally, bvh.rs:370-395).

Device memory layout is tuned for the TPU's gather path: each internal node
row packs BOTH child AABBs and both child references, and each triangle row
packs all three vertices, so one traversal step issues two node gathers
(f32 x12 + i32 x2) and MAX_LEAF triangle gathers (f32 x9) instead of the
~19 dependent scalar-array gathers a naive SoA layout needs.  Child
references encode leaves inline (negative ref = leaf with (start, count)
payload), so leaf nodes are never gathered at all.

The per-ray stack depth is static at trace time: ``nodes_f.shape`` is known
under jit and the builder records the tree depth in the ``stack_hint``
array's shape.
"""
from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.math import (intersect_aabb, intersect_triangle,
                          intersect_triangle_block)

BIG_T = 3.0e38

# static leaf width; must match scene.bvh.MAX_LEAF_SIZE
MAX_LEAF = 4

# triangle block width for the gather-free (brute/pallas) traversals: one
# VPU lane row per block
BLOCK = 128


class BVHArrays(NamedTuple):
    """Device-resident flat BVH + triangle SoA (in BVH leaf order).

    nodes_f: (N, 12) f32 — [c0.min, c0.max, c1.min, c1.max] per internal node
    nodes_i: (N, 2) i32  — child refs; >= 0: internal node id,
                           < 0: leaf, payload v = -(ref+1), start = v >> 3,
                           count = v & 7
    tri9:    (T, 9) f32  — packed triangle vertices [p0 p1 p2]
    p0/p1/p2:(T, 3) f32  — same vertices unpacked (shading-side consumers)
    stack_hint: (D,) i8  — carries the required stack depth in its SHAPE

    Block (clustered) layout for the gather-free traversals — triangles in
    BVH leaf order (spatially coherent) grouped into BLOCK-sized runs:
    tri9p:   (C*BLOCK, 9) f32 — tri9 zero-padded to whole blocks (a
             degenerate all-zero triangle can never be hit: det == 0)
    blk_min/blk_max: (C, 3) f32 — per-block AABB over the REAL triangles
    tri_m:   (4, C*3*BLOCK) f32 — per-triangle unit-triangle affine
             transforms for the MXU fast test: column (blk*3 + c)*BLOCK + j
             holds [M_c0, M_c1, M_c2, b_c] of block blk's triangle j, so
             [o, 1] @ tri_m and [d, 0] @ tri_m are matmuls giving the
             transformed ray in triangle coordinates (u = b1, v = b2,
             plane hit at o'_w + t d'_w = 0); degenerate/padding rows are
             all-zero -> t = NaN -> never a hit
    tri_m12: (C*BLOCK, 12) f32 — the same transforms as per-triangle rows
             [Mu(3) bu Mv(3) bv Mw(3) bw]: the closest-hit kernel returns
             only (packed t|lane key, block); the winner's exact t/u/v are
             recomputed OUTSIDE the kernel from ONE row gather of this
             table (cheaper than per-block argmin/pick lane reductions)
    """
    nodes_f: jnp.ndarray
    nodes_i: jnp.ndarray
    tri9: jnp.ndarray
    p0: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray
    stack_hint: jnp.ndarray
    tri9p: jnp.ndarray
    blk_min: jnp.ndarray
    blk_max: jnp.ndarray
    tri_m: jnp.ndarray
    tri_m12: jnp.ndarray


def _leaf_ref(start: int, count: int) -> int:
    return -(start * 8 + count) - 1


def pack_bvh(fb, P: np.ndarray) -> BVHArrays:
    """Pack a host FlatBVH + reordered triangle vertices for the device.

    fb: scene.bvh.FlatBVH (or the native builder's equivalent)
    P: (T, 3, 3) f32 triangle vertices already permuted by ``fb.order``.
    """
    n = fb.n_nodes
    count = np.asarray(fb.count)
    left = np.asarray(fb.left)
    right = np.asarray(fb.right)
    bmin = np.asarray(fb.bounds_min, np.float32)
    bmax = np.asarray(fb.bounds_max, np.float32)

    assert count.max(initial=0) <= 7, "leaf count must fit the 3-bit payload"
    refs = np.where(count > 0, -(left * 8 + count) - 1,
                    np.arange(n, dtype=np.int64)).astype(np.int32)

    nodes_f = np.zeros((max(n, 1), 12), np.float32)
    nodes_i = np.full((max(n, 1), 2), _leaf_ref(0, 0), np.int32)
    if count[0] > 0:
        # degenerate scene: root itself is a leaf -> pseudo-root whose
        # second child is an empty, never-hit box
        nodes_f[0, 0:3] = bmin[0]
        nodes_f[0, 3:6] = bmax[0]
        nodes_f[0, 6:9] = np.inf
        nodes_f[0, 9:12] = -np.inf
        nodes_i[0, 0] = _leaf_ref(int(left[0]), int(count[0]))
    else:
        internal = count == 0
        l, r = left[internal], right[internal]
        rows = np.nonzero(internal)[0]
        nodes_f[rows, 0:3] = bmin[l]
        nodes_f[rows, 3:6] = bmax[l]
        nodes_f[rows, 6:9] = bmin[r]
        nodes_f[rows, 9:12] = bmax[r]
        nodes_i[rows, 0] = refs[l]
        nodes_i[rows, 1] = refs[r]

    P = np.asarray(P, np.float32)
    depth = int(getattr(fb, "depth", 32))

    # block layout for the brute/pallas traversals
    t = len(P)
    c = max(-(-t // BLOCK), 1)
    tri9p = np.zeros((c * BLOCK, 9), np.float32)
    tri9p[:t] = P.reshape(t, 9)
    blk_min = np.full((c, 3), np.inf, np.float32)
    blk_max = np.full((c, 3), -np.inf, np.float32)
    for k in range(c):
        blk = P[k * BLOCK:(k + 1) * BLOCK]
        if len(blk):
            blk_min[k] = blk.reshape(-1, 3).min(0)
            blk_max[k] = blk.reshape(-1, 3).max(0)

    # unit-triangle affine transforms (f64 host precompute): M = A^-1 with
    # A's columns (p1-p0, p2-p0, e1 x e2); q' = M q - M p0 puts the
    # triangle at the unit right triangle in the w=0 plane
    V = P.astype(np.float64)
    e1 = V[:, 1] - V[:, 0]
    e2 = V[:, 2] - V[:, 0]
    nrm = np.cross(e1, e2)
    A = np.stack([e1, e2, nrm], axis=-1)                 # (T, 3, 3)
    ok = np.abs(np.linalg.det(A)) > 1e-30
    Minv = np.zeros((t, 3, 3))
    if ok.any():
        Minv[ok] = np.linalg.inv(A[ok])
    boff = -np.einsum("tij,tj->ti", Minv, V[:, 0])       # (T, 3)
    M4 = np.concatenate([Minv, boff[:, :, None]], axis=2)  # (T, 3, 4)
    M4p = np.zeros((c * BLOCK, 3, 4), np.float32)
    M4p[:t] = M4.astype(np.float32)
    tri_m = (M4p.reshape(c, BLOCK, 3, 4).transpose(0, 2, 1, 3)
             .reshape(c * 3 * BLOCK, 4).T.copy())        # (4, C*3*BLOCK)
    tri_m12 = M4p.reshape(c * BLOCK, 12)

    return BVHArrays(
        nodes_f=jnp.asarray(nodes_f),
        nodes_i=jnp.asarray(nodes_i),
        tri9=jnp.asarray(P.reshape(len(P), 9)),
        p0=jnp.asarray(P[:, 0]),
        p1=jnp.asarray(P[:, 1]),
        p2=jnp.asarray(P[:, 2]),
        stack_hint=jnp.zeros((depth + 2,), jnp.int8),
        tri9p=jnp.asarray(tri9p),
        blk_min=jnp.asarray(blk_min),
        blk_max=jnp.asarray(blk_max),
        tri_m=jnp.asarray(tri_m),
        tri_m12=jnp.asarray(tri_m12),
    )


class Hit(NamedTuple):
    t: jnp.ndarray        # (R,) hit distance (BIG_T if miss)
    tri: jnp.ndarray      # (R,) triangle id in leaf order (-1 if miss)
    b1: jnp.ndarray       # (R,) barycentric of p1
    b2: jnp.ndarray       # (R,) barycentric of p2
    hit: jnp.ndarray      # (R,) bool


def _traverse(bvh: BVHArrays, ray_o, ray_d, t_max, any_hit: bool,
              active=None):
    r = ray_o.shape[0]
    n_tri = bvh.tri9.shape[0]
    stack_depth = bvh.stack_hint.shape[0]
    inv_d = 1.0 / ray_d  # IEEE inf for zero components is fine for the slab test

    # ref 0 == root (a pseudo-root exists when the whole tree is one leaf)
    # stack is (depth, R): rays on the minor axis so every per-slot op is a
    # full-width vector op and no layout transpose happens per iteration
    stack = jnp.zeros((stack_depth, r), jnp.int32)
    sp = jnp.ones((r,), jnp.int32)
    if active is not None:
        # terminated rays start with an empty stack so they fall out of the
        # lockstep loop immediately (wavefront compaction)
        sp = jnp.where(active, sp, 0)

    state = dict(
        stack=stack, sp=sp,
        best_t=jnp.broadcast_to(jnp.asarray(t_max, ray_o.dtype), (r,)) + 0.0,
        best_tri=jnp.full((r,), -1, jnp.int32),
        best_b1=jnp.zeros((r,), ray_o.dtype),
        best_b2=jnp.zeros((r,), ray_o.dtype),
    )

    def cond(s):
        return jnp.any(s["sp"] > 0)

    def body(s):
        live = s["sp"] > 0
        top = jnp.maximum(s["sp"] - 1, 0)
        ref = jnp.take_along_axis(s["stack"], top[None, :], axis=0)[0]
        ref = jnp.where(live, ref, -1)
        sp = jnp.where(live, s["sp"] - 1, s["sp"])

        is_leaf = live & (ref < 0)
        is_inner = live & (ref >= 0)

        # ---- leaf: payload decoded from the ref, no node gather -----------
        payload = -(ref + 1)
        start = jnp.right_shift(payload, 3)
        cnt = jnp.bitwise_and(payload, 7)
        best_t, best_tri = s["best_t"], s["best_tri"]
        best_b1, best_b2 = s["best_b1"], s["best_b2"]
        for k in range(MAX_LEAF):
            tri_i = jnp.clip(start + k, 0, n_tri - 1)
            valid = is_leaf & (k < cnt)
            row = bvh.tri9[tri_i]                       # (R, 9) single gather
            t, b1, b2, h = intersect_triangle(
                ray_o, ray_d, row[:, 0:3], row[:, 3:6], row[:, 6:9], best_t)
            better = valid & h & (t < best_t)
            best_t = jnp.where(better, t, best_t)
            best_tri = jnp.where(better, tri_i, best_tri)
            best_b1 = jnp.where(better, b1, best_b1)
            best_b2 = jnp.where(better, b2, best_b2)

        # ---- internal: both child AABBs live in the popped node's row -----
        node = jnp.where(is_inner, ref, 0)
        row_f = bvh.nodes_f[node]                        # (R, 12)
        row_i = bvh.nodes_i[node]                        # (R, 2)
        tn_l, hit_l = intersect_aabb(ray_o, inv_d, row_f[:, 0:3],
                                     row_f[:, 3:6], best_t)
        tn_r, hit_r = intersect_aabb(ray_o, inv_d, row_f[:, 6:9],
                                     row_f[:, 9:12], best_t)
        hit_l = is_inner & hit_l
        hit_r = is_inner & hit_r

        # near child popped first => push far child first
        l_nearer = tn_l <= tn_r
        first = jnp.where(l_nearer, row_i[:, 1], row_i[:, 0])   # far
        first_ok = jnp.where(l_nearer, hit_r, hit_l)
        second = jnp.where(l_nearer, row_i[:, 0], row_i[:, 1])  # near
        second_ok = jnp.where(l_nearer, hit_l, hit_r)

        stack = s["stack"]
        slot = jnp.arange(stack_depth)[:, None]
        slot1 = jnp.clip(sp, 0, stack_depth - 1)
        sp1 = sp + first_ok.astype(jnp.int32)
        slot2 = jnp.clip(sp1, 0, stack_depth - 1)
        stack = jnp.where(
            (slot == slot1[None, :]) & first_ok[None, :], first[None, :],
            jnp.where((slot == slot2[None, :]) & second_ok[None, :],
                      second[None, :], stack))
        sp = sp1 + second_ok.astype(jnp.int32)

        if any_hit:
            # occlusion query: stop a ray as soon as anything is hit
            sp = jnp.where(best_tri >= 0, 0, sp)

        return dict(stack=stack, sp=sp, best_t=best_t, best_tri=best_tri,
                    best_b1=best_b1, best_b2=best_b2)

    s = jax.lax.while_loop(cond, body, state)
    hit = s["best_tri"] >= 0
    return Hit(t=s["best_t"], tri=s["best_tri"], b1=s["best_b1"],
               b2=s["best_b2"], hit=hit)


def _traverse_blocks(bvh: BVHArrays, ray_o, ray_d, t_max, active=None):
    """Gather-free clustered traversal: dense ray x triangle-block tests.

    Rationale: on the target chip XLA lowers data-dependent gathers to a
    ~0.5 GB/s path, so the stack traversal above — whose inner loop is
    nothing but gathers — runs ~2 orders of magnitude below the VPU's dense
    throughput (measured: 436 ms vs 93 ms for the same 16k-ray batch even
    with NO culling).  This path instead streams BLOCK-sized runs of
    leaf-ordered triangles (spatially coherent) through dense 2-D
    (rays x block) watertight tests, skipping blocks whose AABB no live ray
    hits (``lax.cond``) — camera-coherent ray tiles cull most blocks.
    """
    r = ray_o.shape[0]
    c = bvh.blk_min.shape[0]
    inv_d = 1.0 / ray_d
    t0 = jnp.broadcast_to(jnp.asarray(t_max, ray_o.dtype), (r,)) + 0.0
    if active is not None:
        t0 = jnp.where(active, t0, -1.0)   # inactive rays hit nothing

    def step(k, carry):
        best_t, best_tri, best_b1, best_b2 = carry
        bmin = jax.lax.dynamic_slice(bvh.blk_min, (k, 0), (1, 3))  # (1, 3)
        bmax = jax.lax.dynamic_slice(bvh.blk_max, (k, 0), (1, 3))
        _, blk_hit = intersect_aabb(ray_o, inv_d, bmin, bmax, best_t)

        def test(carry):
            best_t, best_tri, best_b1, best_b2 = carry
            blk = jax.lax.dynamic_slice(bvh.tri9p, (k * BLOCK, 0), (BLOCK, 9))
            t, b1, b2, h = intersect_triangle_block(ray_o, ray_d, blk, best_t)
            t = jnp.where(h, t, BIG_T)
            j = jnp.argmin(t, axis=1)
            tj = jnp.take_along_axis(t, j[:, None], 1)[:, 0]
            better = tj < best_t
            best_t = jnp.where(better, tj, best_t)
            best_tri = jnp.where(better, k * BLOCK + j, best_tri)
            best_b1 = jnp.where(
                better, jnp.take_along_axis(b1, j[:, None], 1)[:, 0], best_b1)
            best_b2 = jnp.where(
                better, jnp.take_along_axis(b2, j[:, None], 1)[:, 0], best_b2)
            return best_t, best_tri, best_b1, best_b2

        return jax.lax.cond(jnp.any(blk_hit), test, lambda cr: cr,
                            (best_t, best_tri, best_b1, best_b2))

    init = (t0, jnp.full((r,), -1, jnp.int32), jnp.zeros((r,), ray_o.dtype),
            jnp.zeros((r,), ray_o.dtype))
    best_t, best_tri, best_b1, best_b2 = jax.lax.fori_loop(0, c, step, init)
    hit = best_tri >= 0
    return Hit(t=best_t, tri=best_tri, b1=best_b1, b2=best_b2, hit=hit)


# triangle count per pallas-kernel CHUNK: bounds the VMEM-resident table
# (tri_m is 48 B/tri -> 12.6 MB at 1 << 18) and the O(R x C) cull pass.
# Scenes past the cap are traced as a sequence of chunk traversals with
# the running best-t forwarded into each chunk's cull/test bounds — no
# 100x gather-path cliff at any scene size (VERDICT r3 item 7).
MAX_DENSE_TRIS = 1 << 18

_FORCED_METHOD = os.environ.get("TPT_TRAVERSAL")  # bvh | brute | pallas

# Trace-time watertightness override (RenderConfig.precise).  Set by the
# integrator at the top of each traced render function; because the config
# is a static jit argument, a changed value always forces a retrace that
# re-reads this.  None defers to the TPT_PRECISE_TRACE env default.
_PRECISE_OVERRIDE: bool | None = None


def set_precise(v: bool | None) -> None:
    global _PRECISE_OVERRIDE
    _PRECISE_OVERRIDE = v


def _pick_method(bvh: BVHArrays) -> str:
    if _FORCED_METHOD:
        return _FORCED_METHOD
    if jax.default_backend() == "cpu":
        return "bvh"   # CPU XLA gathers are fine; BVH wins asymptotically
    from . import pallas_trace
    return "pallas" if pallas_trace.available() else "brute"


def _dispatch(method: str, bvh, ray_o, ray_d, t_max, active, any_hit: bool):
    if method == "bvh":
        return _traverse(bvh, ray_o, ray_d, t_max, any_hit=any_hit,
                         active=active)
    if method == "brute":
        return _traverse_blocks(bvh, ray_o, ray_d, t_max, active=active)
    if method == "pallas":
        return _pallas_chunked(bvh, ray_o, ray_d, t_max, active, any_hit)
    raise ValueError(f"unknown traversal method {method!r}")


def _chunk_view(bvh: BVHArrays, b0: int, b1: int) -> BVHArrays:
    """Slice the block-clustered tables to blocks [b0, b1) (zero-copy
    views under jit).  tri9's row count carries the chunk's real-triangle
    count; the unsliced BVH-walk arrays are untouched (unused here)."""
    n_tris = bvh.tri9.shape[0]
    lo, hi = b0 * BLOCK, min(n_tris, b1 * BLOCK)
    return bvh._replace(
        tri9=bvh.tri9[lo:max(hi, lo)],
        tri9p=bvh.tri9p[b0 * BLOCK:b1 * BLOCK],
        tri_m=bvh.tri_m[:, b0 * 3 * BLOCK:b1 * 3 * BLOCK],
        tri_m12=bvh.tri_m12[b0 * BLOCK:b1 * BLOCK],
        blk_min=bvh.blk_min[b0:b1],
        blk_max=bvh.blk_max[b0:b1],
    )


def _pallas_chunked(bvh: BVHArrays, ray_o, ray_d, t_max, active,
                    any_hit: bool, interpret: bool = False):
    """Kernel traversal over VMEM-sized chunks of the triangle table.

    Scenes whose clustered table exceeds MAX_DENSE_TRIS are traced as a
    sequence of chunk traversals.  Closest-hit forwards the running
    per-ray best t into each chunk as its t_max, so later chunks cull
    against hits already found (front-loaded by the BVH-leaf spatial
    order); any-hit masks already-occluded rays out of later chunks.
    """
    from . import pallas_trace

    r = ray_o.shape[0]
    c = bvh.blk_min.shape[0]
    cap = max(MAX_DENSE_TRIS // BLOCK, 1)
    if any_hit:
        # shadow rays get the coherence sort too: post-SoA the sort +
        # permute cost ~1-3 ms while sorted subtiles cull to ~2.6x
        # shorter block lists (measured r5: mean 16.6 vs 43.5 blocks on
        # scene-17 bounce-state rays) — the any-hit kernel is bandwidth
        # of the whole step, so this is a direct ~2x on it
        occ = jnp.zeros((r,), bool)
        for b0 in range(0, c, cap):
            sub = bvh if c <= cap else _chunk_view(bvh, b0, min(c, b0 + cap))
            act = ~occ if active is None else (active & ~occ)
            occ = occ | pallas_trace.traverse(sub, ray_o, ray_d, t_max,
                                              active=act, any_hit=True,
                                              sort=True,
                                              precise=_PRECISE_OVERRIDE,
                                              interpret=interpret)
        zero = jnp.zeros((r,), ray_o.dtype)
        return Hit(t=jnp.where(occ, zero, BIG_T),
                   tri=jnp.where(occ, 0, -1).astype(jnp.int32),
                   b1=zero, b2=zero, hit=occ)

    best = None
    t_bound = jnp.broadcast_to(jnp.asarray(t_max, ray_o.dtype), (r,))
    for b0 in range(0, c, cap):
        sub = bvh if c <= cap else _chunk_view(bvh, b0, min(c, b0 + cap))
        h = pallas_trace.traverse(sub, ray_o, ray_d, t_bound,
                                  active=active,
                                  precise=_PRECISE_OVERRIDE,
                                  interpret=interpret)
        if best is None:
            best = h._replace(tri=jnp.where(h.hit, h.tri + b0 * BLOCK, -1))
        else:
            better = h.hit & (h.t < best.t)
            best = Hit(t=jnp.where(better, h.t, best.t),
                       tri=jnp.where(better, h.tri + b0 * BLOCK, best.tri),
                       b1=jnp.where(better, h.b1, best.b1),
                       b2=jnp.where(better, h.b2, best.b2),
                       hit=best.hit | better)
        # missing rays carry t = BIG_T; clamp to the caller's bound so a
        # later chunk cannot report a hit beyond the original finite t_max
        t_bound = jnp.minimum(best.t, t_bound)
    return best


def _zero_cotangent(x):
    # float0 cotangents for integer/bool primals, zeros for float primals
    if jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.zeros_like(x)
    return np.zeros(x.shape, jax.dtypes.float0)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _intersect_detached(method, bvh, ray_o, ray_d, t_max, active):
    return _dispatch(method, bvh, ray_o, ray_d, t_max, active, any_hit=False)


def _intersect_fwd(method, bvh, ray_o, ray_d, t_max, active):
    return (_intersect_detached(method, bvh, ray_o, ray_d, t_max, active),
            (bvh, ray_o, ray_d, t_max, active))


def _intersect_bwd(method, res, _g):
    # Traversal is non-differentiable by design: hits are fixed sample
    # decisions (SURVEY.md §7.6); gradients flow only through shading.
    return tuple(jax.tree.map(_zero_cotangent, r) for r in res)


_intersect_detached.defvjp(_intersect_fwd, _intersect_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _occluded_detached(method, bvh, ray_o, ray_d, t_max, active):
    return _dispatch(method, bvh, ray_o, ray_d, t_max, active,
                     any_hit=True).hit


def _occluded_fwd(method, bvh, ray_o, ray_d, t_max, active):
    return (_occluded_detached(method, bvh, ray_o, ray_d, t_max, active),
            (bvh, ray_o, ray_d, t_max, active))


_occluded_detached.defvjp(_occluded_fwd, _intersect_bwd)


def _full_mask(ray_o, active):
    if active is None:
        return jnp.ones(ray_o.shape[:1], bool)
    return active


def intersect(bvh: BVHArrays, ray_o, ray_d, t_max=BIG_T, active=None,
              method: str | None = None) -> Hit:
    """Closest-hit query for a batch of rays.

    ray_o, ray_d: (R, 3); active: optional (R,) bool — inactive rays skip
    traversal and report a miss.  Equivalent of ``Bvh::intersect``
    (scene/src/bvh.rs:344-444) + ``Scene::intersect`` (scene.rs:80-90).
    Non-differentiable (custom zero-vjp): the traversal is detached so
    reverse-mode flows through shading only.

    method: "bvh" (stack while_loop), "brute" (dense blocks, XLA),
    "pallas" (dense blocks, VMEM-resident kernel) or None = auto: BVH on
    CPU, dense on accelerators (override with env TPT_TRAVERSAL).

    Precision note: the production pallas path uses plain-f32 hit tests
    (the MXU unit-triangle transform form); exact-sign watertight edge
    semantics (Dekker-compensated shear test, matching this module's
    ``intersect_triangle`` and the reference's f64 fallback) are opt-in
    via TPT_PRECISE_TRACE=1 — they cost ~3x and the statistical
    agreement gate in tests/test_bvh.py bounds the default's deviation.
    """
    return _intersect_detached(method or _pick_method(bvh), bvh, ray_o,
                               ray_d, jnp.asarray(t_max),
                               _full_mask(ray_o, active))


def intersect_p(bvh: BVHArrays, ray_o, ray_d, t_max, active=None,
                method: str | None = None) -> jnp.ndarray:
    """Occlusion (any-hit) query; returns (R,) bool.

    Equivalent of ``Bvh::intersect_p`` (scene/src/bvh.rs:450-513).
    """
    return _occluded_detached(method or _pick_method(bvh), bvh, ray_o,
                              ray_d, jnp.asarray(t_max),
                              _full_mask(ray_o, active))


def intersect_v3(bvh: BVHArrays, ray_o, ray_d, t_max=BIG_T, active=None,
                 method: str | None = None) -> Hit:
    """``intersect`` for component-form (V3) rays — the SoA hot path.

    Stacks the components once at the kernel boundary (a single (R, 3)
    materialization; the pallas path immediately repacks into its (R, 8)
    ray record)."""
    from ..utils.vec import v3_stack
    return intersect(bvh, v3_stack(ray_o), v3_stack(ray_d), t_max,
                     active=active, method=method)


def intersect_p_v3(bvh: BVHArrays, ray_o, ray_d, t_max, active=None,
                   method: str | None = None) -> jnp.ndarray:
    """``intersect_p`` for component-form (V3) rays."""
    from ..utils.vec import v3_stack
    return intersect_p(bvh, v3_stack(ray_o), v3_stack(ray_d), t_max,
                       active=active, method=method)


# ---------------------------------------------------------------------------
# Composite scene queries: main flattened soup + instanced mesh groups.
# ---------------------------------------------------------------------------

def _inst_rays(group, o3, d3):
    """Transform V3 rays into every instance's object space.

    Directions stay UNNORMALIZED so the ray parameter t is identical in
    object and render space (affine maps preserve the parameterization).
    Returns stacked (I*R, 3) arrays.
    """
    from ..utils.vec import V3
    os_, ds_ = [], []
    n_inst = group.inv.shape[0]
    for i in range(n_inst):
        m = group.inv[i]
        o = V3(m[0] * o3.x + m[1] * o3.y + m[2] * o3.z + m[9],
               m[3] * o3.x + m[4] * o3.y + m[5] * o3.z + m[10],
               m[6] * o3.x + m[7] * o3.y + m[8] * o3.z + m[11])
        d = V3(m[0] * d3.x + m[1] * d3.y + m[2] * d3.z,
               m[3] * d3.x + m[4] * d3.y + m[5] * d3.z,
               m[6] * d3.x + m[7] * d3.y + m[8] * d3.z)
        os_.append(o)
        ds_.append(d)
    o_all = jnp.stack([jnp.concatenate([v.x for v in os_]),
                       jnp.concatenate([v.y for v in os_]),
                       jnp.concatenate([v.z for v in os_])], axis=1)
    d_all = jnp.stack([jnp.concatenate([v.x for v in ds_]),
                       jnp.concatenate([v.y for v in ds_]),
                       jnp.concatenate([v.z for v in ds_])], axis=1)
    return o_all, d_all


def _inst_active(group, o3, d3, t_bound, active):
    """Per-instance world-AABB pre-cull -> (I*R,) active mask."""
    acts = []
    inv_dx = 1.0 / d3.x
    inv_dy = 1.0 / d3.y
    inv_dz = 1.0 / d3.z
    n_inst = group.inv.shape[0]
    for i in range(n_inst):
        tn = jnp.full_like(o3.x, -jnp.inf)
        tf = jnp.full_like(o3.x, jnp.inf)
        for a, (oc, inv) in enumerate(((o3.x, inv_dx), (o3.y, inv_dy),
                                       (o3.z, inv_dz))):
            lo = (group.aabb_min[i, a] - oc) * inv
            hi = (group.aabb_max[i, a] - oc) * inv
            tn = jnp.maximum(tn, jnp.minimum(lo, hi))
            tf = jnp.minimum(tf, jnp.maximum(lo, hi))
        hit = (tn <= tf) & (tf > 0.0) & (tn < t_bound)
        acts.append(hit if active is None else (active & hit))
    return jnp.concatenate(acts)


def intersect_scene(scene, ray_o, ray_d, t_max=BIG_T, active=None) -> Hit:
    """Closest hit against the whole scene: main soup + instanced groups.

    ray_o/ray_d: V3 (component) rays; returns a composite Hit whose tri
    ids encode (group, instance, canonical tri) past the main soup (see
    scene/types.InstancedGroup).  One batched kernel invocation per group
    covers ALL of its instances (instance-culled lanes ride as dead rays).
    """
    from ..utils.vec import v3_stack
    r = ray_o.x.shape[0]
    best = intersect(scene.bvh, v3_stack(ray_o), v3_stack(ray_d), t_max,
                     active=active)
    base = scene.bvh.tri9.shape[0]
    t0 = jnp.broadcast_to(jnp.asarray(t_max, ray_o.x.dtype), (r,))
    for g in scene.instanced:
        n_inst = g.inv.shape[0]
        tc = g.bvh.tri9.shape[0]
        # missing rays carry t = BIG_T; clamp to the caller's bound so the
        # instance pass cannot report hits beyond a finite t_max
        bound = jnp.minimum(best.t, t0)
        o_all, d_all = _inst_rays(g, ray_o, ray_d)
        act = _inst_active(g, ray_o, ray_d, bound, active)
        t_all = jnp.tile(bound, n_inst)
        h = intersect(g.bvh, o_all, d_all, t_all, active=act)
        # min over instances
        for i in range(n_inst):
            hi = jax.tree.map(lambda x: x[i * r:(i + 1) * r], h)
            better = hi.hit & (hi.t < best.t)
            best = Hit(t=jnp.where(better, hi.t, best.t),
                       tri=jnp.where(better, base + i * tc + hi.tri,
                                     best.tri),
                       b1=jnp.where(better, hi.b1, best.b1),
                       b2=jnp.where(better, hi.b2, best.b2),
                       hit=best.hit | better)
        base += n_inst * tc
    return best


def intersect_p_scene(scene, ray_o, ray_d, t_max, active=None) -> jnp.ndarray:
    """Occlusion against the whole scene (main soup + instances)."""
    from ..utils.vec import v3_stack
    occ = intersect_p(scene.bvh, v3_stack(ray_o), v3_stack(ray_d), t_max,
                      active=active)
    for g in scene.instanced:
        n_inst = g.inv.shape[0]
        o_all, d_all = _inst_rays(g, ray_o, ray_d)
        act = _inst_active(g, ray_o, ray_d, t_max, active)
        act = act & ~jnp.tile(occ, n_inst)
        t_all = jnp.tile(jnp.broadcast_to(jnp.asarray(t_max, o_all.dtype),
                                          occ.shape), n_inst)
        o_i = intersect_p(g.bvh, o_all, d_all, t_all, active=act)
        occ = occ | jnp.any(o_i.reshape(n_inst, -1), axis=0)
    return occ


def intersect_brute(p0, p1, p2, ray_o, ray_d, t_max=BIG_T) -> Hit:
    """O(R*T) reference oracle used by the BVH equivalence tests."""
    def per_ray(o, d):
        t, b1, b2, h = intersect_triangle(o[None, :], d[None, :], p0, p1, p2,
                                          jnp.asarray(t_max))
        t = jnp.where(h, t, BIG_T)
        i = jnp.argmin(t)
        return t[i], jnp.where(h[i], i, -1).astype(jnp.int32), b1[i], b2[i], h[i]

    t, tri, b1, b2, h = jax.vmap(per_ray)(ray_o, ray_d)
    return Hit(t=t, tri=tri, b1=b1, b2=b2, hit=h)
