"""Vector / transform / intersection math on SoA arrays.

TPU-native equivalent of the reference ``math`` crate (math/src/lib.rs:5-21).
The reference encodes coordinate systems in phantom types
(math/src/coordinate_system.rs:4-50); here arrays are untyped and the
coordinate-space discipline lives in naming conventions (``*_w`` world,
``*_r`` render, ``*_l`` local, ``*_t`` shading-tangent) plus the scene
compiler, which bakes all geometry into render space once so the hot path
never changes basis except for the (render <-> shading tangent) rotation.

Everything operates on ``(..., 3)`` f32 arrays and is jit/vmap/grad safe.
"""
from __future__ import annotations

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Basic vector ops
# ---------------------------------------------------------------------------

def sum_last(x):
    """Sum over a SMALL static trailing axis, in component form.

    ``jnp.sum(x, -1)`` over a tiny minor axis lowers to a cross-lane
    shuffle reduce on TPU (~1-4 ms per fusion at 256k rays, measured —
    the single largest shading cost class); an unrolled slice+add is a
    plain elementwise fusion and effectively free."""
    n = x.shape[-1]
    out = x[..., 0]
    for k in range(1, n):
        out = out + x[..., k]
    return out


def mean_last(x):
    return sum_last(x) * (1.0 / x.shape[-1])


def max_last(x):
    n = x.shape[-1]
    out = x[..., 0]
    for k in range(1, n):
        out = jnp.maximum(out, x[..., k])
    return out


def select_lane(values, idx):
    """values (..., K) indexed per element by idx (...) -> (...).

    One-hot multiply-select instead of ``take_along_axis``: TPU XLA lowers
    per-element (multi-dim-indexed) gathers to a scalar loop (~10 ms for
    256k elements, measured), while compare+select is fused onto the VPU
    for free.  K must be small (it is O(K) work per element).  Small K
    unrolls to slice+where chains (no cross-lane reduce, see sum_last);
    large K keeps the single reduce op (unrolling 100s of slices bloats
    compile time more than the reduce costs).
    """
    k = values.shape[-1]
    if k <= 16:
        out = jnp.where(idx == 0, values[..., 0], 0)
        for i in range(1, k):
            out = jnp.where(idx == i, values[..., i], out)
        return out
    oh = idx[..., None] == jnp.arange(k, dtype=jnp.int32)
    return jnp.sum(jnp.where(oh, values, 0), axis=-1)


def select_axis(v, k):
    """v (..., 3) -> (...): component k (0/1/2) of each vector, gather-free."""
    return jnp.where(k == 0, v[..., 0], jnp.where(k == 1, v[..., 1],
                                                  v[..., 2]))


def dot(a, b, keepdims: bool = False):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def cross(a, b):
    return jnp.cross(a, b)


def length(v, keepdims: bool = False):
    return jnp.sqrt(jnp.maximum(dot(v, v, keepdims), 0.0))


def length_squared(v, keepdims: bool = False):
    return dot(v, v, keepdims)


def normalize(v, eps: float = 1e-20):
    return v * jnp.reciprocal(jnp.maximum(length(v, keepdims=True), eps))


def safe_acos(x):
    """NaN-free acos (ref: math/src/safe_math.rs:4-18)."""
    return jnp.arccos(jnp.clip(x, -1.0, 1.0))


def lerp(a, b, t):
    return a + (b - a) * t


def face_forward(n, v):
    """Flip n to the hemisphere of v."""
    return jnp.where(dot(n, v, keepdims=True) < 0.0, -n, n)


def orthogonalize(v, n):
    """Gram-Schmidt v against unit n, normalized
    (ref ``orthogonalize_vector``, math/src/vector.rs)."""
    return normalize(v - dot(v, n, keepdims=True) * n)


def generate_tangent(n):
    """Any unit tangent orthogonal to unit n (branchless Frisvad-style).

    Used where the mesh provides no UV-derived tangent
    (ref ``generate_tangent``, math/src/normal.rs:9-91).
    """
    sign = jnp.where(n[..., 2:3] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2:3])
    b = n[..., 0:1] * n[..., 1:2] * a
    return jnp.concatenate(
        [1.0 + sign * n[..., 0:1] ** 2 * a, sign * b, -sign * n[..., 0:1]], axis=-1)


# ---------------------------------------------------------------------------
# Shading frames: render-space <-> tangent-space rotations
# ---------------------------------------------------------------------------

def make_frame(n, t):
    """Build an orthonormal frame (t', b, n) from unit normal + raw tangent.

    Returns a (..., 3, 3) matrix whose ROWS are (tangent, bitangent, normal):
    ``frame @ v_render = v_tangent`` with +Z = normal, matching the
    reference's ``Transform::from_shading_normal_tangent``
    (math/src/transform.rs:186-214).
    """
    t = orthogonalize(t, n)
    b = cross(n, t)
    return jnp.stack([t, b, n], axis=-2)


def to_frame(frame, v):
    """World/render -> tangent space: rows-as-basis matmul."""
    return jnp.einsum("...ij,...j->...i", frame, v)


def from_frame(frame, v):
    """Tangent -> world/render (transpose = inverse for rotations)."""
    return jnp.einsum("...ji,...j->...i", frame, v)


def frame_from_normal_map(n_shading, t, n_map):
    """Perturb a shading frame by a tangent-space normal map sample.

    Mirrors ``Transform::from_normal_map`` (math/src/transform.rs:216-245):
    build the vertex frame from (n_shading, t), rotate the sampled normal
    into render space, then Gram-Schmidt a new frame around it keeping the
    original tangent direction.
    """
    base = make_frame(n_shading, t)
    n_world = from_frame(base, normalize(n_map))
    return make_frame(n_world, t)


# ---------------------------------------------------------------------------
# 4x4 homogeneous transforms (host-side scene compilation)
# ---------------------------------------------------------------------------

def transform_point(m, p):
    """Apply (..., 4, 4) @ point (..., 3)."""
    return jnp.einsum("...ij,...j->...i", m[..., :3, :3], p) + m[..., :3, 3]


def transform_vector(m, v):
    return jnp.einsum("...ij,...j->...i", m[..., :3, :3], v)


def transform_normal(m_inv, n):
    """Normals transform by the inverse-transpose (ref: transform.rs:43-51)."""
    return jnp.einsum("...ji,...j->...i", m_inv[..., :3, :3], n)


# ---------------------------------------------------------------------------
# Ray-triangle intersection (watertight, PBRT-style)
# ---------------------------------------------------------------------------

def _diff_of_products(a, b, c, d):
    """a*b - c*d with Dekker/TwoProduct compensation (f32-exact sign).

    The reference handles the e==0 ambiguity of the watertight test by
    recomputing edge functions in f64 (math/src/ray.rs:101-121).  TPUs have
    no fast f64, so we use the classic error-free split instead: each
    product is computed as (p, err) where err captures the rounding of p,
    and the difference is corrected by the error terms.  This restores
    watertightness along shared triangle edges (verified: axis-aligned view
    rays across a quad diagonal no longer leak).
    """
    split = 4097.0  # 2^12 + 1 for f32 Dekker splitting
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


def intersect_triangle(ray_o, ray_d, p0, p1, p2, t_max):
    """Watertight ray/triangle test, vectorized.

    Mirrors the reference's PBRT-style test (math/src/ray.rs:44-182):
    translate to ray origin, permute so |dz| is max axis, shear, signed edge
    functions, barycentric interpolation.  The reference's f64 fallback for
    ambiguous edge functions becomes a Dekker-compensated exact product
    (``_diff_of_products``) — same watertightness guarantee, TPU-friendly.

    Returns (t, b1, b2, hit) with shapes (...,). b1, b2 are the barycentric
    weights of p1, p2.
    """
    o = ray_o
    # translate vertices to ray-origin space
    p0t = p0 - o
    p1t = p1 - o
    p2t = p2 - o

    # permute axes so z has the largest |d| component
    d_abs = jnp.abs(ray_d)
    kz = jnp.argmax(d_abs, axis=-1)
    kx = (kz + 1) % 3
    ky = (kz + 2) % 3

    def permute(v):
        vx = select_axis(v, kx)[..., None]
        vy = select_axis(v, ky)[..., None]
        vz = select_axis(v, kz)[..., None]
        return jnp.concatenate([vx, vy, vz], axis=-1)

    d = permute(ray_d)
    p0t = permute(p0t)
    p1t = permute(p1t)
    p2t = permute(p2t)

    # shear to align ray with +z
    dz = d[..., 2]
    sx = -d[..., 0] / dz
    sy = -d[..., 1] / dz
    sz = 1.0 / dz
    p0x = p0t[..., 0] + sx * p0t[..., 2]
    p0y = p0t[..., 1] + sy * p0t[..., 2]
    p1x = p1t[..., 0] + sx * p1t[..., 2]
    p1y = p1t[..., 1] + sy * p1t[..., 2]
    p2x = p2t[..., 0] + sx * p2t[..., 2]
    p2y = p2t[..., 1] + sy * p2t[..., 2]

    # signed edge functions (error-compensated: exact sign at shared edges)
    e0 = _diff_of_products(p1x, p2y, p1y, p2x)
    e1 = _diff_of_products(p2x, p0y, p2y, p0x)
    e2 = _diff_of_products(p0x, p1y, p0y, p1x)

    same_side = ((e0 <= 0) & (e1 <= 0) & (e2 <= 0)) | ((e0 >= 0) & (e1 >= 0) & (e2 >= 0))
    det = e0 + e1 + e2
    det_ok = det != 0.0

    p0z = sz * p0t[..., 2]
    p1z = sz * p1t[..., 2]
    p2z = sz * p2t[..., 2]
    t_scaled = e0 * p0z + e1 * p1z + e2 * p2z

    # sign-consistent t bounds test before division
    neg_det = det < 0.0
    t_ok = jnp.where(
        neg_det,
        (t_scaled <= 0.0) & (t_scaled > t_max * det),
        (t_scaled >= 0.0) & (t_scaled < t_max * det))

    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    b0 = e0 * inv_det
    b1 = e1 * inv_det
    b2 = e2 * inv_det
    t = t_scaled * inv_det

    # conservative epsilon against self-intersection at t ~ 0 (the reference
    # computes a full gamma error bound, ray.rs:150-176; a fixed relative
    # epsilon achieves the same guard under our scene scale)
    hit = same_side & det_ok & t_ok & (t > 1e-6)
    return t, b1, b2, hit


def intersect_triangle_block(ray_o, ray_d, tri9, t_max):
    """Watertight ray x triangle-block test in component (SoA) form.

    Same math as ``intersect_triangle`` but restructured for the TPU VPU:
    rays broadcast along sublanes, triangles along lanes, every intermediate
    a 2-D (R, T) array — no (…, 3) minor axis, so Mosaic/XLA keep all 128
    lanes busy.  This is the building block of the gather-free brute-force /
    clustered traversal (the device this targets executes XLA gathers at
    ~0.5 GB/s, so the BVH's data-dependent loads lose to dense math by ~2
    orders of magnitude; see ops/trace.py).

    ray_o, ray_d: (R, 3); tri9: (T, 9) packed [p0 p1 p2]; t_max: (R,).
    Returns (t, b1, b2, hit), each (R, T).
    """
    # per-ray axis permutation (z = largest |d| component)
    d_abs = jnp.abs(ray_d)
    kz = jnp.argmax(d_abs, axis=-1)[:, None]              # (R, 1)
    kx = (kz + 1) % 3
    ky = (kz + 2) % 3

    def ray_comp(v, k):
        return select_axis(v, k[..., 0])[..., None]       # (R, 1)

    dx = ray_comp(ray_d, kx)
    dy = ray_comp(ray_d, ky)
    dz = ray_comp(ray_d, kz)
    ox = ray_comp(ray_o, kx)
    oy = ray_comp(ray_o, ky)
    oz = ray_comp(ray_o, kz)
    sx = -dx / dz                                          # (R, 1)
    sy = -dy / dz
    sz = 1.0 / dz

    def tri_comp(base, k):
        """Select triangle column (base + k) by per-ray axis k: (R, T)."""
        c0 = tri9[:, base + 0][None, :]
        c1 = tri9[:, base + 1][None, :]
        c2 = tri9[:, base + 2][None, :]
        return jnp.where(k == 0, c0, jnp.where(k == 1, c1, c2))

    t_maxc = t_max[:, None]
    # translated + permuted + sheared 2-D coordinates per vertex
    pxs, pys, pzs = [], [], []
    for v in range(3):
        base = 3 * v
        vx = tri_comp(base, kx) - ox
        vy = tri_comp(base, ky) - oy
        vz = tri_comp(base, kz) - oz
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

    neg_det = det < 0.0
    t_ok = jnp.where(
        neg_det,
        (t_scaled <= 0.0) & (t_scaled > t_maxc * det),
        (t_scaled >= 0.0) & (t_scaled < t_maxc * det))

    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    b1 = e1 * inv_det
    b2 = e2 * inv_det
    t = t_scaled * inv_det
    hit = same_side & det_ok & t_ok & (t > 1e-6)
    return t, b1, b2, hit


# ---------------------------------------------------------------------------
# AABB slab test
# ---------------------------------------------------------------------------

def intersect_aabb(ray_o, inv_d, bmin, bmax, t_max):
    """Slab test with precomputed 1/d (ref: math/src/bounds.rs:27-56).

    Returns (t_near, hit). Flat rays (inv_d = +-inf) handled by IEEE rules.
    """
    t0 = (bmin - ray_o) * inv_d
    t1 = (bmax - ray_o) * inv_d
    t_near = jnp.minimum(t0, t1)
    t_far = jnp.maximum(t0, t1)
    tn = jnp.max(t_near, axis=-1)
    tf = jnp.min(t_far, axis=-1)
    hit = (tn <= tf) & (tf > 0.0) & (tn < t_max)
    return tn, hit


# ---------------------------------------------------------------------------
# Misc integer helpers
# ---------------------------------------------------------------------------

def morton2(x, y):
    """Interleave 16-bit x, y into a 32-bit Morton code
    (ref: z_sobol_sampler.rs:55-66)."""
    def spread(v):
        v = v & jnp.uint32(0x0000ffff)
        v = (v ^ (v << 8)) & jnp.uint32(0x00ff00ff)
        v = (v ^ (v << 4)) & jnp.uint32(0x0f0f0f0f)
        v = (v ^ (v << 2)) & jnp.uint32(0x33333333)
        v = (v ^ (v << 1)) & jnp.uint32(0x55555555)
        return v
    return (spread(y.astype(jnp.uint32)) << 1) | spread(x.astype(jnp.uint32))
