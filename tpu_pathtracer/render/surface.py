"""Surface interactions: gather + interpolate hit attributes (true SoA).

Equivalent of the reference's per-hit ``SurfaceInteraction`` construction
inside the mesh BvhItem (scene/src/geometry/impls/triangle_mesh.rs:42-110):
barycentric interpolation of shading normal / uv, orthogonalized tangent,
geometric normal from the edge cross product — all as batched gathers after
traversal.  Two row gathers feed everything: the packed vertex row
(bvh.tri9) and the packed attribute row (scene.tri_attr); every derived
quantity is then carried as (R,) components (utils/vec.py) so the
interpolation chain runs at full VPU lane width.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..scene.types import SceneData
from ..utils.vec import (V2, V3, cross3, dot3, generate_tangent3, normalize3,
                         orthogonalize3, sel, v3_unstack)


class Interaction(NamedTuple):
    """Batched surface interaction (R rays; masked by ``valid``)."""
    valid: jnp.ndarray       # (R,) bool — ray hit something
    position: V3             # render space
    geo_n: V3                # geometric normal
    shading_n: V3            # interpolated vertex normal
    tangent: V3              # orthogonalized tangent
    uv: V2
    mat_id: jnp.ndarray      # (R,) i32
    light_id: jnp.ndarray    # (R,) i32 area-light row or -1
    tri: jnp.ndarray         # (R,) i32 triangle id (leaf order)
    t: jnp.ndarray           # (R,) hit distance
    wo: V3                   # direction back along the ray


def _attrs_at(vrow, arow, b0, b1, b2):
    """Interpolate one (vertex-row, attribute-row) gather pair -> fields."""
    p0 = v3_unstack(vrow[:, 0:3])
    p1 = v3_unstack(vrow[:, 3:6])
    p2 = v3_unstack(vrow[:, 6:9])
    position = p0 * b0 + p1 * b1 + p2 * b2
    geo_n = normalize3(cross3(p1 - p0, p2 - p0))

    n0 = v3_unstack(arow[:, 0:3])
    n1 = v3_unstack(arow[:, 3:6])
    n2 = v3_unstack(arow[:, 6:9])
    shading_n = normalize3(n0 * b0 + n1 * b1 + n2 * b2)
    # degenerate interpolated normal -> fall back to the geometric normal
    bad_n = dot3(shading_n, shading_n) < 0.5
    shading_n = sel(bad_n, geo_n, shading_n)

    uv = V2(arow[:, 9] * b0 + arow[:, 11] * b1 + arow[:, 13] * b2,
            arow[:, 10] * b0 + arow[:, 12] * b1 + arow[:, 14] * b2)
    raw_t = v3_unstack(arow[:, 15:18])
    return position, geo_n, shading_n, uv, raw_t


def make_interaction(scene: SceneData, hit, ray_o: V3, ray_d: V3
                     ) -> Interaction:
    """Gather per-triangle attributes at the hit and interpolate.

    Composite hits from instanced groups (tri id past the main soup)
    decode per group: gather the CANONICAL object-space rows, transform
    positions by the instance's forward affine and normals/tangents by
    its linear part (normals via the inverse-transpose = inv rows read
    transposed), then mask-merge with the main-soup result.
    """
    tri = jnp.maximum(hit.tri, 0)
    b1 = hit.b1
    b2 = hit.b2
    b0 = 1.0 - b1 - b2

    n_main = scene.bvh.tri9.shape[0]
    tri_main = jnp.minimum(tri, n_main - 1)
    vrow = scene.bvh.tri9[tri_main]                  # (R, 9) single gather
    arow = scene.tri_attr[tri_main]                  # (R, 18) single gather
    position, geo_n, shading_n, uv, raw_t = _attrs_at(vrow, arow, b0, b1, b2)
    mat_id = scene.tri_mat[tri_main]
    light_id = scene.tri_light[tri_main]

    base = n_main
    for g in scene.instanced:
        n_inst = g.inv.shape[0]
        tc = g.bvh.tri9.shape[0]
        in_g = (tri >= base) & (tri < base + n_inst * tc)
        local = jnp.clip(tri - base, 0, n_inst * tc - 1)
        inst = local // tc
        tl = local % tc
        vr = g.bvh.tri9[jnp.where(in_g, tl, 0)]
        ar = g.tri_attr[jnp.where(in_g, tl, 0)]
        pos_o, _, sn_o, uv_g, rt_o = _attrs_at(vr, ar, b0, b1, b2)
        f = g.fwd[inst]                              # (R, 12) row gather
        iv = g.inv[inst]

        def lin(m, v, c0, c1, c2):
            return V3(m[:, c0[0]] * v.x + m[:, c0[1]] * v.y + m[:, c0[2]] * v.z,
                      m[:, c1[0]] * v.x + m[:, c1[1]] * v.y + m[:, c1[2]] * v.z,
                      m[:, c2[0]] * v.x + m[:, c2[1]] * v.y + m[:, c2[2]] * v.z)

        rows = ((0, 1, 2), (3, 4, 5), (6, 7, 8))
        pos_g = lin(f, pos_o, *rows) + V3(f[:, 9], f[:, 10], f[:, 11])
        # geometric normal from the WORLD-space edges (matches the
        # flattened build bit-for-distribution)
        p0w = lin(f, v3_unstack(vr[:, 0:3]), *rows) + V3(f[:, 9], f[:, 10], f[:, 11])
        p1w = lin(f, v3_unstack(vr[:, 3:6]), *rows) + V3(f[:, 9], f[:, 10], f[:, 11])
        p2w = lin(f, v3_unstack(vr[:, 6:9]), *rows) + V3(f[:, 9], f[:, 10], f[:, 11])
        gn_g = normalize3(cross3(p1w - p0w, p2w - p0w))
        # normals: inverse-transpose = inv linear part read transposed
        cols = ((0, 3, 6), (1, 4, 7), (2, 5, 8))
        sn_g = normalize3(lin(iv, sn_o, *cols))
        tan_g = lin(f, rt_o, *rows)

        position = sel(in_g, pos_g, position)
        geo_n = sel(in_g, gn_g, geo_n)
        shading_n = sel(in_g, sn_g, shading_n)
        uv = sel(in_g, uv_g, uv)
        raw_t = sel(in_g, tan_g, raw_t)
        mat_id = jnp.where(in_g, g.mat_id[inst], mat_id)
        light_id = jnp.where(in_g, -1, light_id)
        base += n_inst * tc

    # orthogonalize the per-triangle tangent against the shading normal
    # (triangle_mesh.rs:92-104); fall back where they are parallel
    t_proj = raw_t - shading_n * dot3(raw_t, shading_n)
    parallel = dot3(t_proj, t_proj) < 1e-12
    tangent = sel(parallel, generate_tangent3(shading_n),
                  orthogonalize3(raw_t, shading_n))

    return Interaction(
        valid=hit.hit,
        position=position,
        geo_n=geo_n,
        shading_n=shading_n,
        tangent=tangent,
        uv=uv,
        mat_id=mat_id,
        light_id=light_id,
        tri=tri,
        t=hit.t,
        wo=-ray_d,
    )
