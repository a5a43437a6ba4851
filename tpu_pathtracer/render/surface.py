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


def make_interaction(scene: SceneData, hit, ray_o: V3, ray_d: V3
                     ) -> Interaction:
    """Gather per-triangle attributes at the hit and interpolate."""
    tri = jnp.maximum(hit.tri, 0)
    b1 = hit.b1
    b2 = hit.b2
    b0 = 1.0 - b1 - b2

    vrow = scene.bvh.tri9[tri]                       # (R, 9) single gather
    p0 = v3_unstack(vrow[:, 0:3])
    p1 = v3_unstack(vrow[:, 3:6])
    p2 = v3_unstack(vrow[:, 6:9])
    position = p0 * b0 + p1 * b1 + p2 * b2

    geo_n = normalize3(cross3(p1 - p0, p2 - p0))

    arow = scene.tri_attr[tri]                       # (R, 18) single gather
    n0 = v3_unstack(arow[:, 0:3])
    n1 = v3_unstack(arow[:, 3:6])
    n2 = v3_unstack(arow[:, 6:9])
    shading_n = normalize3(n0 * b0 + n1 * b1 + n2 * b2)
    # degenerate interpolated normal -> fall back to the geometric normal
    bad_n = dot3(shading_n, shading_n) < 0.5
    shading_n = sel(bad_n, geo_n, shading_n)

    uv = V2(arow[:, 9] * b0 + arow[:, 11] * b1 + arow[:, 13] * b2,
            arow[:, 10] * b0 + arow[:, 12] * b1 + arow[:, 14] * b2)

    # orthogonalize the per-triangle tangent against the shading normal
    # (triangle_mesh.rs:92-104); fall back where they are parallel
    raw_t = v3_unstack(arow[:, 15:18])
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
        mat_id=scene.tri_mat[tri],
        light_id=scene.tri_light[tri],
        tri=tri,
        t=hit.t,
        wo=-ray_d,
    )
