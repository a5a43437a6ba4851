"""Surface interactions: gather + interpolate hit attributes (SoA).

Equivalent of the reference's per-hit ``SurfaceInteraction`` construction
inside the mesh BvhItem (scene/src/geometry/impls/triangle_mesh.rs:42-110):
barycentric interpolation of shading normal / uv, orthogonalized tangent,
geometric normal from the edge cross product — all as batched gathers after
traversal (the traversal loop itself only touches positions).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..scene.types import SceneData
from ..utils.math import cross, normalize, orthogonalize, generate_tangent, dot


class Interaction(NamedTuple):
    """Batched surface interaction (R rays; masked by ``valid``)."""
    valid: jnp.ndarray       # (R,) bool — ray hit something
    position: jnp.ndarray    # (R, 3) render space
    geo_n: jnp.ndarray       # (R, 3) geometric normal
    shading_n: jnp.ndarray   # (R, 3) interpolated vertex normal
    tangent: jnp.ndarray     # (R, 3) orthogonalized tangent
    uv: jnp.ndarray          # (R, 2)
    mat_id: jnp.ndarray      # (R,) i32
    light_id: jnp.ndarray    # (R,) i32 area-light row or -1
    tri: jnp.ndarray         # (R,) i32 triangle id (leaf order)
    t: jnp.ndarray           # (R,) hit distance
    wo: jnp.ndarray          # (R, 3) direction back along the ray


def make_interaction(scene: SceneData, hit, ray_o, ray_d) -> Interaction:
    """Gather per-triangle attributes at the hit and interpolate."""
    tri = jnp.maximum(hit.tri, 0)
    b1 = hit.b1
    b2 = hit.b2
    b0 = 1.0 - b1 - b2

    p0 = scene.bvh.p0[tri]
    p1 = scene.bvh.p1[tri]
    p2 = scene.bvh.p2[tri]
    position = b0[:, None] * p0 + b1[:, None] * p1 + b2[:, None] * p2

    geo_n = normalize(cross(p1 - p0, p2 - p0))

    n0 = scene.tri_n0[tri]
    n1 = scene.tri_n1[tri]
    n2 = scene.tri_n2[tri]
    shading_n = normalize(b0[:, None] * n0 + b1[:, None] * n1 + b2[:, None] * n2)
    # degenerate interpolated normal -> fall back to the geometric normal
    bad_n = dot(shading_n, shading_n) < 0.5
    shading_n = jnp.where(bad_n[:, None], geo_n, shading_n)

    uv0 = scene.tri_uv0[tri]
    uv1 = scene.tri_uv1[tri]
    uv2 = scene.tri_uv2[tri]
    uv = b0[:, None] * uv0 + b1[:, None] * uv1 + b2[:, None] * uv2

    # orthogonalize the per-triangle tangent against the shading normal
    # (triangle_mesh.rs:92-104); fall back where they are parallel
    raw_t = scene.tri_tangent[tri]
    t_proj = raw_t - dot(raw_t, shading_n, keepdims=True) * shading_n
    parallel = dot(t_proj, t_proj) < 1e-12
    tangent = jnp.where(parallel[:, None], generate_tangent(shading_n),
                        orthogonalize(raw_t, shading_n))

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
