"""Compiled scene representation: frozen pytrees of device arrays.

TPU-native replacement for the reference's object graph
(``Scene<Id>`` owning ``Vec<Box<dyn Primitive>>`` + ``Arc<dyn Material>``,
scene/src/scene.rs:36-240): a scene *compiles* to

  * ``SceneData``  — a pytree of jnp arrays (traced through jit), and
  * ``SceneMeta``  — a small frozen, hashable record of static facts
    (counts, which material kinds exist, texture shapes), passed as a
    static argument so the integrator specializes per scene.

Materials become rows of a tagged SoA table (``MaterialTable``) instead of
trait objects; spectra become rows of a dense ``(K, 470)`` bank; lights
become a typed SoA table plus an emissive-triangle CDF.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from ..ops.trace import BVHArrays

# material kind tags (mat_type column)
MAT_LAMBERT = 0      # ref: scene/src/material/impls/lambert_material.rs
MAT_METAL = 1        # ref: metal_material.rs (ConductorBsdf)
MAT_GLASS = 2        # ref: glass_material.rs (DielectricBsdf, measured eta)
MAT_PLASTIC = 3      # ref: plastic_material.rs (constant-eta dielectric + tint)
MAT_PBR = 4          # ref: simple_pbr_material.rs (schlick metal + dielectric mix)
MAT_CLEARCOAT = 5    # ref: simple_pbr_clearcoat_material.rs
MAT_EMISSIVE = 6     # ref: emissive_material.rs (UniformEdf)

MAT_NAMES = {
    MAT_LAMBERT: "lambert", MAT_METAL: "metal", MAT_GLASS: "glass",
    MAT_PLASTIC: "plastic", MAT_PBR: "pbr", MAT_CLEARCOAT: "clearcoat",
    MAT_EMISSIVE: "emissive",
}

# light kind tags
LIGHT_AREA = 0       # emissive mesh primitive (emissive_triangle_mesh.rs)
LIGHT_POINT = 1      # point_light.rs
LIGHT_SPOT = 2       # spot_light.rs
LIGHT_DIRECTIONAL = 3  # directional_light.rs
LIGHT_ENV = 4        # environment_light.rs


class MaterialTable(NamedTuple):
    """One row per material instance; unused columns hold zeros/-1.

    Spectral color parameters are resolved at compile time to sigmoid-poly
    coefficients (constant colors) or texture ids (textured); physical
    spectra (metal eta/k, glass eta, emission SPD) are rows of
    ``SceneData.spectra`` (dense 470-bin bank).
    """
    mat_type: jnp.ndarray       # (M,) i32
    base_coeff: jnp.ndarray     # (M, 3) sigmoid coeffs of base color/albedo/tint
    base_tex: jnp.ndarray       # (M,) i32 rgb texture id, -1 = use base_coeff
    roughness: jnp.ndarray      # (M,) f32
    roughness_tex: jnp.ndarray  # (M,) i32 gray texture id or -1
    metallic: jnp.ndarray       # (M,) f32
    metallic_tex: jnp.ndarray   # (M,) i32
    normal_tex: jnp.ndarray     # (M,) i32 normal-map texture id or -1
    eta_row: jnp.ndarray        # (M,) i32 spectra-bank row of eta, -1 = const_eta
    k_row: jnp.ndarray          # (M,) i32 spectra-bank row of k (metals), -1
    const_eta: jnp.ndarray      # (M,) f32 constant IOR (plastic/pbr)
    thin: jnp.ndarray           # (M,) i32 thin-surface dielectric flag
    emission_row: jnp.ndarray   # (M,) i32 spectra-bank row of radiance SPD, -1
    emission_scale: jnp.ndarray  # (M,) f32 emissive intensity multiplier
    emission_tex: jnp.ndarray   # (M,) i32 rgb texture for radiance or -1
    coat_tint_coeff: jnp.ndarray   # (M, 3) clearcoat tint sigmoid coeffs
    coat_thickness: jnp.ndarray    # (M,) f32 (mm)
    coat_thickness_tex: jnp.ndarray  # (M,) i32
    coat_roughness: jnp.ndarray    # (M,) f32
    coat_eta: jnp.ndarray          # (M,) f32


class LightTable(NamedTuple):
    """One row per light primitive (SoA).

    Per-wavelength sampling weights are computed on device from these
    columns (phi(lambda), ref: light_sampler.rs:190-220).
    """
    light_type: jnp.ndarray     # (L,) i32
    position: jnp.ndarray       # (L, 3) point/spot position (render space)
    direction: jnp.ndarray      # (L, 3) spot axis (+Z convention) / directional dir
    spectrum_row: jnp.ndarray   # (L,) i32 row in spectra bank
    intensity: jnp.ndarray      # (L,) f32 scalar intensity
    cos_inner: jnp.ndarray      # (L,) f32 spot cone cos(inner angle)
    cos_outer: jnp.ndarray      # (L,) f32 spot cone cos(outer angle)
    angle_inner: jnp.ndarray    # (L,) f32 spot inner angle (rad, for phi)
    angle_outer: jnp.ndarray    # (L,) f32
    phi_scale: jnp.ndarray      # (L,) f32 type-specific power factor:
    #   area: area_sum; point: 4*pi*I; spot: analytic cone integral * I;
    #   directional: pi*r_world^2*I (bounding-sphere cross-section,
    #   ref: directional_light.rs:79-93); env: 4*pi^2*r^2 approx.
    area_first_tri: jnp.ndarray  # (L,) i32 first row in area_tri_* arrays (-1)
    area_n_tris: jnp.ndarray     # (L,) i32
    area_total: jnp.ndarray      # (L,) f32 total world-space area
    mat_id: jnp.ndarray          # (L,) i32 emissive material row (area lights)


class EnvMap(NamedTuple):
    """Equirect HDR environment (ref: environment_light.rs:18-351)."""
    rgb: jnp.ndarray            # (H, W, 3) linear rgb
    # luminance*sin(theta) two-stage CDFs for importance sampling (:165-215)
    marginal_cdf: jnp.ndarray   # (H,) row CDF
    conditional_cdf: jnp.ndarray  # (H, W) per-row column CDF
    avg_rgb: jnp.ndarray        # (3,) sin(theta)-weighted average color (phi)
    rotation: jnp.ndarray       # () f32 azimuth rotation (radians)


class InstancedGroup(NamedTuple):
    """One canonical mesh shared by I transformed instances.

    TPU-native two-level acceleration (ref: the per-mesh bottom BVH under
    transformed primitives, scene/src/primitive/bvh.rs:111-166 +
    geometry/impls/triangle_mesh.rs:245-253): the canonical geometry is
    stored ONCE in object space with its own block/BVH tables; at trace
    time rays transform into object space per instance (direction left
    unnormalized so the ray parameter t stays world-parametric) and all
    instances trace as one batched kernel invocation, pre-culled by the
    per-instance world AABBs.  Composite triangle ids
    ``n_main + base + inst*Tc + tri`` route hits back through the decode
    in render/surface.py.

    Instanced meshes are non-emissive (builder-enforced): area-light
    sampling stays on the flattened main soup.
    """
    bvh: BVHArrays              # canonical object-space mesh
    tri_attr: jnp.ndarray       # (Tc, 18) canonical shading attributes
    fwd: jnp.ndarray            # (I, 12) object->render affine rows [A|t]
    inv: jnp.ndarray            # (I, 12) render->object affine rows [A|t]
    mat_id: jnp.ndarray         # (I,) material row per instance
    aabb_min: jnp.ndarray       # (I, 3) world (render-space) instance AABB
    aabb_max: jnp.ndarray       # (I, 3)


class SceneData(NamedTuple):
    """Everything the integrator needs, as device arrays (pytree)."""
    bvh: BVHArrays
    # packed per-triangle shading attributes in BVH leaf order:
    # [n0 n1 n2 | uv0 uv1 uv2 | tangent] = (T, 18).  One row gather feeds
    # the whole surface-interaction build (a (T, 18) row gather costs the
    # same as a (T, 3) one on TPU — the gathered row pads to 128 lanes
    # either way — so this replaces 7 gathers with 1)
    tri_attr: jnp.ndarray
    # per-triangle attributes in BVH leaf order
    tri_n0: jnp.ndarray         # (T, 3) vertex shading normals
    tri_n1: jnp.ndarray
    tri_n2: jnp.ndarray
    tri_uv0: jnp.ndarray        # (T, 2)
    tri_uv1: jnp.ndarray
    tri_uv2: jnp.ndarray
    tri_tangent: jnp.ndarray    # (T, 3) per-triangle UV tangent
    tri_mat: jnp.ndarray        # (T,) i32 material row
    tri_light: jnp.ndarray      # (T,) i32 area-light row or -1
    materials: MaterialTable
    lights: LightTable
    spectra: jnp.ndarray        # (K, 470) dense spectra bank
    # flattened emissive-triangle table (area lights)
    area_tri: jnp.ndarray       # (AT,) i32 triangle id (leaf order)
    area_tri_area: jnp.ndarray  # (AT,) f32 world-space area
    area_tri_cdf: jnp.ndarray   # (AT,) f32 per-light CDF (normalized within light)
    textures: Tuple[jnp.ndarray, ...]  # each (H, W, C) f32, pre-linearized
    env: Optional[EnvMap]
    world_radius: jnp.ndarray   # () f32 scene bounding-sphere radius
    # rgb2spec table (device constants: textured albedo + env spectral upsampling)
    rs_zn: jnp.ndarray          # (res,)
    rs_coeffs: jnp.ndarray      # (3, res, res, res, 3)
    # instanced mesh groups (possibly empty; static length)
    instanced: Tuple["InstancedGroup", ...] = ()


class SceneMeta(NamedTuple):
    """Static (hashable) facts the integrator specializes on."""
    mat_types: Tuple[int, ...]      # mat_type per material row
    light_types: Tuple[int, ...]    # light_type per light row
    n_tris: int
    has_env: bool
    texture_shapes: Tuple[Tuple[int, ...], ...]
    # largest triangle count over all area lights: sizes the static binary
    # search in the NEE area-point sampler (any count works; no silent cap)
    max_area_tris: int = 1
    # any material has a textured emission (gates the Le texture fetch)
    has_emission_tex: bool = False

    @property
    def present_mat_kinds(self) -> Tuple[int, ...]:
        return tuple(sorted(set(self.mat_types)))

    @property
    def n_lights(self) -> int:
        return len(self.light_types)
