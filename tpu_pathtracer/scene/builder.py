"""SceneBuilder: host-side scene description -> compiled SceneData pytree.

Replaces the reference's ``Scene`` facade + ``create_primitive`` factory +
``Scene::build`` (scene/src/scene.rs:36-240, primitive/repository.rs:43-170)
with a compile step: meshes and lights are described with plain Python
objects, then ``build(camera_position)`` bakes everything into flat device
arrays:

  * all meshes -> one global triangle SoA in *render space* (world minus
    camera position, the reference's Render space convention,
    math/src/coordinate_system.rs:16-24), reordered by one global SAH BVH
    (design note in scene/bvh.py on why one level, not two);
  * materials -> MaterialTable rows (constant colors pre-resolved to
    sigmoid-polynomial coefficients);
  * lights -> LightTable rows + flattened emissive-triangle CDFs
    (emissive_triangle_mesh.rs:36-57);
  * spectra -> dense (K, 470) bank (row 0 is always normalized D65).
"""
from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from .. import spectrum as spec
from ..spectrum import rgb2spec
from .bvh import build_bvh
from .mesh import Mesh
from ..ops.trace import pack_bvh
from .types import (LIGHT_AREA, LIGHT_DIRECTIONAL, LIGHT_ENV, LIGHT_POINT,
                    LIGHT_SPOT, MAT_CLEARCOAT, MAT_EMISSIVE, MAT_GLASS,
                    MAT_LAMBERT, MAT_METAL, MAT_PBR, MAT_PLASTIC, EnvMap,
                    InstancedGroup, LightTable, MaterialTable, SceneData,
                    SceneMeta)

# ---------------------------------------------------------------------------
# Texture + material descriptors (host-side scene description DSL)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class Texture:
    """An image parameter (ref: scene/src/texture/*).

    data: (H, W, C) float array.
    kind: "rgb" | "gray" | "normal".
    gamut / eotf: the COLOR METADATA of an rgb texture (ref
    TypedRgbTexture<G, E>, scene/src/texture/rgb_texture.rs:18-281).  The
    reference EOTF-inverts and gamut-types per texel LOOKUP (:48-66); here
    the scene compiler decodes the EOTF and converts to the scene's working
    gamut ONCE at build — pointwise per texel, so semantically identical
    and free at render time.  eotf="linear" means data is already linear.
    gray textures honor eotf only; normal maps ignore both.
    """
    data: np.ndarray
    kind: str = "rgb"
    gamut: str = "srgb"
    eotf: str = "linear"

    def __post_init__(self):
        self.data = np.asarray(self.data, np.float32)
        if self.data.ndim == 2:
            self.data = self.data[..., None]

    def decoded(self, scene_gamut) -> np.ndarray:
        """Linear data in the scene's working gamut (host-side, once)."""
        from .. import color as color_mod
        from ..color import eotf as eotf_mod
        import numpy as _np
        data = self.data
        if self.kind == "normal":
            return data
        if self.eotf != "linear":
            data = _np.asarray(eotf_mod.decode(data, self.eotf), _np.float32)
        if self.kind == "rgb" and self.gamut != scene_gamut.name:
            data = _np.asarray(color_mod.convert_gamut(
                data, color_mod.by_name(self.gamut), scene_gamut),
                _np.float32)
        return data


RGB = Tuple[float, float, float]
FloatParam = Union[float, Texture]
ColorParam = Union[RGB, Texture]


@dataclasses.dataclass
class Lambert:
    """Diffuse material (ref: lambert_material.rs:15-179)."""
    albedo: ColorParam = (0.8, 0.8, 0.8)
    normal: Optional[Texture] = None


@dataclasses.dataclass
class Metal:
    """Conductor with measured complex IOR (ref: metal_material.rs).

    kind: gold | silver | copper | aluminum | brass.
    """
    kind: str = "gold"
    roughness: FloatParam = 0.1
    normal: Optional[Texture] = None


@dataclasses.dataclass
class Glass:
    """Dielectric with measured dispersion (ref: glass_material.rs:15-232)."""
    kind: str = "bk7"   # bk7|baf10|fk51a|lasf9|sf5|sf10|sf11
    roughness: FloatParam = 0.0
    thin: bool = False


@dataclasses.dataclass
class Plastic:
    """Constant-eta dielectric with color tint (ref: plastic_material.rs)."""
    color: ColorParam = (0.8, 0.8, 0.8)
    roughness: FloatParam = 0.0
    eta: float = 1.5
    thin: bool = False


@dataclasses.dataclass
class Pbr:
    """Metallic/roughness PBR (ref: simple_pbr_material.rs:16-537)."""
    base_color: ColorParam = (0.8, 0.8, 0.8)
    metallic: FloatParam = 0.0
    roughness: FloatParam = 0.5
    eta: float = 1.5
    normal: Optional[Texture] = None


@dataclasses.dataclass
class Clearcoat:
    """PBR base + clearcoat layer (ref: simple_pbr_clearcoat_material.rs)."""
    base_color: ColorParam = (0.8, 0.8, 0.8)
    metallic: FloatParam = 0.0
    roughness: FloatParam = 0.5
    eta: float = 1.5
    normal: Optional[Texture] = None
    coat_tint: RGB = (1.0, 1.0, 1.0)
    coat_thickness: FloatParam = 1.0  # mm
    coat_roughness: float = 0.0
    coat_eta: float = 1.5


@dataclasses.dataclass
class Emissive:
    """Uniform EDF emitter (ref: emissive_material.rs:15-80).

    spectrum: dense (470,) SPD, an RGB triple (-> illuminant spectrum), or a
    Texture (radiance texture).
    """
    spectrum: Union[np.ndarray, RGB, Texture] = (1.0, 1.0, 1.0)
    intensity: float = 1.0


MaterialDesc = Union[Lambert, Metal, Glass, Plastic, Pbr, Clearcoat, Emissive]

_METAL_KINDS = {"gold": "au", "silver": "ag", "copper": "cu",
                "aluminum": "al", "brass": "cuzn"}


# ---------------------------------------------------------------------------
# Builder
# ---------------------------------------------------------------------------

class SceneBuilder:
    def __init__(self, table_res: int = 64, gamut: str = "srgb"):
        """``gamut``: the scene's working color space — material RGB values
        and (after conversion) textures are interpreted in it, and the
        RGB->spectrum table is fitted for it (ref ships 8 per-gamut table
        blobs, rgb_to_spec/src/lib.rs:1-32)."""
        from ..color import by_name as _gamut_by_name
        self.table_res = table_res
        self.gamut = _gamut_by_name(gamut)
        self._materials: List[MaterialDesc] = []
        self._meshes: List[Tuple[Mesh, int]] = []          # (mesh in world space, mat_id)
        self._instanced: List[Tuple[Mesh, List[Tuple[np.ndarray, int]]]] = []
        self._delta_lights: List[dict] = []
        self._env: Optional[dict] = None
        self._textures: List[Texture] = []

    # -- description API ----------------------------------------------------

    def add_material(self, desc: MaterialDesc) -> int:
        self._materials.append(desc)
        return len(self._materials) - 1

    def add_mesh(self, mesh: Mesh, material: int,
                 transform: Optional[np.ndarray] = None) -> None:
        """Add a geometry primitive (ref CreatePrimitiveDesc::GeometryPrimitive;
        the emissive variant is chosen by the material like
        primitive/repository.rs:57-107)."""
        if transform is not None:
            mesh = mesh.transformed(np.asarray(transform))
        self._meshes.append((mesh, material))

    def add_instances(self, mesh: Mesh,
                      instances: List[Tuple[np.ndarray, int]]) -> None:
        """Add one mesh shared by many (transform, material) instances.

        TPU-native two-level instancing (ref: per-mesh bottom BVH under
        transformed primitives, scene/src/primitive/bvh.rs:111-166): the
        triangle soup and its acceleration tables are stored ONCE; each
        instance contributes a 3x4 affine + a material row.  Emissive
        instance materials are rejected — area-light sampling runs on the
        flattened main soup only (none of the reference demo scenes
        instances an emitter).
        """
        insts = [(np.asarray(t, np.float64), int(m)) for t, m in instances]
        if not insts:
            raise ValueError("add_instances needs at least one instance")
        for _, m in insts:
            if isinstance(self._materials[m], Emissive):
                raise ValueError("instanced meshes cannot be emissive")
        self._instanced.append((mesh, insts))

    def add_triangle(self, p0, p1, p2, material: int) -> None:
        """Single-triangle primitive (ref: single_triangle.rs)."""
        pos = np.asarray([p0, p1, p2], np.float32)
        n = np.cross(pos[1] - pos[0], pos[2] - pos[0])
        n = n / max(np.linalg.norm(n), 1e-20)
        m = Mesh(positions=pos, normals=np.tile(n, (3, 1)).astype(np.float32),
                 uvs=np.zeros((3, 2), np.float32),
                 indices=np.asarray([[0, 1, 2]], np.int32),
                 tangents=np.zeros((1, 3), np.float32))
        # tangent from the first edge
        t = pos[1] - pos[0]
        m.tangents[0] = t / max(np.linalg.norm(t), 1e-20)
        self._meshes.append((m, material))

    def add_point_light(self, position, spectrum, intensity: float) -> None:
        """ref: point_light.rs; phi = 4*pi*I (point_light.rs:76-79)."""
        self._delta_lights.append(dict(
            type=LIGHT_POINT, position=np.asarray(position, np.float32),
            spectrum=self._dense(spectrum), intensity=float(intensity)))

    def add_spot_light(self, position, direction, angle_inner: float,
                       angle_outer: float, spectrum, intensity: float) -> None:
        """ref: spot_light.rs; +Z cone axis, smoothstep falloff.

        Deviation: our falloff interpolates in cos-angle space
        (smoothstep(cos_outer, cos_inner, cos(theta))); the reference mixes a
        cosine into an angle-domain smoothstep (spot_light.rs:110-116), which
        no demo scene exercises.
        """
        d = np.asarray(direction, np.float64)
        d = d / np.linalg.norm(d)
        self._delta_lights.append(dict(
            type=LIGHT_SPOT, position=np.asarray(position, np.float32),
            direction=d.astype(np.float32), spectrum=self._dense(spectrum),
            intensity=float(intensity), angle_inner=float(angle_inner),
            angle_outer=float(angle_outer)))

    def add_directional_light(self, direction, spectrum, intensity: float) -> None:
        """ref: directional_light.rs; direction points TOWARD the light."""
        d = np.asarray(direction, np.float64)
        d = d / np.linalg.norm(d)
        self._delta_lights.append(dict(
            type=LIGHT_DIRECTIONAL, direction=d.astype(np.float32),
            spectrum=self._dense(spectrum), intensity=float(intensity)))

    def add_env_light(self, rgb_image: np.ndarray, intensity: float = 1.0,
                      rotation_deg: float = 0.0) -> None:
        """Equirect HDR environment light (ref: environment_light.rs).

        One environment light per scene: pdf_env_for_direction sums over
        infinite lights (Scene::pdf_infinite_light_sample, scene.rs:185-210)
        and we keep that sum trivially correct by rejecting a second env.
        """
        if self._env is not None:
            raise ValueError("scene already has an environment light; "
                             "only one is supported")
        img = np.asarray(rgb_image, np.float32) * intensity
        self._env = dict(rgb=img, rotation=float(np.radians(rotation_deg)))

    # -- helpers ------------------------------------------------------------

    def _dense(self, spectrum) -> np.ndarray:
        if isinstance(spectrum, np.ndarray) and spectrum.shape == (spec.N_DENSE,):
            return np.asarray(spectrum, np.float32)
        if isinstance(spectrum, (tuple, list)) and len(spectrum) == 3:
            # rgb -> illuminant spectrum baked to the dense grid
            return np.asarray(self._rgb_to_illum_dense(np.asarray(spectrum)), np.float32)
        raise TypeError(f"bad spectrum {type(spectrum)}")

    def _table(self):
        return rgb2spec.get_table(self.gamut.name, res=self.table_res)

    def _rgb_to_illum_dense(self, rgb: np.ndarray) -> np.ndarray:
        import jax
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            zn, coeffs = self._table()
            lam = jnp.asarray(spec.DENSE_LAMBDA, jnp.float32)[None, :]
            out = rgb2spec.illuminant_eval(
                jnp.asarray(rgb, jnp.float32)[None, :], lam, zn, coeffs,
                spec.illum_d6500())
            return np.asarray(out)[0]

    def _rgb_coeff(self, rgb) -> np.ndarray:
        import jax
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            zn, coeffs = self._table()
            c = rgb2spec.lookup_coeffs(jnp.asarray(rgb, jnp.float32)[None, :],
                                       zn, coeffs)
            return np.asarray(c)[0]

    def _add_texture(self, tex: Optional[Texture]) -> int:
        if tex is None:
            return -1
        self._textures.append(tex)
        return len(self._textures) - 1

    def _color_param(self, p: ColorParam):
        """-> (coeff (3,), tex_id)"""
        if isinstance(p, Texture):
            return np.zeros(3, np.float32), self._add_texture(p)
        return self._rgb_coeff(p), -1

    def _float_param(self, p: FloatParam):
        if isinstance(p, Texture):
            return 0.0, self._add_texture(p)
        return float(p), -1

    # -- compile ------------------------------------------------------------

    def build(self, camera_position) -> Tuple[SceneData, SceneMeta]:
        """Compile the scene.  Runs pinned to the host CPU backend: scene
        compilation is many small ops, and dispatching those through a
        remote TPU (each one a tunnel round trip) takes minutes; the arrays
        transfer to the accelerator once, at first render."""
        import jax
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            return self._build_on_host(camera_position)

    def _build_on_host(self, camera_position) -> Tuple[SceneData, SceneMeta]:
        cam_pos = np.asarray(camera_position, np.float64)

        # 1. spectra bank: row 0 = normalized D65 (illuminant basis)
        bank: List[np.ndarray] = [spec.illum_d6500().astype(np.float32)]

        def bank_row(dense: np.ndarray) -> int:
            bank.append(np.asarray(dense, np.float32))
            return len(bank) - 1

        # 2. material table
        M = len(self._materials)
        mt = dict(
            mat_type=np.zeros(M, np.int32),
            base_coeff=np.zeros((M, 3), np.float32),
            base_tex=np.full(M, -1, np.int32),
            roughness=np.zeros(M, np.float32),
            roughness_tex=np.full(M, -1, np.int32),
            metallic=np.zeros(M, np.float32),
            metallic_tex=np.full(M, -1, np.int32),
            normal_tex=np.full(M, -1, np.int32),
            eta_row=np.full(M, -1, np.int32),
            k_row=np.full(M, -1, np.int32),
            const_eta=np.full(M, 1.5, np.float32),
            thin=np.zeros(M, np.int32),
            emission_row=np.full(M, -1, np.int32),
            emission_scale=np.zeros(M, np.float32),
            emission_tex=np.full(M, -1, np.int32),
            coat_tint_coeff=np.zeros((M, 3), np.float32),
            coat_thickness=np.zeros(M, np.float32),
            coat_thickness_tex=np.full(M, -1, np.int32),
            coat_roughness=np.zeros(M, np.float32),
            coat_eta=np.full(M, 1.5, np.float32),
        )
        for i, d in enumerate(self._materials):
            if isinstance(d, Lambert):
                mt["mat_type"][i] = MAT_LAMBERT
                mt["base_coeff"][i], mt["base_tex"][i] = self._color_param(d.albedo)
                mt["normal_tex"][i] = self._add_texture(d.normal)
            elif isinstance(d, Metal):
                mt["mat_type"][i] = MAT_METAL
                eta, k = spec.metal_eta_k(_METAL_KINDS[d.kind])
                mt["eta_row"][i] = bank_row(eta)
                mt["k_row"][i] = bank_row(k)
                mt["roughness"][i], mt["roughness_tex"][i] = self._float_param(d.roughness)
                mt["normal_tex"][i] = self._add_texture(d.normal)
            elif isinstance(d, Glass):
                mt["mat_type"][i] = MAT_GLASS
                mt["eta_row"][i] = bank_row(spec.glass_eta(d.kind))
                mt["roughness"][i], mt["roughness_tex"][i] = self._float_param(d.roughness)
                mt["thin"][i] = int(d.thin)
            elif isinstance(d, Plastic):
                mt["mat_type"][i] = MAT_PLASTIC
                mt["base_coeff"][i], mt["base_tex"][i] = self._color_param(d.color)
                mt["roughness"][i], mt["roughness_tex"][i] = self._float_param(d.roughness)
                mt["const_eta"][i] = d.eta
                mt["thin"][i] = int(d.thin)
            elif isinstance(d, Pbr):
                mt["mat_type"][i] = MAT_PBR
                mt["base_coeff"][i], mt["base_tex"][i] = self._color_param(d.base_color)
                mt["metallic"][i], mt["metallic_tex"][i] = self._float_param(d.metallic)
                mt["roughness"][i], mt["roughness_tex"][i] = self._float_param(d.roughness)
                mt["const_eta"][i] = d.eta
                mt["normal_tex"][i] = self._add_texture(d.normal)
            elif isinstance(d, Clearcoat):
                mt["mat_type"][i] = MAT_CLEARCOAT
                mt["base_coeff"][i], mt["base_tex"][i] = self._color_param(d.base_color)
                mt["metallic"][i], mt["metallic_tex"][i] = self._float_param(d.metallic)
                mt["roughness"][i], mt["roughness_tex"][i] = self._float_param(d.roughness)
                mt["const_eta"][i] = d.eta
                mt["normal_tex"][i] = self._add_texture(d.normal)
                mt["coat_tint_coeff"][i] = self._rgb_coeff(d.coat_tint)
                (mt["coat_thickness"][i],
                 mt["coat_thickness_tex"][i]) = self._float_param(d.coat_thickness)
                mt["coat_roughness"][i] = d.coat_roughness
                mt["coat_eta"][i] = d.coat_eta
            elif isinstance(d, Emissive):
                mt["mat_type"][i] = MAT_EMISSIVE
                if isinstance(d.spectrum, Texture):
                    mt["emission_tex"][i] = self._add_texture(d.spectrum)
                    # phi approximation: average texel (ref approximates at
                    # uv=(0.5,0.5), emissive_material.rs:64-78)
                    avg = d.spectrum.data.reshape(-1, 3).mean(0)
                    mt["emission_row"][i] = bank_row(self._rgb_to_illum_dense(avg))
                else:
                    mt["emission_row"][i] = bank_row(self._dense(d.spectrum))
                mt["emission_scale"][i] = d.intensity
            else:
                raise TypeError(f"unknown material {type(d)}")

        # 3. concatenate meshes into global triangle SoA (world space)
        pos_list, n_list, uv_list, tan_list, mat_list = [], [], [], [], []
        tri_prim = []
        for prim_id, (mesh, mat_id) in enumerate(self._meshes):
            idx = mesh.indices
            pos_list.append(mesh.positions[idx])       # (t, 3, 3)
            n_list.append(mesh.normals[idx])
            uv_list.append(mesh.uvs[idx])
            tan_list.append(mesh.tangents)
            mat_list.append(np.full(len(idx), mat_id, np.int32))
            tri_prim.append(np.full(len(idx), prim_id, np.int32))
        if not pos_list:
            raise ValueError("scene has no geometry")
        P = np.concatenate(pos_list, 0).astype(np.float64)
        N = np.concatenate(n_list, 0).astype(np.float32)
        UV = np.concatenate(uv_list, 0).astype(np.float32)
        TAN = np.concatenate(tan_list, 0).astype(np.float32)
        MATID = np.concatenate(mat_list, 0)
        PRIM = np.concatenate(tri_prim, 0)

        # render space: subtract camera position (ref: camera.rs:84-87)
        P = (P - cam_pos).astype(np.float32)

        # 4. BVH over world triangles; reorder all per-tri arrays.
        # Prefer the native C++ builder (native/bvh_builder.cpp); fall back
        # to the pure-Python one (same algorithm) if no toolchain.
        fb = None
        if not os.environ.get("TPT_NO_NATIVE"):
            from ..native import build_bvh_native
            fb = build_bvh_native(P.min(1), P.max(1))
        if fb is None:
            fb = build_bvh(P.min(1), P.max(1))
        o = fb.order
        P, N, UV, TAN, MATID, PRIM = P[o], N[o], UV[o], TAN[o], MATID[o], PRIM[o]

        bvh = pack_bvh(fb, P)

        # 4b. instanced groups: canonical OBJECT-space tables built once
        # per mesh; per-instance 3x4 affines in render space
        groups = []
        inst_lo_all, inst_hi_all = [], []
        for mesh_c, insts in self._instanced:
            idx = mesh_c.indices
            Pg = mesh_c.positions[idx].astype(np.float64)
            Ng = mesh_c.normals[idx].astype(np.float32)
            UVg = mesh_c.uvs[idx].astype(np.float32)
            TANg = mesh_c.tangents.astype(np.float32)
            fbg = None
            if not os.environ.get("TPT_NO_NATIVE"):
                from ..native import build_bvh_native
                fbg = build_bvh_native(Pg.min(1), Pg.max(1))
            if fbg is None:
                fbg = build_bvh(Pg.min(1), Pg.max(1))
            og = fbg.order
            Pg, Ng, UVg, TANg = Pg[og], Ng[og], UVg[og], TANg[og]
            gb = pack_bvh(fbg, Pg.astype(np.float32))
            attr = np.concatenate(
                [Ng.reshape(len(Pg), 9), UVg.reshape(len(Pg), 6), TANg],
                axis=1).astype(np.float32)
            lo_o = Pg.reshape(-1, 3).min(0)
            hi_o = Pg.reshape(-1, 3).max(0)
            corners = np.array([[x, y, z]
                                for x in (lo_o[0], hi_o[0])
                                for y in (lo_o[1], hi_o[1])
                                for z in (lo_o[2], hi_o[2])])
            fwd_rows, inv_rows, mats = [], [], []
            g_lo, g_hi = [], []
            for t4, m in insts:
                a = t4[:3, :3]
                t = t4[:3, 3] - cam_pos            # render space
                ai = np.linalg.inv(a)
                fwd_rows.append(np.concatenate([a.reshape(9), t]))
                inv_rows.append(np.concatenate([ai.reshape(9), -ai @ t]))
                mats.append(m)
                wc = corners @ a.T + t
                g_lo.append(wc.min(0))
                g_hi.append(wc.max(0))
            inst_lo_all.extend(g_lo)
            inst_hi_all.extend(g_hi)
            groups.append(InstancedGroup(
                bvh=gb, tri_attr=jnp.asarray(attr),
                fwd=jnp.asarray(np.stack(fwd_rows), jnp.float32),
                inv=jnp.asarray(np.stack(inv_rows), jnp.float32),
                mat_id=jnp.asarray(np.asarray(mats, np.int32)),
                aabb_min=jnp.asarray(np.stack(g_lo), jnp.float32),
                aabb_max=jnp.asarray(np.stack(g_hi), jnp.float32)))

        # 5. world bounding sphere (for directional/env phi + env distance)
        lo, hi = P.reshape(-1, 3).min(0), P.reshape(-1, 3).max(0)
        if inst_lo_all:
            lo = np.minimum(lo, np.stack(inst_lo_all).min(0))
            hi = np.maximum(hi, np.stack(inst_hi_all).max(0))
        world_radius = float(np.linalg.norm(hi - lo) / 2.0) or 1.0

        # 6. lights
        lights: List[dict] = []
        tri_light = np.full(len(P), -1, np.int32)
        area_tri, area_area, area_cdf = [], [], []

        # area lights: one per emissive-material primitive
        for prim_id, (mesh, mat_id) in enumerate(self._meshes):
            if mt["mat_type"][mat_id] != MAT_EMISSIVE:
                continue
            sel = np.nonzero(PRIM == prim_id)[0]           # leaf-order rows
            e1 = P[sel, 1] - P[sel, 0]
            e2 = P[sel, 2] - P[sel, 0]
            areas = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
            total = float(areas.sum())
            cdf = np.cumsum(areas) / max(total, 1e-20)
            light_row = len(lights)
            tri_light[sel] = light_row
            first = len(area_tri)
            area_tri.extend(sel.tolist())
            area_area.extend(areas.tolist())
            area_cdf.extend(cdf.tolist())
            lights.append(dict(
                type=LIGHT_AREA, spectrum_row=int(mt["emission_row"][mat_id]),
                intensity=float(mt["emission_scale"][mat_id]),
                phi_scale=total, area_first=first, area_n=len(sel),
                area_total=total, mat_id=mat_id))

        for dl in self._delta_lights:
            row = bank_row(dl["spectrum"])
            if dl["type"] == LIGHT_POINT:
                lights.append(dict(
                    type=LIGHT_POINT, spectrum_row=row, intensity=dl["intensity"],
                    position=dl["position"] - cam_pos,
                    phi_scale=4.0 * np.pi * dl["intensity"]))
            elif dl["type"] == LIGHT_SPOT:
                ai, ao = dl["angle_inner"], dl["angle_outer"]
                # analytic cone integral (ref: spot_light.rs:82-94)
                phi = 2.0 * np.pi * ((1.0 - np.cos(ai)) + (np.cos(ai) - np.cos(ao)) / 2.0)
                lights.append(dict(
                    type=LIGHT_SPOT, spectrum_row=row, intensity=dl["intensity"],
                    position=dl["position"] - cam_pos, direction=dl["direction"],
                    cos_inner=float(np.cos(ai)), cos_outer=float(np.cos(ao)),
                    angle_inner=ai, angle_outer=ao,
                    phi_scale=float(phi) * dl["intensity"]))
            elif dl["type"] == LIGHT_DIRECTIONAL:
                # phi uses the scene bounding-sphere cross-section
                # (ref: directional_light.rs:79-93)
                lights.append(dict(
                    type=LIGHT_DIRECTIONAL, spectrum_row=row,
                    intensity=dl["intensity"], direction=dl["direction"],
                    phi_scale=float(np.pi * world_radius ** 2) * dl["intensity"]))

        env = None
        if self._env is not None:
            img = self._env["rgb"]
            h, w = img.shape[:2]
            # luminance * sin(theta) importance table (ref: :165-215)
            lum = img @ np.asarray([0.2126, 0.7152, 0.0722])
            sin_t = np.sin((np.arange(h) + 0.5) / h * np.pi)
            weights = lum * sin_t[:, None] + 1e-12
            row_sum = weights.sum(1)
            marginal = np.cumsum(row_sum) / row_sum.sum()
            conditional = np.cumsum(weights, 1) / weights.sum(1, keepdims=True)
            # solid-angle (sin theta) weighted average radiance — matches the
            # reference's integrated average spectrum for phi
            # (environment_light.rs:50-66,299-301) up to spectral upsampling
            avg_rgb = ((img * sin_t[:, None, None]).sum((0, 1))
                       / (sin_t.sum() * w))
            env = EnvMap(rgb=jnp.asarray(img),
                         marginal_cdf=jnp.asarray(marginal, jnp.float32),
                         conditional_cdf=jnp.asarray(conditional, jnp.float32),
                         avg_rgb=jnp.asarray(avg_rgb, jnp.float32),
                         rotation=jnp.asarray(self._env["rotation"], jnp.float32))
            # env phi: avg spectrum row; power scale like a sphere light
            avg_row = bank_row(self._rgb_to_illum_dense(avg_rgb))
            lights.append(dict(
                type=LIGHT_ENV, spectrum_row=avg_row, intensity=1.0,
                phi_scale=float(4.0 * np.pi * np.pi * world_radius ** 2)))

        L = max(len(lights), 1)
        lt = dict(
            light_type=np.full(L, -1, np.int32),
            position=np.zeros((L, 3), np.float32),
            direction=np.tile(np.asarray([0.0, 0.0, 1.0], np.float32), (L, 1)),
            spectrum_row=np.zeros(L, np.int32),
            intensity=np.zeros(L, np.float32),
            cos_inner=np.ones(L, np.float32),
            cos_outer=np.zeros(L, np.float32),
            angle_inner=np.zeros(L, np.float32),
            angle_outer=np.zeros(L, np.float32),
            phi_scale=np.zeros(L, np.float32),
            area_first_tri=np.full(L, -1, np.int32),
            area_n_tris=np.zeros(L, np.int32),
            area_total=np.zeros(L, np.float32),
            mat_id=np.full(L, -1, np.int32),
        )
        for i, l in enumerate(lights):
            lt["light_type"][i] = l["type"]
            lt["spectrum_row"][i] = l["spectrum_row"]
            lt["intensity"][i] = l.get("intensity", 0.0)
            lt["phi_scale"][i] = l.get("phi_scale", 0.0)
            if "position" in l:
                lt["position"][i] = l["position"]
            if "direction" in l:
                lt["direction"][i] = l["direction"]
            if "cos_inner" in l:
                lt["cos_inner"][i] = l["cos_inner"]
                lt["cos_outer"][i] = l["cos_outer"]
                lt["angle_inner"][i] = l["angle_inner"]
                lt["angle_outer"][i] = l["angle_outer"]
            if "area_first" in l:
                lt["area_first_tri"][i] = l["area_first"]
                lt["area_n_tris"][i] = l["area_n"]
                lt["area_total"][i] = l["area_total"]
                lt["mat_id"][i] = l["mat_id"]

        zn, coeffs = self._table()
        tri_attr = np.concatenate(
            [N.reshape(len(P), 9), UV.reshape(len(P), 6), TAN],
            axis=1).astype(np.float32)
        data = SceneData(
            bvh=bvh,
            tri_attr=jnp.asarray(tri_attr),
            tri_n0=jnp.asarray(N[:, 0]), tri_n1=jnp.asarray(N[:, 1]),
            tri_n2=jnp.asarray(N[:, 2]),
            tri_uv0=jnp.asarray(UV[:, 0]), tri_uv1=jnp.asarray(UV[:, 1]),
            tri_uv2=jnp.asarray(UV[:, 2]),
            tri_tangent=jnp.asarray(TAN),
            tri_mat=jnp.asarray(MATID), tri_light=jnp.asarray(tri_light),
            materials=MaterialTable(**{k: jnp.asarray(v) for k, v in mt.items()}),
            lights=LightTable(**{k: jnp.asarray(v) for k, v in lt.items()}),
            spectra=jnp.asarray(np.stack(bank, 0)),
            area_tri=jnp.asarray(np.asarray(area_tri, np.int32).reshape(-1)),
            area_tri_area=jnp.asarray(np.asarray(area_area, np.float32).reshape(-1)),
            area_tri_cdf=jnp.asarray(np.asarray(area_cdf, np.float32).reshape(-1)),
            textures=tuple(jnp.asarray(t.decoded(self.gamut))
                           for t in self._textures),
            env=env,
            world_radius=jnp.asarray(world_radius, jnp.float32),
            rs_zn=jnp.asarray(zn),
            rs_coeffs=jnp.asarray(coeffs),
            instanced=tuple(groups),
        )
        meta = SceneMeta(
            mat_types=tuple(int(t) for t in mt["mat_type"]),
            light_types=tuple(int(l["type"]) for l in lights),
            n_tris=len(P),
            has_env=env is not None,
            texture_shapes=tuple(tuple(t.data.shape) for t in self._textures),
            max_area_tris=max([l["area_n"] for l in lights
                               if "area_first" in l], default=1),
            has_emission_tex=bool((mt["emission_tex"] >= 0).any()),
        )
        return data, meta
