"""The 20 demo scenes (ref: renderer/src/scene/scene_0.rs..scene_19.rs).

Each ``scene_N()`` returns ``(SceneData, SceneMeta, Camera)`` for the given
output resolution.  Hero meshes are procedural stand-ins (the reference's
OBJ scans are LFS stubs — see scenes/common.py).
"""
from __future__ import annotations

from typing import Callable, Dict

import numpy as np

from ..render.camera import default_camera
from ..scene import mesh
from ..scene.builder import (Clearcoat, Emissive, Glass, Lambert, Metal, Pbr,
                             Plastic, SceneBuilder, Texture)
from ..spectrum import illum_d6500
from . import common
from .common import (CAMERA_DIR, CAMERA_POS, add_cornell_box, bunny_on_floor,
                     dragon_on_floor, translate)

_REGISTRY: Dict[int, Callable] = {}


def register(n):
    def deco(fn):
        _REGISTRY[n] = fn
        return fn
    return deco


def available_scenes():
    return sorted(_REGISTRY)


def load_scene(n: int, width: int, height: int, table_res: int = 64):
    """Build scene n; returns (SceneData, SceneMeta, Camera)."""
    if n not in _REGISTRY:
        raise ValueError(
            f"scene {n} not implemented yet (available: {available_scenes()})")
    cam = default_camera(width, height, fov=45.0)
    cam = cam.look_to(CAMERA_POS, CAMERA_DIR)
    sb = SceneBuilder(table_res=table_res)
    cam = _REGISTRY[n](sb, cam) or cam
    data, meta = sb.build(cam.position)
    return data, meta, cam


@register(0)
def scene_0(sb: SceneBuilder, cam):
    """Lambert bunny in the Cornell box (scene_0.rs:13-107)."""
    add_cornell_box(sb)
    m = sb.add_material(Lambert(albedo=(0.8, 0.8, 0.8)))
    bun, t = bunny_on_floor()
    sb.add_mesh(bun, m, t)
    return cam


@register(1)
def scene_1(sb: SceneBuilder, cam):
    """Two point lights + floor triangle (scene_1.rs)."""
    m = sb.add_material(Lambert(albedo=(0.8, 0.8, 0.8)))
    s = common.BOX_HALF
    sb.add_mesh(mesh.quad([-s, 0, s], [s, 0, s], [s, 0, -s], [-s, 0, -s]), m)
    bun, t = bunny_on_floor()
    sb.add_mesh(bun, m, t)
    sb.add_point_light((-1.5, 3.0, 1.5), illum_d6500(), 16.0)
    sb.add_point_light((1.5, 3.0, 1.5), (0.9, 0.4, 0.2), 12.0)
    return cam


@register(2)
def scene_2(sb: SceneBuilder, cam):
    """Cornell box lit by a point light (scene_2.rs)."""
    add_cornell_box(sb, with_light=False)
    m = sb.add_material(Lambert(albedo=(0.8, 0.8, 0.8)))
    bun, t = bunny_on_floor()
    sb.add_mesh(bun, m, t)
    sb.add_point_light((0.0, 3.6, 0.0), illum_d6500(), 20.0)
    return cam


def _checker_texture(n=256, a=(0.9, 0.9, 0.9), b=(0.2, 0.3, 0.6), tiles=8):
    ij = np.indices((n, n)).sum(0)
    mask = ((ij * tiles // n) % 2).astype(np.float32)[..., None]
    img = np.asarray(a) * (1 - mask) + np.asarray(b) * mask
    return Texture(img.astype(np.float32), kind="rgb")


def _normal_map_texture(n=256, bumps=12, amp=0.6):
    y, x = np.mgrid[0:n, 0:n] / n
    h = np.sin(x * bumps * 2 * np.pi) * np.sin(y * bumps * 2 * np.pi) * amp
    dx = np.gradient(h, axis=1) * n
    dy = np.gradient(h, axis=0) * n
    nrm = np.stack([-dx, -dy, np.ones_like(h)], -1)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    return Texture(((nrm + 1.0) * 0.5).astype(np.float32), kind="normal")


@register(3)
def scene_3(sb: SceneBuilder, cam):
    """Textured + normal-mapped bunny (scene_3.rs; bunny-material-0 stand-in)."""
    add_cornell_box(sb)
    m = sb.add_material(Lambert(albedo=_checker_texture(),
                                normal=_normal_map_texture()))
    bun, t = bunny_on_floor()
    sb.add_mesh(bun, m, t)
    return cam


@register(6)
def scene_6(sb: SceneBuilder, cam):
    """Smooth gold bunny (scene_6.rs: MetalType::Gold, roughness 0)."""
    add_cornell_box(sb)
    m = sb.add_material(Metal(kind="gold", roughness=0.0))
    bun, t = bunny_on_floor()
    sb.add_mesh(bun, m, t)
    return cam


def _four_on_floor(sb, materials, scale=0.75, flatten=False):
    """Four small hero meshes left-to-right (scene_7.rs:20-27 layout).

    Instanced by default: the bunny soup + BVH tables are stored ONCE and
    the four placements are 3x4 affines (ref two-level structure,
    scene/src/primitive/bvh.rs:111-166).  ``flatten=True`` keeps the old
    duplicated world-space build (the instancing equivalence test renders
    both).
    """
    xs = [-1.3, -0.5, 0.3, 1.1]
    bun = mesh.bunny()
    lo = bun.positions.min(0)
    ts = [translate(x, -lo[1] * scale, -0.5) @ np.diag([scale] * 3 + [1.0])
          for x in xs]
    if flatten:
        for t, mat in zip(ts, materials):
            sb.add_mesh(bun, mat, t)
    else:
        sb.add_instances(bun, list(zip(ts, materials)))


@register(7)
def scene_7(sb: SceneBuilder, cam):
    """Four gold bunnies, roughness sweep (scene_7.rs: [0.05,0.25,0.5,0.75])."""
    add_cornell_box(sb)
    mats = [sb.add_material(Metal(kind="gold", roughness=r))
            for r in (0.05, 0.25, 0.5, 0.75)]
    _four_on_floor(sb, mats)
    return cam


@register(8)
def scene_8(sb: SceneBuilder, cam):
    """Smooth SF11 glass bunny (scene_8.rs: GlassType::Sf11, rough 0)."""
    add_cornell_box(sb)
    m = sb.add_material(Glass(kind="sf11", roughness=0.0))
    bun, t = bunny_on_floor()
    sb.add_mesh(bun, m, t)
    return cam


@register(9)
def scene_9(sb: SceneBuilder, cam):
    """Smooth plastic bunny, eta 1.8 (scene_9.rs)."""
    add_cornell_box(sb)
    m = sb.add_material(Plastic(color=(1.0, 1.0, 1.0), eta=1.8, roughness=0.0))
    bun, t = bunny_on_floor()
    sb.add_mesh(bun, m, t)
    return cam


@register(10)
def scene_10(sb: SceneBuilder, cam):
    """Thin-film plastic bunny, eta 1.8 (scene_10.rs: thin=true)."""
    add_cornell_box(sb)
    m = sb.add_material(Plastic(color=(1.0, 1.0, 1.0), eta=1.8, roughness=0.0,
                                thin=True))
    bun, t = bunny_on_floor()
    sb.add_mesh(bun, m, t)
    return cam


@register(11)
def scene_11(sb: SceneBuilder, cam):
    """Rough SF11 glass bunny (scene_11.rs: roughness 0.2)."""
    add_cornell_box(sb)
    m = sb.add_material(Glass(kind="sf11", roughness=0.2))
    bun, t = bunny_on_floor()
    sb.add_mesh(bun, m, t)
    return cam


@register(12)
def scene_12(sb: SceneBuilder, cam):
    """Four BK7 glass bunnies, roughness sweep (scene_12.rs)."""
    add_cornell_box(sb)
    mats = [sb.add_material(Glass(kind="bk7", roughness=r))
            for r in (0.05, 0.25, 0.5, 0.75)]
    _four_on_floor(sb, mats)
    return cam


@register(13)
def scene_13(sb: SceneBuilder, cam):
    """Colored plastic bunny (scene_13.rs: linear rgb (0.4,0.9,1.0), eta 1.5)."""
    add_cornell_box(sb)
    m = sb.add_material(Plastic(color=(0.4, 0.9, 1.0), eta=1.5, roughness=0.0))
    bun, t = bunny_on_floor()
    sb.add_mesh(bun, m, t)
    return cam


@register(14)
def scene_14(sb: SceneBuilder, cam):
    """Four colored plastic bunnies (scene_14.rs: colors + roughness sweep)."""
    add_cornell_box(sb)
    colors = [(1.0, 0.5, 0.5), (0.5, 1.0, 0.5), (0.5, 0.5, 1.0), (1.0, 0.8, 0.4)]
    roughs = (0.05, 0.1, 0.3, 0.5)
    mats = [sb.add_material(Plastic(color=c, eta=1.5, roughness=r))
            for c, r in zip(colors, roughs)]
    _four_on_floor(sb, mats)
    return cam


@register(4)
def scene_4(sb: SceneBuilder, cam):
    """Bunny with the second texture set (scene_4.rs; bunny-material-1
    stand-in: marble-ish albedo + bumps)."""
    add_cornell_box(sb)
    m = sb.add_material(Lambert(
        albedo=_checker_texture(a=(0.85, 0.75, 0.6), b=(0.45, 0.3, 0.25), tiles=5),
        normal=_normal_map_texture(bumps=9, amp=0.4)))
    bun, t = bunny_on_floor()
    sb.add_mesh(bun, m, t)
    return cam


@register(15)
def scene_15(sb: SceneBuilder, cam):
    """PBR dragon with full texture set (scene_15.rs: BaseColor/Metallic/
    Roughness/Normal maps, ior 1.5; dragon scaled 2.5 at z=0.5)."""
    add_cornell_box(sb)
    m = sb.add_material(Pbr(
        base_color=_checker_texture(a=(0.8, 0.55, 0.3), b=(0.35, 0.4, 0.5), tiles=6),
        metallic=_metal_mask_texture(),
        roughness=_roughness_texture(),
        normal=_normal_map_texture(bumps=16, amp=0.3),
        eta=1.5))
    drg, t = dragon_on_floor(scale=1.3)
    sb.add_mesh(drg, m, t)
    return cam


@register(16)
def scene_16(sb: SceneBuilder, cam):
    """Clearcoat PBR dragon (scene_16.rs: metallic 1, rough 0.7, coat ior
    1.5, coat rough 0.01, blue tint, 0.8mm)."""
    add_cornell_box(sb)
    m = sb.add_material(Clearcoat(
        base_color=(0.8, 0.8, 0.8), metallic=1.0, roughness=0.7, eta=1.5,
        coat_eta=1.5, coat_roughness=0.01, coat_tint=(0.7, 0.8, 1.0),
        coat_thickness=0.8))
    drg, t = dragon_on_floor(scale=1.3)
    sb.add_mesh(drg, m, t)
    return cam


@register(17)
def scene_17(sb: SceneBuilder, cam):
    """Rough clearcoat dragon (scene_17.rs:22-70: coat roughness 0.75)."""
    add_cornell_box(sb)
    m = sb.add_material(Clearcoat(
        base_color=(0.8, 0.8, 0.8), metallic=1.0, roughness=0.7, eta=1.5,
        coat_eta=1.5, coat_roughness=0.75, coat_tint=(0.7, 0.8, 1.0),
        coat_thickness=0.8))
    drg, t = dragon_on_floor(scale=1.3)
    sb.add_mesh(drg, m, t)
    return cam


@register(18)
def scene_18(sb: SceneBuilder, cam):
    """Clearcoat with a thickness map (scene_18.rs)."""
    add_cornell_box(sb)
    m = sb.add_material(Clearcoat(
        base_color=(0.8, 0.8, 0.8), metallic=1.0, roughness=0.7, eta=1.5,
        coat_eta=1.5, coat_roughness=0.05, coat_tint=(0.7, 0.8, 1.0),
        coat_thickness=_thickness_texture()))
    drg, t = dragon_on_floor(scale=1.3)
    sb.add_mesh(drg, m, t)
    return cam


def _procedural_sky(h=128, w=256, sun_dir=(0.4, 0.5, -0.3), turbidity=0.35):
    """Stand-in for the LFS-stub EXR sky: gradient + sun disk + horizon glow."""
    v, u = np.mgrid[0:h, 0:w]
    theta = (v + 0.5) / h * np.pi
    phi = (u + 0.5) / w * 2 * np.pi
    d = np.stack([np.sin(theta) * np.cos(phi), np.cos(theta),
                  -np.sin(theta) * np.sin(phi)], -1)
    sun = np.asarray(sun_dir) / np.linalg.norm(sun_dir)
    cos_sun = (d @ sun).clip(-1, 1)
    sky = np.zeros((h, w, 3), np.float32)
    t = np.clip(d[..., 1], 0, 1)[..., None]
    sky += (1 - t) * np.asarray([0.9, 0.85, 0.8]) + t * np.asarray([0.25, 0.45, 0.9])
    sky += np.exp((cos_sun - 1.0) / 0.0008)[..., None] * np.asarray([80.0, 70.0, 55.0])
    sky += np.exp((cos_sun - 1.0) / 0.08)[..., None] * np.asarray([1.2, 1.0, 0.7])
    ground = d[..., 1] < 0
    sky[ground] = sky[ground] * 0.0 + np.asarray([0.25, 0.22, 0.2]) * (
        0.3 + 0.7 * np.abs(d[ground][:, 1:2]))
    return sky.astype(np.float32)


@register(19)
def scene_19(sb: SceneBuilder, cam):
    """Environment-light scene: PBR/plastic/clearcoat objects under an HDRI
    sky, no box (scene_19.rs; camera :148-152)."""
    s = common.BOX_HALF
    floor = sb.add_material(Lambert(albedo=(0.7, 0.7, 0.7)))
    sb.add_mesh(mesh.quad([-2 * s, 0, 2 * s], [2 * s, 0, 2 * s],
                          [2 * s, 0, -2 * s], [-2 * s, 0, -2 * s]), floor)
    m_pbr = sb.add_material(Pbr(base_color=(0.8, 0.3, 0.25), metallic=0.9,
                                roughness=0.25, eta=1.5))
    m_coat = sb.add_material(Clearcoat(base_color=(0.7, 0.7, 0.75),
                                       metallic=1.0, roughness=0.5,
                                       coat_roughness=0.02,
                                       coat_tint=(0.8, 0.9, 1.0),
                                       coat_thickness=0.5))
    m_plastic = sb.add_material(Plastic(color=(0.9, 0.85, 0.4), eta=1.49,
                                        roughness=0.05))
    sph = mesh.uv_sphere(0.45, 24, 48)
    sb.add_mesh(sph, m_pbr, translate(-1.0, 0.45, 0.0))
    sb.add_mesh(sph, m_coat, translate(0.0, 0.45, -0.6))
    sb.add_mesh(sph, m_plastic, translate(1.0, 0.45, 0.2))
    sb.add_env_light(_procedural_sky(), intensity=1.0)
    return cam.look_to((-1.5, 0.8, 2.5), (1.5, -0.4, -2.5))


def _metal_mask_texture(n=128):
    y, x = np.mgrid[0:n, 0:n] / n
    v = ((np.sin(x * 12) * np.sin(y * 9)) > 0.2).astype(np.float32)
    return Texture(v[..., None], kind="gray")


def _roughness_texture(n=128):
    y, x = np.mgrid[0:n, 0:n] / n
    v = (0.2 + 0.6 * (0.5 + 0.5 * np.sin(x * 20 + 3 * y))).astype(np.float32)
    return Texture(v[..., None], kind="gray")


def _thickness_texture(n=128):
    y, x = np.mgrid[0:n, 0:n] / n
    v = (1.2 * ((np.sin(x * 15) * np.cos(y * 15)) > 0.0)).astype(np.float32)
    return Texture(v[..., None], kind="gray")


@register(5)
def scene_5(sb: SceneBuilder, cam):
    """Constant color + normal map (scene_5.rs)."""
    add_cornell_box(sb)
    m = sb.add_material(Lambert(albedo=(0.75, 0.71, 0.68),
                                normal=_normal_map_texture(bumps=6, amp=0.9)))
    bun, t = bunny_on_floor()
    sb.add_mesh(bun, m, t)
    return cam
