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


def _four_on_floor(sb, materials, scale=0.75):
    """Four small hero meshes left-to-right (scene_7.rs:20-27 layout)."""
    xs = [-1.3, -0.5, 0.3, 1.1]
    bun = mesh.bunny()
    lo = bun.positions.min(0)
    for x, mat in zip(xs, materials):
        t = translate(x, -lo[1] * scale, -0.5) @ np.diag([scale] * 3 + [1.0])
        sb.add_mesh(bun, mat, t)


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


@register(5)
def scene_5(sb: SceneBuilder, cam):
    """Constant color + normal map (scene_5.rs)."""
    add_cornell_box(sb)
    m = sb.add_material(Lambert(albedo=(0.75, 0.71, 0.68),
                                normal=_normal_map_texture(bumps=6, amp=0.9)))
    bun, t = bunny_on_floor()
    sb.add_mesh(bun, m, t)
    return cam
