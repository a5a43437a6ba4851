"""Image file loading for textures and environment maps.

TPU-native equivalent of the reference's texture loader
(/root/reference/scene/src/texture/loader.rs:9-87): decodes image files
into numpy float arrays ONCE at scene-build time (the reference re-decodes
EOTF per texel lookup, rgb_texture.rs:48-66; here textures enter the scene
pytree already linear, and sampling is pure device math).

Formats: PNG/JPG/BMP/TGA via PIL; EXR/HDR via OpenCV (the reference loads
its equirect HDRI as EXR, environment_light.rs:165-215).

Options mirror the reference texture types:
  * ``load_normal(flip_y=...)``  — NormalTexture's DirectX-style Y flip
    (normal_texture.rs:16-67), baked into the stored encoding.
  * ``load_gray(linearize=...)`` — FloatTexture's inverse-sRGB option
    (float_texture.rs:16-55).
"""
from __future__ import annotations

import os

import numpy as np

__all__ = ["load_rgb", "load_gray", "load_normal", "load_env",
           "texture_from_file"]

_EXR_EXTS = (".exr", ".hdr")


def _srgb_to_linear(v: np.ndarray) -> np.ndarray:
    """Inverse sRGB EOTF (same curve as color/eotf.py, host-side)."""
    return np.where(v <= 0.04045, v / 12.92,
                    ((v + 0.055) / 1.055) ** 2.4).astype(np.float32)


def _load_float_image(path: str) -> np.ndarray:
    """EXR/HDR -> (H, W, 3) f32 (linear by definition of the formats).

    EXR decodes through the framework's own codec (utils/exr.py — the
    platform image stacks ship no EXR support); HDR through OpenCV.
    """
    if path.lower().endswith(".exr"):
        from ..utils.exr import read_exr

        img = np.asarray(read_exr(path), np.float32)
        if img.shape[-1] == 1:
            img = np.repeat(img, 3, -1)
        return np.ascontiguousarray(img[..., :3])
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED | cv2.IMREAD_ANYDEPTH
                     | cv2.IMREAD_ANYCOLOR)
    if img is None:
        raise IOError(f"failed to decode {path}")
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, -1)
    if img.shape[-1] >= 3:
        img = img[..., 2::-1]  # BGR(A) -> RGB
    return np.ascontiguousarray(img[..., :3])


def load_rgb(path: str, linearize: bool = True) -> np.ndarray:
    """Image file -> (H, W, 3) f32 LINEAR rgb.

    8-bit files are assumed sRGB-encoded and linearized when ``linearize``
    (color textures); EXR/HDR are already linear.  Equivalent of
    ``load_rgb_image`` (loader.rs:44-62) + the per-lookup EOTF invert the
    reference does at rgb_texture.rs:48-66.
    """
    if path.lower().endswith(_EXR_EXTS):
        return _load_float_image(path)
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    return _srgb_to_linear(img) if linearize else img


def load_gray(path: str, linearize: bool = False) -> np.ndarray:
    """Image file -> (H, W) f32 grayscale.

    ``linearize`` applies the inverse sRGB EOTF, mirroring FloatTexture's
    ``gamma_corrected`` option (float_texture.rs:44-53).
    """
    if path.lower().endswith(_EXR_EXTS):
        img = _load_float_image(path).mean(-1)
        return np.asarray(img, np.float32)
    from PIL import Image

    img = np.asarray(Image.open(path).convert("L"), np.float32) / 255.0
    return _srgb_to_linear(img) if linearize else img


def load_normal(path: str, flip_y: bool = False) -> np.ndarray:
    """Normal map file -> (H, W, 3) f32 in the [0,1] encoding the shading
    kernel decodes with ``n = raw*2 - 1`` (render/bsdf.py).

    ``flip_y`` (DirectX-convention maps) negates the decoded green channel
    (normal_texture.rs:44-47), baked here as ``g -> 1 - g``.
    """
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    if flip_y:
        img = img.copy()
        img[..., 1] = 1.0 - img[..., 1]
    return img


def load_env(path: str) -> np.ndarray:
    """Equirect environment map (EXR/HDR/PNG) -> (H, W, 3) f32 linear
    radiance, ready for ``SceneBuilder.add_env_light``
    (ref: environment_light.rs:165-215 loads the EXR sky)."""
    return load_rgb(path, linearize=True)


def texture_from_file(path: str, kind: str = "rgb", flip_y: bool = False,
                      linearize: bool | None = None):
    """File -> builder ``Texture`` of the given kind.

    kind "rgb": color texture, linearized unless ``linearize=False``;
    kind "gray": scalar texture, NOT linearized unless ``linearize=True``
    (matching the reference defaults for albedo vs roughness/metallic maps);
    kind "normal": [0,1]-encoded tangent-space normals with optional flip_y.
    """
    from .builder import Texture

    if kind == "rgb":
        data = load_rgb(path, linearize=True if linearize is None else linearize)
    elif kind == "gray":
        data = load_gray(path, linearize=bool(linearize))
    elif kind == "normal":
        data = load_normal(path, flip_y=flip_y)
    else:
        raise ValueError(f"unknown texture kind {kind!r}")
    return Texture(data=data, kind=kind)
