"""Texture sampling: bilinear, UV-wrapped, batched over rays.

Equivalent of the reference sampler (scene/src/texture/sampler.rs:6-143):
fract-wrap UVs with flipped v (1 - v.fract()).  Because scene textures have
heterogeneous shapes, per-ray texture selection is a static Python loop over
the scene's texture tuple with masked merges — scenes carry a handful of
textures, and XLA fuses the masked loads.

UVs arrive as ``V2`` component pairs (utils/vec.py); fetched texels stay as
``(R, C)`` gather rows (the gathered row pads to 128 lanes regardless of C,
so there is nothing to win by splitting the gather itself) and callers
slice components off immediately.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.vec import V2


def sample_bilinear(tex, uv: V2):
    """tex: (H, W, C); uv: V2 of (R,) -> (R, C).

    v is flipped (the reference flips v: sampler.rs 1.0 - uv.y.fract()).
    """
    h, w = tex.shape[0], tex.shape[1]
    u = uv.x % 1.0
    v = (1.0 - (uv.y % 1.0)) % 1.0
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    x1i = jnp.mod(x0i + 1, w)
    y0i = jnp.mod(y0.astype(jnp.int32), h)
    y1i = jnp.mod(y0i + 1, h)
    # flat 1-D row indices: multi-dim-indexed gathers fall off the TPU fast
    # path; a single-index row gather of the (H*W, C) view stays on it
    texf = tex.reshape(h * w, tex.shape[2])
    c00 = texf[y0i * w + x0i]
    c10 = texf[y0i * w + x1i]
    c01 = texf[y1i * w + x0i]
    c11 = texf[y1i * w + x1i]
    top = c00 + (c10 - c00) * fx[:, None]
    bot = c01 + (c11 - c01) * fx[:, None]
    return top + (bot - top) * fy[:, None]


def sample_indexed(textures, tex_ids, uv: V2, n_channels: int, default):
    """Masked multi-texture fetch.

    textures: tuple of (H, W, C) arrays (static); tex_ids: (R,) i32 with -1
    meaning 'use default'; default: (R, n_channels) or broadcastable.
    """
    r = uv.x.shape[0]
    out = jnp.broadcast_to(jnp.asarray(default, jnp.float32), (r, n_channels))
    for tid, tex in enumerate(textures):
        if tex.shape[-1] < n_channels:
            tex = jnp.broadcast_to(tex, tex.shape[:2] + (n_channels,))
        vals = sample_bilinear(tex[..., :n_channels], uv)
        out = jnp.where((tex_ids == tid)[:, None], vals, out)
    return out
