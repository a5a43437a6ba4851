"""Multi-chip sharding: pixel/ray data-parallelism over a device mesh.

The reference's only parallelism is a rayon ``par_iter_mut`` over pixels
(renderer/src/renderer.rs:121-134).  The TPU-native equivalent is a 1-D
``jax.sharding.Mesh`` over a ``rays`` axis: the flat pixel buffer is sharded
across chips, the scene (BVH, material/light tables, spectra bank, textures)
is replicated per chip, and film/gradient reductions ride ICI collectives
(``psum``) inside ``shard_map``.

Provides:
  * ``make_mesh``           — 1-D device mesh over the ``rays`` axis
  * ``render_sharded``      — forward render, pixels sharded across chips
  * ``loss_and_grads``      — differentiable pass: MSE pixel loss vs a target
                              image, gradients w.r.t. material parameters
                              all-reduced over the mesh
  * ``train_step``          — one SGD step on material parameters
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..render import film as film_mod
from ..render.integrator import RenderConfig, _pixel_grid, trace_sample
from ..render.sampler import make_sampler
from ..scene.types import SceneData, SceneMeta

AXIS = "rays"

# Material-table columns exposed to the differentiable pass.  Discrete
# decisions (BVH hits, lobe/light choices, RR) are treated as fixed sample
# decisions; these continuous parameters receive pixel-loss gradients.
TRAINABLE_COLUMNS = ("base_coeff", "roughness", "metallic",
                     "emission_scale", "coat_tint_coeff", "coat_roughness")


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (AXIS,))


def extract_params(scene: SceneData) -> dict:
    """Pull the trainable material columns out of the scene pytree."""
    return {c: getattr(scene.materials, c) for c in TRAINABLE_COLUMNS}


def merge_params(scene: SceneData, params: dict) -> SceneData:
    return scene._replace(materials=scene.materials._replace(**params))


def _accum_linear(scene, meta, camera, cfg, pixel_xy, max_depth_dyn=None):
    """Mean linear-RGB estimate over spp for a block of pixels -> (R, 3).

    Honors ``cfg.tile_rays`` exactly like ``integrator.render``: a shard
    whose pixel block exceeds the tile budget marches tiles sequentially
    (bounds the per-chip HBM footprint of the wavefront)."""
    sampler = make_sampler(cfg.sampler, cfg.seed, cfg.spp,
                           (cfg.width, cfg.height))

    def tile_accum(px_tile):
        def body(s_idx, accum):
            return accum + trace_sample(scene, meta, camera, cfg, sampler,
                                        px_tile, s_idx,
                                        max_depth_dyn=max_depth_dyn)
        return jax.lax.fori_loop(0, cfg.spp, body,
                                 jnp.zeros((px_tile.shape[0], 3)))

    n_px = pixel_xy.shape[0]
    tile = min(cfg.tile_rays, n_px)
    n_tiles = -(-n_px // tile)
    if n_tiles == 1:
        accum = tile_accum(pixel_xy)
    else:
        pad = n_tiles * tile - n_px
        px = jnp.concatenate([pixel_xy, jnp.zeros((pad, 2), jnp.int32)], 0)
        accum = jax.lax.map(tile_accum,
                            px.reshape(n_tiles, tile, 2)).reshape(-1, 3)[:n_px]
    return accum / cfg.spp


def _pad_pixels(cfg: RenderConfig, n_shards: int):
    """Flat pixel grid padded so the ray axis divides the mesh."""
    pixel_xy = np.asarray(_pixel_grid(cfg.width, cfg.height))
    r = pixel_xy.shape[0]
    pad = (-r) % n_shards
    if pad:
        pixel_xy = np.concatenate([pixel_xy, np.zeros((pad, 2), np.int32)], 0)
    return jnp.asarray(pixel_xy), r


@partial(jax.jit, static_argnums=(1, 2, 3, 5))
def _render_sharded_jit(scene, meta, camera, cfg, pixel_xy, mesh,
                        max_depth_dyn=None):
    # max_depth rides in as a runtime scalar (jit argument, not an embedded
    # constant) so the bounce loop's trip count stays opaque to XLA — see
    # integrator.trace_sample docstring
    fn = jax.shard_map(
        lambda sc, px, md: _accum_linear(sc, meta, camera, cfg, px,
                                         max_depth_dyn=md),
        mesh=mesh, in_specs=(P(), P(AXIS), P()), out_specs=P(AXIS),
        check_vma=False)
    return fn(scene, pixel_xy, max_depth_dyn)


def render_sharded(scene: SceneData, meta: SceneMeta, camera, cfg: RenderConfig,
                   mesh: Mesh | None = None):
    """Full forward render with pixels sharded over the mesh.

    Returns the display-encoded (H, W, 3) image, identical to
    ``integrator.render`` modulo shard boundaries (bitwise identical in
    fact: samplers are pure functions of (pixel, sample, dim)).
    """
    mesh = mesh or make_mesh()
    pixel_xy, r = _pad_pixels(cfg, mesh.devices.size)
    accum = _render_sharded_jit(scene, meta, camera, cfg, pixel_xy, mesh,
                                jnp.asarray(cfg.max_depth, jnp.int32))[:r]
    # AOV-aware finalize, same rule as integrator._render_jit
    img = film_mod.finalize(
        accum * cfg.spp, cfg.spp,
        tone_map=cfg.tone_map if cfg.strategy in ("pt", "nee", "mis") else "none",
        eotf=cfg.eotf if cfg.strategy in ("pt", "nee", "mis", "albedo") else "linear")
    return img.reshape(cfg.height, cfg.width, 3)


@partial(jax.jit, static_argnums=(2, 3, 4, 7))
def _loss_and_grads_jit(params, scene, meta, camera, cfg, pixel_xy, target,
                        mesh):
    n_total = pixel_xy.shape[0]

    def per_shard(params, scene, px, tgt):
        def loss_fn(p):
            rgb = _accum_linear(merge_params(scene, p), meta, camera, cfg, px)
            return jnp.sum((rgb - tgt) ** 2) / (3.0 * n_total)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # film loss and parameter grads all-reduce over ICI
        loss = jax.lax.psum(loss, AXIS)
        grads = jax.tree.map(lambda g: jax.lax.psum(g, AXIS), grads)
        return loss, grads

    fn = jax.shard_map(per_shard, mesh=mesh,
                       in_specs=(P(), P(), P(AXIS), P(AXIS)),
                       out_specs=(P(), P()), check_vma=False)
    return fn(params, scene, pixel_xy, target)


def loss_and_grads(params: dict, scene: SceneData, meta: SceneMeta, camera,
                   cfg: RenderConfig, target, mesh: Mesh | None = None):
    """MSE(linear render, target) and its gradient w.r.t. ``params``.

    ``target``: (H*W, 3) linear-RGB target image.  Pixels are sharded over
    the mesh; each chip renders + backprops its block, gradients are
    ``psum``-reduced so every chip holds the full gradient.
    """
    mesh = mesh or make_mesh()
    # reverse-mode requires the statically-bounded bounce loop
    import dataclasses as _dc
    cfg = _dc.replace(cfg, early_exit=False)
    pixel_xy, r = _pad_pixels(cfg, mesh.devices.size)
    pad = pixel_xy.shape[0] - r
    if pad:
        target = jnp.concatenate([target, jnp.zeros((pad, 3))], 0)
    return _loss_and_grads_jit(params, scene, meta, camera, cfg, pixel_xy,
                               target, mesh)


def train_step(params: dict, scene: SceneData, meta: SceneMeta, camera,
               cfg: RenderConfig, target, lr: float = 0.1,
               mesh: Mesh | None = None):
    """One SGD step on the trainable material columns. Returns
    (new_params, loss)."""
    loss, grads = loss_and_grads(params, scene, meta, camera, cfg, target,
                                 mesh)
    new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
    return new_params, loss
