"""Progressive rendering with checkpoint/resume.

New TPU-first capability (the reference renders to completion in one shot
and its only artifact is the final PNG, renderer/src/renderer.rs:137-148;
SURVEY §5 calls for orbax-style checkpointing of accumulated tile sums +
spp counter + optimizer state).  A render is split into spp chunks; after
each chunk the film state (linear-RGB accumulator + samples-done counter)
is checkpointed to disk, so a long render survives preemption and resumes
exactly (samplers are pure functions of (pixel, sample, dim): re-running
chunk k reproduces its samples bit-for-bit).
"""
from __future__ import annotations

import dataclasses
import json
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import film as film_mod
from .integrator import RenderConfig, render_accum


@dataclasses.dataclass
class FilmState:
    """Resumable film: sum of per-sample linear RGB + samples completed."""
    accum: np.ndarray          # (H*W, 3) f32 linear
    spp_done: int
    cfg_key: str               # guards against resuming a different render

    def save(self, path: str) -> None:
        tmp = path + ".tmp"
        np.savez(tmp if tmp.endswith(".npz") else tmp + ".npz",
                 accum=self.accum, spp_done=self.spp_done,
                 cfg_key=self.cfg_key)
        src = tmp if tmp.endswith(".npz") else tmp + ".npz"
        os.replace(src, path)

    @staticmethod
    def load(path: str) -> "FilmState":
        z = np.load(path, allow_pickle=False)
        return FilmState(accum=z["accum"], spp_done=int(z["spp_done"]),
                         cfg_key=str(z["cfg_key"]))


def _cfg_key(cfg: RenderConfig) -> str:
    d = dataclasses.asdict(cfg)
    return json.dumps(d, sort_keys=True)


def render_progressive(scene, meta, camera, cfg: RenderConfig,
                       checkpoint_path: str | None = None,
                       chunk_spp: int = 16,
                       on_chunk=None):
    """Render in spp chunks, checkpointing after each.

    Returns the display-encoded (H, W, 3) image.  If ``checkpoint_path``
    exists and matches this render's config, resumes from it.
    """
    key = _cfg_key(cfg)
    state = None
    if checkpoint_path and os.path.exists(checkpoint_path):
        loaded = FilmState.load(checkpoint_path)
        if loaded.cfg_key == key and loaded.spp_done <= cfg.spp:
            state = loaded
    if state is None:
        state = FilmState(
            accum=np.zeros((cfg.width * cfg.height, 3), np.float32),
            spp_done=0, cfg_key=key)

    while state.spp_done < cfg.spp:
        end = min(state.spp_done + chunk_spp, cfg.spp)
        state.accum = np.asarray(render_accum(
            scene, meta, camera, cfg, spp_start=state.spp_done, spp_end=end,
            accum_init=state.accum))
        state.spp_done = end
        if checkpoint_path:
            state.save(checkpoint_path)
        if on_chunk:
            on_chunk(state)

    img = film_mod.finalize(jnp.asarray(state.accum), cfg.spp,
                            tone_map=cfg.tone_map, eotf=cfg.eotf)
    return np.asarray(img).reshape(cfg.height, cfg.width, 3)
