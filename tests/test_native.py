"""Native C++ BVH builder (native/bvh_builder.cpp) equivalence tests.

The native builder implements the same 16-bin SAH as scene/bvh.py; float
rounding at bin boundaries may shuffle a few triangles between children, so
the gate is semantic: device traversal over the native tree must agree with
the brute-force oracle on every ray, and tree quality (node count, depth)
must match the Python build.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pathtracer import native
from tpu_pathtracer.ops import trace
from tpu_pathtracer.scene import bvh, mesh

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _arrays(fb, p):
    return trace.pack_bvh(fb, p[fb.order])


def test_native_build_matches_brute_force():
    m = mesh.bunny(subdiv=16)
    p = m.positions[m.indices]
    fb = native.build_bvh_native(p.min(1), p.max(1))
    assert fb is not None
    arrs = _arrays(fb, p)

    rng = np.random.default_rng(0)
    o = rng.normal(size=(512, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 3.0
    d = rng.normal(size=(512, 3)) * 0.3 - o
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    o = jnp.asarray(o, jnp.float32)

    h = jax.jit(trace.intersect)(arrs, o, d)
    hb = jax.jit(trace.intersect_brute)(arrs.p0, arrs.p1, arrs.p2, o, d)
    assert (np.asarray(h.hit) == np.asarray(hb.hit)).all()
    both = np.asarray(h.hit)
    assert np.abs(np.asarray(h.t) - np.asarray(hb.t))[both].max() < 1e-5
    assert (np.asarray(h.tri) == np.asarray(hb.tri))[both].all()


def test_native_tree_quality_matches_python():
    m = mesh.dragon(n_u=96, n_v=12)
    p = m.positions[m.indices]
    fb_c = native.build_bvh_native(p.min(1), p.max(1))
    fb_py = bvh.build_bvh(p.min(1), p.max(1))
    # same algorithm => identical size/shape characteristics
    assert fb_c.n_nodes == fb_py.n_nodes
    assert fb_c.depth == fb_py.depth
    assert np.sort(fb_c.order).tolist() == list(range(len(p)))
    # leaf sizes bounded
    leaf = fb_c.count > 0
    assert fb_c.count[leaf].max() <= bvh.MAX_LEAF_SIZE


def test_degenerate_inputs():
    # all centroids identical -> median splits, no infinite loop
    tmin = np.zeros((37, 3), np.float32)
    tmax = np.ones((37, 3), np.float32)
    fb = native.build_bvh_native(tmin, tmax)
    assert fb is not None
    leaf = fb.count > 0
    assert fb.count[leaf].sum() == 37
    assert fb.count[leaf].max() <= bvh.MAX_LEAF_SIZE
