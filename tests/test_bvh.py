"""BVH build + device traversal equivalence tests.

Mirrors the SURVEY test plan: traversal must agree with a brute-force oracle
on every ray (hit flag, t, triangle id, occlusion) for a non-trivial mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np

from tpu_pathtracer.ops import trace
from tpu_pathtracer.scene import bvh, mesh


def _bvh_arrays(m: mesh.Mesh) -> trace.BVHArrays:
    p = m.positions[m.indices]
    fb = bvh.build_bvh(p.min(1), p.max(1))
    return trace.pack_bvh(fb, p[fb.order])


def _random_rays(n, rng, r_origin=3.0):
    o = rng.normal(size=(n, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * r_origin
    target = rng.normal(size=(n, 3)) * 0.3
    d = target - o
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def test_traversal_matches_brute_force():
    m = mesh.bunny(subdiv=16)
    arrs = _bvh_arrays(m)
    o, d = _random_rays(512, np.random.default_rng(0))
    h = jax.jit(trace.intersect)(arrs, o, d)
    hb = jax.jit(trace.intersect_brute)(arrs.p0, arrs.p1, arrs.p2, o, d)
    assert (np.asarray(h.hit) == np.asarray(hb.hit)).all()
    both = np.asarray(h.hit)
    assert np.abs(np.asarray(h.t) - np.asarray(hb.t))[both].max() < 1e-5
    assert (np.asarray(h.tri) == np.asarray(hb.tri))[both].all()


def test_occlusion_matches():
    m = mesh.dragon(n_u=96, n_v=12)
    arrs = _bvh_arrays(m)
    o, d = _random_rays(512, np.random.default_rng(1))
    occ = jax.jit(trace.intersect_p)(arrs, o, d, jnp.full((512,), 3e38, jnp.float32))
    hb = jax.jit(trace.intersect_brute)(arrs.p0, arrs.p1, arrs.p2, o, d)
    assert (np.asarray(occ) == np.asarray(hb.hit)).all()


def test_t_max_respected():
    m = mesh.uv_sphere(1.0, 8, 16)
    arrs = _bvh_arrays(m)
    # rays from outside pointing at sphere but t_max short of the surface
    o = jnp.asarray(np.tile([[0.0, 0.0, 3.0]], (4, 1)), jnp.float32)
    d = jnp.asarray(np.tile([[0.0, 0.0, -1.0]], (4, 1)), jnp.float32)
    h_near = jax.jit(trace.intersect)(arrs, o, d, t_max=jnp.asarray(1.0))
    h_far = jax.jit(trace.intersect)(arrs, o, d, t_max=jnp.asarray(10.0))
    assert not np.asarray(h_near.hit).any()
    assert np.asarray(h_far.hit).all()
    assert np.allclose(np.asarray(h_far.t), 2.0, atol=1e-2)


def test_bvh_covers_all_triangles():
    m = mesh.bunny(subdiv=12)
    p = m.positions[m.indices]
    fb = bvh.build_bvh(p.min(1), p.max(1))
    # order is a permutation; leaves tile the triangle range exactly
    assert sorted(fb.order.tolist()) == list(range(m.n_triangles))
    leaf = fb.count > 0
    spans = sorted((int(s), int(s + c)) for s, c in zip(fb.left[leaf], fb.count[leaf]))
    cursor = 0
    for a, b in spans:
        assert a == cursor
        cursor = b
    assert cursor == m.n_triangles


def test_python_builder_degenerate_leaves():
    """37 coincident triangles (all centroids identical): the Python builder
    must median-split down to MAX_LEAF_SIZE leaves (mirrors the native
    builder) so pack_bvh's 3-bit leaf payload and the device traversal's
    static MAX_LEAF window stay valid."""
    tmin = np.zeros((37, 3), np.float32)
    tmax = np.ones((37, 3), np.float32)
    fb = bvh.build_bvh(tmin, tmax)
    leaf = fb.count > 0
    assert fb.count[leaf].sum() == 37
    assert fb.count[leaf].max() <= bvh.MAX_LEAF_SIZE
    # and the packed tree actually finds all of them
    P = np.zeros((37, 3, 3), np.float32)
    P[:, 0] = [0, 0, 0]
    P[:, 1] = [1, 0, 0]
    P[:, 2] = [0, 1, 0]
    arrs = trace.pack_bvh(fb, P[fb.order])
    o = jnp.asarray([[0.2, 0.2, 1.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    h = jax.jit(trace.intersect)(arrs, o, d)
    assert bool(np.asarray(h.hit)[0])
    assert abs(float(np.asarray(h.t)[0]) - 1.0) < 1e-5


def test_brute_method_matches_bvh():
    """Dense-block (gather-free) traversal == BVH on hits/t/tri/occlusion."""
    m = mesh.bunny(subdiv=16)
    arrs = _bvh_arrays(m)
    o, d = _random_rays(512, np.random.default_rng(2))
    hb = jax.jit(lambda o, d: trace.intersect(arrs, o, d, method="bvh"))(o, d)
    hr = jax.jit(lambda o, d: trace.intersect(arrs, o, d, method="brute"))(o, d)
    assert (np.asarray(hb.hit) == np.asarray(hr.hit)).all()
    both = np.asarray(hb.hit)
    assert np.abs(np.asarray(hb.t) - np.asarray(hr.t))[both].max() == 0.0
    assert (np.asarray(hb.tri) == np.asarray(hr.tri))[both].all()
    tmax = jnp.full((512,), 2.5, jnp.float32)
    ob = jax.jit(lambda o, d: trace.intersect_p(arrs, o, d, tmax,
                                                method="bvh"))(o, d)
    orr = jax.jit(lambda o, d: trace.intersect_p(arrs, o, d, tmax,
                                                 method="brute"))(o, d)
    assert (np.asarray(ob) == np.asarray(orr)).all()


def test_pallas_kernel_matches_bvh_interpret():
    """The Pallas traversal kernel (interpret mode on CPU, precise edge
    functions) == BVH exactly, including ray-count padding, active masks,
    t_max, and both sort orders."""
    from tpu_pathtracer.ops import pallas_trace
    m = mesh.dragon(n_u=48, n_v=10)
    arrs = _bvh_arrays(m)
    n = 300   # deliberately not a multiple of the 128-ray tile
    o, d = _random_rays(n, np.random.default_rng(3))
    act = jnp.asarray(np.random.default_rng(4).uniform(size=n) < 0.7)
    hb = jax.jit(lambda o, d: trace.intersect(arrs, o, d, active=act,
                                              method="bvh"))(o, d)
    for sort in (False, True):
        hp = pallas_trace.traverse(arrs, o, d, jnp.asarray(3e38), active=act,
                                   interpret=True, precise=True, sort=sort)
        assert (np.asarray(hb.hit) == np.asarray(hp.hit)).all()
        both = np.asarray(hb.hit)
        assert np.abs(np.asarray(hb.t) - np.asarray(hp.t))[both].max() == 0.0
        assert np.abs(np.asarray(hb.b1) - np.asarray(hp.b1))[both].max() == 0.0
        assert not np.asarray(hp.hit)[~np.asarray(act)].any()


def test_pallas_kernel_fast_mode_statistics():
    """Fast (uncompensated) edge functions: hits may flip only within a
    sliver around triangle edges.  Gate: >= 99.9% identical hit/miss on
    random rays, and matching hits agree on t to 1e-4 relative."""
    from tpu_pathtracer.ops import pallas_trace
    m = mesh.dragon(n_u=48, n_v=10)
    arrs = _bvh_arrays(m)
    n = 2048
    o, d = _random_rays(n, np.random.default_rng(5))
    hb = jax.jit(lambda o, d: trace.intersect(arrs, o, d,
                                              method="bvh"))(o, d)
    hp = pallas_trace.traverse(arrs, o, d, jnp.asarray(3e38),
                               interpret=True, precise=False)
    same = np.asarray(hb.hit) == np.asarray(hp.hit)
    assert same.mean() >= 0.999
    both = np.asarray(hb.hit) & np.asarray(hp.hit) & same
    tb, tp = np.asarray(hb.t)[both], np.asarray(hp.t)[both]
    assert np.abs(tb - tp).max() <= 1e-4 * np.abs(tb).max()


def test_pallas_anyhit_matches_bvh_interpret():
    from tpu_pathtracer.ops import pallas_trace
    m = mesh.dragon(n_u=48, n_v=10)
    arrs = _bvh_arrays(m)
    n = 300
    o, d = _random_rays(n, np.random.default_rng(6))
    act = jnp.asarray(np.random.default_rng(7).uniform(size=n) < 0.7)
    tmax = jnp.full((n,), 2.5, jnp.float32)
    ob = jax.jit(lambda o, d: trace.intersect_p(arrs, o, d, tmax, active=act,
                                                method="bvh"))(o, d)
    op = pallas_trace.traverse(arrs, o, d, tmax, active=act, any_hit=True,
                               interpret=True, precise=True)
    assert (np.asarray(ob) == np.asarray(op)).all()


def test_pallas_chunked_traversal_matches_bvh():
    """Scenes past MAX_DENSE_TRIS trace as a sequence of VMEM-sized chunk
    traversals with the running best-t forwarded (ops/trace.py
    _pallas_chunked) — no gather-path cliff at any scene size (VERDICT r3
    item 7).  Forced here by shrinking the cap so the bunny scene spans
    many chunks."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpu_pathtracer.ops import trace
    from tpu_pathtracer.scenes import load_scene

    scene, meta, cam = load_scene(0, 32, 24, table_res=16)
    arrs = scene.bvh
    rng = np.random.default_rng(5)
    n = 256
    o = jnp.asarray(rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    act = jnp.asarray(rng.uniform(size=n) > 0.1)

    ref = trace._dispatch("bvh", arrs, o, d, jnp.asarray(3e38), act,
                          any_hit=False)
    occ_ref = trace._dispatch("bvh", arrs, o, d, jnp.asarray(2.0), act,
                              any_hit=True).hit

    old_cap = trace.MAX_DENSE_TRIS
    try:
        trace.MAX_DENSE_TRIS = 1024      # bunny (~9k tris) -> ~10 chunks
        got = trace._pallas_chunked(arrs, o, d, jnp.asarray(3e38), act,
                                    any_hit=False, interpret=True)
        occ = trace._pallas_chunked(arrs, o, d, jnp.asarray(2.0), act,
                                    any_hit=True, interpret=True).hit
    finally:
        trace.MAX_DENSE_TRIS = old_cap

    hit_ref = np.asarray(ref.hit)
    hit_got = np.asarray(got.hit)
    agree = (hit_ref == hit_got).mean()
    assert agree > 0.995, f"hit agreement {agree}"
    both = hit_ref & hit_got
    t_err = np.abs(np.asarray(ref.t)[both] - np.asarray(got.t)[both])
    assert np.percentile(t_err / np.maximum(np.asarray(ref.t)[both], 1e-3),
                         99) < 1e-3
    assert (np.asarray(ref.tri)[both] == np.asarray(got.tri)[both]).mean() \
        > 0.99
    assert (np.asarray(occ_ref) == np.asarray(occ)).mean() > 0.995
