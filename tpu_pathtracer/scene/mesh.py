"""Triangle meshes: OBJ loading, procedural generators, tangent generation.

Host-side (numpy) equivalent of the reference's ``TriangleMesh`` geometry
(scene/src/geometry/impls/triangle_mesh.rs:128-286).  Meshes exist only
during scene compilation; the scene compiler concatenates them into global
SoA device arrays, so nothing here needs to be jittable.

The reference's demo assets (bunny.obj, dragon.obj, Cornell-box pieces) are
git-LFS pointer stubs in this checkout, so this module also provides
procedural stand-ins with matching roles: the Cornell box pieces are exact
(they are simple quads with known layout), and ``bunny()`` / ``dragon()``
are smooth organic hero meshes (perturbed icosphere / torus knot) standing
in for the unavailable scans.
"""
from __future__ import annotations

import dataclasses
import os

import numpy as np

__all__ = ["Mesh", "load_obj", "quad", "box_interior", "uv_sphere", "bunny",
           "dragon", "try_load_asset"]

# Real scanned assets are loaded from here when present (and not LFS
# pointer stubs); TPT_ASSET_DIR overrides.
ASSET_DIR = os.environ.get("TPT_ASSET_DIR", "/root/reference/renderer/assets")


def _is_lfs_stub(path: str) -> bool:
    try:
        with open(path, "rb") as f:
            return f.read(32).startswith(b"version https://git-lfs")
    except OSError:
        return True


def try_load_asset(name: str, fit_height: float | None = None):
    """Load ``ASSET_DIR/name`` if it is a real OBJ (not an LFS stub).

    Returns the Mesh or None.  When ``fit_height`` is given the mesh is
    uniformly rescaled so its Y extent equals it, recentered in XZ with its
    base at y=0 — the convention the procedural stand-ins use, so a real
    scan drops into the same scene transforms.
    """
    path = os.path.join(ASSET_DIR, name)
    if not os.path.isfile(path) or _is_lfs_stub(path):
        return None
    m = load_obj(path)
    if fit_height is not None and len(m.positions):
        p = m.positions
        lo, hi = p.min(0), p.max(0)
        s = fit_height / max(hi[1] - lo[1], 1e-9)
        center = (lo + hi) * 0.5
        p = (p - [center[0], lo[1], center[2]]) * s
        m = dataclasses.replace(m, positions=p.astype(np.float32))
    return m


@dataclasses.dataclass
class Mesh:
    """SoA triangle mesh (numpy, host-side).

    positions: (V, 3) f32; normals: (V, 3); uvs: (V, 2);
    indices: (T, 3) i32; tangents: (T, 3) per-triangle UV-derived tangents
    (the reference also stores tangents per triangle, triangle_mesh.rs:183).
    """
    positions: np.ndarray
    normals: np.ndarray
    uvs: np.ndarray
    indices: np.ndarray
    tangents: np.ndarray

    @property
    def n_triangles(self) -> int:
        return len(self.indices)

    def transformed(self, matrix: np.ndarray) -> "Mesh":
        """Apply a 4x4 transform (normals via inverse transpose)."""
        m = np.asarray(matrix, np.float64)
        p = self.positions @ m[:3, :3].T + m[:3, 3]
        n_mat = np.linalg.inv(m[:3, :3]).T
        n = self.normals @ n_mat.T
        n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
        t = self.tangents @ m[:3, :3].T
        t /= np.maximum(np.linalg.norm(t, axis=-1, keepdims=True), 1e-20)
        return Mesh(p.astype(np.float32), n.astype(np.float32), self.uvs,
                    self.indices, t.astype(np.float32))


def _generate_tangents(positions, uvs, indices) -> np.ndarray:
    """Per-triangle tangents from UV derivatives with degenerate fallback.

    Mirrors the reference's loader logic (triangle_mesh.rs:181-226): tangent
    = (e1*dv2 - e2*dv1)/det; if |det| < 1e-6 or NaN, fall back to an
    arbitrary tangent of the geometric normal.
    """
    p0, p1, p2 = (positions[indices[:, k]] for k in range(3))
    e1, e2 = p1 - p0, p2 - p0
    if len(uvs):
        uv0, uv1, uv2 = (uvs[indices[:, k]] for k in range(3))
        d1, d2 = uv1 - uv0, uv2 - uv0
        det = d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]
        safe_det = np.where(np.abs(det) < 1e-6, 1.0, det)
        t = (e1 * d2[:, 1:2] - e2 * d1[:, 1:2]) / safe_det[:, None]
        bad = (np.abs(det) < 1e-6) | ~np.isfinite(t).all(-1) | \
            (np.linalg.norm(t, axis=-1) < 1e-12)
    else:
        t = np.zeros_like(e1)
        bad = np.ones(len(e1), dtype=bool)

    # fallback: branchless tangent of the geometric normal (math/src/normal.rs)
    gn = np.cross(e1, e2)
    gn_len = np.linalg.norm(gn, axis=-1, keepdims=True)
    gn = np.where(gn_len < 1e-12, np.array([0.0, 0.0, 1.0]), gn / np.maximum(gn_len, 1e-20))
    sign = np.where(gn[:, 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + gn[:, 2])
    b = gn[:, 0] * gn[:, 1] * a
    fb = np.stack([1.0 + sign * gn[:, 0] ** 2 * a, sign * b, -sign * gn[:, 0]], -1)

    t = np.where(bad[:, None], fb, t)
    t /= np.maximum(np.linalg.norm(t, axis=-1, keepdims=True), 1e-20)
    return t.astype(np.float32)


def _finalize(positions, normals, uvs, indices) -> Mesh:
    positions = np.asarray(positions, np.float32)
    indices = np.asarray(indices, np.int32).reshape(-1, 3)
    uvs = np.asarray(uvs, np.float32).reshape(-1, 2) if len(uvs) else np.zeros((len(positions), 2), np.float32)
    if normals is None or not len(normals):
        # area-weighted vertex normals
        p0, p1, p2 = (positions[indices[:, k]] for k in range(3))
        fn = np.cross(p1 - p0, p2 - p0)
        normals = np.zeros_like(positions)
        for k in range(3):
            np.add.at(normals, indices[:, k], fn)
        normals /= np.maximum(np.linalg.norm(normals, axis=-1, keepdims=True), 1e-20)
    normals = np.asarray(normals, np.float32)
    tangents = _generate_tangents(positions, uvs, indices)
    return Mesh(positions, normals, uvs, indices, tangents)


# ---------------------------------------------------------------------------
# OBJ loader (single-index + triangulate, like tobj's options in the ref)
# ---------------------------------------------------------------------------

def load_obj(path: str) -> Mesh:
    """Minimal OBJ parser: v/vt/vn + polygonal f, fan-triangulated.

    Equivalent of the reference's tobj load with single_index+triangulate
    (triangle_mesh.rs:141-152): every unique (v, vt, vn) triple becomes one
    vertex.
    """
    vs, vts, vns = [], [], []
    out_pos, out_uv, out_nrm, out_idx = [], [], [], []
    cache: dict = {}

    def vertex(token: str) -> int:
        if token in cache:
            return cache[token]
        parts = token.split("/")
        vi = int(parts[0])
        vi = vi - 1 if vi > 0 else len(vs) + vi
        out_pos.append(vs[vi])
        if len(parts) > 1 and parts[1]:
            ti = int(parts[1])
            out_uv.append(vts[ti - 1 if ti > 0 else len(vts) + ti])
        else:
            out_uv.append((0.0, 0.0))
        if len(parts) > 2 and parts[2]:
            ni = int(parts[2])
            out_nrm.append(vns[ni - 1 if ni > 0 else len(vns) + ni])
        else:
            out_nrm.append((0.0, 0.0, 0.0))
        idx = len(out_pos) - 1
        cache[token] = idx
        return idx

    with open(path) as f:
        for line in f:
            t = line.split()
            if not t:
                continue
            if t[0] == "v":
                vs.append(tuple(map(float, t[1:4])))
            elif t[0] == "vt":
                vts.append(tuple(map(float, t[1:3])))
            elif t[0] == "vn":
                vns.append(tuple(map(float, t[1:4])))
            elif t[0] == "f":
                ids = [vertex(tok) for tok in t[1:]]
                for k in range(1, len(ids) - 1):  # fan triangulation
                    out_idx.append((ids[0], ids[k], ids[k + 1]))

    normals = np.asarray(out_nrm, np.float32)
    if not len(normals) or float(np.abs(normals).sum()) == 0.0:
        normals = None
    return _finalize(out_pos, normals, out_uv, out_idx)


# ---------------------------------------------------------------------------
# Procedural meshes
# ---------------------------------------------------------------------------

def quad(p00, p10, p11, p01, uv_scale: float = 1.0) -> Mesh:
    """Two-triangle quad with planar UVs; vertices counter-clockwise."""
    p = np.asarray([p00, p10, p11, p01], np.float32)
    n = np.cross(p[1] - p[0], p[3] - p[0])
    n = n / np.maximum(np.linalg.norm(n), 1e-20)
    normals = np.tile(n, (4, 1))
    uvs = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32) * uv_scale
    indices = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    return _finalize(p, normals, uvs, indices)


def box_interior(size: float = 1.0, half_depth: float = 1.0):
    """Cornell-box interior walls as named quads facing inward.

    Stand-in for the reference's LFS assets yuka/tenjou/oku/hidari/migi
    (floor/ceiling/back/left/right, renderer/assets/*.obj): a [-s, s]^3 box
    centred at origin. Returns dict of name -> Mesh.
    """
    s = size
    d = half_depth
    return {
        # floor (y=-s, normal +y)
        "floor": quad([-s, -s, d], [s, -s, d], [s, -s, -d], [-s, -s, -d]),
        # ceiling (y=+s, normal -y)
        "ceiling": quad([-s, s, -d], [s, s, -d], [s, s, d], [-s, s, d]),
        # back wall (z=-d, normal +z)
        "back": quad([-s, -s, -d], [s, -s, -d], [s, s, -d], [-s, s, -d]),
        # left wall (x=-s, normal +x)
        "left": quad([-s, -s, -d], [-s, -s, d], [-s, s, d], [-s, s, -d]),
        # right wall (x=+s, normal -x)
        "right": quad([s, -s, d], [s, -s, -d], [s, s, -d], [s, s, d]),
    }


def uv_sphere(radius: float = 1.0, n_theta: int = 32, n_phi: int = 64,
              center=(0.0, 0.0, 0.0)) -> Mesh:
    """Lat-long sphere with spherical UVs and exact normals."""
    th = np.linspace(0.0, np.pi, n_theta + 1)
    ph = np.linspace(0.0, 2.0 * np.pi, n_phi + 1)
    tt, pp = np.meshgrid(th, ph, indexing="ij")
    x = np.sin(tt) * np.cos(pp)
    y = np.cos(tt)
    z = np.sin(tt) * np.sin(pp)
    pos = np.stack([x, y, z], -1).reshape(-1, 3)
    normals = pos.copy()
    pos = pos * radius + np.asarray(center)
    uvs = np.stack([pp / (2 * np.pi), 1.0 - tt / np.pi], -1).reshape(-1, 2)

    idx = []
    cols = n_phi + 1
    for i in range(n_theta):
        for j in range(n_phi):
            a = i * cols + j
            b = a + 1
            c = a + cols
            dd = c + 1
            idx.append((a, c, b))
            idx.append((b, c, dd))
    return _finalize(pos, normals, uvs, idx)


def _smooth_mesh(pos, indices, iters: int = 2):
    """Simple Laplacian smoothing used by the procedural hero meshes."""
    for _ in range(iters):
        acc = np.zeros_like(pos)
        cnt = np.zeros(len(pos))
        for a, b in ((0, 1), (1, 2), (2, 0)):
            np.add.at(acc, indices[:, a], pos[indices[:, b]])
            np.add.at(cnt, indices[:, a], 1.0)
            np.add.at(acc, indices[:, b], pos[indices[:, a]])
            np.add.at(cnt, indices[:, b], 1.0)
        pos = 0.5 * pos + 0.5 * acc / np.maximum(cnt[:, None], 1.0)
    return pos


def bunny(scale: float = 1.0, subdiv: int = 48) -> Mesh:
    """'Bunny' hero mesh: the real scan when available, else procedural.

    Tries ``ASSET_DIR/bunny.obj`` first (the reference's scan,
    renderer/assets/bunny.obj — an LFS stub in this checkout).  The
    procedural fallback is a smooth organic blob: unit sphere displaced by
    a few fixed low-frequency bumps (head/ears-ish), ~5-10k triangles.
    """
    real = try_load_asset("bunny.obj", fit_height=1.15 * scale)
    if real is not None:
        return real
    m = uv_sphere(1.0, subdiv, subdiv * 2)
    p = m.positions.copy()
    n = m.normals

    def bump(center, sharp, amp):
        c = np.asarray(center, np.float32)
        c = c / np.linalg.norm(c)
        d = (n @ c).clip(-1, 1)
        return amp * np.exp(sharp * (d - 1.0))

    disp = (0.25 * bump([0.0, 0.8, 0.6], 6.0, 1.0)       # head
            + 0.45 * bump([0.25, 1.0, 0.35], 40.0, 1.0)  # ear 1
            + 0.45 * bump([-0.25, 1.0, 0.35], 40.0, 1.0) # ear 2
            + 0.18 * bump([0.0, -0.2, -1.0], 3.0, 1.0)   # tail-ish
            - 0.10 * bump([0.0, -1.0, 0.0], 2.0, 1.0))   # flatten base
    p = p * (1.0 + disp[:, None])
    p[:, 1] *= 1.05
    p = _smooth_mesh(p, m.indices, 1) * (0.55 * scale)
    return _finalize(p, None, m.uvs, m.indices)


def dragon(scale: float = 1.0, n_u: int = 256, n_v: int = 24) -> Mesh:
    """'Dragon' hero mesh: the real scan when available, else procedural.

    Tries ``ASSET_DIR/dragon.min.obj`` then ``dragon.obj`` (the reference's
    ~870k-tri scan, renderer/assets/ — LFS stubs in this checkout).  The
    procedural fallback is a (2,3) torus knot swept with a varying-radius
    tube: long, twisty, self-shadowing; resolution (n_u, n_v) controls the
    triangle count (2*n_u*n_v — e.g. (1024, 56) ~ 114k tris for
    reference-scale traversal workloads).
    """
    for name in ("dragon.min.obj", "dragon.obj"):
        real = try_load_asset(name, fit_height=0.9 * scale)
        if real is not None:
            return real
    u = np.linspace(0.0, 2.0 * np.pi, n_u, endpoint=False)
    # (2,3) torus knot centreline
    cx = np.cos(2 * u) * (2.0 + np.cos(3 * u))
    cy = np.sin(3 * u) * 0.6
    cz = np.sin(2 * u) * (2.0 + np.cos(3 * u))
    c = np.stack([cx, cy, cz], -1) * 0.28

    # Frenet-ish frames along the curve
    t = np.roll(c, -1, 0) - np.roll(c, 1, 0)
    t /= np.maximum(np.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    ref = np.array([0.0, 1.0, 0.0])
    b = np.cross(t, ref)
    b /= np.maximum(np.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
    nrm = np.cross(b, t)

    radius = 0.09 * (1.0 + 0.35 * np.cos(5 * u))[:, None]
    v = np.linspace(0.0, 2.0 * np.pi, n_v, endpoint=False)
    circ = np.stack([np.cos(v), np.sin(v)], -1)  # (n_v, 2)

    pos = (c[:, None, :]
           + radius[:, :, None] * (circ[None, :, 0:1] * nrm[:, None, :]
                                   + circ[None, :, 1:2] * b[:, None, :]))
    pos = pos.reshape(-1, 3) * scale

    uvs = np.stack(np.meshgrid(u / (2 * np.pi), v / (2 * np.pi), indexing="ij"),
                   -1).reshape(-1, 2)
    idx = []
    for i in range(n_u):
        for j in range(n_v):
            a = i * n_v + j
            bq = i * n_v + (j + 1) % n_v
            cq = ((i + 1) % n_u) * n_v + j
            dq = ((i + 1) % n_u) * n_v + (j + 1) % n_v
            idx.append((a, cq, bq))
            idx.append((bq, cq, dq))
    return _finalize(pos, None, uvs, idx)
