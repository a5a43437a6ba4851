"""True-SoA value types for the shading hot path: V2 / V3 / S4 / Frame.

Why these exist: on TPU every materialized array tiles as T(8, 128) over
its last two axes, so a ``(R, 3)`` vector buffer pads its channel axis
3 -> 128 lanes (~42x its logical size) and every elementwise pass over it
runs at 3/128 lane efficiency — measured as the dominant cost of a
wavefront step (PERF.md round 4).  Carrying each component as its own
``(R,)`` array instead keeps every op a full-width VPU op and every buffer
its logical size.  This is the "true SoA" refactor round 4 deferred: the
*state and interfaces* carry components (slicing padded arrays after the
fact was measured counterproductive).

These are frozen dataclasses registered as pytrees — deliberately NOT
NamedTuples: a tuple subclass silently converts under ``jnp.asarray``
(``ndarray * V3`` would stack the components into a (3, R) array and
broadcast wrongly); a dataclass fails loudly instead.  Put the SoA value
on the LEFT of mixed arithmetic (``v * s``).

The reference's per-value equivalents: glam Vec3 wrappers
(math/src/vector.rs:12), ``SampledSpectrum`` 4-lane struct
(spectrum/src/sampled_spectrum.rs:11) and tangent-frame ``Transform``s
(math/src/transform.rs:167-245).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

__all__ = [
    "V2", "V3", "S4", "Frame", "sel", "smap",
    "dot3", "cross3", "normalize3", "length3", "length_sq3",
    "face_forward3", "orthogonalize3", "generate_tangent3",
    "make_frame", "to_frame", "from_frame", "frame_rows",
    "v3_stack", "v3_unstack", "v2_stack", "v2_unstack",
    "s4_stack", "s4_unstack", "s4_mean", "s4_max", "s4_dot", "s4_full",
    "v3_const", "v3_full",
]


def _binop(op):
    def f(self, other):
        cls = type(self)
        if isinstance(other, cls):
            return cls(*(op(a, b) for a, b in
                         zip(dataclasses.astuple(self),
                             dataclasses.astuple(other))))
        return cls(*(op(a, other) for a in dataclasses.astuple(self)))
    return f


def _rbinop(op):
    def f(self, other):
        cls = type(self)
        return cls(*(op(other, a) for a in dataclasses.astuple(self)))
    return f


class _Ops:
    """Elementwise arithmetic over the component fields.

    Scalar operands ((R,) arrays or python floats) broadcast to every
    component — the SoA form of the old ``x[:, None]`` lane broadcast."""
    __add__ = _binop(lambda a, b: a + b)
    __sub__ = _binop(lambda a, b: a - b)
    __mul__ = _binop(lambda a, b: a * b)
    __truediv__ = _binop(lambda a, b: a / b)
    __pow__ = _binop(lambda a, b: a ** b)
    __radd__ = _rbinop(lambda b, a: b + a)
    __rsub__ = _rbinop(lambda b, a: b - a)
    __rmul__ = _rbinop(lambda b, a: b * a)
    __rtruediv__ = _rbinop(lambda b, a: b / a)

    def __neg__(self):
        return type(self)(*(-a for a in dataclasses.astuple(self)))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class V2(_Ops):
    x: Any
    y: Any


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class V3(_Ops):
    x: Any
    y: Any
    z: Any


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class S4(_Ops):
    """4-lane hero-wavelength spectral value (SampledSpectrum equivalent)."""
    a: Any
    b: Any
    c: Any
    d: Any

    @property
    def lanes(self):
        return (self.a, self.b, self.c, self.d)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Frame:
    """Orthonormal rotation render<->tangent; rows (t, b, n), +Z = normal.

    Equivalent of ``Transform::from_shading_normal_tangent``
    (math/src/transform.rs:186-214) in component form.
    """
    t: V3
    b: V3
    n: V3


# ---------------------------------------------------------------------------
# Generic helpers
# ---------------------------------------------------------------------------

def smap(f, *xs):
    """Componentwise map over matching SoA structures."""
    return jax.tree.map(f, *xs)


def sel(mask, a, b):
    """``jnp.where`` lifted over any SoA structure (mask: (R,))."""
    return jax.tree.map(lambda x, y: jnp.where(mask, x, y), a, b)


# ---------------------------------------------------------------------------
# V3 math
# ---------------------------------------------------------------------------

def v3_const(x: float, y: float, z: float) -> V3:
    return V3(jnp.float32(x), jnp.float32(y), jnp.float32(z))


def v3_full(r: int, x: float = 0.0, y: float = 0.0, z: float = 0.0) -> V3:
    return V3(jnp.full((r,), x), jnp.full((r,), y), jnp.full((r,), z))


def dot3(a: V3, b: V3):
    return a.x * b.x + a.y * b.y + a.z * b.z


def cross3(a: V3, b: V3) -> V3:
    return V3(a.y * b.z - a.z * b.y,
              a.z * b.x - a.x * b.z,
              a.x * b.y - a.y * b.x)


def length_sq3(v: V3):
    return dot3(v, v)


def length3(v: V3):
    return jnp.sqrt(jnp.maximum(dot3(v, v), 0.0))


def normalize3(v: V3, eps: float = 1e-20) -> V3:
    return v * jax.lax.rsqrt(jnp.maximum(dot3(v, v), eps * eps))


def face_forward3(n: V3, v: V3) -> V3:
    return sel(dot3(n, v) < 0.0, -n, n)


def orthogonalize3(v: V3, n: V3) -> V3:
    """Gram-Schmidt v against unit n, normalized (math/src/vector.rs)."""
    return normalize3(v - n * dot3(v, n))


def generate_tangent3(n: V3) -> V3:
    """Branchless Frisvad tangent for unit n (math/src/normal.rs:9-91)."""
    sign = jnp.where(n.z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n.z)
    b = n.x * n.y * a
    return V3(1.0 + sign * n.x * n.x * a, sign * b, -sign * n.x)


# ---------------------------------------------------------------------------
# Frames
# ---------------------------------------------------------------------------

def make_frame(n: V3, t: V3) -> Frame:
    """Orthonormal frame from unit normal + raw tangent
    (math/src/transform.rs:186-214)."""
    t = orthogonalize3(t, n)
    return Frame(t=t, b=cross3(n, t), n=n)


def to_frame(f: Frame, v: V3) -> V3:
    """Render -> tangent (rows-as-basis)."""
    return V3(dot3(f.t, v), dot3(f.b, v), dot3(f.n, v))


def from_frame(f: Frame, v: V3) -> V3:
    """Tangent -> render (transpose = inverse for rotations)."""
    return f.t * v.x + f.b * v.y + f.n * v.z


def frame_rows(f: Frame):
    return (f.t, f.b, f.n)


# ---------------------------------------------------------------------------
# S4 reductions
# ---------------------------------------------------------------------------

def s4_full(r: int, v: float = 0.0) -> S4:
    x = jnp.full((r,), v)
    return S4(x, x, x, x)


def s4_mean(s: S4):
    return (s.a + s.b + s.c + s.d) * 0.25


def s4_max(s: S4):
    return jnp.maximum(jnp.maximum(s.a, s.b), jnp.maximum(s.c, s.d))


def s4_dot(a: S4, b: S4):
    return a.a * b.a + a.b * b.b + a.c * b.c + a.d * b.d


# ---------------------------------------------------------------------------
# AoS <-> SoA boundaries (kernel edges, tests, host code)
# ---------------------------------------------------------------------------

def v3_stack(v: V3):
    return jnp.stack([v.x, v.y, v.z], axis=-1)


def v3_unstack(arr) -> V3:
    return V3(arr[..., 0], arr[..., 1], arr[..., 2])


def v2_stack(v: V2):
    return jnp.stack([v.x, v.y], axis=-1)


def v2_unstack(arr) -> V2:
    return V2(arr[..., 0], arr[..., 1])


def s4_stack(s: S4):
    return jnp.stack([s.a, s.b, s.c, s.d], axis=-1)


def s4_unstack(arr) -> S4:
    return S4(arr[..., 0], arr[..., 1], arr[..., 2], arr[..., 3])
