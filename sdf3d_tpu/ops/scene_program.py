"""Scene compiler: SDF pytree → structure-of-arrays TPU kernel program.

The reference compiles its scene by handing GLSL text to the driver
(``sceneSDF`` at ``/root/reference/Code/shader/voxel_fragment.frag:73-81``,
built at ``main.cpp:74-77``).  The TPU-native equivalent is staged tracing:
:func:`compile_scene` walks the scene pytree **once at trace time** and emits
a closed function

    ``dist = emit(px, py, pz, getp)``

over *component planes* ``px, py, pz`` (each an ``(TH, TW)`` tile) and a
scalar-parameter accessor ``getp(i)`` (an SMEM read inside a Pallas kernel, a
vector index outside).  Two properties make this the right shape for the VPU:

- **SoA layout**: no ``(..., 3)`` trailing axis anywhere — a 3-vector as a
  last dim would be padded to the 128-wide lane dimension by Mosaic, wasting
  ~42× the registers/VMEM.  Every intermediate is a full ``(TH, TW)`` plane.
- **Scalar parameters**: shape parameters are read through ``getp`` as true
  scalars (SMEM), so the emitted program is one fused elementwise expression
  per tile with zero parameter-broadcast traffic.

Parameter order matches ``jax.tree_util.tree_flatten(scene)`` exactly (struct
dataclasses flatten in field order; each handler consumes its params in field
order), so :func:`scene_param_vector` round-trips with ``ravel_pytree`` and
kernel gradients line up with the pytree structure.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from sdf3d_tpu.sdf import csg, primitives, transforms
from sdf3d_tpu.sdf.node import SDFNode

# getp(i) -> scalar parameter i;  emit(px,py,pz,getp) -> distance plane.
GetP = Callable[[int], jnp.ndarray]


def scene_param_vector(scene: SDFNode) -> jnp.ndarray:
    """Flatten every numeric leaf of the scene into one (P,) float32 vector
    (tree_flatten order — the order :func:`compile_scene` consumes)."""
    leaves = jax.tree_util.tree_leaves(scene)
    return jnp.concatenate([jnp.ravel(jnp.asarray(l, jnp.float32)) for l in leaves]) if leaves else jnp.zeros((0,), jnp.float32)


def unflatten_scene_params(scene: SDFNode, vec: jnp.ndarray) -> SDFNode:
    """Rebuild a scene pytree (same structure as ``scene``) from a flat vector."""
    leaves, treedef = jax.tree_util.tree_flatten(scene)
    out, i = [], 0
    for l in leaves:
        n = int(np.prod(np.shape(l))) if np.ndim(l) else 1
        out.append(jnp.reshape(vec[i : i + n], np.shape(l)))
        i += n
    return jax.tree_util.tree_unflatten(treedef, out)


def count_params(node: SDFNode) -> int:
    """Number of scalar parameters in a subtree."""
    return sum(int(np.prod(np.shape(l)) or 1) for l in jax.tree_util.tree_leaves(node))


# ---------------------------------------------------------------------------
# SoA math helpers (all on (TH, TW) planes / scalars)
# ---------------------------------------------------------------------------


def _len3(x, y, z):
    return jnp.sqrt(x * x + y * y + z * z)


def _len2(x, y):
    return jnp.sqrt(x * x + y * y)


def _smooth_mix(da, db, k, sign):
    """Quilez polynomial smooth min/max — scalar k, plane distances
    (mirrors sdf/csg.py::_smooth_mix)."""
    k = jnp.maximum(k, 1e-6)
    h = jnp.clip(0.5 + 0.5 * sign * (db - da) / k, 0.0, 1.0)
    return db + (da - db) * h - sign * k * h * (1.0 - h)


# ---------------------------------------------------------------------------
# Emit handlers: node type -> (px,py,pz,getp,offset) -> distance plane.
# Each consumes parameters at consecutive indices in dataclass-field order.
# ---------------------------------------------------------------------------


def _emit(node, px, py, pz, getp: GetP, off: int):
    t = type(node)
    h = _HANDLERS.get(t)
    if h is None:
        raise TypeError(
            f"no Pallas emitter for scene node {t.__name__}; register one in "
            "sdf3d_tpu/ops/scene_program.py"
        )
    return h(node, px, py, pz, getp, off)


def _sphere(n, px, py, pz, getp, off):
    cx, cy, cz, r = getp(off), getp(off + 1), getp(off + 2), getp(off + 3)
    return _len3(px - cx, py - cy, pz - cz) - r


def _plane(n, px, py, pz, getp, off):
    nx, ny, nz, d = getp(off), getp(off + 1), getp(off + 2), getp(off + 3)
    return px * nx + py * ny + pz * nz - d


def _box_core(px, py, pz, cx, cy, cz, hx, hy, hz):
    qx = jnp.abs(px - cx) - hx
    qy = jnp.abs(py - cy) - hy
    qz = jnp.abs(pz - cz) - hz
    ox = jnp.maximum(qx, 0.0)
    oy = jnp.maximum(qy, 0.0)
    oz = jnp.maximum(qz, 0.0)
    outside = _len3(ox, oy, oz)
    inside = jnp.minimum(jnp.maximum(qx, jnp.maximum(qy, qz)), 0.0)
    return outside + inside


def _box(n, px, py, pz, getp, off):
    return _box_core(px, py, pz, *(getp(off + i) for i in range(6)))


def _round_box(n, px, py, pz, getp, off):
    return _box_core(px, py, pz, *(getp(off + i) for i in range(6))) - getp(off + 6)


def _torus(n, px, py, pz, getp, off):
    cx, cy, cz, major, minor = (getp(off + i) for i in range(5))
    ring = _len2(px - cx, pz - cz) - major
    return _len2(ring, py - cy) - minor


def _capsule(n, px, py, pz, getp, off):
    ax, ay, az, bx, by, bz, r = (getp(off + i) for i in range(7))
    pax, pay, paz = px - ax, py - ay, pz - az
    bax, bay, baz = bx - ax, by - ay, bz - az
    denom = jnp.maximum(bax * bax + bay * bay + baz * baz, 1e-12)
    h = jnp.clip((pax * bax + pay * bay + paz * baz) / denom, 0.0, 1.0)
    return _len3(pax - bax * h, pay - bay * h, paz - baz * h) - r


def _cylinder(n, px, py, pz, getp, off):
    cx, cy, cz, r, hh = (getp(off + i) for i in range(5))
    radial = _len2(px - cx, pz - cz) - r
    axial = jnp.abs(py - cy) - hh
    outside = _len2(jnp.maximum(radial, 0.0), jnp.maximum(axial, 0.0))
    inside = jnp.minimum(jnp.maximum(radial, axial), 0.0)
    return outside + inside


def _ellipsoid(n, px, py, pz, getp, off):
    cx, cy, cz, rx, ry, rz = (getp(off + i) for i in range(6))
    qx, qy, qz = px - cx, py - cy, pz - cz
    k0 = _len3(qx / rx, qy / ry, qz / rz)
    k1 = _len3(qx / (rx * rx), qy / (ry * ry), qz / (rz * rz))
    return k0 * (k0 - 1.0) / jnp.maximum(k1, 1e-12)


def _binary(op):
    def h(n, px, py, pz, getp, off):
        da = _emit(n.a, px, py, pz, getp, off)
        db = _emit(n.b, px, py, pz, getp, off + count_params(n.a))
        return op(da, db)

    return h


def _smooth(sign, neg_b=False):
    def h(n, px, py, pz, getp, off):
        na = count_params(n.a)
        nb = count_params(n.b)
        da = _emit(n.a, px, py, pz, getp, off)
        db = _emit(n.b, px, py, pz, getp, off + na)
        if neg_b:
            db = -db
        k = getp(off + na + nb)
        return _smooth_mix(da, db, k, sign)

    return h


def _translate(n, px, py, pz, getp, off):
    nc = count_params(n.child)
    ox, oy, oz = getp(off + nc), getp(off + nc + 1), getp(off + nc + 2)
    return _emit(n.child, px - ox, py - oy, pz - oz, getp, off)


def _rotate(n, px, py, pz, getp, off):
    nc = count_params(n.child)
    wx, wy, wz = getp(off + nc), getp(off + nc + 1), getp(off + nc + 2)
    # Rodrigues on scalars (series-safe near 0, matching transforms.py).
    t2 = wx * wx + wy * wy + wz * wz
    small = t2 < 1e-8
    safe2 = jnp.where(small, 1.0, t2)
    theta = jnp.sqrt(safe2)
    sinc = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(theta) / theta)
    cosc = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / safe2)
    # R = I + sinc*K + cosc*K²; rotate the query by R⁻¹ = Rᵀ.
    r00 = 1.0 + cosc * (-(wy * wy + wz * wz))
    r01 = -sinc * wz + cosc * (wx * wy)
    r02 = sinc * wy + cosc * (wx * wz)
    r10 = sinc * wz + cosc * (wx * wy)
    r11 = 1.0 + cosc * (-(wx * wx + wz * wz))
    r12 = -sinc * wx + cosc * (wy * wz)
    r20 = -sinc * wy + cosc * (wx * wz)
    r21 = sinc * wx + cosc * (wy * wz)
    r22 = 1.0 + cosc * (-(wx * wx + wy * wy))
    # Rᵀ p: row i of Rᵀ is column i of R.
    qx = r00 * px + r10 * py + r20 * pz
    qy = r01 * px + r11 * py + r21 * pz
    qz = r02 * px + r12 * py + r22 * pz
    return _emit(n.child, qx, qy, qz, getp, off)


def _scale(n, px, py, pz, getp, off):
    nc = count_params(n.child)
    s = jnp.maximum(getp(off + nc), 1e-12)
    return _emit(n.child, px / s, py / s, pz / s, getp, off) * s


def _round(n, px, py, pz, getp, off):
    nc = count_params(n.child)
    return _emit(n.child, px, py, pz, getp, off) - getp(off + nc)


def _onion(n, px, py, pz, getp, off):
    nc = count_params(n.child)
    return jnp.abs(_emit(n.child, px, py, pz, getp, off)) - getp(off + nc)


def _elongate(n, px, py, pz, getp, off):
    nc = count_params(n.child)
    ax, ay, az = getp(off + nc), getp(off + nc + 1), getp(off + nc + 2)
    qx = px - jnp.clip(px, -ax, ax)
    qy = py - jnp.clip(py, -ay, ay)
    qz = pz - jnp.clip(pz, -az, az)
    return _emit(n.child, qx, qy, qz, getp, off)


def _repeat(n, px, py, pz, getp, off):
    nc = count_params(n.child)

    def fold(p, period):
        safe = jnp.where(period > 0.0, period, 1.0)
        return jnp.where(period > 0.0, p - period * jnp.round(p / safe), p)

    qx = fold(px, getp(off + nc))
    qy = fold(py, getp(off + nc + 1))
    qz = fold(pz, getp(off + nc + 2))
    return _emit(n.child, qx, qy, qz, getp, off)


_HANDLERS = {
    primitives.Sphere: _sphere,
    primitives.Plane: _plane,
    primitives.Box: _box,
    primitives.RoundBox: _round_box,
    primitives.Torus: _torus,
    primitives.Capsule: _capsule,
    primitives.Cylinder: _cylinder,
    primitives.Ellipsoid: _ellipsoid,
    csg.Union: _binary(jnp.minimum),
    csg.Intersection: _binary(jnp.maximum),
    csg.Subtraction: _binary(lambda a, b: jnp.maximum(a, -b)),
    csg.SmoothUnion: _smooth(+1.0),
    csg.SmoothIntersection: _smooth(-1.0),
    csg.SmoothSubtraction: _smooth(-1.0, neg_b=True),
    transforms.Translate: _translate,
    transforms.Rotate: _rotate,
    transforms.Scale: _scale,
    transforms.Round: _round,
    transforms.Onion: _onion,
    transforms.Elongate: _elongate,
    transforms.RepeatInfinite: _repeat,
}


def compile_scene(scene: SDFNode):
    """Stage the scene into ``soa_fn(px, py, pz, getp) -> distance plane``.

    The tree walk happens once (Python time); the returned closure traces to
    one fused elementwise expression.  ``getp`` abstracts where parameters
    live: an SMEM ref inside a Pallas kernel, the flat vector elsewhere.
    """

    def soa_fn(px, py, pz, getp: GetP):
        return _emit(scene, px, py, pz, getp, 0)

    return soa_fn
