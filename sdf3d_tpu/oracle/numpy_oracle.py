"""Vectorized float32 NumPy oracle for the reference fragment program.

Implements the *exact* math of ``/root/reference/Code/shader/voxel_fragment.frag``
(lines cited per function) independently of the JAX path, for three-way
golden-image parity tests (JAX == NumPy == C++).  All arithmetic is float32;
per-pixel ``break``s become lane masks frozen in the same program order as the
GLSL loop bodies, so results agree with a scalar transliteration bit-for-bit
up to fused-multiply-add differences.

Quirks reproduced on purpose (SURVEY.md §2):
- ray z-term ``-2/tan(fov·π/360)`` (frag:191) — effective FOV ≈ 32.3°;
- no miss branch: rays beyond MAX_DISTANCE still shaded at their far point;
- ``light.col`` set but unused (frag:183);
- shadow-ray origin offset ``P + 2ε·N`` (frag:205);
- GLSL ``min(x, NaN) = x`` convention in the shadow update → ``np.fmin``.
"""

from __future__ import annotations

import dataclasses

import numpy as np

F = np.float32

# Constants from voxel_fragment.frag:15-19.
PI = F(3.1415925359)
MAX_STEPS = 100
MAX_DISTANCE = F(100.0)
EPSILON = F(0.01)


@dataclasses.dataclass
class OracleParams:
    """Runtime scene/light/material parameters (frag:54-64,178-189 defaults)."""

    sphere_center: tuple = (0.0, 0.4, 0.0)
    sphere_radius: float = 0.2
    camera_pos: tuple = (0.0, 0.2, 2.0)
    fov_deg: float = 60.0
    light_pos: tuple = (5.0, 5.0, 0.0)
    light_amb: float = 0.1
    mat_amb: tuple = (0.0, 0.2, 0.8)
    mat_dif: tuple = (0.0, 0.2, 0.8)
    mat_ref: tuple = (0.5, 0.5, 0.5)
    mat_shn: float = 12.0
    shadow_k: float = 10.0


def _scene_sdf(p: np.ndarray, prm: OracleParams) -> np.ndarray:
    """``sceneSDF``: min(plane y, sphere) seeded from INF (frag:73-81)."""
    plane = p[..., 1]  # frag:66-71
    c = np.asarray(prm.sphere_center, F)
    r = F(prm.sphere_radius)
    sph = np.sqrt(np.sum((p - c) ** 2, axis=-1, dtype=F)).astype(F) - r  # frag:54-64
    sdf = np.minimum(np.full_like(plane, np.inf), plane)
    return np.minimum(sdf, sph)


def _normalize(v: np.ndarray) -> np.ndarray:
    n = np.sqrt(np.sum(v * v, axis=-1, dtype=F)).astype(F)
    return (v / n[..., None]).astype(F)


def _raymarch(pos: np.ndarray, direction: np.ndarray, prm: OracleParams) -> np.ndarray:
    """``raymarch`` (frag:86-103): distance += sdf then break-test, masked."""
    dist = np.zeros(direction.shape[:-1], F)
    active = np.ones(dist.shape, bool)
    for _ in range(MAX_STEPS):
        if not active.any():
            break
        ray = pos + dist[..., None] * direction
        sdf = _scene_sdf(ray, prm)
        dist = np.where(active, (dist + sdf).astype(F), dist)
        done = (dist > MAX_DISTANCE) | (sdf < EPSILON)
        active &= ~done
    return dist


def _shadow(pos: np.ndarray, direction: np.ndarray, k: F, prm: OracleParams) -> np.ndarray:
    """``shadow`` (frag:105-132): Quilez improved soft shadow, GLSL NaN
    semantics via np.fmin (min(x, NaN) keeps x)."""
    shape = np.broadcast_shapes(pos.shape[:-1], direction.shape[:-1])
    dist = np.zeros(shape, F)
    sdf_prev = np.full(shape, np.inf, F)
    shadow = np.ones(shape, F)
    active = np.ones(shape, bool)
    with np.errstate(divide="ignore", invalid="ignore"):
        for i in range(MAX_STEPS):
            if not active.any():
                break
            ray = pos + dist[..., None] * direction
            sdf_new = _scene_sdf(ray, prm)
            if i == 0:
                intersection = np.zeros(shape, F)
            else:
                intersection = (sdf_new * sdf_new / (F(2.0) * sdf_prev)).astype(F)  # frag:120
            d_est = np.sqrt(sdf_new * sdf_new - intersection * intersection).astype(F)  # frag:121 (NaN if negative)
            denom = np.maximum(F(0.0), dist - intersection)
            atten = (k * d_est / denom).astype(F)  # frag:122 — inf/NaN propagate
            shadow = np.where(active, np.fmin(shadow, atten), shadow)
            sdf_prev = np.where(active, sdf_new, sdf_prev)
            dist = np.where(active, (dist + sdf_new).astype(F), dist)
            done = (dist > MAX_DISTANCE) | (shadow < EPSILON)
            active &= ~done
    return np.clip(shadow, F(0.0), F(1.0))


def _normal(p: np.ndarray, prm: OracleParams) -> np.ndarray:
    """``normal`` (frag:134-155): 6-tap central differences at ±EPSILON."""
    comps = []
    for axis in range(3):
        off = np.zeros(3, F)
        off[axis] = EPSILON
        comps.append(_scene_sdf(p + off, prm) - _scene_sdf(p - off, prm))
    return _normalize(np.stack(comps, axis=-1).astype(F))


def render_reference_numpy(
    width: int = 800,
    height: int = 600,
    view_matrix: np.ndarray | None = None,
    params: OracleParams | None = None,
) -> np.ndarray:
    """Full-image render of the reference scene; returns (H, W, 3) float32.

    ``view_matrix`` is the arcball ``V_mat`` (identity at startup,
    ``main.cpp:7-11``); the shader applies its inverse to the eye as a point
    (frag:180) and to rays as directions (frag:192).
    """
    prm = params or OracleParams()
    V = np.eye(4, dtype=F) if view_matrix is None else np.asarray(view_matrix, F)
    Vinv = np.linalg.inv(V).astype(F)

    # Fragment quad UV: GL bottom-left origin, pixel centers; row 0 = top.
    xs = (F(2.0) * (np.arange(width, dtype=F) + F(0.5)) / F(width)) - F(1.0)
    ys = F(1.0) - (F(2.0) * (np.arange(height, dtype=F) + F(0.5)) / F(height))
    qx = np.broadcast_to(xs[None, :], (height, width)).astype(F)
    qy = np.broadcast_to(ys[:, None], (height, width)).astype(F)
    ar = F(width) / F(height)  # AR uniform (voxel_geometry.geom:8)

    cam_pos = np.asarray(prm.camera_pos, F)
    cam_pos = (Vinv @ np.append(cam_pos, F(1.0)))[:3].astype(F)  # frag:180

    fov = F(prm.fov_deg)
    z = -F(2.0) / np.tan(fov * PI / F(360.0), dtype=F)  # frag:191 — the quirky 2
    ray = _normalize(np.stack([qx * ar, qy, np.full_like(qx, z)], axis=-1))
    ray = _normalize(ray @ Vinv[:3, :3].T)  # frag:192 (w=0 → rotation only)

    d = _raymarch(cam_pos, ray, prm)  # frag:195
    P = (cam_pos + d[..., None] * ray).astype(F)  # frag:196 — even for misses
    N = _normal(P, prm)  # frag:197

    light_pos = np.asarray(prm.light_pos, F)
    view = _normalize(cam_pos - P)  # frag:200
    incident = _normalize(light_pos - P)  # frag:201
    halfway = _normalize(incident + view)  # frag:203
    spec = np.power(np.maximum(np.sum(N * halfway, axis=-1, dtype=F), F(0.0)), F(prm.mat_shn)).astype(F)  # frag:204
    sh = _shadow(P + N * (F(2.0) * EPSILON), incident, F(prm.shadow_k), prm)  # frag:205
    dif = (np.clip(np.sum(N * incident, axis=-1, dtype=F), F(0.0), F(1.0)) * sh).astype(F)

    ambient = F(prm.light_amb) * np.asarray(prm.mat_amb, F)  # frag:206
    out = (
        ambient
        + dif[..., None] * np.asarray(prm.mat_dif, F)
        + spec[..., None] * np.asarray(prm.mat_ref, F)
    ).astype(F)  # frag:206-210
    return out
