"""Fused Pallas *backward* kernel: per-tile scene/camera/light/material grads.

Round-1 profiling showed the forward kernel at ~1.8 ms/frame (1080p) with the
XLA planar backward costing ~2.7 ms — the backward was HBM-bound: every
``(H, W)`` plane op in the re-traced shading expression round-trips HBM,
while the forward kernel keeps everything in VMEM/registers.  This kernel
fuses the whole backward the same way the forward is fused:

- Inputs per tile: the forward kernel's residual planes ``t``/``shadow``/
  ``ao`` plus the incoming RGB cotangent ``g_rgb`` (50 MB of HBM reads at
  1080p — the unavoidable traffic), with scene params and uniforms in SMEM.
- The kernel body re-traces exactly the planar shading expression of
  ``ops/render_pallas._planar_shade`` (ray gen → implicit-function
  re-attachment of ``t`` → normals → AO taps → Blinn-Phong) as a function of
  the *scalar* parameter/uniform lists, and differentiates it **with
  ``jax.vjp`` at kernel-trace time** — AD runs on the jaxpr before Mosaic
  lowering, so the reverse pass compiles into the same fused tile program
  (no hand-derived gradients to get wrong).
- Output per tile: one ``(P + N_UNIFORMS,)`` vector of gradient partial sums
  (the full-plane reductions happen in-register); partials are summed across
  tiles outside.  Total gradient HBM writes: ``grid × (P + 29)`` floats.

The uniform-vector gradient is scattered back to Camera/PointLight/Material
pytrees by ``jax.vjp(pack_uniforms)`` — the packing layout stays the single
source of truth (ops/render_kernel.py).

Semantics match ``_planar_shade`` with ``ShadowConfig.grad == "detach"``:
shadow is a detached factor, AO flows, ``t`` carries implicit-function
gradients (diff.py), normals/lighting/material by ordinary AD.  The
``grad == "ad"`` shadow mode keeps using the XLA planar backward (it must
re-march; see ops/render_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdf3d_tpu.config import RenderConfig
from sdf3d_tpu.diff import _DENOM_FLOOR
from sdf3d_tpu.ops.render_kernel import (
    N_UNIFORMS,
    PallasRenderConfig,
    _U_AMB,
    _U_C2W,
    _U_CAM,
    _U_FZ,
    _U_LIGHT,
    _U_MAT_AMB,
    _U_MAT_DIF,
    _U_MAT_REF,
    _U_ROW0,
    _U_ROWSTRIDE,
    _U_SHN,
    _round_up,
)
from sdf3d_tpu.ops.scene_program import compile_scene


def _shade_tile(pv, uv, gpos, t0, shadow_in, ao_in, *, soa, mat_soa, cfg: RenderConfig, pc: PallasRenderConfig):
    """The planar shading expression for one tile, as a function of the
    scalar parameter list ``pv`` and uniform list ``uv`` (the differentiable
    inputs).  Mirrors ops/render_pallas._planar_shade stage for stage.

    ``gpos`` = (rows, cols) absolute pixel-index planes; ``t0``/``shadow_in``/
    ``ao_in`` are the forward kernel's residual planes (constants under AD).
    Returns the (r, g, b) tile planes.
    """
    f32 = jnp.float32
    sg = jax.lax.stop_gradient
    H = cfg.ndc_height or cfg.height
    W = cfg.ndc_width or cfg.width
    mc = cfg.march
    rows, cols = gpos

    def getp(k):
        return pv[k]

    def sdf(px, py, pz):
        return soa(px, py, pz, getp)

    # ---- ray generation (kernel parity) ----
    qx = (2.0 * (cols + 0.5) / f32(W)) - 1.0
    qy = 1.0 - (2.0 * (rows + 0.5) / f32(H))
    ar = f32(W / H)
    vx = qx * ar
    vy = qy
    vz = jnp.full_like(qx, 0.0) + uv[_U_FZ]
    inv = jax.lax.rsqrt(vx * vx + vy * vy + vz * vz)
    vx, vy, vz = vx * inv, vy * inv, vz * inv
    m = [uv[_U_C2W + k] for k in range(9)]
    dx = m[0] * vx + m[1] * vy + m[2] * vz
    dy = m[3] * vx + m[4] * vy + m[5] * vz
    dz = m[6] * vx + m[7] * vy + m[8] * vz
    inv2 = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
    dx, dy, dz = dx * inv2, dy * inv2, dz * inv2
    ox, oy, oz = uv[_U_CAM], uv[_U_CAM + 1], uv[_U_CAM + 2]

    # ---- implicit-function re-attachment of the stored hit distance ----
    px0, py0, pz0 = sg(ox + t0 * dx), sg(oy + t0 * dy), sg(oz + t0 * dz)
    ddx, ddy, ddz = sg(dx), sg(dy), sg(dz)
    _, denom = jax.jvp(sdf, (px0, py0, pz0), (ddx, ddy, ddz))
    denom = sg(denom)
    usable = (t0 <= mc.max_distance) & (jnp.abs(denom) >= _DENOM_FLOOR)
    inv_denom = jnp.where(usable, 1.0 / jnp.where(usable, denom, 1.0), 0.0)
    f_here = sdf(ox + t0 * dx, oy + t0 * dy, oz + t0 * dz)
    t_att = t0 - (f_here - sg(f_here)) * inv_denom

    hx, hy, hz = ox + t_att * dx, oy + t_att * dy, oz + t_att * dz

    # ---- normals (kernel parity) ----
    e = f32(mc.epsilon)
    if cfg.normals == "central":
        nx = sdf(hx + e, hy, hz) - sdf(hx - e, hy, hz)
        ny = sdf(hx, hy + e, hz) - sdf(hx, hy - e, hz)
        nz = sdf(hx, hy, hz + e) - sdf(hx, hy, hz - e)
    elif cfg.normals == "tetrahedron":
        s0 = sdf(hx + e, hy - e, hz - e)
        s1 = sdf(hx - e, hy - e, hz + e)
        s2 = sdf(hx - e, hy + e, hz - e)
        s3 = sdf(hx + e, hy + e, hz + e)
        nx = s0 - s1 - s2 + s3
        ny = -s0 - s1 + s2 + s3
        nz = -s0 + s1 - s2 + s3
    else:  # pragma: no cover - guarded by render_pallas engine selection
        raise ValueError(f"pallas backward supports central/tetrahedron normals, not {cfg.normals!r}")
    ninv = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-24))
    nx, ny, nz = nx * ninv, ny * ninv, nz * ninv

    # ---- incident light / secondary factors ----
    lx, ly, lz = uv[_U_LIGHT], uv[_U_LIGHT + 1], uv[_U_LIGHT + 2]
    ix, iy, iz = lx - hx, ly - hy, lz - hz
    iinv = jax.lax.rsqrt(jnp.maximum(ix * ix + iy * iy + iz * iz, 1e-24))
    ix, iy, iz = ix * iinv, iy * iinv, iz * iinv

    shadow = shadow_in  # detached factor (grad == "detach" semantics)

    if cfg.ao.enabled:
        # AO flows (XLA-path semantics); kernel plane stays the primal.
        occ = jnp.zeros_like(t0)
        weight = 1.0
        for tap in range(1, cfg.ao.samples + 1):
            hh = cfg.ao.step * tap
            sa = sdf(hx + hh * nx, hy + hh * ny, hz + hh * nz)
            occ = occ + weight * (hh - sa)
            weight *= cfg.ao.falloff
        ao_ad = jnp.clip(1.0 - cfg.ao.strength * occ, 0.0, 1.0)
        ao = ao_ad - sg(ao_ad) + ao_in
    else:
        ao = ao_in

    # ---- shading (kernel parity) ----
    wx, wy, wz = ox - hx, oy - hy, oz - hz
    winv = jax.lax.rsqrt(jnp.maximum(wx * wx + wy * wy + wz * wz, 1e-24))
    wx, wy, wz = wx * winv, wy * winv, wz * winv
    hwx, hwy, hwz = ix + wx, iy + wy, iz + wz
    hwinv = jax.lax.rsqrt(jnp.maximum(hwx * hwx + hwy * hwy + hwz * hwz, 1e-24))
    hwx, hwy, hwz = hwx * hwinv, hwy * hwinv, hwz * hwinv

    ndoth = jnp.maximum(nx * hwx + ny * hwy + nz * hwz, 0.0)
    dif = jnp.clip(nx * ix + ny * iy + nz * iz, 0.0, 1.0) * shadow
    amb_scale = uv[_U_AMB] * ao if cfg.ao.enabled else uv[_U_AMB] + jnp.zeros_like(dif)

    # Material channels (kernel parity): per-lane when the scene carries
    # Shaded tags, so material-parameter gradients flow through the vjp of
    # the selects/lerps exactly like shape parameters.
    mch = (
        uv[_U_MAT_AMB], uv[_U_MAT_AMB + 1], uv[_U_MAT_AMB + 2],
        uv[_U_MAT_DIF], uv[_U_MAT_DIF + 1], uv[_U_MAT_DIF + 2],
        uv[_U_MAT_REF], uv[_U_MAT_REF + 1], uv[_U_MAT_REF + 2],
        uv[_U_SHN],
    )
    if mat_soa is not None:
        _, mch = mat_soa(hx, hy, hz, getp, mch)
    spec = jnp.power(ndoth, mch[9])

    if cfg.shading == "blinn_phong":
        chans = [amb_scale * mch[c] + dif * mch[3 + c] + spec * mch[6 + c] for c in range(3)]
    elif cfg.shading == "lambert":
        chans = [amb_scale * mch[c] + dif * mch[3 + c] for c in range(3)]
    else:  # pragma: no cover
        raise ValueError(f"unknown shading mode {cfg.shading!r}")

    if cfg.background is not None:
        miss = t0 > mc.max_distance
        chans = [jnp.where(miss, f32(bgc), ch) for bgc, ch in zip(cfg.background, chans)]
    return tuple(chans)


def _bwd_tile_kernel(
    uni, prm, gr, gg, gb, t_in, sh_in, ao_in, grads_ref, *, soa, mat_soa, n_params, cfg: RenderConfig, pc: PallasRenderConfig
):
    """Kernel body: vjp of the tile shading expression w.r.t. scalar params
    and uniforms; writes the (P + N_UNIFORMS,) partial-sum vector to SMEM."""
    TH, TW = pc.tile_h, pc.tile_w
    f32 = jnp.float32
    i = pl.program_id(0)
    j = pl.program_id(1)
    # row0/rowstride map tiles to absolute image rows exactly like the
    # forward (render_kernel.py:158): contiguous slabs stride by TH,
    # interleaved row-block sharding by n_devices*TH.  The backward must
    # differentiate at the same pixel positions the forward rendered.
    rows = uni[_U_ROW0] + i.astype(f32) * uni[_U_ROWSTRIDE] + jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0).astype(f32)
    cols = (j * TW + jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 1)).astype(f32)

    pv = tuple(prm[k] for k in range(n_params))
    uv = tuple(uni[k] for k in range(N_UNIFORMS))
    t0 = t_in[:, :]
    shp = sh_in[:, :]
    aop = ao_in[:, :]

    fn = functools.partial(_shade_tile, gpos=(rows, cols), t0=t0, shadow_in=shp, ao_in=aop, soa=soa, mat_soa=mat_soa, cfg=cfg, pc=pc)
    _, pullback = jax.vjp(fn, pv, uv)
    d_pv, d_uv = pullback((gr[:, :], gg[:, :], gb[:, :]))
    # Scatter the scalar grads into an (8, 128) plane via compile-time
    # one-hot masks (lane-dim stacking of scalars would be a Mosaic
    # relayout); component k lands at (k // 128, k % 128).
    riota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    ciota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    plane = jnp.zeros((8, 128), f32)
    for k, d in enumerate(list(d_pv) + list(d_uv)):
        mask = (riota == k // 128) & (ciota == k % 128)
        plane = plane + jnp.where(mask, d, 0.0)
    grads_ref[0, 0, :, :] = plane


@functools.partial(jax.jit, static_argnames=("scene_treedef", "leaf_shapes", "cfg", "pc"))
def render_kernel_backward(
    scene_treedef, leaf_shapes, params, uniforms, g_rgb, t, shadow, ao, cfg: RenderConfig, pc: PallasRenderConfig
):
    """Fused backward: returns ``(g_params (P,), g_uniforms (N_UNIFORMS,))``.

    ``g_rgb`` is the *planar* (3, H, W) RGB cotangent (contiguous channel
    planes — see render_pallas_planar); ``t``/``shadow``/``ao`` the forward
    kernel's residual planes (cropped to H×W).  Padding re-expands to the
    forward's tile grid with miss values (t = 2·max_distance,
    shadow = ao = 1) and a zero cotangent, so padded lanes contribute exact
    zeros.
    """
    dummies = [jnp.zeros(shape, jnp.float32) for shape in leaf_shapes]
    scene = jax.tree_util.tree_unflatten(scene_treedef, dummies)
    soa = compile_scene(scene)
    from sdf3d_tpu.ops.scene_program import compile_scene_material
    from sdf3d_tpu.sdf.materials import scene_has_materials

    mat_soa = compile_scene_material(scene) if scene_has_materials(scene) else None
    H, W = cfg.height, cfg.width
    TH, TW = pc.tile_h, pc.tile_w
    Hp, Wp = _round_up(H, TH), _round_up(W, TW)
    grid = (Hp // TH, Wp // TW)
    P = int(params.shape[0])
    G = P + N_UNIFORMS

    # Default row stride = TH (contiguous tiles), mirroring the forward's
    # patch in _render_kernel_call — pack_uniforms leaves the slot 0.
    stride = jnp.where(
        uniforms[_U_ROWSTRIDE] > 0.0, uniforms[_U_ROWSTRIDE], jnp.float32(TH)
    )
    uniforms = uniforms.at[_U_ROWSTRIDE].set(stride)

    pad = ((0, Hp - H), (0, Wp - W))
    gr = jnp.pad(g_rgb[0], pad)
    gg = jnp.pad(g_rgb[1], pad)
    gb = jnp.pad(g_rgb[2], pad)
    t_p = jnp.pad(t, pad, constant_values=2.0 * cfg.march.max_distance)
    sh_p = jnp.pad(shadow, pad, constant_values=1.0)
    ao_p = jnp.pad(ao, pad, constant_values=1.0)

    if G > 8 * 128:
        raise ValueError(f"scene has {P} params; fused backward supports up to {8 * 128 - N_UNIFORMS}")

    kernel = functools.partial(_bwd_tile_kernel, soa=soa, mat_soa=mat_soa, n_params=P, cfg=cfg, pc=pc)
    plane = lambda: pl.BlockSpec((TH, TW), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    partials = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            plane(),
            plane(),
            plane(),
            plane(),
            plane(),
            plane(),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, 128), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid[0], grid[1], 8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=pc.vmem_limit_bytes,
        ),
        interpret=pc.interpret,
    )(uniforms, params, gr, gg, gb, t_p, sh_p, ao_p)

    total = jnp.sum(partials, axis=(0, 1)).reshape(-1)
    return total[:P], total[P : P + N_UNIFORMS]
