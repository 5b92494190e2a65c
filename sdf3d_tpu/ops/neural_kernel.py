"""Fused MXU render kernel for neural-SDF scenes.

The analytic fused kernel (ops/render_kernel.py) keeps every per-ray
quantity as a VPU-friendly ``(TH, TW)`` plane and reads scene parameters as
SMEM scalars — exactly wrong for an MLP field, whose evaluation is a chain
of matmuls over the ray batch.  This kernel uses the **matrix layout**
instead: each grid program owns a block of ``N`` rays stored as ``(N, 8)``
matrices (xyz in lanes 0-2), so every march step's MLP evaluation is
``(N,8)@(8,H) → softplus → (N,H)@(H,H) → … → (N,H)@(H,8)`` on the MXU,
while march bookkeeping stays elementwise on ``(N, 1)`` columns.

Supported scene shapes: a bare :class:`~sdf3d_tpu.sdf.neural.NeuralSDF`, or
``Union(analytic, NeuralSDF)`` in either order where the analytic subtree is
scene-program-emittable (the common ``ground_plane() | neural`` composition
— the analytic part evaluates on the ``(N, 1)`` columns through the same
emitter as the analytic kernel, parameters in SMEM).

Stages mirror the analytic kernel stage for stage (march semantics of
``voxel_fragment.frag:86-103``, Quilez shadow ``:105-132``, Blinn-Phong
``:160-211``); outputs one ``(N, 8)`` matrix per block with columns
``[r, g, b, t, shadow, ao, 0, 0]``.  The custom VJP reuses the planar
no-march backward (ops/render_pallas.py) through its generic-SDF fallback.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdf3d_tpu.config import RenderConfig
from sdf3d_tpu.ops.render_kernel import (
    _U_AMB,
    _U_C2W,
    _U_CAM,
    _U_FZ,
    _U_K,
    _U_LIGHT,
    _U_MAT_AMB,
    _U_MAT_DIF,
    _U_MAT_REF,
    _U_SHN,
    pack_uniforms,
)
from sdf3d_tpu.ops.scene_program import compile_scene, scene_param_vector
from sdf3d_tpu.sdf import csg
from sdf3d_tpu.sdf.neural import NeuralSDF


@dataclasses.dataclass(frozen=True)
class NeuralRenderConfig:
    """Static parameters of the neural kernel (hashable → jit static arg).

    ``block_rays``: rays per grid program (the matmul M dimension).
    ``check_every``: march steps between whole-block convergence checks.
    """

    block_rays: int = 1024
    check_every: int = 2
    interpret: bool = False


def split_neural(scene):
    """Decompose ``scene`` into ``(analytic_subtree | None, NeuralSDF)``.

    Raises ``ValueError`` for shapes the kernel does not support.
    """
    if isinstance(scene, NeuralSDF):
        return None, scene
    if isinstance(scene, csg.Union):
        a_n, b_n = isinstance(scene.a, NeuralSDF), isinstance(scene.b, NeuralSDF)
        if a_n and not b_n:
            return scene.b, scene.a
        if b_n and not a_n:
            return scene.a, scene.b
    raise ValueError(
        "neural kernel supports a bare NeuralSDF or Union(analytic, NeuralSDF); "
        f"got {type(scene).__name__} (use the XLA engine for other compositions)"
    )


def _pad_weights(neural: NeuralSDF):
    """Pad the MLP to MXU-friendly shapes: first layer (3,H)→(8,H); final
    layer (H,1)→(H,8) / bias (1,)→(1,8) in column 0."""
    ws, bs = [], []
    n = len(neural.weights)
    for i, (w, b) in enumerate(zip(neural.weights, neural.biases)):
        w = jnp.asarray(w, jnp.float32)
        b = jnp.asarray(b, jnp.float32)[None, :]  # (1, fan_out)
        if i == 0:
            w = jnp.concatenate([w, jnp.zeros((8 - w.shape[0], w.shape[1]), jnp.float32)], axis=0)
        if i == n - 1:
            w = jnp.concatenate([w, jnp.zeros((w.shape[0], 8 - w.shape[1]), jnp.float32)], axis=1)
            b = jnp.concatenate([b, jnp.zeros((1, 8 - b.shape[1]), jnp.float32)], axis=1)
        ws.append(w)
        bs.append(b)
    return ws, bs


def _neural_tile_kernel(uni, prm, beta_ref, *refs, soa, n_params, n_layers, precision, cfg: RenderConfig, nc: NeuralRenderConfig):
    """Kernel body. ``refs`` = qx, qy, W0, b0, …, W_{L-1}, b_{L-1}, out."""
    qx_ref, qy_ref = refs[0], refs[1]
    wrefs = refs[2 : 2 + 2 * n_layers]
    out_ref = refs[-1]
    N = nc.block_rays
    f32 = jnp.float32
    mc = cfg.march
    chk = max(1, nc.check_every)

    ws = [wrefs[2 * i][:] for i in range(n_layers)]
    bs = [wrefs[2 * i + 1][:] for i in range(n_layers)]
    beta = beta_ref[0]
    prm_vals = [prm[k] for k in range(n_params)]

    def getp(k):
        return prm_vals[k]

    # Lane one-hots: (N,1) columns broadcast into lane c of an (N,8) matrix
    # without concatenation (lane-dim concat is a relayout on TPU).
    eye = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)

    def lane(col, c):
        return col * (eye == c).astype(f32)

    def mlp(px, py, pz):
        x = lane(px, 0) + lane(py, 1) + lane(pz, 2)
        for i in range(n_layers):
            # precision comes from NeuralSDF.precision — the MXU's 1-pass
            # bf16 default errs ~3e-3 on the field, outside the ε band.
            x = jnp.dot(x, ws[i], preferred_element_type=f32, precision=precision) + bs[i]
            if i < n_layers - 1:
                x = jax.nn.softplus(beta * x) / beta
        return x[:, 0:1]

    if soa is None:
        def sdf(px, py, pz):
            return mlp(px, py, pz)
    else:
        def sdf(px, py, pz):
            return jnp.minimum(soa(px, py, pz, getp), mlp(px, py, pz))

    # ---- ray generation (reference parity; same math as the analytic
    # kernel but on (N,1) columns; qx/qy NDC precomputed by the caller) ----
    qx = qx_ref[:]
    qy = qy_ref[:]
    H = cfg.ndc_height or cfg.height
    W = cfg.ndc_width or cfg.width
    ar = f32(W / H)
    vx = qx * ar
    vy = qy
    vz = jnp.full((N, 1), uni[_U_FZ], f32)
    inv = jax.lax.rsqrt(vx * vx + vy * vy + vz * vz)
    vx, vy, vz = vx * inv, vy * inv, vz * inv
    m = [uni[_U_C2W + k] for k in range(9)]
    dx = m[0] * vx + m[1] * vy + m[2] * vz
    dy = m[3] * vx + m[4] * vy + m[5] * vz
    dz = m[6] * vx + m[7] * vy + m[8] * vz
    inv2 = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
    dx, dy, dz = dx * inv2, dy * inv2, dz * inv2
    ox, oy, oz = uni[_U_CAM], uni[_U_CAM + 1], uni[_U_CAM + 2]

    # ---- primary march (reference semantics; matrix layout) ----
    def march_cond(state):
        step, _, active = state
        return jnp.logical_and(step < mc.max_steps, jnp.max(active) > 0.5)

    def march_body(state):
        step, dist, active = state
        for i in range(chk):
            s = sdf(ox + dist * dx, oy + dist * dy, oz + dist * dz)
            take = active > 0.5
            if mc.max_steps % chk != 0:
                take = take & (step + i < mc.max_steps)
            dist = jnp.where(take, dist + s, dist)
            active = jnp.where(take & ((dist > mc.max_distance) | (s < mc.epsilon)), 0.0, active)
        return step + chk, dist, active

    _, t, _ = jax.lax.while_loop(
        march_cond, march_body,
        (jnp.int32(0), jnp.zeros((N, 1), f32), jnp.ones((N, 1), f32)),
    )
    hx, hy, hz = ox + t * dx, oy + t * dy, oz + t * dz

    # ---- normals ----
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
    else:  # pragma: no cover - validated upstream
        raise ValueError(f"neural kernel supports central/tetrahedron normals, not {cfg.normals!r}")
    ninv = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-24))
    nx, ny, nz = nx * ninv, ny * ninv, nz * ninv

    # ---- incident light ----
    lx, ly, lz = uni[_U_LIGHT], uni[_U_LIGHT + 1], uni[_U_LIGHT + 2]
    ix, iy, iz = lx - hx, ly - hy, lz - hz
    iinv = jax.lax.rsqrt(jnp.maximum(ix * ix + iy * iy + iz * iz, 1e-24))
    ix, iy, iz = ix * iinv, iy * iinv, iz * iinv

    # ---- soft shadow march (Quilez; matrix layout) ----
    if cfg.shadow.enabled:
        k = uni[_U_K]
        sox, soy, soz = hx + 2.0 * e * nx, hy + 2.0 * e * ny, hz + 2.0 * e * nz

        def sh_cond(state):
            step, _, _, _, active = state
            return jnp.logical_and(step < cfg.shadow.max_steps, jnp.max(active) > 0.5)

        def sh_body(state):
            step, dist, prev, sh, active = state
            for i in range(chk):
                s = sdf(sox + dist * ix, soy + dist * iy, soz + dist * iz)
                inter = jnp.where(step + i == 0, 0.0, s * s / (2.0 * jnp.where(prev == 0.0, 1e-30, prev)))
                d2 = s * s - inter * inter
                denom = dist - inter
                valid = (denom > 0.0) & (d2 >= 0.0)
                atten = jnp.where(valid, k * jnp.sqrt(jnp.maximum(d2, 0.0)) / jnp.where(valid, denom, 1.0), 1e30)
                take = active > 0.5
                if cfg.shadow.max_steps % chk != 0:
                    take = take & (step + i < cfg.shadow.max_steps)
                sh = jnp.where(take, jnp.minimum(sh, atten), sh)
                dist = jnp.where(take, dist + s, dist)
                prev = jnp.where(take, s, prev)
                active = jnp.where(take & ((dist > mc.max_distance) | (sh < mc.epsilon)), 0.0, active)
            return step + chk, dist, prev, sh, active

        _, _, _, shadow, _ = jax.lax.while_loop(
            sh_cond, sh_body,
            (jnp.int32(0), jnp.zeros((N, 1), f32), jnp.full((N, 1), jnp.inf, f32),
             jnp.ones((N, 1), f32), jnp.ones((N, 1), f32)),
        )
        shadow = jnp.clip(shadow, 0.0, 1.0)
    else:
        shadow = jnp.ones((N, 1), f32)

    # ---- ambient occlusion ----
    if cfg.ao.enabled:
        occ = jnp.zeros((N, 1), f32)
        weight = 1.0
        for tap in range(1, cfg.ao.samples + 1):
            h = cfg.ao.step * tap
            sa = sdf(hx + h * nx, hy + h * ny, hz + h * nz)
            occ = occ + weight * (h - sa)
            weight *= cfg.ao.falloff
        ao = jnp.clip(1.0 - cfg.ao.strength * occ, 0.0, 1.0)
    else:
        ao = jnp.ones((N, 1), f32)

    # ---- shading (Blinn-Phong / Lambert, reference quirks) ----
    wx, wy, wz = ox - hx, oy - hy, oz - hz
    winv = jax.lax.rsqrt(jnp.maximum(wx * wx + wy * wy + wz * wz, 1e-24))
    wx, wy, wz = wx * winv, wy * winv, wz * winv
    hwx, hwy, hwz = ix + wx, iy + wy, iz + wz
    hwinv = jax.lax.rsqrt(jnp.maximum(hwx * hwx + hwy * hwy + hwz * hwz, 1e-24))
    hwx, hwy, hwz = hwx * hwinv, hwy * hwinv, hwz * hwinv
    ndoth = jnp.maximum(nx * hwx + ny * hwy + nz * hwz, 0.0)
    spec = jnp.power(ndoth, uni[_U_SHN])
    dif = jnp.clip(nx * ix + ny * iy + nz * iz, 0.0, 1.0) * shadow
    amb_scale = uni[_U_AMB] * ao if cfg.ao.enabled else uni[_U_AMB] * jnp.ones_like(dif)

    def chan(c):
        if cfg.shading == "blinn_phong":
            v = amb_scale * uni[_U_MAT_AMB + c] + dif * uni[_U_MAT_DIF + c] + spec * uni[_U_MAT_REF + c]
        elif cfg.shading == "lambert":
            v = amb_scale * uni[_U_MAT_AMB + c] + dif * uni[_U_MAT_DIF + c]
        else:  # pragma: no cover
            raise ValueError(f"unknown shading mode {cfg.shading!r}")
        if cfg.background is not None:
            v = jnp.where(t > mc.max_distance, f32(cfg.background[c]), v)
        return v

    out_ref[:] = (
        lane(chan(0), 0) + lane(chan(1), 1) + lane(chan(2), 2)
        + lane(t, 3) + lane(shadow, 4) + lane(ao, 5)
    )


@functools.partial(jax.jit, static_argnames=("scene_treedef", "leaf_shapes", "n_layers", "cfg", "nc"))
def _neural_kernel_call(scene_treedef, leaf_shapes, leaves, camera, light, mat, n_layers, cfg: RenderConfig, nc: NeuralRenderConfig):
    scene = jax.tree_util.tree_unflatten(scene_treedef, leaves)
    analytic, neural = split_neural(scene)
    ws, bs = _pad_weights(neural)
    if analytic is not None:
        soa = compile_scene(analytic)
        params = scene_param_vector(analytic)
    else:
        soa = None
        params = jnp.zeros((1,), jnp.float32)
    uniforms = pack_uniforms(camera, light, mat, cfg.ray_mode)
    uniforms = uniforms.at[_U_K].set(jnp.asarray(cfg.shadow.k, jnp.float32))
    beta = jnp.ravel(jnp.asarray(neural.beta, jnp.float32))

    H, W = cfg.height, cfg.width
    N = nc.block_rays
    total = H * W
    padded = ((total + N - 1) // N) * N
    grid = (padded // N,)

    # NDC coords per ray, flattened row-major and padded (same formulas as
    # camera.pixel_grid; padded rays render off-screen and are cropped).
    idx = jnp.arange(padded, dtype=jnp.float32)
    rows = jnp.floor(idx / W)
    cols = idx - rows * W
    ndcH = cfg.ndc_height or H
    ndcW = cfg.ndc_width or W
    qx = ((2.0 * (cols + 0.5) / ndcW) - 1.0)[:, None]
    qy = (1.0 - (2.0 * (rows + 0.5) / ndcH))[:, None]

    weight_inputs = []
    for w, b in zip(ws, bs):
        weight_inputs.extend([w, b])

    # Mosaic lowers only DEFAULT/HIGHEST dot precisions; "high" rounds up.
    kernel_precision = "default" if neural.precision == "default" else "highest"
    kernel = functools.partial(
        _neural_tile_kernel,
        soa=soa, n_params=int(params.shape[0]), n_layers=n_layers,
        precision=kernel_precision, cfg=cfg, nc=nc,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # uniforms
        pl.BlockSpec(memory_space=pltpu.SMEM),  # analytic params
        pl.BlockSpec(memory_space=pltpu.SMEM),  # beta
        pl.BlockSpec((N, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),  # qx
        pl.BlockSpec((N, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),  # qy
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * n_layers)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((N, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # The fused stage chain keeps ~20 MB of block intermediates +
            # DMA buffers live; the default 16 MB scoped-vmem rail is shy.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=nc.interpret,
    )(uniforms, params, beta, qx, qy, *weight_inputs)

    out = out[:total].reshape(H, W, 8)
    rgb = out[..., 0:3]
    return rgb, out[..., 3], out[..., 4], out[..., 5]


def render_neural_forward(scene, camera, light, mat, cfg: RenderConfig, nc: NeuralRenderConfig = NeuralRenderConfig()):
    """Fused neural-scene forward render: ``(rgb (H,W,3), t, shadow, ao)``."""
    analytic, neural = split_neural(scene)  # validate shape eagerly
    leaves, treedef = jax.tree_util.tree_flatten(scene)
    leaf_shapes = tuple(jnp.shape(l) for l in leaves)
    return _neural_kernel_call(
        treedef, leaf_shapes, tuple(leaves), camera, light, mat,
        len(neural.weights), cfg, nc,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def render_neural(cfg: RenderConfig, nc: NeuralRenderConfig, scene, camera, light, mat) -> jnp.ndarray:
    """Differentiable fused neural render; returns RGB (H, W, 3).

    Backward is the planar no-march pass (ops/render_pallas.py) through its
    generic-SDF fallback — gradients flow to MLP weights, analytic subtree
    parameters, camera pose, lighting, and material.
    """
    rgb, _, _, _ = render_neural_forward(scene, camera, light, mat, cfg, nc)
    return rgb


def _fwd(cfg, nc, scene, camera, light, mat):
    rgb, t, shadow, ao = render_neural_forward(scene, camera, light, mat, cfg, nc)
    return rgb, (scene, camera, light, mat, t, shadow, ao)


def _bwd(cfg, nc, residuals, g_rgb):
    from sdf3d_tpu.ops.render_pallas import _planar_shade

    scene, camera, light, mat, t, shadow, ao = residuals

    def shade_path(scene_, camera_, light_, mat_):
        # _planar_shade returns planar (3, H, W); this engine's output is
        # (H, W, 3), so transpose the cotangent into the planar layout.
        return jnp.transpose(_planar_shade(cfg, scene_, camera_, light_, mat_, t, shadow, ao), (1, 2, 0))

    _, pullback = jax.vjp(shade_path, scene, camera, light, mat)
    return pullback(g_rgb)


render_neural.defvjp(_fwd, _bwd)
