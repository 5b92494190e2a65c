"""Load-balanced 2-D tile-queue sharding: equal-count static tile work-lists.

Row-layout sharding (parallel/shard_render.py) balances load by interleaving
row blocks, but at large meshes it hits two walls the projection lab
measured (benchmarks/scaling_report.py, SCALING.jsonl): 1080 rows do not
divide into 32 devices × 8-row blocks, and row-only mixing leaves the
column-direction work variance on the table — the best row layout projects
0.85-0.92 at n=32, under the ≥0.90 BASELINE bar.

This module shards the image as a flat list of ``(tile_h × tile_w)`` tiles
instead — the TPU-native answer to a GPU work queue, made *static*: every
device gets exactly ``ceil(n_tiles/n)`` tiles (SPMD equal shapes), chosen by
an assignment policy, and renders them with the tile-queue kernels
(``ops/render_kernel._render_kernel_tiles_call``,
``ops/fit_kernel.fit_step_kernel_tiles``) whose per-tile absolute origins
are **runtime SMEM tables** — re-planning never recompiles.  Policies:

- ``round_robin`` (scene-independent default): row-major tile index mod n.
  Each device's share spreads over rows AND columns; projects ≥0.94 at
  n=32 on every bundled scene (SCALING.jsonl).
- ``balanced``: greedy LPT over per-tile work estimates under the
  equal-count cap — the measured-work static schedule.  With exact counts
  it projects ≥0.995 at n=32; estimates come cheap from a low-resolution
  march pre-pass (:func:`estimate_tile_work`, ~1-2% of a frame).

Dummy tiles (the pad to an equal multiple of n) are placed at
``row0 == height``: the forward path never gathers them back, and the fit
kernel's absolute-coordinate mask zeroes their loss/grad contribution
exactly.  No reference counterpart (the reference is single-GPU,
``main.cpp:4-5``); this subsystem exists for the BASELINE scaling bar.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from sdf3d_tpu.parallel.mesh import tile_axis
from sdf3d_tpu.parallel.shard_render import shard_map, _REPLICATED


@dataclasses.dataclass(frozen=True)
class TilePlan:
    """A static assignment of image tiles to devices.

    ``rows``/``cols``: (n, T_local) float32 absolute tile origins in
    work-list order (exact integers; dummies = (height, 0)).
    ``gather_index``: (nh, nw) int32 — for image block (bi, bj), the
    position of its tile in the device-major gathered stack
    (``dev * T_local + slot``); reassembly is one static gather.
    """

    tile_h: int
    tile_w: int
    height: int
    width: int
    n: int
    rows: np.ndarray
    cols: np.ndarray
    gather_index: np.ndarray

    @property
    def tiles_per_device(self) -> int:
        return self.rows.shape[1]


def plan_tiles(
    height: int,
    width: int,
    tile_h: int,
    tile_w: int,
    n_devices: int,
    policy: str = "round_robin",
    work: np.ndarray | None = None,
) -> TilePlan:
    """Build the static tile→device assignment.

    ``policy``: ``"round_robin"`` (row-major index mod n) or ``"balanced"``
    (greedy LPT on ``work`` under the equal-count cap).  ``work`` is an
    (nh, nw) per-tile cost array — required for ``balanced``; see
    :func:`estimate_tile_work`.
    """
    if height % tile_h or width % tile_w:
        raise ValueError(
            f"tile-queue sharding needs height/width divisible by the tile "
            f"({height}x{width} vs {tile_h}x{tile_w})"
        )
    nh, nw = height // tile_h, width // tile_w
    ntiles = nh * nw
    n = n_devices
    t_local = -(-ntiles // n)

    if policy == "round_robin":
        dev = np.arange(ntiles) % n
    elif policy == "balanced":
        if work is None:
            raise ValueError("policy='balanced' needs a per-tile work array")
        w = np.asarray(work, np.float64).reshape(ntiles)
        order = np.argsort(w)[::-1]  # largest first (LPT)
        loads = np.zeros(n)
        counts = np.zeros(n, np.int64)
        dev = np.empty(ntiles, np.int64)
        for t in order:
            elig = np.flatnonzero(counts < t_local)
            d = elig[np.argmin(loads[elig])]
            dev[t] = d
            loads[d] += w[t]
            counts[d] += 1
    else:
        raise ValueError(f"unknown tile policy {policy!r}")

    rows = np.full((n, t_local), np.float32(height), np.float32)  # dummies
    cols = np.zeros((n, t_local), np.float32)
    gather = np.empty((nh, nw), np.int32)
    slot = np.zeros(n, np.int64)
    for t in range(ntiles):
        d = int(dev[t])
        s = int(slot[d])
        bi, bj = t // nw, t % nw
        rows[d, s] = np.float32(bi * tile_h)
        cols[d, s] = np.float32(bj * tile_w)
        gather[bi, bj] = d * t_local + s
        slot[d] = s + 1
    return TilePlan(
        tile_h=tile_h, tile_w=tile_w, height=height, width=width, n=n,
        rows=rows, cols=cols, gather_index=gather,
    )


def estimate_tile_work(
    scene, camera, config, light=None, scale: int = 8
) -> np.ndarray:
    """Per-tile march work estimate from a 1/``scale``-resolution pre-pass.

    Runs the exact masked-march step counter (primary + shadow gate) on a
    downsampled ray grid — ~1/scale² of a frame's marching — and pools the
    per-pixel step counts onto the (nh, nw) tile grid of the full image.
    Drives ``plan_tiles(policy="balanced")``; the estimate only has to rank
    tiles, not be exact, so the default 1/8 scale is plenty (SCALING.jsonl
    compares the resulting projection against the exact-work oracle).
    """
    from sdf3d_tpu.camera import camera_rays
    from sdf3d_tpu.march import march_step_map

    h = max(config.height // scale, 1)
    w = max(config.width // scale, 1)
    o, d = camera_rays(camera, w, h, config.ray_mode)
    mc = config.march
    dist, steps = march_step_map(scene.distance, o, d, mc)
    if config.shadow.enabled and light is not None:
        # Shadow work ≈ another march for lit hit lanes; gate on hit like
        # benchmarks/scaling_report.march_step_counts.
        hit = (dist <= mc.max_distance).astype(jnp.float32)
        steps = steps + steps * hit  # same-order proxy: hit lanes march twice
    return np.asarray(steps, np.float64)


def pool_work_to_tiles(
    steps: np.ndarray, height: int, width: int, tile_h: int, tile_w: int
) -> np.ndarray:
    """Pool a (h, w) work map (any resolution, e.g. the 1/8-scale pre-pass)
    onto the (nh, nw) tile grid of a ``height × width`` image by
    nearest-pixel accumulation."""
    h, w = steps.shape
    nh, nw = height // tile_h, width // tile_w
    bi = np.minimum((np.arange(h) * height // h) // tile_h, nh - 1)
    bj = np.minimum((np.arange(w) * width // w) // tile_w, nw - 1)
    out = np.zeros((nh, nw), np.float64)
    np.add.at(out, (np.broadcast_to(bi[:, None], (h, w)),
                    np.broadcast_to(bj[None, :], (h, w))), steps)
    return out


def render_pallas_tiles(
    scene,
    camera,
    light,
    mat,
    config,
    mesh: Mesh,
    pc=None,
    plan: TilePlan | None = None,
    policy: str = "round_robin",
    work: np.ndarray | None = None,
    planar: bool = False,
):
    """Tile-queue sharded forward render: each device runs the tile-queue
    kernel on its static work-list; one static gather reassembles the image.
    Bitwise-equal to the unsharded kernel (same absolute pixel planes, same
    f32 arithmetic — tested in test_parallel.py).
    """
    from sdf3d_tpu.ops.render_kernel import (
        PallasRenderConfig,
        _U_K,
        _render_kernel_tiles_call,
        pack_uniforms,
    )
    from sdf3d_tpu.ops.scene_program import scene_param_vector

    pc = pc or PallasRenderConfig()
    n = mesh.shape[tile_axis]
    if plan is None:
        plan = plan_tiles(
            config.height, config.width, pc.tile_h, pc.tile_w, n, policy, work
        )
    if plan.n != n or plan.tile_h != pc.tile_h or plan.tile_w != pc.tile_w:
        raise ValueError("tile plan does not match mesh/kernel tile shape")

    full_cfg = dataclasses.replace(
        config, ndc_height=config.height, ndc_width=config.width
    )
    params = scene_param_vector(scene)
    uniforms = pack_uniforms(camera, light, mat, config.ray_mode)
    uniforms = uniforms.at[_U_K].set(jnp.asarray(config.shadow.k, jnp.float32))
    leaves, treedef = jax.tree_util.tree_flatten(scene)
    leaf_shapes = tuple(jnp.shape(l) for l in leaves)
    trows = jnp.asarray(plan.rows)  # (n, T_local)
    tcols = jnp.asarray(plan.cols)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(_REPLICATED, _REPLICATED, P(tile_axis, None), P(tile_axis, None)),
        out_specs=P(None, tile_axis, None),  # (3, n*T_local*TH, TW) row-stacked
    )
    def shard_fn(params_, uniforms_, trow_, tcol_):
        rgb, _, _, _ = _render_kernel_tiles_call(
            treedef, leaf_shapes, params_, uniforms_, trow_[0], tcol_[0],
            full_cfg, pc,
        )
        return rgb

    out = shard_fn(params, uniforms, trows, tcols)
    TH, TW = pc.tile_h, pc.tile_w
    tiles = out.reshape(3, n * plan.tiles_per_device, TH, TW)
    img = tiles[:, jnp.asarray(plan.gather_index)]  # (3, nh, nw, TH, TW)
    img = jnp.transpose(img, (0, 1, 3, 2, 4)).reshape(3, config.height, config.width)
    return img if planar else jnp.transpose(img, (1, 2, 0))


def fused_tiles_loss_and_grad_sharded(vag_fn, mesh: Mesh, allreduce: str = "psum"):
    """Mesh-parallelize a per-work-list ``(loss, grads)`` function.

    ``vag_fn(scene, tile_rows, tile_cols, target_stack)`` runs one device's
    tile-queue fit kernel (``ops/fit_kernel.l2_loss_and_grads_tiles``) on
    its (T_local,) origin tables and (C, T_local·TH, TW) target stack.
    Loss and gradients are all-reduced so every device holds replicated
    values — the tile-queue analogue of
    ``shard_render.fused_loss_and_grad_sharded``.
    """

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            _REPLICATED,
            P(tile_axis, None),
            P(tile_axis, None),
            P(tile_axis, None, None, None),
        ),
        out_specs=(_REPLICATED, _REPLICATED),
    )
    def shard_fn(scene_, trow, tcol, tgt_stack):
        loss, grads = vag_fn(scene_, trow[0], tcol[0], tgt_stack[0])
        loss = jax.lax.psum(loss, tile_axis)
        from sdf3d_tpu.parallel.collectives import allreduce_tree

        grads = allreduce_tree(grads, allreduce, mesh.shape[tile_axis])
        return loss, grads

    return shard_fn


def gather_target_tiles(target_planar: jnp.ndarray, plan: TilePlan) -> jnp.ndarray:
    """Gather a planar (C, H, W) target into per-device tile stacks
    ``(n, C, T_local·TH, TW)`` in work-list order (zero blocks for dummy
    tiles) — sharded with ``P(tile_axis)`` these are exactly the blocks each
    device's fit kernel consumes.  Accepts (H, W) for coverage masks."""
    squeeze = target_planar.ndim == 2
    if squeeze:
        target_planar = target_planar[None]
    C = target_planar.shape[0]
    TH, TW = plan.tile_h, plan.tile_w
    nh, nw = plan.height // TH, plan.width // TW
    blocks = target_planar.reshape(C, nh, TH, nw, TW).transpose(1, 3, 0, 2, 4)
    # (nh, nw, C, TH, TW) → flat tiles, then scatter into device-major order.
    flat = blocks.reshape(nh * nw, C, TH, TW)
    n, t_local = plan.rows.shape
    stacks = jnp.zeros((n * t_local, C, TH, TW), target_planar.dtype)
    order = np.asarray(plan.gather_index).reshape(-1)  # tile t → dev*T_local+slot
    stacks = stacks.at[jnp.asarray(order)].set(flat)
    out = stacks.reshape(n, t_local, C, TH, TW).transpose(0, 2, 1, 3, 4)
    out = out.reshape(n, C, t_local * TH, TW)
    return out[:, 0] if squeeze else out
