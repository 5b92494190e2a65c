"""Hand-rolled ICI collectives: a Pallas ring all-reduce.

``lax.psum`` is the right default — XLA's collectives are tuned and fuse
with surrounding compute.  This module exists for the cases where manual
control wins (BASELINE north star: gradient all-reduce overlapped with
backward compute) and as the framework's ICI-level building block:

- double-buffered **ring all-reduce** over the 1-D ``"tiles"`` mesh axis via
  ``pltpu.make_async_remote_copy`` (pattern: pallas_guide.md §Ring
  Collectives / jax distributed-pallas docs): N−1 lockstep steps, each
  forwarding the chunk received in the previous step to the right neighbor
  and accumulating it locally;
- **genuine comm/compute overlap**: the payload runs as two interleaved
  ring streams — while one stream's RDMA is on the wire, the VPU
  accumulates the other stream's arrived chunk, so reduction adds hide
  transfer latency instead of serializing after it (the BASELINE north
  star's "all-reduce overlapped with backward compute", realized at the
  collective level where the dependence structure allows it);
- drop-in for ``lax.psum`` inside ``shard_map`` bodies via
  :func:`pallas_psum` (pads/reshapes arbitrary vectors to lane-aligned
  planes around the kernel).

For the renderer's ~dozens-of-floats gradient vectors this is latency-bound
either way; the value is the validated overlapped plumbing for bigger
payloads (e.g. neural-scene MLP gradients).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdf3d_tpu.parallel.mesh import tile_axis

_LANES = 128
_SUBLANES = 8


def ring_schedule(num: int) -> list:
    """The two-stream ring all-reduce op sequence, as data.

    Returns ``[(op, stream, step), ...]`` with ``op ∈ {start, wait, accum}``
    and ``stream ∈ {A, B}``: ``start`` issues stream's step-``s`` RDMA to the
    right neighbor, ``wait`` blocks on its arrival, ``accum`` adds the
    arrived chunk into the output.  This list is the **single source of
    truth** for the kernel: ``_ring_allreduce_kernel`` emits its program by
    walking it in order (Mosaic preserves program order for side-effecting
    DMA ops), so schedule-level properties are properties of the compiled
    kernel.  The overlap evidence lives in
    ``test_parallel.py::test_ring_schedule_overlaps_comm_and_compute``:
    every ``accum`` except the final one executes while the *other* stream
    has an RDMA outstanding (issued, not yet waited) — compute hides wire
    time instead of serializing after it.
    """
    ops = [("start", "A", 0), ("start", "B", 0)]
    for step in range(num - 1):
        for stream in ("A", "B"):
            # Consume this stream's arrival while the other stream's RDMA
            # (issued below on the previous line for A, or on the previous
            # step for B) is still in flight.
            ops.append(("wait", stream, step))
            ops.append(("accum", stream, step))
            if step + 1 < num - 1:
                ops.append(("start", stream, step + 1))
    return ops


def _ring_allreduce_kernel(
    x_ref, out_ref, comm_a, comm_b, send_a, recv_a, send_b, recv_b, *, axis: str, num: int
):
    """Two-stream rotating ring all-reduce (sum) with **comm/compute overlap**.

    The payload is split into two row-halves, each running its own rotating
    ring (own comm buffers and semaphore pairs).  Every device runs the same
    program in lockstep; per stream, step s forwards the chunk received at
    step s−1 and accumulates each arrival — after N−1 steps every device has
    every shard's contribution.

    The op order comes verbatim from :func:`ring_schedule`: the two streams
    are interleaved so that while stream A's RDMA is on the wire, the VPU
    accumulates stream B's already-arrived chunk (and vice versa) — each
    stream's wire time is hidden behind the other's adds (BASELINE north
    star: gradient all-reduce overlapped with compute).
    """
    my_id = lax.axis_index(axis)
    right = lax.rem(my_id + 1, num)

    half = x_ref.shape[0] // 2  # padded to 8 sublane rows by pallas_psum

    def rdma(buf, s_sem, r_sem, src_slot, dst_slot):
        return pltpu.make_async_remote_copy(
            src_ref=buf.at[src_slot],
            dst_ref=buf.at[dst_slot],
            send_sem=s_sem.at[src_slot],
            recv_sem=r_sem.at[dst_slot],
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    out_ref[...] = x_ref[...]
    comm_a[0] = x_ref[:half]
    comm_b[0] = x_ref[half:]

    streams = {
        "A": (comm_a, send_a, recv_a, slice(None, half)),
        "B": (comm_b, send_b, recv_b, slice(half, None)),
    }
    handles = {}
    for op, stream, step in ring_schedule(num):
        buf, s_sem, r_sem, rows = streams[stream]
        src_slot, dst_slot = step % 2, (step + 1) % 2
        if op == "start":
            handles[stream] = rdma(buf, s_sem, r_sem, src_slot, dst_slot)
            handles[stream].start()
        elif op == "wait":
            handles[stream].wait()
        else:  # accum
            out_ref[rows] += buf[dst_slot]


@functools.partial(jax.jit, static_argnames=("axis", "num", "interpret"))
def _ring_allreduce_padded(x, axis: str, num: int, interpret: bool):
    """All-reduce an (R, 128k) lane-aligned plane across the mesh axis."""
    kernel = functools.partial(_ring_allreduce_kernel, axis=axis, num=num)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, x.shape[0] // 2) + x.shape[1:], x.dtype),
            pltpu.VMEM((2, x.shape[0] - x.shape[0] // 2) + x.shape[1:], x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(collective_id=0, has_side_effects=True),
        interpret=interpret,
    )(x)


def pallas_psum(x: jnp.ndarray, num_devices: int, axis: str = tile_axis, interpret: bool = False) -> jnp.ndarray:
    """Sum ``x`` across the mesh axis with the ring kernel.

    Call **inside** a ``shard_map`` body (like ``lax.psum``).  ``x`` may be
    any shape; it is flattened and padded to an (8, 128k) plane around the
    kernel.  ``interpret=True`` runs the interpreter (CPU-mesh tests).
    """
    if num_devices == 1:
        return x
    flat = jnp.ravel(x).astype(jnp.float32)
    n = flat.shape[0]
    cols = max(_LANES, ((n + _SUBLANES * _LANES - 1) // (_SUBLANES * _LANES)) * _LANES)
    padded = jnp.zeros((_SUBLANES * cols,), jnp.float32).at[:n].set(flat)
    plane = padded.reshape(_SUBLANES, cols)
    reduced = _ring_allreduce_padded(plane, axis, num_devices, interpret)
    return jnp.reshape(jnp.ravel(reduced)[:n], jnp.shape(x)).astype(x.dtype)


def pallas_psum_tree(tree, num_devices: int, axis: str = tile_axis, interpret: bool = False):
    """All-reduce a whole pytree with **one** ring kernel launch.

    Leaves are raveled and concatenated into a single vector, reduced with
    one :func:`pallas_psum`, and split back — a gradient pytree costs one
    collective per step, not one per leaf (a leaf-per-ring launch paid the
    full ring latency ``n_leaves`` times for the same handful of floats).
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if not leaves:
        return tree
    if len(leaves) == 1:
        return jax.tree_util.tree_unflatten(
            treedef, [pallas_psum(leaves[0], num_devices, axis, interpret)]
        )
    sizes = [int(jnp.size(l)) for l in leaves]
    flat = jnp.concatenate([jnp.ravel(l).astype(jnp.float32) for l in leaves])
    reduced = pallas_psum(flat, num_devices, axis, interpret)
    out, off = [], 0
    for leaf, size in zip(leaves, sizes):
        out.append(
            jnp.reshape(reduced[off : off + size], jnp.shape(leaf)).astype(leaf.dtype)
        )
        off += size
    return jax.tree_util.tree_unflatten(treedef, out)
