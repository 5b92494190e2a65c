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
- drop-in for ``lax.psum`` inside ``shard_map`` bodies via
  :func:`pallas_psum` (pads/reshapes arbitrary vectors to lane-aligned
  planes around the kernel).

For the renderer's ~dozens-of-floats gradient vectors this is latency-bound
either way; the value is the overlap hook (``rdma.start`` early, ``wait``
late) and validated plumbing for bigger payloads.
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


def _ring_allreduce_kernel(x_ref, out_ref, comm_buf, send_sem, recv_sem, *, axis: str, num: int):
    """Naive rotating ring all-reduce (sum), double-buffered.

    Every device runs the same program in lockstep: at step s it sends the
    chunk it holds in slot s%2 to its right neighbor and receives the next
    chunk into slot (s+1)%2, accumulating each arrival.  After N−1 steps each
    device has seen every shard's contribution.  Bandwidth-naive (sends whole
    vectors, not 1/N chunks) — right for small payloads where latency rules.
    """
    my_id = lax.axis_index(axis)
    right = lax.rem(my_id + 1, num)

    out_ref[...] = x_ref[...]
    comm_buf[0] = x_ref[...]

    for step in range(num - 1):
        src_slot = step % 2
        dst_slot = (step + 1) % 2
        rdma = pltpu.make_async_remote_copy(
            src_ref=comm_buf.at[src_slot],
            dst_ref=comm_buf.at[dst_slot],
            send_sem=send_sem.at[src_slot],
            recv_sem=recv_sem.at[dst_slot],
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        # Overlap hook: independent compute may be issued here before wait().
        rdma.wait()
        out_ref[...] += comm_buf[dst_slot]


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
            pltpu.VMEM((2,) + x.shape, x.dtype),
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
    """Tree-map :func:`pallas_psum` — all leaves reduced with one kernel call
    each (small gradient pytrees; fuse into one vector upstream if needed)."""
    return jax.tree_util.tree_map(
        lambda leaf: pallas_psum(leaf, num_devices, axis, interpret), tree
    )
