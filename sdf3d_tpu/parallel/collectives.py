"""Hand-rolled ICI collectives: Pallas ring all-reduces.

``lax.psum`` is the right default — XLA's collectives are tuned and fuse
with surrounding compute.  This module exists for the cases where manual
control wins (BASELINE north star: gradient all-reduce overlapped with
backward compute) and as the framework's ICI-level building block.  Two
kernels, selected by payload size (``pallas_psum(algorithm="auto")``):

- **Latency ring** (:func:`ring_schedule`): two column-half streams, each
  forwarding its whole half every hop.  Wire traffic per link per stream is
  ``(N−1)·P/2`` bytes — bandwidth-*naive*, but for the analytic renderer's
  ~dozens-of-floats gradient vectors the collective is latency-bound and
  fewer, larger messages win.
- **Bandwidth ring** (:func:`rs_ag_schedule`): the standard chunked
  reduce-scatter + all-gather ring.  The payload is split into N row chunks
  per stream; RS forwards partial sums N−1 hops, AG circulates the reduced
  chunks N−1 hops, so each link carries ``2·(N−1)/N · P`` bytes total —
  3.5× less than the latency ring at N=8, asymptotically optimal.  This is
  the right kernel for neural-scene MLP gradients (the big-payload case).

Both kernels interleave two streams so one stream's VPU accumulate runs
while the other stream's RDMA is on the wire.  **The overlap is
schedule-verified, not hardware-measured**: the op sequence comes verbatim
from the schedule functions below (Mosaic preserves program order for
side-effecting DMA ops), and tests assert the overlap property *of the
schedule* (``test_parallel.py``).  Real-ICI semaphore timing and >1-chip
behavior are unvalidated on this 1-chip environment.

Multi-collective programs: every entry point takes a ``collective_id``.
The defaults (latency ring 0, bandwidth ring 1) are fine for one reduction
per compiled program; a step body that reduces **twice with the same
kernel** must pass distinct ids or the two launches collide on the barrier
semaphore (deadlock/corruption, not an error).  ``pallas_psum``/
``pallas_psum_tree`` thread the id through to ``CompilerParams``
(tested: two ring reductions in one jitted program,
``test_parallel.py::test_two_ring_reductions_one_program``).

Drop-in for ``lax.psum`` inside ``shard_map`` bodies via :func:`pallas_psum`
(pads/reshapes arbitrary vectors to lane-aligned planes around the kernel);
:func:`pallas_psum_tree` reduces a whole gradient pytree in ONE launch.
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


# ---------------------------------------------------------------------------
# Latency-optimal two-stream ring (small payloads)
# ---------------------------------------------------------------------------


def ring_schedule(num: int) -> list:
    """The two-stream latency-ring op sequence, as data.

    Returns ``[(op, stream, step), ...]`` with ``op ∈ {start, wait, accum}``
    and ``stream ∈ {A, B}``: ``start`` issues stream's step-``s`` RDMA to the
    right neighbor, ``wait`` blocks on its arrival, ``accum`` adds the
    arrived chunk into the output.  This list is the **single source of
    truth** for the kernel: ``_ring_allreduce_kernel`` emits its program by
    walking it in order (Mosaic preserves program order for side-effecting
    DMA ops), so schedule-level properties are properties of the compiled
    kernel.  The (schedule-verified) overlap evidence lives in
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
    """Two-stream rotating ring all-reduce (sum), schedule-verified overlap.

    The payload is split into two row-halves, each running its own rotating
    ring (own comm buffers and semaphore pairs).  Every device runs the same
    program in lockstep; per stream, step s forwards the chunk received at
    step s−1 and accumulates each arrival — after N−1 steps every device has
    every shard's contribution.  Traffic: each hop forwards the whole half,
    so ``(N−1)·P/2`` bytes per link per stream — latency-optimal (N−1
    messages), bandwidth-naive (use the RS+AG kernel for large payloads).

    The op order comes verbatim from :func:`ring_schedule`: the two streams
    are interleaved so that while stream A's RDMA is on the wire, the VPU
    accumulates stream B's already-arrived chunk (and vice versa).
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


@functools.partial(
    jax.jit, static_argnames=("axis", "num", "interpret", "collective_id")
)
def _ring_allreduce_padded(x, axis: str, num: int, interpret: bool, collective_id: int = 0):
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
        compiler_params=pltpu.CompilerParams(
            collective_id=collective_id, has_side_effects=True
        ),
        interpret=interpret,
    )(x)


# ---------------------------------------------------------------------------
# Bandwidth-optimal reduce-scatter + all-gather ring (large payloads)
# ---------------------------------------------------------------------------


def rs_ag_schedule(num: int, backpressure: bool = False) -> list:
    """The two-stream reduce-scatter + all-gather op sequence, as data.

    Returns ``[(op, stream, k), ...]`` with ``k`` the *global* step,
    ``0 ≤ k < 2(num−1)``: steps ``k < num−1`` are the reduce-scatter phase
    (``accum`` the arrived partial into the working chunk), the rest the
    all-gather phase (``copy`` the arrived fully-reduced chunk).  Like
    :func:`ring_schedule` this is the kernel's single source of truth, and
    the same schedule-level overlap property holds: every accum/copy except
    the last runs while the other stream's RDMA is outstanding
    (``test_parallel.py::test_rs_ag_schedule_overlaps_comm_and_compute``).

    ``backpressure=True`` adds the consumption-ack ops the hardware kernel
    emits: ``bp_signal`` after each accum/copy tells the *left* neighbor the
    just-consumed slot may be rewritten; ``bp_wait`` before the start that
    reuses a slot (step ``k`` reuses step ``k−2``'s slot) blocks until the
    *right* neighbor's ack arrives.  Ordering properties — the signal for
    step ``k`` precedes the wait for step ``k+2`` (lockstep-deadlock-free)
    and every slot-reusing start is ack-guarded (sender never ≥2 slots
    ahead of consumption) — are asserted as schedule properties in
    ``test_parallel.py::test_rs_ag_backpressure_schedule_is_safe``, the
    same schedule-as-data treatment the overlap proof gets.
    """
    total = 2 * (num - 1)
    ops = [("start", "A", 0), ("start", "B", 0)]
    for k in range(total):
        for stream in ("A", "B"):
            ops.append(("wait", stream, k))
            ops.append(("accum" if k < num - 1 else "copy", stream, k))
            if backpressure and k + 2 < total:
                ops.append(("bp_signal", stream, k))
            if k + 1 < total:
                if backpressure and k + 1 >= 2:
                    ops.append(("bp_wait", stream, k + 1))
                ops.append(("start", stream, k + 1))
    return ops


def _rs_ag_kernel(
    x_ref, out_ref, comm_a, comm_b, send_a, recv_a, send_b, recv_b,
    free_a, free_b, *, axis: str, num: int, backpressure: bool,
):
    """Chunked reduce-scatter + all-gather ring all-reduce (sum).

    Payload layout: ``(num·8, C)`` — chunk ``c`` is rows ``[8c, 8(c+1))``;
    the two streams are the column halves.  Per stream:

    - **RS step s** (``0 ≤ s < N−1``): send the partially-reduced chunk
      ``(d−s) mod N`` right; accumulate the arrival into ``(d−s−1) mod N``.
      After N−1 steps device ``d`` owns the fully-reduced chunk ``(d+1)``.
    - **AG step t**: send ``(d+1−t) mod N`` right (reduced chunks circulate);
      store the arrival into ``(d−t) mod N``.

    Traffic per link: ``2(N−1)/N · P`` bytes total — the bandwidth-optimal
    ring (vs ``(N−1)·P`` for the latency ring).  Schedule-verified overlap
    as in the latency ring (ops emitted from :func:`rs_ag_schedule`).

    ``backpressure``: comm slots alternate every step, so the slot of step
    ``k`` is rewritten (by the left neighbor) at step ``k+2``; with pure
    lockstep that rewrite could in principle race a slow consumer.  When on,
    the consumer signals the sender's per-slot REGULAR semaphore after each
    accum/copy and the sender waits one signal before any slot reuse — a
    cheap consumption ack that makes the ring robust to device skew (the
    public double-buffered ring examples, and the latency kernel above,
    rely on lockstep instead).
    """
    d = lax.axis_index(axis)
    right = lax.rem(d + 1, num)
    left = lax.rem(d + num - 1, num)
    cols = x_ref.shape[1]
    half = cols // 2

    out_ref[...] = x_ref[...]

    def chunk_rows(c):
        return pl.ds(c * _SUBLANES, _SUBLANES)

    def send_chunk(k):
        if k < num - 1:
            return lax.rem(d - k + 2 * num, num)
        return lax.rem(d + 1 - (k - (num - 1)) + 2 * num, num)

    def recv_chunk(k):
        if k < num - 1:
            return lax.rem(d - k - 1 + 2 * num, num)
        return lax.rem(d - (k - (num - 1)) + 2 * num, num)

    streams = {
        "A": (comm_a, send_a, recv_a, free_a, slice(None, half)),
        "B": (comm_b, send_b, recv_b, free_b, slice(half, None)),
    }
    handles = {}
    # The kernel walks the (possibly back-pressure-annotated) schedule
    # verbatim — bp_wait/bp_signal placement is schedule data, asserted by
    # test_rs_ag_backpressure_schedule_is_safe, not ad-hoc emission logic.
    for op, stream, k in rs_ag_schedule(num, backpressure=backpressure):
        comm, s_sem, r_sem, f_sem, csl = streams[stream]
        slot = k % 2
        if op == "bp_wait":
            # Right neighbor consumed its copy of this slot at step k−2.
            pltpu.semaphore_wait(f_sem.at[slot], 1)
        elif op == "start":
            h = pltpu.make_async_remote_copy(
                src_ref=out_ref.at[chunk_rows(send_chunk(k)), csl],
                dst_ref=comm.at[slot],
                send_sem=s_sem.at[slot],
                recv_sem=r_sem.at[slot],
                device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            h.start()
            handles[stream] = h
        elif op == "wait":
            handles[stream].wait()
        elif op == "bp_signal":
            # Tell the sender (left neighbor) this slot may be rewritten.
            pltpu.semaphore_signal(
                f_sem.at[slot], inc=1, device_id=left,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
        else:  # accum / copy
            c = recv_chunk(k)
            if op == "accum":
                out_ref[chunk_rows(c), csl] += comm[slot]
            else:
                out_ref[chunk_rows(c), csl] = comm[slot]


@functools.partial(
    jax.jit,
    static_argnames=("axis", "num", "interpret", "backpressure", "collective_id"),
)
def _rs_ag_padded(
    x, axis: str, num: int, interpret: bool, backpressure: bool,
    collective_id: int = 1,
):
    """All-reduce a (num·8, 256k) plane with the RS+AG ring."""
    kernel = functools.partial(
        _rs_ag_kernel, axis=axis, num=num, backpressure=backpressure
    )
    half = x.shape[1] // 2
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, _SUBLANES, half), x.dtype),
            pltpu.VMEM((2, _SUBLANES, x.shape[1] - half), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.REGULAR((2,)),
            pltpu.SemaphoreType.REGULAR((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            collective_id=collective_id, has_side_effects=True
        ),
        interpret=interpret,
    )(x)


# Below this flat length the RS+AG plane's padding overhead (num·8·256
# elements minimum) outweighs its wire savings; the latency ring wins.
def _rs_ag_threshold(num_devices: int) -> int:
    return num_devices * _SUBLANES * 2 * _LANES


def pallas_psum(
    x: jnp.ndarray,
    num_devices: int,
    axis: str = tile_axis,
    interpret: bool = False,
    algorithm: str = "auto",
    collective_id: int | None = None,
) -> jnp.ndarray:
    """Sum ``x`` across the mesh axis with a Pallas ring kernel.

    Call **inside** a ``shard_map`` body (like ``lax.psum``).  ``x`` may be
    any shape; it is flattened and padded to a lane-aligned plane around the
    kernel.  ``algorithm``: ``"ring"`` (latency-optimal two-stream ring),
    ``"rs_ag"`` (bandwidth-optimal reduce-scatter + all-gather), or
    ``"auto"`` — rs_ag once the payload reaches its minimum-sensible plane
    (``num·8·256`` floats, 64 KB at N=8), ring below.  ``interpret=True``
    runs the interpreter (CPU-mesh tests).

    ``collective_id`` keys the kernel's barrier semaphore.  ``None`` uses
    the per-kernel default (ring 0, rs_ag 1) — correct for one reduction
    per compiled program.  A program that launches the SAME ring kernel
    twice (e.g. two reductions in one step body) MUST pass distinct ids, or
    the launches collide on the barrier semaphore.
    """
    if num_devices == 1:
        return x
    flat = jnp.ravel(x).astype(jnp.float32)
    n = flat.shape[0]
    if algorithm == "auto":
        algorithm = "rs_ag" if n >= _rs_ag_threshold(num_devices) else "ring"
    if algorithm == "ring":
        cid = 0 if collective_id is None else int(collective_id)
        cols = max(_LANES, ((n + _SUBLANES * _LANES - 1) // (_SUBLANES * _LANES)) * _LANES)
        padded = jnp.zeros((_SUBLANES * cols,), jnp.float32).at[:n].set(flat)
        plane = padded.reshape(_SUBLANES, cols)
        reduced = _ring_allreduce_padded(plane, axis, num_devices, interpret, cid)
    elif algorithm == "rs_ag":
        cid = 1 if collective_id is None else int(collective_id)
        rows = num_devices * _SUBLANES
        unit = rows * 2 * _LANES  # keep the column count a multiple of 256
        cols = 2 * _LANES * ((n + unit - 1) // unit)
        padded = jnp.zeros((rows * cols,), jnp.float32).at[:n].set(flat)
        plane = padded.reshape(rows, cols)
        # Back-pressure acks ride remote semaphore signals, which the Pallas
        # interpreter does not implement ("Remote signal not implemented") —
        # interpret runs are single-host lockstep emulation anyway, so the
        # ack is correctness-neutral there.  Hardware runs keep it on.
        reduced = _rs_ag_padded(plane, axis, num_devices, interpret, not interpret, cid)
    else:
        raise ValueError(f"unknown algorithm {algorithm!r}")
    return jnp.reshape(jnp.ravel(reduced)[:n], jnp.shape(x)).astype(x.dtype)


def allreduce_tree(tree, allreduce: str, num_devices: int, axis: str = tile_axis):
    """Dispatch a gradient-pytree all-reduce by config name — the single
    switch behind every sharded fit wrapper (shard_render, tile_queue):

    - ``"psum"``: XLA's collective (the tuned default);
    - ``"pallas_ring"`` / ``"pallas_ring_interpret"``: one ring-kernel
      launch, algorithm auto-selected by payload (latency ring for
      analytic-scene gradients, bandwidth RS+AG once the flattened vector
      is large — neural MLPs);
    - ``"pallas_rs_ag"`` / ``"pallas_rs_ag_interpret"``: force the
      bandwidth-optimal RS+AG ring regardless of payload size.
    """
    if allreduce == "psum":
        return jax.tree_util.tree_map(lambda g: lax.psum(g, axis), tree)
    if allreduce in ("pallas_ring", "pallas_ring_interpret",
                     "pallas_rs_ag", "pallas_rs_ag_interpret"):
        return pallas_psum_tree(
            tree, num_devices, axis,
            interpret=allreduce.endswith("_interpret"),
            algorithm="rs_ag" if "rs_ag" in allreduce else "auto",
        )
    raise ValueError(f"unknown allreduce {allreduce!r}")


def pallas_psum_tree(tree, num_devices: int, axis: str = tile_axis,
                     interpret: bool = False, algorithm: str = "auto",
                     collective_id: int | None = None):
    """All-reduce a whole pytree with **one** ring kernel launch.

    Leaves are raveled and concatenated into a single vector, reduced with
    one :func:`pallas_psum`, and split back — a gradient pytree costs one
    collective per step, not one per leaf (a leaf-per-ring launch paid the
    full ring latency ``n_leaves`` times for the same handful of floats).
    ``algorithm="auto"`` picks the bandwidth ring automatically once the
    concatenated gradient vector is large (neural-scene MLPs).
    ``collective_id`` as in :func:`pallas_psum` — distinct ids are required
    when one compiled program reduces more than one tree with the same
    kernel.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if not leaves:
        return tree
    if len(leaves) == 1:
        return jax.tree_util.tree_unflatten(
            treedef,
            [pallas_psum(leaves[0], num_devices, axis, interpret, algorithm,
                         collective_id)],
        )
    sizes = [int(jnp.size(l)) for l in leaves]
    flat = jnp.concatenate([jnp.ravel(l).astype(jnp.float32) for l in leaves])
    reduced = pallas_psum(flat, num_devices, axis, interpret, algorithm, collective_id)
    out, off = [], 0
    for leaf, size in zip(leaves, sizes):
        out.append(
            jnp.reshape(reduced[off : off + size], jnp.shape(leaf)).astype(leaf.dtype)
        )
        off += size
    return jax.tree_util.tree_unflatten(treedef, out)
