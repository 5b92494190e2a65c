"""Collective op-count / wire-traffic lab (interpret-mode sanity).

Real ICI timing needs a multi-chip slice (unavailable here — 1 chip via the
axon relay), so this lab validates what *can* be validated off-hardware:

- per-link wire traffic of both ring algorithms, derived from the schedule
  (the kernels emit exactly the schedule's ops, so these ARE the kernel's
  message counts);
- padded-plane overhead per payload size (the rs_ag plane is (N·8, 256k) —
  tiny payloads would pay a big padding tax, which is why ``auto`` switches
  algorithms at the threshold);
- optional interpret-mode correctness run per size (``--run``).

Usage::

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
        python -m benchmarks.collectives_lab [--run] [--num 8]

(Do NOT set ``JAX_PLATFORMS=cpu`` — with the axon relay plugin present that
combination stalls interpret-mode pallas; the lab pins jax_default_device to
CPU itself, the same recipe as tests/conftest.py.)
"""

from __future__ import annotations

import argparse


def analyze(num: int, payload_bytes: int) -> dict:
    from sdf3d_tpu.parallel.collectives import (
        _LANES,
        _SUBLANES,
        _rs_ag_threshold,
        ring_schedule,
        rs_ag_schedule,
    )

    n = payload_bytes // 4  # f32 elements
    # ring padding: (8, 128k) plane
    ring_cols = max(_LANES, ((n + _SUBLANES * _LANES - 1) // (_SUBLANES * _LANES)) * _LANES)
    ring_plane = _SUBLANES * ring_cols * 4
    # rs_ag padding: (num*8, 256k) plane
    rows = num * _SUBLANES
    unit = rows * 2 * _LANES
    rsag_cols = 2 * _LANES * ((n + unit - 1) // unit)
    rsag_plane = rows * rsag_cols * 4

    ring_msgs = sum(1 for op, _, _ in ring_schedule(num) if op == "start")
    rsag_msgs = sum(1 for op, _, _ in rs_ag_schedule(num) if op == "start")
    return {
        "payload_bytes": payload_bytes,
        "auto": "rs_ag" if n >= _rs_ag_threshold(num) else "ring",
        "ring": {
            "messages_per_link": ring_msgs,
            "bytes_per_link": ring_msgs * ring_plane // 2,
            "padded_plane_bytes": ring_plane,
        },
        "rs_ag": {
            "messages_per_link": rsag_msgs,
            "bytes_per_link": rsag_msgs * rsag_plane // (2 * num),
            "padded_plane_bytes": rsag_plane,
        },
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--num", type=int, default=8)
    ap.add_argument("--run", action="store_true", help="interpret-mode correctness per size")
    args = ap.parse_args()

    sizes = [1 << 10, 16 << 10, 256 << 10, 1 << 20, 4 << 20, 16 << 20]
    print(f"{'payload':>10} {'auto':>6} | {'ring msgs':>9} {'ring B/link':>12} | "
          f"{'rsag msgs':>9} {'rsag B/link':>12} {'saving':>7}")
    for size in sizes:
        a = analyze(args.num, size)
        saving = a["ring"]["bytes_per_link"] / max(a["rs_ag"]["bytes_per_link"], 1)
        print(f"{size:>10} {a['auto']:>6} | {a['ring']['messages_per_link']:>9} "
              f"{a['ring']['bytes_per_link']:>12} | {a['rs_ag']['messages_per_link']:>9} "
              f"{a['rs_ag']['bytes_per_link']:>12} {saving:>6.2f}x")

    if args.run:
        import functools

        import jax

        jax.config.update("jax_default_device", jax.devices("cpu")[0])
        import jax.numpy as jnp
        import numpy as np
        from jax.sharding import PartitionSpec as PS

        from sdf3d_tpu.parallel import pallas_psum
        from sdf3d_tpu.parallel.mesh import make_mesh, tile_axis

        mesh = make_mesh(jax.devices("cpu"), n_devices=args.num)
        rng = np.random.default_rng(0)
        for size in sizes[:3]:  # interpret mode is slow; cap at 256 KB
            n = size // 4
            x = jnp.asarray(rng.standard_normal((args.num, n)), jnp.float32)

            @functools.partial(
                jax.shard_map, mesh=mesh, in_specs=PS(tile_axis, None),
                out_specs=PS(tile_axis, None), check_vma=False,
            )
            def f(local):
                return pallas_psum(local[0], args.num, interpret=True)[None]

            out = np.asarray(f(x))
            np.testing.assert_allclose(
                out, np.broadcast_to(np.asarray(jnp.sum(x, 0)), out.shape),
                rtol=1e-4, atol=1e-4,
            )
            print(f"  correctness {size:>9} B: OK")


if __name__ == "__main__":
    main()
