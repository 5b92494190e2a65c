"""Checkpoint / resume for inverse-rendering fits.

The reference has no persistence of any kind — no state outlives the process
(``/root/reference/Code/src/main.cpp:103-107``).  Here fits checkpoint the
scene-parameter pytree + optimizer state (SURVEY.md §5): atomic single-file
snapshots via flax serialization (msgpack), with a JSON manifest carrying the
step counter and loss history.  Renders themselves are stateless.
"""

from __future__ import annotations

import json
import os
import pathlib
import tempfile
from typing import Any

import flax.serialization as fser
import jax


def save_checkpoint(path: str | os.PathLike, state: Any, step: int, meta: dict | None = None) -> None:
    """Atomically write ``state`` (any pytree) + metadata to ``path``.

    Layout: ``<path>`` is a directory with ``state.msgpack`` and
    ``manifest.json``.  Writes go to a temp name then ``os.replace`` — a
    crash mid-write never corrupts the previous checkpoint.

    **Multi-host**: only process 0 writes (fit state is replicated, so its
    copy is complete); every other process is a silent no-op — N processes
    racing ``os.replace`` on one shared directory is corruption.  Resume
    (:func:`load_checkpoint`) runs on *all* processes, so the checkpoint path
    must be readable everywhere (shared filesystem, or replicated file).
    """
    if jax.process_index() != 0:
        return
    path = pathlib.Path(path)
    path.mkdir(parents=True, exist_ok=True)
    state = jax.device_get(state)
    payload = fser.to_bytes(state)

    def atomic_write(name: str, data: bytes):
        fd, tmp = tempfile.mkstemp(dir=path, prefix=name + ".")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(data)
            os.replace(tmp, path / name)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    atomic_write("state.msgpack", payload)
    manifest = {"step": int(step), **(meta or {})}
    atomic_write("manifest.json", json.dumps(manifest, indent=2).encode())


def load_checkpoint(path: str | os.PathLike, state_template: Any):
    """Restore ``(state, manifest)``; ``state_template`` supplies the pytree
    structure (standard flax ``from_bytes`` contract).  Returns ``(None,
    None)`` if no checkpoint exists — callers start fresh deterministically
    (the SURVEY §5 failure-recovery story: re-init from the last snapshot).
    """
    path = pathlib.Path(path)
    state_file = path / "state.msgpack"
    if not state_file.exists():
        return None, None
    state = fser.from_bytes(state_template, state_file.read_bytes())
    manifest = json.loads((path / "manifest.json").read_text())
    return state, manifest
