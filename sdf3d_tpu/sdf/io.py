"""Scene and render-setup serialization: human-editable JSON files.

The reference bakes its scene into shader source (``voxel_fragment.frag:54-81``
— changing anything means recompiling, SURVEY.md §5 config system); here a
scene is a pytree of typed nodes, so it serializes generically: every node
class, plus Camera/PointLight/Material and the RenderConfig family, round-
trips through a tagged JSON encoding.

Design:

- **Human-editable**: small arrays (a sphere's center, a material's diffuse)
  are plain JSON lists you can tweak in a text editor; only large arrays
  (voxel grids, MLP weights) switch to base64-packed raw float bytes.
- **Exact**: both encodings are bit-preserving for float32 leaves (JSON
  numbers are decimal shortest-round-trip doubles, a superset of float32;
  base64 stores the raw bytes), so a load-save-load cycle is a fixed point
  and a loaded scene renders bit-identically.
- **Closed registry**: only classes registered here decode (every SDFNode
  subclass is picked up automatically), so a malformed file fails loudly
  instead of instantiating arbitrary types.

API: :func:`scene_to_json` / :func:`scene_from_json` (any registered pytree,
not just scenes), :func:`save_scene` / :func:`load_scene` (files), and
:func:`save_setup` / :func:`load_setup` (scene + camera + light + material +
render config in one file — a complete reproducible render).
"""

from __future__ import annotations

import base64
import dataclasses
import json
import pathlib

import jax.numpy as jnp
import numpy as np

from sdf3d_tpu.sdf.node import SDFNode

#: Arrays with more elements than this are base64-packed instead of listed.
_LIST_MAX = 256

_FORMAT = "sdf3d-tpu/1"


def _registry() -> dict:
    """Name -> class for every decodable type (SDFNode subclasses found
    recursively, plus the view/config dataclasses)."""
    # Importing the node modules registers their subclasses.
    from sdf3d_tpu.sdf import csg, grid, materials, neural, primitives, transforms  # noqa: F401

    classes: dict[str, type] = {}

    def walk(cls):
        for sub in cls.__subclasses__():
            classes[sub.__name__] = sub
            walk(sub)

    walk(SDFNode)

    from sdf3d_tpu.camera import Camera
    from sdf3d_tpu.config import AOConfig, MarchConfig, RenderConfig, ShadowConfig
    from sdf3d_tpu.lighting import Material, PointLight

    for cls in (Camera, Material, PointLight, RenderConfig, MarchConfig, ShadowConfig, AOConfig):
        classes[cls.__name__] = cls
    return classes


def _encode(v):
    if isinstance(v, (jnp.ndarray, np.ndarray)):
        a = np.asarray(v)
        out = {"__array__": True, "dtype": str(a.dtype), "shape": list(a.shape)}
        if a.size <= _LIST_MAX:
            out["data"] = a.tolist()
        else:
            out["b64"] = base64.b64encode(np.ascontiguousarray(a).tobytes()).decode("ascii")
        return out
    if dataclasses.is_dataclass(v) and not isinstance(v, type):
        return {
            "__type__": type(v).__name__,
            "fields": {
                f.name: _encode(getattr(v, f.name)) for f in dataclasses.fields(v)
            },
        }
    if isinstance(v, (tuple, list)):
        return {"__seq__": "tuple" if isinstance(v, tuple) else "list",
                "items": [_encode(x) for x in v]}
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    raise TypeError(f"cannot serialize {type(v).__name__}: {v!r}")


#: dtypes a scene file may carry.  The file's dtype/shape are untrusted
#: (hand-editable JSON): anything outside this set — or a b64 payload whose
#: byte length disagrees with shape×itemsize — fails here with a clear error
#: instead of deferring a confusing failure to trace time.
_DTYPE_ALLOWLIST = ("float32", "int32", "bool")


def _decode(v, classes: dict):
    if isinstance(v, dict) and v.get("__array__"):
        if str(v["dtype"]) not in _DTYPE_ALLOWLIST:
            raise ValueError(
                f"scene file array dtype {v['dtype']!r} not allowed; "
                f"expected one of {_DTYPE_ALLOWLIST}"
            )
        dtype = np.dtype(v["dtype"])
        shape = tuple(int(s) for s in v["shape"])
        if "b64" in v:
            raw = base64.b64decode(v["b64"])
            expected = int(np.prod(shape, dtype=np.int64)) * dtype.itemsize
            if len(raw) != expected:
                raise ValueError(
                    f"scene file array payload is {len(raw)} bytes but "
                    f"shape {shape} dtype {dtype} needs {expected}"
                )
            a = np.frombuffer(raw, dtype=dtype).reshape(shape)
        else:
            a = np.asarray(v["data"], dtype=dtype).reshape(shape)
        return jnp.asarray(a)
    if isinstance(v, dict) and "__type__" in v:
        name = v["__type__"]
        if name not in classes:
            raise ValueError(f"unknown node/config type {name!r} in scene file")
        cls = classes[name]
        fields = {k: _decode(x, classes) for k, x in v["fields"].items()}
        return cls(**fields)
    if isinstance(v, dict) and "__seq__" in v:
        items = [_decode(x, classes) for x in v["items"]]
        return tuple(items) if v["__seq__"] == "tuple" else items
    return v


def scene_to_json(obj, indent: int | None = 2) -> str:
    """Serialize any registered pytree (scene node, Camera, configs, or a
    dict of them) to a JSON string."""
    if isinstance(obj, dict):
        payload = {k: _encode(v) for k, v in obj.items()}
    else:
        payload = _encode(obj)
    return json.dumps({"format": _FORMAT, "root": payload}, indent=indent)


def scene_from_json(text: str):
    doc = json.loads(text)
    if not isinstance(doc, dict) or doc.get("format") != _FORMAT:
        raise ValueError(f"not an {_FORMAT} file")
    classes = _registry()
    root = doc["root"]
    if isinstance(root, dict) and "__type__" not in root and "__seq__" not in root and not root.get("__array__"):
        return {k: _decode(v, classes) for k, v in root.items()}
    return _decode(root, classes)


def save_scene(path, scene: SDFNode) -> None:
    """Write a scene tree to ``path`` as editable JSON."""
    pathlib.Path(path).write_text(scene_to_json(scene))


def load_scene(path) -> SDFNode:
    """Load a scene written by :func:`save_scene` (or hand-written)."""
    obj = scene_from_json(pathlib.Path(path).read_text())
    if not isinstance(obj, SDFNode):
        raise ValueError(f"{path} does not contain a scene node (got {type(obj).__name__})")
    return obj


def save_setup(path, scene, camera=None, light=None, material=None, config=None) -> None:
    """Write a complete reproducible render setup (scene + view + config) to
    one JSON file.  ``None`` entries are omitted and fall back to the
    reference defaults on load."""
    doc = {"scene": scene}
    if camera is not None:
        doc["camera"] = camera
    if light is not None:
        doc["light"] = light
    if material is not None:
        doc["material"] = material
    if config is not None:
        doc["config"] = config
    pathlib.Path(path).write_text(scene_to_json(doc))


def load_setup(path) -> dict:
    """Load a setup file: returns a dict with ``scene`` plus ``camera`` /
    ``light`` / ``material`` / ``config`` filled in with reference defaults
    where the file omits them."""
    obj = scene_from_json(pathlib.Path(path).read_text())
    if isinstance(obj, SDFNode):
        obj = {"scene": obj}
    if "scene" not in obj:
        raise ValueError(f"{path} has no 'scene' entry")
    import sdf3d_tpu as s

    obj.setdefault("camera", s.Camera.reference())
    obj.setdefault("light", s.reference_light())
    obj.setdefault("material", s.reference_material())
    obj.setdefault("config", s.REFERENCE_CONFIG)
    return obj
