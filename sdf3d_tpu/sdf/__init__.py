"""Differentiable SDF scene graphs: primitives, CSG combinators, transforms."""

from sdf3d_tpu.sdf.node import SDFNode, as_f32, vdot, vlength, vnormalize
from sdf3d_tpu.sdf.primitives import (
    Box,
    Capsule,
    Cylinder,
    Ellipsoid,
    Mandelbulb,
    Plane,
    RoundBox,
    Sphere,
    Torus,
    box,
    capsule,
    cylinder,
    ellipsoid,
    ground_plane,
    mandelbulb,
    plane,
    round_box,
    sphere,
    torus,
)
from sdf3d_tpu.sdf.csg import (
    Intersection,
    SmoothIntersection,
    SmoothSubtraction,
    SmoothUnion,
    Subtraction,
    Union,
    intersection,
    smooth_intersection,
    smooth_subtraction,
    smooth_union,
    subtraction,
    union,
)
from sdf3d_tpu.sdf.grid import VoxelGrid, voxel_grid, voxelize
from sdf3d_tpu.sdf.io import (
    load_scene,
    load_setup,
    save_scene,
    save_setup,
    scene_from_json,
    scene_to_json,
)
from sdf3d_tpu.sdf.materials import Shaded, material_at, scene_has_materials, shaded
from sdf3d_tpu.sdf.neural import NeuralSDF, distill, neural_sdf
from sdf3d_tpu.sdf.transforms import (
    Elongate,
    Onion,
    RepeatInfinite,
    Rotate,
    Round,
    Scale,
    Translate,
    elongate,
    onion,
    repeat_infinite,
    rotate,
    rotvec_to_matrix,
    round_edges,
    scale,
    translate,
)

__all__ = [
    # base
    "SDFNode", "as_f32", "vdot", "vlength", "vnormalize",
    # primitives
    "Box", "Capsule", "Cylinder", "Ellipsoid", "Mandelbulb", "Plane",
    "RoundBox", "Sphere", "Torus", "box", "capsule", "cylinder", "ellipsoid",
    "ground_plane", "mandelbulb", "plane", "round_box", "sphere", "torus",
    # csg
    "Intersection", "SmoothIntersection", "SmoothSubtraction", "SmoothUnion",
    "Subtraction", "Union", "intersection", "smooth_intersection",
    "smooth_subtraction", "smooth_union", "subtraction", "union",
    # transforms
    "Elongate", "Onion", "RepeatInfinite", "Rotate", "Round", "Scale",
    "Translate", "elongate", "onion", "repeat_infinite", "rotate",
    "rotvec_to_matrix", "round_edges", "scale", "translate",
    # voxel grid
    "VoxelGrid", "voxel_grid", "voxelize",
    # per-object materials
    "Shaded", "shaded", "material_at", "scene_has_materials",
    # neural
    "NeuralSDF", "distill", "neural_sdf",
    # serialization
    "load_scene", "load_setup", "save_scene", "save_setup",
    "scene_from_json", "scene_to_json",
]
