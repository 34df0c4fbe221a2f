"""rpt_tpu — a TPU-native, differentiable physically-based path tracer.

Built from scratch in JAX/XLA/Pallas with the full capability surface of the
Rust CPU renderer `ekzhang/rpt` (see SURVEY.md), re-architected for TPUs:
batched wavefront light transport over SoA ray tensors, BVH-accelerated mesh
intersection, one-sample-MIS microfacet BSDFs, next-event estimation,
HDRI environments, thin-lens depth of field, OBJ/MTL/STL loading, progressive
rendering with variance estimation, RK4 particle physics, multi-chip sharding
via jax.sharding, and end-to-end differentiability.

Everything is re-exported flat, mirroring the reference's crate root
(/root/reference/src/lib.rs:9-21).
"""

from .buffer import Buffer, Filter
from .camera import Camera
from .color import SRGB_GAMMA, color_bytes, hex_color
from .environment import Environment
from .lights import AmbientLight, DirectionalLight, ObjectLight, PointLight
from .materials import Material
from .renderer import Renderer
from .scene import Object, Scene
from .shapes import (
    Cube,
    Group,
    KdTree,
    Mesh,
    MonomialSurface,
    Plane,
    Sphere,
    Transformed,
    cube,
    group,
    monomial_surface,
    plane,
    polygon,
    sphere,
    triangle_mesh,
)

__version__ = "0.1.0"

__all__ = [
    "Buffer",
    "Filter",
    "Camera",
    "SRGB_GAMMA",
    "color_bytes",
    "hex_color",
    "Environment",
    "AmbientLight",
    "DirectionalLight",
    "ObjectLight",
    "PointLight",
    "Material",
    "Renderer",
    "Object",
    "Scene",
    "Cube",
    "Group",
    "KdTree",
    "Mesh",
    "MonomialSurface",
    "Plane",
    "Sphere",
    "Transformed",
    "cube",
    "group",
    "monomial_surface",
    "plane",
    "polygon",
    "sphere",
    "triangle_mesh",
    "load_obj",
    "load_obj_with_mtl",
    "load_stl",
]


def __getattr__(name):
    # Lazy IO imports keep `import rpt_tpu` light.
    if name in ("load_obj", "load_obj_with_mtl", "load_stl"):
        from .io import obj as _obj, stl as _stl

        return {
            "load_obj": _obj.load_obj,
            "load_obj_with_mtl": _obj.load_obj_with_mtl,
            "load_stl": _stl.load_stl,
        }[name]
    raise AttributeError(name)
