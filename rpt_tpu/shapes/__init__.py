"""Host-side scene geometry: shapes + affine transforms.

TPU-native counterpart of /root/reference/src/shape.rs and src/shape/*.rs.
These classes are *descriptions*, not intersectors: scene compilation
(`rpt_tpu.scene.Scene.compile`) lowers them to flat struct-of-arrays device
buffers, and the batched intersection kernels live in `rpt_tpu.ops.intersect`.

Transform semantics match the reference exactly (shape.rs:99-284): a
`Transformed` shape stores one accumulated homogeneous matrix (chaining does
not nest), rays are intersected in local space via the inverse transform, and
normals are corrected by the inverse-transpose. For meshes we instead bake the
transform into the vertices at compile time — by linearity this yields
identical hit times and identical interpolated normals.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional

import numpy as np

__all__ = [
    "Shape",
    "Sphere",
    "Plane",
    "Cube",
    "MonomialSurface",
    "Mesh",
    "Group",
    "KdTree",
    "Transformed",
    "sphere",
    "plane",
    "cube",
    "monomial_surface",
    "polygon",
    "triangle_mesh",
    "group",
]


def _rotation_matrix(angle: float, axis) -> np.ndarray:
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    x, y, z = axis
    c, s = math.cos(angle), math.sin(angle)
    C = 1 - c
    m = np.eye(4)
    m[:3, :3] = np.array(
        [
            [x * x * C + c, x * y * C - z * s, x * z * C + y * s],
            [y * x * C + z * s, y * y * C + c, y * z * C - x * s],
            [z * x * C - y * s, z * y * C + x * s, z * z * C + c],
        ]
    )
    return m


class Shape:
    """Base class providing the `Transformable` fluent API (shape.rs:179-230)."""

    def _compose(self, matrix: np.ndarray) -> "Transformed":
        return Transformed(self, matrix)

    def translate(self, v) -> "Transformed":
        m = np.eye(4)
        m[:3, 3] = np.asarray(v, dtype=np.float64)
        return self._compose(m)

    def scale(self, v) -> "Transformed":
        m = np.eye(4)
        m[0, 0], m[1, 1], m[2, 2] = np.asarray(v, dtype=np.float64)
        return self._compose(m)

    def rotate(self, angle: float, axis) -> "Transformed":
        return self._compose(_rotation_matrix(angle, axis))

    def rotate_x(self, angle: float) -> "Transformed":
        return self.rotate(angle, (1.0, 0.0, 0.0))

    def rotate_y(self, angle: float) -> "Transformed":
        return self.rotate(angle, (0.0, 1.0, 0.0))

    def rotate_z(self, angle: float) -> "Transformed":
        return self.rotate(angle, (0.0, 0.0, 1.0))

    def transform(self, matrix) -> "Transformed":
        return self._compose(np.asarray(matrix, dtype=np.float64).reshape(4, 4))


@dataclasses.dataclass
class Sphere(Shape):
    """Unit sphere centered at the origin (shape/sphere.rs)."""


@dataclasses.dataclass
class Plane(Shape):
    """Infinite plane x . normal = value (shape/plane.rs). Unbounded: cannot
    be used as an area light and never enters a BVH (cf. renderer.rs:206-210)."""

    normal: np.ndarray
    value: float

    def __init__(self, normal, value: float):
        self.normal = np.asarray(normal, dtype=np.float64)
        self.value = float(value)


@dataclasses.dataclass
class Cube(Shape):
    """Unit cube centered at the origin (shape/cube.rs)."""


@dataclasses.dataclass
class MonomialSurface(Shape):
    """Glass-shaped surface y = height * (x^2+z^2)^(exp/2), x^2+z^2 <= 1
    (shape/monomial_surface.rs). Only exp = 4 is supported, as in the
    reference."""

    height: float
    exp: float = 4.0

    # Hard-coded one-sided surface area for exp=4, height=2 glass
    # (monomial_surface.rs:117)
    AREA = 6.3406654362


class Mesh(Shape):
    """A triangle soup with per-vertex shading normals.

    The reference stores `Mesh = KdTree<Triangle>` (shape/mesh.rs:102); here
    triangles are flat numpy arrays — acceleration structure layout happens at
    scene compile time (BVH over world-space triangles).
    """

    def __init__(self, vertices: np.ndarray, normals: Optional[np.ndarray] = None):
        """vertices: (T, 3, 3) float64 — T triangles x 3 vertices x xyz.
        normals: optional (T, 3, 3) per-vertex shading normals; if omitted the
        flat geometric normal is used for all three (mesh.rs:26-36)."""
        v = np.asarray(vertices, dtype=np.float64)
        assert v.ndim == 3 and v.shape[1:] == (3, 3), v.shape
        if normals is None:
            e1 = v[:, 1] - v[:, 0]
            e2 = v[:, 2] - v[:, 0]
            fn = np.cross(e1, e2)
            ln = np.linalg.norm(fn, axis=-1, keepdims=True)
            fn = fn / np.where(ln > 0, ln, 1.0)
            normals = np.repeat(fn[:, None, :], 3, axis=1)
        self.vertices = v
        self.normals = np.asarray(normals, dtype=np.float64)
        assert self.normals.shape == v.shape

    @property
    def num_triangles(self) -> int:
        return self.vertices.shape[0]

    def areas(self) -> np.ndarray:
        e1 = self.vertices[:, 1] - self.vertices[:, 0]
        e2 = self.vertices[:, 2] - self.vertices[:, 0]
        return 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)


class Group(Shape):
    """A collection of shapes acting as one shape.

    API parity with the reference's `KdTree::new(Vec<Box<dyn Bounded>>)`
    (kdtree.rs:108-119), which is itself a `Shape` (kdtree.rs:128) so groups
    nest and can be transformed as a unit (examples/fractal_teapots.rs). The
    acceleration-structure choice is NOT part of this type: the scene compiler
    flattens groups (composing transforms) and picks the layout per primitive
    type — brute-force SoA batches for small counts, chunked batches for large
    analytic-primitive counts, and a two-level instanced BVH for meshes.
    """

    def __init__(self, shapes: List["Shape"]):
        self.shapes = list(shapes)


#: Alias matching the reference's type name. In the reference a KdTree is a
#: concrete accelerator; here acceleration is a compiler decision, so this is
#: just a named group of shapes.
KdTree = Group


def group(shapes: List["Shape"]) -> Group:
    return Group(shapes)


class Transformed(Shape):
    """A shape composed with a homogeneous transform (shape.rs:99-151).

    Chained transforms accumulate into a single matrix rather than nesting
    (shape.rs:232-284)."""

    def __init__(self, base: Shape, matrix: np.ndarray):
        if isinstance(base, Transformed):
            matrix = matrix @ base.matrix
            base = base.base
        self.base = base
        self.matrix = np.asarray(matrix, dtype=np.float64).reshape(4, 4)

    def _compose(self, matrix: np.ndarray) -> "Transformed":
        return Transformed(self, matrix)

    @property
    def inverse(self) -> np.ndarray:
        return np.linalg.inv(self.matrix)

    @property
    def linear(self) -> np.ndarray:
        return self.matrix[:3, :3]

    @property
    def normal_matrix(self) -> np.ndarray:
        """Inverse-transpose of the linear part (shape.rs:115)."""
        return np.linalg.inv(self.linear).T

    @property
    def det(self) -> float:
        return float(np.linalg.det(self.linear))


def unwrap_transform(shape: Shape):
    """Return (base_shape, 4x4 world-from-local matrix)."""
    if isinstance(shape, Transformed):
        return shape.base, shape.matrix
    return shape, np.eye(4)


# --- Helper constructors (shape.rs:286-313) --------------------------------


def sphere() -> Sphere:
    return Sphere()


def plane(normal, value: float) -> Plane:
    return Plane(normal, value)


def cube() -> Cube:
    return Cube()


def monomial_surface(height: float, exp: float = 4.0) -> MonomialSurface:
    return MonomialSurface(height, exp)


def polygon(verts: List) -> Mesh:
    """Fan-triangulate a simple polygon (shape.rs:306-313)."""
    verts = [np.asarray(v, dtype=np.float64) for v in verts]
    tris = [
        np.stack([verts[0], verts[i], verts[i + 1]])
        for i in range(1, len(verts) - 1)
    ]
    return Mesh(np.stack(tris))


def triangle_mesh(vertices, normals=None) -> Mesh:
    return Mesh(vertices, normals)
