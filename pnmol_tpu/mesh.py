"""Mesh containers: scattered spatial points with neighbor queries.

Capability parity with ``/root/reference/src/pnmol/mesh.py``: a
``RectangularMesh`` over tensor-product 1-D/2-D grids with boundary/interior
classification by bbox-face membership, k-NN stencil queries, and a
boundary projection matrix.

Host/device split (SURVEY.md §5): neighbor search runs once at problem
*setup* and never in the step loop, so it lives on host. For moderate N a
vectorized NumPy brute-force search is used (no tree build cost, exact,
deterministic); above ``_TREE_CUTOVER`` points it switches to the framework's
native C++ KD-tree (``pnmol_tpu.native``, OpenMP-parallel queries — the role
scipy's KDTree plays in the reference, ``mesh.py:16``). Results become
device-resident constants.
"""

import abc
from functools import cached_property

import jax.numpy as jnp
import numpy as np

_TREE_CUTOVER = 2048


def _knn_host(points: np.ndarray, queries: np.ndarray, k: int):
    """Indices of the k nearest neighbors for each query point (host-side)."""
    n = points.shape[0]
    k = min(k, n)
    if n > _TREE_CUTOVER:
        from pnmol_tpu import native

        idx, _ = native.knn(points, queries, k)
        return idx
    d2 = ((queries[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    idx = np.argpartition(d2, kth=k - 1, axis=1)[:, :k]
    order = np.take_along_axis(d2, idx, axis=1).argsort(axis=1)
    return np.take_along_axis(idx, order, axis=1)


class Mesh(abc.ABC):
    """Scattered points."""

    def __init__(self, points):
        # Host copy in float64 BEFORE the device cast: setup-time geometry
        # (neighbor search, stencil offsets, fill distance) keeps full
        # precision even when the device arrays run the f32 TPU policy —
        # f32 coordinate *differences* of nearby points would lose most of
        # their digits, whereas small offsets stored directly are accurate.
        pts_np = np.asarray(points)
        self._points_host = pts_np.astype(np.float64)
        self.points = jnp.asarray(pts_np)

    @abc.abstractmethod
    def neighbours(self, point, num):
        raise NotImplementedError

    @property
    @abc.abstractmethod
    def boundary(self):
        raise NotImplementedError

    @property
    @abc.abstractmethod
    def interior(self):
        raise NotImplementedError

    def sort(self):
        """Reorder points as [interior; boundary] in place (reference:
        ``mesh.py:32-41``)."""
        _, _, interior_idx = self.interior
        _, _, boundary_idx = self.boundary
        perm = np.concatenate((np.asarray(interior_idx), np.asarray(boundary_idx)))
        self.points = self.points[jnp.asarray(perm)]
        self._points_host = self._points_host[perm]  # keep the f64 host copy
        # invalidate cached classifications
        for attr in ("boundary", "interior", "_boundary_mask_host",
                     "boundary_projection_matrix", "boundary_normals"):
            self.__dict__.pop(attr, None)

    def __len__(self):
        return len(self.points)

    def __getitem__(self, key):
        return self.points[key]

    def __repr__(self):
        return f"{type(self).__name__}({repr(self.points)})"

    @property
    def shape(self):
        return self.points.shape

    @property
    def ndim(self):
        """Dimension of the mesh AS AN ARRAY."""
        return self.points.ndim

    @property
    def dimension(self):
        """Spatial dimension of the mesh."""
        return self.points.shape[-1]

    @property
    def fill_distance(self):
        """Largest distance from any point to its nearest distinct neighbor."""
        pts = self._points_host
        if pts.shape[0] > _TREE_CUTOVER:
            # kNN path: the dense (N, N) distance matrix is O(N^2) host memory
            idx = _knn_host(pts, pts, 2)
            nn = pts[idx[:, 1]]
            return float(np.sqrt(((pts - nn) ** 2).sum(-1).max()))
        d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        return float(np.sqrt(d2.min(axis=1).max()))

    @property
    def boundary_projection_matrix(self):
        raise NotImplementedError


class RectangularMesh(Mesh):
    """Tensor-product grid over an axis-aligned bounding box."""

    def __init__(self, points, bbox=None):
        # f64 host copy of the bbox: boundary classification compares the f64
        # host points against it with exact equality, so a policy-dtype (f32)
        # bbox would silently drop every face whose bound is not exactly
        # f32-representable (points would classify as interior and the
        # boundary condition would vanish).
        pts_np = np.asarray(points, dtype=np.float64)
        if bbox is None:
            self._bbox_host = np.stack(
                (pts_np.min(axis=0), pts_np.max(axis=0)), axis=-1
            )
            self.bbox = jnp.asarray(self._bbox_host)
        else:
            self._bbox_host = np.asarray(bbox, dtype=np.float64).reshape(-1, 2)
            self.bbox = jnp.asarray(bbox)
        super().__init__(points)

    @classmethod
    def from_bbox_1d(cls, bbox, step=None, num=None):
        # Grids are built in host float64 (the Mesh constructor keeps the f64
        # copy for setup geometry and casts the device copy per dtype policy).
        bbox = np.asarray(bbox, dtype=np.float64)
        if (step is None) == (num is None):
            raise ValueError("Provide exactly one of step or num.")
        if step is not None:
            num = int((bbox[1] - bbox[0]) / step) + 1
        grid = np.linspace(bbox[0], bbox[1], num=num, endpoint=True)
        return cls(grid.reshape(-1, 1))

    @classmethod
    def from_bbox_nd(cls, bbox, steps=None, nums=None):
        """Tensor-product grid over an n-dimensional bounding box."""
        bbox = np.asarray(bbox, dtype=np.float64).reshape(-1, 2)
        dim = bbox.shape[0]
        if (steps is None) == (nums is None):
            raise ValueError("Provide exactly one of steps or nums.")
        if steps is not None:
            nums = tuple(
                int((bbox[d, 1] - bbox[d, 0]) / steps[d]) + 1 for d in range(dim)
            )
        axes = [
            np.linspace(bbox[d, 0], bbox[d, 1], num=nums[d], endpoint=True)
            for d in range(dim)
        ]
        grids = np.meshgrid(*axes, indexing="ij")
        points = np.stack([g.reshape(-1) for g in grids], axis=-1)
        return cls(points)

    @classmethod
    def from_bbox_2d(cls, bbox, steps=None, nums=None):
        return cls.from_bbox_nd(bbox, steps=steps, nums=nums)

    @classmethod
    def from_bbox_3d(cls, bbox, steps=None, nums=None):
        """3-D tensor grid (the BASELINE.md N=1e5 advection-diffusion path)."""
        return cls.from_bbox_nd(bbox, steps=steps, nums=nums)

    def neighbours(self, point, num):
        """k nearest mesh points for each query point (host-side, setup only)."""
        if num <= 0:
            raise ValueError("num >= 1 required!")
        queries = np.atleast_2d(np.asarray(point))
        indices = _knn_host(self._points_host, queries, num)
        if np.asarray(point).ndim == 1:
            indices = indices[0]
        return self.points[indices], jnp.asarray(indices)

    @cached_property
    def _bbox_2d(self):
        return self._bbox_host

    @cached_property
    def _boundary_mask_host(self):
        bbox = self._bbox_2d
        on_face = (self._points_host == bbox[None, :, 0]) | (
            self._points_host == bbox[None, :, 1]
        )
        return on_face.any(axis=1)

    @cached_property
    def boundary(self):
        mask = jnp.asarray(self._boundary_mask_host)
        return self.points[mask], mask, jnp.nonzero(mask)[0]

    @cached_property
    def interior(self):
        mask = jnp.asarray(~self._boundary_mask_host)
        return self.points[mask], mask, jnp.nonzero(mask)[0]

    @cached_property
    def boundary_projection_matrix(self):
        """Rows of the identity at boundary indices: B x = x restricted to
        the boundary (reference: ``mesh.py:171-175``)."""
        _, _, indices = self.boundary
        return jnp.eye(self.points.shape[0], dtype=self.points.dtype)[indices, :]

    @cached_property
    def boundary_normals(self):
        """Unit outward normals at the boundary points, shape (b, dim).

        Face points get the face's axis normal; edge/corner points (on
        several faces) get the normalized sum of their face normals — the
        standard discrete choice for Neumann corners on a box.
        """
        bbox = self._bbox_2d
        _, _, indices = self.boundary
        pts = self._points_host[np.asarray(indices)]
        normals = (pts == bbox[None, :, 1]).astype(np.float64) - (
            pts == bbox[None, :, 0]
        ).astype(np.float64)
        norms = np.linalg.norm(normals, axis=1, keepdims=True)
        return jnp.asarray(normals / np.maximum(norms, 1e-300))


def read_bbox(points):
    """Per-dimension (min, max) of a point cloud, shape (dim, 2)."""
    pts = np.asarray(points)
    return jnp.asarray(
        np.stack((pts.min(axis=0), pts.max(axis=0)), axis=-1)
    )
