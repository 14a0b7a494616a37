"""Mesh construction, boundary/interior classification, neighbors, projections."""

import jax.numpy as jnp
import pytest

from pnmol_tpu import mesh


@pytest.fixture
def grid_1d():
    return mesh.RectangularMesh.from_bbox_1d([0.0, 1.0], step=0.25)


@pytest.fixture
def grid_2d():
    return mesh.RectangularMesh.from_bbox_2d(
        [[0.0, 1.0], [0.0, 2.0]], nums=(3, 5)
    )


def test_from_bbox_1d(grid_1d):
    assert grid_1d.shape == (5, 1)
    assert grid_1d.dimension == 1
    assert jnp.allclose(grid_1d.points[:, 0], jnp.linspace(0, 1, 5))


def test_from_bbox_1d_num():
    m = mesh.RectangularMesh.from_bbox_1d([0.0, 1.0], num=11)
    assert m.shape == (11, 1)


def test_exactly_one_of_step_num():
    with pytest.raises(ValueError):
        mesh.RectangularMesh.from_bbox_1d([0.0, 1.0])
    with pytest.raises(ValueError):
        mesh.RectangularMesh.from_bbox_1d([0.0, 1.0], step=0.1, num=5)


def test_from_bbox_2d(grid_2d):
    assert grid_2d.shape == (15, 2)
    assert grid_2d.dimension == 2


def test_boundary_interior_1d(grid_1d):
    b_pts, b_mask, b_idx = grid_1d.boundary
    i_pts, i_mask, i_idx = grid_1d.interior
    assert set(map(int, b_idx)) == {0, 4}
    assert set(map(int, i_idx)) == {1, 2, 3}
    assert jnp.all(b_mask == ~i_mask)


def test_boundary_interior_2d(grid_2d):
    b_pts, _, b_idx = grid_2d.boundary
    i_pts, _, i_idx = grid_2d.interior
    # 3x5 grid: interior is 1x3
    assert len(i_idx) == 3
    assert len(b_idx) == 12
    # all interior points strictly inside the bbox
    assert jnp.all(i_pts[:, 0] > 0.0) and jnp.all(i_pts[:, 0] < 1.0)
    assert jnp.all(i_pts[:, 1] > 0.0) and jnp.all(i_pts[:, 1] < 2.0)


def test_neighbours_single_and_batch(grid_1d):
    nbrs, idx = grid_1d.neighbours(jnp.asarray([0.5]), num=3)
    assert nbrs.shape == (3, 1)
    assert int(idx[0]) == 2  # nearest is the center point

    queries = grid_1d.points[1:3]
    nbrs, idx = grid_1d.neighbours(queries, num=2)
    assert nbrs.shape == (2, 2, 1)
    assert idx.shape == (2, 2)
    # each point is its own nearest neighbor
    assert int(idx[0, 0]) == 1 and int(idx[1, 0]) == 2


def test_neighbours_invalid_num(grid_1d):
    with pytest.raises(ValueError):
        grid_1d.neighbours(jnp.asarray([0.5]), num=0)


def test_boundary_projection_matrix(grid_1d):
    B = grid_1d.boundary_projection_matrix
    assert B.shape == (2, 5)
    x = jnp.arange(5.0)
    assert jnp.allclose(B @ x, jnp.array([0.0, 4.0]))


def test_read_bbox():
    pts = jnp.array([[0.0, -1.0], [2.0, 3.0], [1.0, 0.5]])
    bbox = mesh.read_bbox(pts)
    assert bbox.shape == (2, 2)
    assert jnp.allclose(bbox, jnp.array([[0.0, 2.0], [-1.0, 3.0]]))


def test_fill_distance(grid_1d):
    # uniform grid: every point's nearest distinct neighbor is at dx
    assert abs(grid_1d.fill_distance - 0.25) < 1e-12
