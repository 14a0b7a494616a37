"""Native C++ k-NN engine vs scipy/NumPy oracles."""

import numpy as np
import pytest

from pnmol_tpu import native


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(0)
    points = rng.uniform(size=(3000, 2))
    queries = rng.uniform(size=(200, 2))
    return points, queries


def test_native_builds():
    assert native.available(), "C++ kNN extension failed to build"


def test_knn_matches_scipy(cloud):
    points, queries = cloud
    idx, dist = native.knn(points, queries, k=7)
    assert idx.shape == (200, 7)

    import scipy.spatial

    tree = scipy.spatial.KDTree(points)
    ref_dist, ref_idx = tree.query(queries, k=7)
    assert np.array_equal(idx, ref_idx)
    assert np.allclose(dist, ref_dist)


def test_knn_self_query(cloud):
    points, _ = cloud
    idx, dist = native.knn(points, points[:50], k=1)
    assert np.array_equal(idx[:, 0], np.arange(50))
    assert np.allclose(dist[:, 0], 0.0)


def test_knn_k_clamped(cloud):
    points, queries = cloud
    idx, dist = native.knn(points[:5], queries[:3], k=10)
    assert idx.shape == (3, 5)  # k clamped to n
    # each row is a permutation of all 5 points
    assert np.array_equal(np.sort(idx, axis=1), np.tile(np.arange(5), (3, 1)))


def test_mesh_uses_native_above_cutover():
    import jax.numpy as jnp

    from pnmol_tpu import mesh

    grid = mesh.RectangularMesh.from_bbox_1d([0.0, 1.0], num=3000)
    nbrs, idx = grid.neighbours(grid.points[100:103], num=3)
    assert idx.shape == (3, 3)
    assert int(idx[0, 0]) == 100
