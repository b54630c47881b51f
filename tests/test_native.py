"""Tests for the chorenat native geometry runtime (native/chorenat.cpp via
chore_tpu/native.py), cross-checked against the JAX/numpy oracles."""
import numpy as np
import pytest

from chore_tpu import native
from chore_tpu.utils.meshio import octasphere

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


@pytest.fixture(scope="module")
def mesh():
    return octasphere(radius=0.4, center=(0.1, -0.2, 0.3), subdiv=2)


@pytest.fixture(scope="module")
def points():
    rng = np.random.RandomState(7)
    return (rng.randn(800, 3) * 0.6).astype(np.float32)


class TestBVH:
    def test_distance_matches_dense_oracle(self, mesh, points):
        v, f = mesh
        a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
        # dense oracle via the jitted region-test kernel
        from chore_tpu.ops.point_mesh import point_mesh_udf as jax_udf

        d_ref, vidx_ref = jax_udf(points, v, f)
        d_ref = np.asarray(d_ref)

        bvh = native.TriangleBVH(v, f)
        d = bvh.query(points)
        np.testing.assert_allclose(d, d_ref, atol=2e-5)

        d2, vidx = native.point_mesh_udf(points, v, f)
        np.testing.assert_allclose(d2, d_ref, atol=2e-5)
        np.testing.assert_array_equal(vidx, np.asarray(vidx_ref))

    def test_closest_points_lie_on_mesh(self, mesh, points):
        v, f = mesh
        bvh = native.TriangleBVH(v, f)
        d, fi, cp = bvh.query(points, want_faces=True, want_closest=True)
        # distance to returned closest point equals reported distance
        np.testing.assert_allclose(
            np.linalg.norm(points - cp, axis=1), d, atol=1e-5
        )
        assert (fi >= 0).all() and (fi < len(f)).all()

    def test_surface_points_have_zero_distance(self, mesh):
        v, f = mesh
        bvh = native.TriangleBVH(v, f)
        d = bvh.query(v)
        np.testing.assert_allclose(d, 0.0, atol=1e-6)


class TestKDTree:
    def test_matches_brute_force(self, mesh, points):
        v, _ = mesh
        dist, idx = native.PointKDTree(v).query(points)
        d2 = ((points[:, None] - v[None]) ** 2).sum(-1)
        np.testing.assert_array_equal(idx, d2.argmin(1))
        np.testing.assert_allclose(dist, np.sqrt(d2.min(1)), atol=1e-5)


class TestSampling:
    def test_deterministic_and_on_surface(self, mesh):
        v, f = mesh
        s1 = native.sample_surface(v, f, 5000, seed=11)
        s2 = native.sample_surface(v, f, 5000, seed=11)
        np.testing.assert_array_equal(s1, s2)
        s3 = native.sample_surface(v, f, 5000, seed=12)
        assert not np.array_equal(s1, s3)
        # samples lie on the mesh surface
        d = native.TriangleBVH(v, f).query(s1)
        np.testing.assert_allclose(d, 0.0, atol=1e-5)

    def test_area_weighting(self):
        # two triangles, one 4x the area of the other -> ~80/20 sample split
        v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                      [10, 0, 0], [12, 0, 0], [10, 2, 0]], np.float32)
        f = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        s = native.sample_surface(v, f, 20000, seed=0)
        frac_big = (s[:, 0] > 5).mean()
        assert abs(frac_big - 0.8) < 0.02


class TestChamfer:
    def test_matches_numpy(self, mesh, points):
        v, _ = mesh
        got = native.chamfer(points, v)
        d2 = ((points[:, None] - v[None]) ** 2).sum(-1)
        want = np.sqrt(d2.min(1)).mean() + np.sqrt(d2.min(0)).mean()
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_zero_on_identical(self, points):
        assert native.chamfer(points, points) == 0.0
