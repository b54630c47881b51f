"""Surface extraction tests: a sphere SDF has a known level set."""
import numpy as np

from chore_tpu.utils.marching import (
    batch_eval,
    create_grid,
    marching_tetrahedra,
    reconstruction,
)


def sphere_sdf(points, c=(0.0, 0.0, 0.0), r=0.6):
    return np.linalg.norm(points - np.asarray(c), axis=-1) - r


class TestGrid:
    def test_create_grid_bounds(self):
        pts, axes = create_grid(16, [-1, -1, -1], [1, 1, 1])
        assert pts.shape == (16**3, 3)
        assert pts.min() == -1 and pts.max() == 1

    def test_batch_eval_chunks(self):
        pts, _ = create_grid(16, [-1, -1, -1], [1, 1, 1])
        v1 = batch_eval(pts, sphere_sdf, chunk=100)
        v2 = sphere_sdf(pts)
        assert np.allclose(v1, v2)


class TestMarchingTetrahedra:
    def test_sphere_surface(self):
        pts, _ = create_grid(48, [-1, -1, -1], [1, 1, 1])
        vals = sphere_sdf(pts).reshape(48, 48, 48)
        verts, faces = marching_tetrahedra(vals, [-1, -1, -1], [1, 1, 1],
                                           level=0.0)
        assert len(verts) > 500 and len(faces) > 500
        r = np.linalg.norm(verts, axis=1)
        assert abs(r.mean() - 0.6) < 0.01
        assert r.std() < 0.01
        # faces index valid verts
        assert faces.max() < len(verts)

    def test_empty_grid(self):
        vals = np.ones((8, 8, 8))
        verts, faces = marching_tetrahedra(vals, [-1, -1, -1], [1, 1, 1], 0.0)
        assert len(verts) == 0 and len(faces) == 0

    def test_reconstruction_coarse_to_fine(self):
        verts, faces = reconstruction(sphere_sdf, 48, [-1, -1, -1],
                                      [1, 1, 1], level=0.0, coarse_stride=4,
                                      band=0.3)
        r = np.linalg.norm(verts, axis=1)
        assert abs(r.mean() - 0.6) < 0.01
