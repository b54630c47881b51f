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


class TestFieldMeshExtraction:
    def test_demo_field_meshes(self):
        """extract_field_meshes (the PIFu gen_mesh capability) produces
        finite shell meshes from a random field."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from chore_tpu.cli.demo import extract_field_meshes
        from chore_tpu.models import CHOREField, FieldConfig
        from chore_tpu.recon.fitter import ReconFitter
        from chore_tpu.smpl import SMPLH, synthetic_smplh
        from chore_tpu.utils.meshio import octasphere
        from tests.test_fit_e2e import FIT, SAMP, TINY

        model = CHOREField(cfg=TINY)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)),
                            jnp.zeros((1, 8, 3)), jnp.zeros((1, 2)))
        smplh = SMPLH(synthetic_smplh())
        tv, tf = octasphere(radius=0.15, subdiv=2)
        fitter = ReconFitter(model, params, smplh, tv, tf, cfg=FIT,
                             sampler_cfg=SAMP)
        rng = np.random.RandomState(0)
        images = rng.rand(1, 64, 64, 5).astype(np.float32)
        cc = np.array([[1018.0, 779.0]], np.float32)
        out = extract_field_meshes(fitter, images, cc, res=24, level=0.5)
        for name in ("human", "object"):
            fv, ff = out[name]
            assert fv.ndim == 2 and fv.shape[1] == 3
            assert np.isfinite(fv).all()
