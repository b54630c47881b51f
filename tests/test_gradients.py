"""Numerical gradient checks (jax.test_util.check_grads) for the
differentiable ops the fitting loops rely on (SURVEY §4 test strategy)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.test_util import check_grads

from chore_tpu.ops.camera import PerspectiveCamera
from chore_tpu.ops.grid_sample import bilinear_sample
from chore_tpu.ops.rotation import project_so3
from chore_tpu.ops.rasterizer import project_unit_k, soft_silhouette
from chore_tpu.smpl import SMPLH, synthetic_smplh
from chore_tpu.smpl.model import init_params


def _pts(n=32, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(
        (rng.rand(1, n, 3) * [1.0, 1.0, 0.4] + [-0.5, -0.5, 2.0]).astype(
            np.float32
        )
    )


class TestGradChecks:
    def test_camera_projection(self):
        cam = PerspectiveCamera()
        cc = jnp.asarray([[1018.0, 779.0]])
        check_grads(
            lambda p: cam.project_points(p, cc), (_pts(),),
            order=1, modes=["rev"], atol=1e-2, rtol=1e-2,
        )

    def test_bilinear_sample(self):
        rng = np.random.RandomState(1)
        feat = jnp.asarray(rng.rand(1, 8, 8, 4).astype(np.float32))
        # keep sample points away from integer pixel crossings where
        # bilinear interpolation is non-differentiable
        uv = jnp.asarray(
            (rng.rand(1, 16, 2) * 1.4 - 0.7 + 0.013).astype(np.float32)
        )
        check_grads(lambda f, u: bilinear_sample(f, u), (feat, uv),
                    order=1, modes=["rev"], atol=5e-2, rtol=5e-2)

    def test_project_so3(self):
        rng = np.random.RandomState(2)
        m = jnp.asarray(
            (np.linalg.qr(rng.randn(3, 3))[0]
             + 0.05 * rng.randn(3, 3)).astype(np.float32)[None]
        )
        check_grads(project_so3, (m,), order=1, modes=["rev"],
                    atol=5e-2, rtol=5e-2)

    def test_soft_silhouette(self):
        v, f = np.array(
            [[-0.2, -0.2, 2.0], [0.3, -0.1, 2.0], [0.0, 0.3, 2.0]],
            np.float32,
        ), np.array([[0, 1, 2]], np.int32)
        K = jnp.asarray(np.array(
            [[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32
        ))

        def render_sum(verts):
            ndc = project_unit_k(verts[None], K[None])
            return jnp.sum(soft_silhouette(ndc, jnp.asarray(f),
                                           image_size=32))

        check_grads(render_sum, (jnp.asarray(v),), order=1, modes=["rev"],
                    atol=0.3, rtol=0.3)

    def test_lbs(self):
        smplh = SMPLH(synthetic_smplh())
        sp = init_params(jnp.full((1, 72), 0.05), jnp.zeros((1, 10)),
                         jnp.asarray([[0.0, 0.0, 2.2]]))

        def verts_sum(pose_body):
            p = dict(sp, body_pose=pose_body)
            return jnp.sum(smplh.verts(p) ** 2)

        check_grads(verts_sum, (sp["body_pose"],), order=1, modes=["rev"],
                    atol=5e-2, rtol=5e-2)
