"""SMPL-H layer tests: LBS against an independent numpy oracle, priors,
landmarks, split params."""
import numpy as np
import pytest

import jax.numpy as jnp

from chore_tpu.ops.rotation import axis_angle_to_matrix
from chore_tpu.smpl import (
    SMPLH,
    const,
    init_params,
    lbs,
    load_part_labels,
    make_body_prior,
    make_hand_prior,
    mean_hand_pose,
    model_from_arrays,
    pack_pose,
    split_params,
    synthetic_smplh,
)


@pytest.fixture(scope="module")
def tiny_model():
    # small synthetic model: fast CPU tests, full 52-joint chain
    return synthetic_smplh(num_verts=200, num_joints=52)


@pytest.fixture(scope="module")
def smplh(tiny_model):
    return SMPLH(tiny_model)  # landmark regressors are (K, 6890): skip here


def numpy_lbs_oracle(data, pose, betas, trans):
    """Straight SMPL-paper implementation in numpy (independent of lbs.py)."""
    from scipy.spatial.transform import Rotation

    V = data["v_template"].shape[0]
    J = len(data["parents"])
    rots = Rotation.from_rotvec(pose.reshape(J, 3)).as_matrix()  # (J, 3, 3)
    v_shaped = data["v_template"] + data["shapedirs"] @ betas
    joints = data["j_regressor"] @ v_shaped
    pose_map = (rots[1:] - np.eye(3)).reshape(-1)
    v_posed = v_shaped + data["posedirs"] @ pose_map

    G = np.zeros((J, 4, 4))
    G[0, :3, :3] = rots[0]
    G[0, :3, 3] = joints[0]
    G[0, 3, 3] = 1
    for i in range(1, J):
        p = data["parents"][i]
        rel = np.zeros((4, 4))
        rel[:3, :3] = rots[i]
        rel[:3, 3] = joints[i] - joints[p]
        rel[3, 3] = 1
        G[i] = G[p] @ rel
    A = G.copy()
    for i in range(J):
        A[i, :3, 3] -= G[i, :3, :3] @ joints[i]
    T = np.einsum("vj,jpq->vpq", data["weights"], A)
    verts = np.einsum("vpq,vq->vp", T[:, :3, :3], v_posed) + T[:, :3, 3]
    return verts + trans, G[:, :3, 3] + trans


class TestLBS:
    def test_matches_numpy_oracle(self, tiny_model, rng):
        model, parents = model_from_arrays(tiny_model)
        pose = (0.3 * rng.randn(1, 156)).astype(np.float32)
        betas = (0.5 * rng.randn(1, 10)).astype(np.float32)
        trans = rng.randn(1, 3).astype(np.float32)
        verts, joints, _, _ = lbs(
            model, parents, jnp.asarray(pose), jnp.asarray(betas), jnp.asarray(trans)
        )
        ev, ej = numpy_lbs_oracle(tiny_model, pose[0], betas[0], trans[0])
        assert np.allclose(verts[0], ev, atol=2e-5)
        assert np.allclose(joints[0], ej, atol=2e-5)

    def test_zero_pose_is_template(self, tiny_model):
        model, parents = model_from_arrays(tiny_model)
        verts, _, _, _ = lbs(
            model, parents, jnp.zeros((1, 156)), jnp.zeros((1, 10)), jnp.zeros((1, 3))
        )
        assert np.allclose(verts[0], tiny_model["v_template"], atol=1e-5)

    def test_translation_is_additive(self, tiny_model, rng):
        model, parents = model_from_arrays(tiny_model)
        pose = jnp.asarray(0.2 * rng.randn(2, 156).astype(np.float32))
        betas = jnp.zeros((2, 10))
        t = jnp.asarray(rng.randn(2, 3).astype(np.float32))
        v0, j0, _, _ = lbs(model, parents, pose, betas, jnp.zeros((2, 3)))
        v1, j1, _, _ = lbs(model, parents, pose, betas, t)
        assert np.allclose(v1, v0 + t[:, None], atol=1e-6)

    def test_global_rotation_rotates_rigidly(self, tiny_model):
        model, parents = model_from_arrays(tiny_model)
        pose = jnp.zeros((1, 156)).at[0, :3].set(jnp.array([0, np.pi / 2, 0]))
        v0, j0, _, _ = lbs(
            model, parents, jnp.zeros((1, 156)), jnp.zeros((1, 10)), jnp.zeros((1, 3))
        )
        v1, j1, _, _ = lbs(model, parents, pose, jnp.zeros((1, 10)), jnp.zeros((1, 3)))
        r = np.asarray(axis_angle_to_matrix(jnp.array([[0.0, np.pi / 2, 0.0]])))[0]
        root = np.asarray(j0[0, 0])
        expected = (np.asarray(v0[0]) - root) @ r.T + root
        # pose blendshapes perturb slightly; synthetic posedirs are tiny
        assert np.allclose(v1[0], expected, atol=5e-3)

    def test_gradients_flow(self, tiny_model):
        import jax

        model, parents = model_from_arrays(tiny_model)

        def loss(pose):
            v, _, _, _ = lbs(model, parents, pose, jnp.zeros((1, 10)), jnp.zeros((1, 3)))
            return jnp.sum(v**2)

        g = jax.grad(loss)(jnp.zeros((1, 156)) + 0.1)
        assert np.all(np.isfinite(np.asarray(g)))


class TestParams:
    def test_split_roundtrip(self, rng):
        pose = jnp.asarray(rng.randn(2, 156).astype(np.float32))
        betas = jnp.asarray(rng.randn(2, 10).astype(np.float32))
        trans = jnp.asarray(rng.randn(2, 3).astype(np.float32))
        p = split_params(pose, betas, trans)
        assert p["global_pose"].shape == (2, 3)
        assert p["body_pose"].shape == (2, 63)
        assert p["hand_pose"].shape == (2, 90)
        assert np.allclose(pack_pose(p), pose)

    def test_init_params_pads_smpl72_with_grab_hands(self, rng):
        poses = rng.randn(2, 72).astype(np.float32)
        p = init_params(poses, np.zeros((2, 10)), np.zeros((2, 3)))
        full = np.asarray(pack_pose(p))
        assert np.allclose(full[:, :66], poses[:, :66])
        assert np.allclose(full[:, 66:], np.asarray(mean_hand_pose())[None])


class TestPriorsAssets:
    def test_body_prior_zero_at_mean(self):
        prior = make_body_prior()
        from chore_tpu.smpl.assets import load_priors

        mean = load_priors()["body_mean"]
        pose = jnp.concatenate(
            [jnp.zeros((1, 3)), jnp.asarray(mean)[None], jnp.zeros((1, 6))], axis=1
        )
        assert np.allclose(prior(pose), 0.0, atol=1e-8)
        # deviating increases energy
        assert float(prior(pose + 0.5)[0]) > 0.0

    def test_hand_prior_zero_at_mean(self):
        prior = make_hand_prior()
        pose = jnp.concatenate(
            [jnp.zeros((1, 66)), jnp.asarray(mean_hand_pose())[None]], axis=1
        )
        assert np.allclose(prior(pose), 0.0, atol=1e-8)

    def test_part_labels(self):
        labels = load_part_labels()
        assert labels.shape == (6890,)
        assert labels.min() >= 0 and labels.max() == const.SMPL_PARTS_NUM - 1
        # every part is populated
        assert len(np.unique(labels)) == const.SMPL_PARTS_NUM

    def test_landmark_regressors_rows_sum_to_one(self):
        from chore_tpu.smpl.assets import load_landmark_regressors

        regs = load_landmark_regressors()
        assert regs["body25"].shape == (25, 6890)
        sums = regs["body25"].sum(1)
        assert np.allclose(sums, 1.0, atol=1e-3)


class TestSMPLHWrapper:
    def test_full_size_forward_and_landmarks(self):
        model_data = synthetic_smplh()  # full 6890 verts for regressor compat
        smplh = SMPLH(model_data)
        params = init_params(
            np.zeros((1, 72), np.float32),
            np.zeros((1, 10), np.float32),
            np.array([[0.0, 0.0, 2.2]], np.float32),
        )
        verts = smplh.verts(params)
        assert verts.shape == (1, 6890, 3)
        j, face, hand = smplh.get_landmarks(params)
        assert j.shape == (1, 25, 3)
        assert face.shape == (1, 70, 3)
        assert hand.shape == (1, 42, 3)
        pelvis = smplh.pelvis(params)
        assert pelvis.shape == (1, 3)
        # translation propagates to the pelvis depth
        assert abs(float(pelvis[0, 2]) - 2.2) < 0.5
