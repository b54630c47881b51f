"""Optimizer-trajectory parity against the ACTUAL torch reference fitter.

Forward, loss, gradient and prep parity are pinned elsewhere
(tests/test_torch_parity.py, test_prep_parity.py); this closes the last
offline-provable behavioral surface: the reference's own fitting LOOPS --
optimize_smpl (reference: recon/recon_fit_behave.py:224-291) and the
'object only' phase of optimize_smpl_object (:90-163) -- run side by side
with our jitted phase chains from identical inputs, weights and synthetic
SMPL-H assets, comparing the per-step weighted loss traces and the final
parameters.

Green here proves the phase schedule, Adam lifetimes (including the
moments carrying across the reference's pose->kpts switch, which rebuilds
no optimizer), weight decays, plateau early-stop and every loss term
descend the same surface the reference descends.

Both sides run float32 on CPU; tolerances are set at the measured
accumulation-noise floor (see assertions) -- structural mismatches (wrong
decay, optimizer reset, missing term) diverge orders of magnitude faster.
"""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(__file__))
from ref_oracle import (  # noqa: E402
    REF, FakeSilLossROI, LossRecorder, StopAtSil, load_ref_part_labels,
    make_ref_fitter, make_ref_smpl, setup_reference,
)

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REF, "recon")),
        reason="reference checkout not available",
    ),
]


class _Opt(dict):
    __getattr__ = dict.__getitem__


# config/chore-release.json fields the torch model constructor reads
# (same as tests/test_torch_parity.py)
RELEASE = dict(
    num_stack=2, num_hourglass=2, norm="group", hg_down="ave_pool",
    hourglass_dim=256, skip_hourglass=True, input_type="RGBM3",
    z_feat="xyz", projection_mode="perspective", loadSize=1200,
    gpu_id="cpu",
)

S = 128  # net input size: small for CPU-torch speed; the projection
# conventions are resolution-independent (normalized grid_sample coords)


@pytest.fixture(scope="module")
def smplh_arrays():
    from chore_tpu.smpl.loader import synthetic_smplh

    return synthetic_smplh()


@pytest.fixture(scope="module")
def ref_ns(tmp_path_factory, smplh_arrays):
    return setup_reference(tmp_path_factory.mktemp("ref_oracle"),
                           smplh_arrays)


@pytest.fixture(scope="module")
def torch_chore(ref_ns):
    torch.manual_seed(3)
    model = ref_ns["CHORE"](_Opt(RELEASE))
    model.eval()  # fitting runs the generator's eval-mode model (last
    # stack only, reference: generator.py:33, model/chore.py:93-96)
    for p in model.parameters():  # frozen net (reference: generator.py:40)
        p.requires_grad = False
    return model


@pytest.fixture(scope="module")
def shared_inputs():
    rng = np.random.RandomState(11)
    images = rng.rand(1, S, S, 5).astype(np.float32)
    crop_center = np.array([[1018.0, 779.0]], np.float32)
    # mocap-like init: small pose, nonzero betas (a zero-norm betas tensor
    # flips SMPL_Layer onto its template-betas branch, smpl_layer.py:96)
    pose72 = (0.1 * rng.randn(1, 72)).astype(np.float32)
    betas = (0.1 * rng.randn(1, 10) + 0.05).astype(np.float32)
    human_t = np.array([[0.05, -0.1, 2.2]], np.float32)
    kpts = np.concatenate(
        [rng.rand(1, 25, 2).astype(np.float32) * S,
         (0.3 + 0.7 * rng.rand(1, 25, 1)).astype(np.float32)], axis=-1)
    return dict(images=images, crop_center=crop_center, pose72=pose72,
                betas=betas, human_t=human_t, kpts=kpts)


@pytest.fixture(scope="module")
def our_fitter(torch_chore, smplh_arrays):
    from chore_tpu.models import CHOREField, FieldConfig
    from chore_tpu.recon.fitter import FitConfig, ReconFitter
    from chore_tpu.smpl.model import SMPLH
    from chore_tpu.train.torch_import import convert_state_dict

    cfg = FieldConfig(num_stack=2)
    model = CHOREField(cfg=cfg)
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)),
        jnp.zeros((1, 8, 3)), jnp.zeros((1, 2)),
    )
    params, _ = convert_state_dict(torch_chore.state_dict(), template)

    smplh = SMPLH(smplh_arrays)
    # tiny template; the object oracle overwrites obj_points/pca_init with
    # arrays shared with the torch side
    tv = np.random.RandomState(0).randn(64, 3).astype(np.float32) * 0.2
    tf = np.stack([np.arange(62), np.arange(1, 63), np.arange(2, 64)], 1)
    fit_cfg = FitConfig(
        iter_betas=1, iter_pose=2, iter_kpts=1, iter_kpts_max=2,
        iter_obj=6, iter_sil=0, iter_joint=0, iter_joint_max=0,
        net_in_size=S, svd_jitter=False,
    )
    fitter = ReconFitter(model, params, smplh, tv, tf.astype(np.int32),
                         cfg=fit_cfg, record_traces=True)
    return fitter


def _trace_concat(traces, names):
    loss = np.concatenate(
        [np.asarray(traces[n]["loss"]).ravel() for n in names])
    live = np.concatenate(
        [np.asarray(traces[n]["live"]).ravel() for n in names])
    return loss, live


def test_part_labels_match_reference():
    """Our converted part-label asset is bit-identical to the reference's
    densified smpl_parts_dense.pkl (recon_fit_base.py:277-287)."""
    from chore_tpu.smpl.assets import load_part_labels

    np.testing.assert_array_equal(
        np.asarray(load_part_labels()), load_ref_part_labels())


def test_smpl_trajectory_parity(ref_ns, torch_chore, shared_inputs,
                                our_fitter):
    """optimize_smpl oracle: 6 outer iterations x 10 steps through all
    three reference phases ('global' 1, 'smpl all pose' 2, 'kpts' 1+2,
    decays 1 -> it/3, early stop gated at global it > 3.5)."""
    inp = shared_inputs

    # --- torch reference ------------------------------------------------
    torch_chore.filter(
        torch.from_numpy(inp["images"].transpose(0, 3, 1, 2)))
    fitter_t = make_ref_fitter(ref_ns, net_in_size=S)
    rec = LossRecorder(fitter_t)
    smpl = make_ref_smpl(ref_ns, inp["pose72"], inp["betas"],
                         inp["human_t"])
    betas_dict = {
        "net": torch_chore,
        "part_labels": torch.from_numpy(
            load_ref_part_labels()).long()[None],
        "body_kpts": torch.from_numpy(inp["kpts"]),
        "query_dict": {
            "crop_center": torch.from_numpy(inp["crop_center"])},
        "pose_init": smpl.pose[:, 3:72].clone().detach(),
    }
    smpl_out, scale_t = fitter_t.optimize_smpl(
        smpl, betas_dict, iter_for_betas=1, iter_for_pose=2,
        iter_for_kpts=1, steps_per_iter=10, max_iter=2)

    # --- ours: identical inputs through the production stage jit --------
    feats, tmpx = our_fitter.generator.encode(jnp.asarray(inp["images"]))
    smpl_params, scale_j, traces = our_fitter._jit_fit_smpl(
        our_fitter.params, feats, tmpx, jnp.asarray(inp["crop_center"]),
        jnp.asarray(inp["pose72"]), jnp.asarray(inp["betas"]),
        jnp.asarray(inp["human_t"]), jnp.asarray(inp["kpts"]),
        jax.random.PRNGKey(0),
    )

    loss_j, live_j = _trace_concat(traces, ["global", "pose_kpts"])
    loss_t = np.asarray(rec.trace)

    # both sides must execute the same number of steps (same early-stop
    # decision at the same iteration)
    assert int(live_j.sum()) == len(loss_t), (
        f"step counts differ: ours {int(live_j.sum())} vs torch "
        f"{len(loss_t)}")
    loss_j = loss_j[live_j.astype(bool)]

    rel = np.abs(loss_j - loss_t) / np.maximum(np.abs(loss_t), 1e-6)
    # Tolerances from measurement (2026-08, torch 2.x CPU vs jax CPU,
    # both f32): steps 0-12 track at <3e-5 (the whole 'global' phase and
    # first pose iteration, including the reference's characteristic
    # smplz oscillation, which only reproduces with the per-iteration
    # gradient accumulation). From step ~13 f32 noise is amplified ~2x
    # per step by the dynamically unstable oscillation (measured max 0.23
    # mid-swing, re-converging to 2.5% by the end). Structural mismatches
    # (wrong decay, optimizer reset, missing term) blow past the early
    # bound within a few steps -- that is what this oracle guards.
    assert rel[:13].max() < 1e-3, f"early trace diverged: {rel[:13]}"
    assert rel.max() < 0.35, (
        f"trace diverged: max rel {rel.max():.3e} at step {rel.argmax()}")
    assert rel.mean() < 0.08, f"trace diverged on average: {rel.mean():.3e}"

    # the kpts switch at global iteration 3 (step 30): j2d turns on and
    # the decay changes -- the loss jumps by the same factor on both sides
    jump_t = loss_t[30] / loss_t[29]
    jump_j = loss_j[30] / loss_j[29]
    assert jump_t > 3 and jump_j > 3, (jump_t, jump_j)
    assert abs(jump_j - jump_t) / jump_t < 0.15, (jump_j, jump_t)

    # final parameters agree within the chaos envelope (their difference
    # reflects the trajectory noise above, not a framework mismatch)
    from chore_tpu.smpl.model import pack_pose

    pose_j = np.asarray(pack_pose(smpl_params))
    pose_t = smpl_out.pose.detach().numpy()
    np.testing.assert_allclose(pose_j, pose_t, atol=0.08)
    np.testing.assert_allclose(
        np.asarray(smpl_params["trans"]),
        smpl_out.trans.detach().numpy(), atol=0.08)
    np.testing.assert_allclose(
        np.asarray(smpl_params["top_betas"]),
        smpl_out.betas.detach().numpy()[:, :2], atol=0.08)
    np.testing.assert_allclose(
        np.asarray(scale_j), scale_t.detach().numpy(), atol=0.02)

    # final-GEOMETRY check: the per-parameter atols above bound each
    # parameter independently; vertex RMS between the two fitted meshes
    # is the aggregate that catches a SYSTEMATIC surface shift (wrong
    # late-phase weight/decay) even when each parameter stays inside its
    # own box. Measured floor 2026-08: 72.8 mm — consistent with the
    # granted envelopes (trans atol alone is 80 mm); the oscillation
    # noise, not a framework mismatch, dominates it. A mis-weighted
    # late-phase term drags the surface decimeters within a few
    # iterations, which this bound still catches.
    verts_j = np.asarray(our_fitter.smplh.verts(smpl_params))
    verts_t = smpl_out()[0].detach().numpy()
    rms = float(np.sqrt(np.mean(np.sum((verts_j - verts_t) ** 2, -1))))
    assert rms < 0.15, f"fitted-surface RMS {rms * 1000:.1f} mm"


def test_smpl_kpts_adam_carry(ref_ns, torch_chore, shared_inputs,
                              smplh_arrays):
    """Micro-oracle for the pose->kpts optimizer lifetime: with budgets
    (betas 0, pose 1, kpts 1, max 0) the switch lands at step 10, where
    the f32 noise floor is still ~1e-4, so the trace across the boundary
    is a SHARP test that Adam's moments and step count carry over (the
    reference builds no new optimizer at the switch,
    recon_fit_behave.py:260-264; a state reset shifts the post-switch
    steps by far more than the bound here)."""
    from chore_tpu.models import CHOREField, FieldConfig
    from chore_tpu.recon.fitter import FitConfig, ReconFitter
    from chore_tpu.smpl.model import SMPLH
    from chore_tpu.train.torch_import import convert_state_dict

    inp = shared_inputs
    torch_chore.filter(
        torch.from_numpy(inp["images"].transpose(0, 3, 1, 2)))
    fitter_t = make_ref_fitter(ref_ns, net_in_size=S)
    rec = LossRecorder(fitter_t)
    smpl = make_ref_smpl(ref_ns, inp["pose72"], inp["betas"],
                         inp["human_t"])
    betas_dict = {
        "net": torch_chore,
        "part_labels": torch.from_numpy(
            load_ref_part_labels()).long()[None],
        "body_kpts": torch.from_numpy(inp["kpts"]),
        "query_dict": {
            "crop_center": torch.from_numpy(inp["crop_center"])},
        "pose_init": smpl.pose[:, 3:72].clone().detach(),
    }
    fitter_t.optimize_smpl(smpl, betas_dict, iter_for_betas=0,
                           iter_for_pose=1, iter_for_kpts=1,
                           steps_per_iter=10, max_iter=0)

    model = CHOREField(cfg=FieldConfig(num_stack=2))
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)),
        jnp.zeros((1, 8, 3)), jnp.zeros((1, 2)),
    )
    params, _ = convert_state_dict(torch_chore.state_dict(), template)
    tv = np.random.RandomState(0).randn(64, 3).astype(np.float32) * 0.2
    tf = np.stack(
        [np.arange(62), np.arange(1, 63), np.arange(2, 64)], 1)
    fitter_j = ReconFitter(
        model, params, SMPLH(smplh_arrays), tv, tf.astype(np.int32),
        cfg=FitConfig(iter_betas=0, iter_pose=1, iter_kpts=1,
                      iter_kpts_max=0, net_in_size=S, svd_jitter=False),
        record_traces=True)
    feats, tmpx = fitter_j.generator.encode(jnp.asarray(inp["images"]))
    _, _, traces = fitter_j._jit_fit_smpl(
        fitter_j.params, feats, tmpx, jnp.asarray(inp["crop_center"]),
        jnp.asarray(inp["pose72"]), jnp.asarray(inp["betas"]),
        jnp.asarray(inp["human_t"]), jnp.asarray(inp["kpts"]),
        jax.random.PRNGKey(0),
    )
    loss_j, live_j = _trace_concat(traces, ["global", "pose_kpts"])
    loss_t = np.asarray(rec.trace)
    assert int(live_j.sum()) == len(loss_t) == 20
    loss_j = loss_j[live_j.astype(bool)]
    rel = np.abs(loss_j - loss_t) / np.abs(loss_t)
    assert rel.max() < 1e-2, (
        f"pose->kpts boundary diverged (Adam state not carried?): {rel}")


def test_object_trajectory_parity(ref_ns, torch_chore, shared_inputs,
                                  our_fitter):
    """'object only' phase oracle: 6 iterations x 10 steps of Adam on
    (R, t, s) against the df_o + scale + ocent losses.

    The SVD projection is de-RANDOMIZED on both sides but NOT de-jittered:
    both add the same FIXED 1e-3 offset before projecting. At an exact
    rotation the singular values coincide and the SVD backward is 0/0 --
    jax returns NaN, torch returns implementation-defined junk -- so the
    R-gradient is only comparable when the spectrum is split. This is the
    deterministic analog of the reference's own 1e-4 random jitter, which
    exists precisely to dodge this degeneracy (recon_fit_base.py:373-384);
    production keeps FitConfig.svd_jitter=True."""
    inp = shared_inputs
    rng = np.random.RandomState(5)
    jitter = (1e-3 * rng.rand(3, 3)).astype(np.float32)

    # shared object init data
    obj_points = (0.15 * rng.randn(2000, 3)).astype(np.float32)
    pca_init = np.linalg.qr(rng.randn(3, 3))[0].astype(np.float32)
    pca_pred = (np.linalg.qr(rng.randn(3, 3))[0]
                + 0.05 * rng.randn(3, 3)).astype(np.float32)
    center_rel = np.array([[0.4, -0.2, 0.1]], np.float32)
    scale0 = np.array([0.97], np.float32)

    # --- torch reference ------------------------------------------------
    import recon.recon_fit_behave as rfb

    torch_chore.filter(
        torch.from_numpy(inp["images"].transpose(0, 3, 1, 2)))
    fitter_t = make_ref_fitter(ref_ns, net_in_size=S)
    # deterministic SO(3) projection: fixed shared jitter (see docstring)
    jit_t = torch.from_numpy(jitter)
    base = ref_ns["ReconFitterBehave"]
    orig_decopose = base.decopose_axis
    base.decopose_axis = staticmethod(
        lambda rot, no_rand=False: fitter_t.project_so3(rot + jit_t))
    orig_sil = rfb.SilLossROI
    rfb.SilLossROI = FakeSilLossROI
    try:
        fitter_t.obj_points = torch.from_numpy(obj_points)
        fitter_t.pca_init = torch.from_numpy(pca_init)
        fitter_t.scan = None
        smpl = make_ref_smpl(ref_ns, inp["pose72"], inp["betas"],
                             inp["human_t"])
        pc_fake = {"object": {
            "centers": torch.from_numpy(
                np.concatenate([np.zeros((1, 3), np.float32),
                                center_rel], 1)),
            "pca_axis": torch.from_numpy(pca_pred[None]),
        }}
        obj_R, obj_s, obj_t, object_init = fitter_t.init_obj_fit_data(
            1, torch.from_numpy(inp["human_t"]), pc_fake,
            torch.from_numpy(scale0))
        data_dict = {
            "obj_R": obj_R, "obj_t": obj_t, "obj_s": obj_s,
            "objects": object_init, "smpl": smpl,
            "images": torch.from_numpy(
                inp["images"].transpose(0, 3, 1, 2)),
            "query_dict": {
                "crop_center": torch.from_numpy(inp["crop_center"])},
            "obj_t_init": obj_t.clone().detach(),
        }
        rec = LossRecorder(fitter_t)
        with pytest.raises(StopAtSil):
            fitter_t.optimize_smpl_object(
                torch_chore, data_dict, obj_iter=6, joint_iter=0,
                steps_per_iter=10)
    finally:
        base.decopose_axis = orig_decopose
        rfb.SilLossROI = orig_sil

    # --- ours -----------------------------------------------------------
    import chore_tpu.ops.rotation as rot_mod
    import chore_tpu.recon.fitter as fitter_mod
    from chore_tpu.smpl.model import init_params

    our_fitter.obj_points = jnp.asarray(obj_points)
    our_fitter.pca_init = jnp.asarray(pca_init)
    # same fixed jitter before every projection (both the init inside
    # init_object_orientation and the per-step re-projection)
    jit_j = jnp.asarray(jitter)
    orig_proj = rot_mod.project_so3
    rot_mod.project_so3 = lambda m: orig_proj(m + jit_j)
    fitter_mod.project_so3 = rot_mod.project_so3
    try:
        feats, tmpx = our_fitter.generator.encode(
            jnp.asarray(inp["images"]))
        smpl_params = init_params(inp["pose72"], inp["betas"],
                                  inp["human_t"])
        obj_params, traces = jax.jit(
            our_fitter._fit_object_pure, static_argnames=("use_sil",)
        )(
            our_fitter.params, feats, tmpx,
            jnp.asarray(inp["crop_center"]), smpl_params,
            jnp.asarray(center_rel), jnp.asarray(pca_pred[None]),
            jnp.asarray(inp["human_t"]), jnp.asarray(scale0), None,
            jax.random.PRNGKey(0), use_sil=False,
        )
    finally:
        rot_mod.project_so3 = orig_proj
        fitter_mod.project_so3 = orig_proj

    loss_j, live_j = _trace_concat(traces, ["obj"])
    loss_t = np.asarray(rec.trace)
    assert int(live_j.sum()) == len(loss_t) == 60
    loss_j = loss_j[live_j.astype(bool)]
    rel = np.abs(loss_j - loss_t) / np.maximum(np.abs(loss_t), 1e-6)
    assert rel[:10].max() < 1e-3, f"early trace diverged: {rel[:10]}"
    assert rel.max() < 2e-2, (
        f"trace diverged: max rel {rel.max():.3e} at step {rel.argmax()}")

    np.testing.assert_allclose(
        np.asarray(obj_params["obj_t"]), obj_t.detach().numpy(),
        atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(obj_params["obj_s"]), obj_s.detach().numpy(),
        atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(obj_params["obj_R"]), obj_R.detach().numpy(),
        atol=1e-2)


class _FakePointclouds:
    """pytorch3d.structures.Pointclouds stand-in: a ragged list holder
    (the exact-chamfer stub below consumes it directly)."""

    def __init__(self, points):
        self.points = list(points)


def _exact_chamfer(x, y):
    """Exact brute-force CPU replacement for pytorch3d.loss.chamfer_distance
    at its defaults (squared distances, point_reduction='mean' per cloud,
    batch_reduction='mean', K=1 via full pairwise min): loss =
    mean_clouds(mean_p min_q d2) + mean_clouds(mean_q min_p d2). No cdist
    (its mm path is approximate); the expansion-free quadratic form is the
    oracle."""
    chx, chy = [], []
    for p, q in zip(x.points, y.points):
        d2 = ((p[:, None, :] - q[None, :, :]) ** 2).sum(-1)
        chx.append(d2.min(1).values.mean())
        chy.append(d2.min(0).values.mean())
    return torch.stack(chx).mean() + torch.stack(chy).mean(), None


class _ZeroSilLossROI:
    """SilLossROI stand-in returning an exactly-zero mask loss: the mask
    term and its gradient vanish on BOTH sides (ours via keep_mask=0 ->
    loss (0*image - 0)^2 == 0 with zero grad), while the sil phase's
    scale/trans regularizers, optimizer lifetime, decay schedule and
    prev_loss threading still run for real and stay oracle-comparable.
    The true mask gradient is CUDA-gated (NMR) and covered separately by
    tests/test_pallas_sil.py + the convergence study."""

    def __init__(self, *a, **k):
        pass

    def to(self, device):
        return self

    def __call__(self, R, t, s):
        # scalar: sum_dict stacks the weighted losses (recon_fit_base.py:358)
        return ({"mask": torch.zeros(())}, None, None, None, None)


def test_joint_trajectory_parity(ref_ns, torch_chore, shared_inputs,
                                 our_fitter):
    """Full object-chain oracle through ALL THREE phases of the reference
    optimize_smpl_object (recon_fit_behave.py:90-163): 'object only' (2
    iters), 'sil' (the hardcoded 50 iters, mask term exactly zeroed on
    both sides -- see _ZeroSilLossROI), and 'joint' (up to 100 iters of
    Adam on (t, s) against field + ocent + CONTACT + scale, collide
    zero-weighted: ours by weight table, the reference by a
    zero-returning pen_distance stub -- mesh_intersection BVH is
    CUDA-only). pytorch3d chamfer/Pointclouds are replaced by the exact
    brute-force stubs above, so the torch side runs the REAL ragged
    per-part contact gather (recon_fit_base.py:553-608) against our
    fixed-shape masked grouped-NN implementation."""
    from chore_tpu.models import CHOREField, FieldConfig
    from chore_tpu.recon import losses as L
    from chore_tpu.recon.fitter import FitConfig, ReconFitter
    from chore_tpu.recon.silhouette import compute_k_roi
    from chore_tpu.smpl.model import SMPLH, init_params
    from chore_tpu.train.torch_import import convert_state_dict

    inp = shared_inputs
    rng = np.random.RandomState(7)
    jitter = (1e-3 * rng.rand(3, 3)).astype(np.float32)

    obj_points = (0.15 * rng.randn(600, 3)).astype(np.float32)
    pca_init = np.linalg.qr(rng.randn(3, 3))[0].astype(np.float32)
    pca_pred = (np.linalg.qr(rng.randn(3, 3))[0]
                + 0.05 * rng.randn(3, 3)).astype(np.float32)
    center_rel = np.array([[0.15, -0.05, 0.02]], np.float32)
    scale0 = np.array([0.97], np.float32)
    scan_v = (0.12 * np.random.RandomState(8).randn(64, 3)).astype(
        np.float32)
    scan_f = np.stack([np.arange(62), np.arange(1, 63),
                       np.arange(2, 64)], 1)

    # --- torch reference ------------------------------------------------
    import recon.recon_fit_base as rfbase
    import recon.recon_fit_behave as rfb

    torch_chore.filter(
        torch.from_numpy(inp["images"].transpose(0, 3, 1, 2)))
    fitter_t = make_ref_fitter(ref_ns, net_in_size=S)
    jit_t = torch.from_numpy(jitter)
    base = ref_ns["ReconFitterBehave"]
    orig_decopose = base.decopose_axis
    base.decopose_axis = staticmethod(
        lambda rot, no_rand=False: fitter_t.project_so3(rot + jit_t))
    orig_sil = rfb.SilLossROI
    rfb.SilLossROI = _ZeroSilLossROI
    orig_cham = rfbase.chamfer_distance
    orig_pc = rfbase.Pointclouds
    rfbase.chamfer_distance = _exact_chamfer
    rfbase.Pointclouds = _FakePointclouds

    class _Scan:
        v = scan_v

    try:
        fitter_t.obj_points = torch.from_numpy(obj_points)
        fitter_t.pca_init = torch.from_numpy(pca_init)
        fitter_t.scan = _Scan()
        fitter_t.scan_faces = torch.from_numpy(scan_f.astype(np.int64))
        fitter_t.search_tree = lambda tri: None
        fitter_t.pen_distance = lambda tri, idx: torch.zeros(1)
        fitter_t.part_names = [f"part{i}" for i in range(14)]
        smpl = make_ref_smpl(ref_ns, inp["pose72"], inp["betas"],
                             inp["human_t"])
        pc_fake = {"object": {
            "centers": torch.from_numpy(
                np.concatenate([np.zeros((1, 3), np.float32),
                                center_rel], 1)),
            "pca_axis": torch.from_numpy(pca_pred[None]),
        }}
        obj_R, obj_s, obj_t, object_init = fitter_t.init_obj_fit_data(
            1, torch.from_numpy(inp["human_t"]), pc_fake,
            torch.from_numpy(scale0))
        data_dict = {
            "obj_R": obj_R, "obj_t": obj_t, "obj_s": obj_s,
            "objects": object_init, "smpl": smpl,
            "images": torch.from_numpy(
                inp["images"].transpose(0, 3, 1, 2)),
            "query_dict": {
                "crop_center": torch.from_numpy(inp["crop_center"])},
            "obj_t_init": obj_t.clone().detach(),
        }
        rec = LossRecorder(fitter_t)
        fitter_t.optimize_smpl_object(
            torch_chore, data_dict, obj_iter=2, joint_iter=0,
            steps_per_iter=10)
    finally:
        base.decopose_axis = orig_decopose
        rfb.SilLossROI = orig_sil
        rfbase.chamfer_distance = orig_cham
        rfbase.Pointclouds = orig_pc

    # --- ours -----------------------------------------------------------
    import chore_tpu.ops.rotation as rot_mod
    import chore_tpu.recon.fitter as fitter_mod

    model = CHOREField(cfg=FieldConfig(num_stack=2))
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)),
        jnp.zeros((1, 8, 3)), jnp.zeros((1, 2)),
    )
    params, _ = convert_state_dict(torch_chore.state_dict(), template)
    from chore_tpu.smpl.loader import synthetic_smplh

    fitter_j = ReconFitter(
        model, params, SMPLH(synthetic_smplh()), scan_v,
        scan_f.astype(np.int32),
        weights=dict(L.BEHAVE_WEIGHTS, collide=0.0),
        cfg=FitConfig(iter_obj=2, iter_sil=50, iter_joint=0,
                      iter_joint_max=100, net_in_size=S, svd_jitter=False,
                      sil_rend_size=64),
        record_traces=True)
    fitter_j.obj_points = jnp.asarray(obj_points)
    fitter_j.pca_init = jnp.asarray(pca_init)

    # exactly-zero mask loss: keep_mask = image_ref = 0 everywhere
    Z = np.zeros((1, 64, 64), np.float32)
    sil_data = {
        "image_ref": jnp.asarray(Z), "keep_mask": jnp.asarray(Z),
        "edt_ref": jnp.asarray(Z),
        "k_rois": jnp.asarray(compute_k_roi(
            np.array([500.0, 400.0, 600.0, 600.0]))[None]),
    }

    jit_j = jnp.asarray(jitter)
    orig_proj = rot_mod.project_so3
    rot_mod.project_so3 = lambda m: orig_proj(m + jit_j)
    fitter_mod.project_so3 = rot_mod.project_so3
    try:
        feats, tmpx = fitter_j.generator.encode(jnp.asarray(inp["images"]))
        smpl_params = init_params(inp["pose72"], inp["betas"],
                                  inp["human_t"])
        obj_params, traces = jax.jit(
            fitter_j._fit_object_pure, static_argnames=("use_sil",)
        )(
            fitter_j.params, feats, tmpx,
            jnp.asarray(inp["crop_center"]), smpl_params,
            jnp.asarray(center_rel), jnp.asarray(pca_pred[None]),
            jnp.asarray(inp["human_t"]), jnp.asarray(scale0), sil_data,
            jax.random.PRNGKey(0), use_sil=True,
        )
    finally:
        rot_mod.project_so3 = orig_proj
        fitter_mod.project_so3 = orig_proj

    loss_j, live_j = _trace_concat(traces, ["obj", "sil", "joint"])
    loss_t = np.asarray(rec.trace)

    n_t, n_j = len(loss_t), int(live_j.sum())
    # same phase schedule: obj 20 + sil 500 + joint steps; both sides must
    # take the same early-stop decision in the joint phase
    assert n_t > 520 and n_j > 520, (n_t, n_j)
    assert n_j == n_t, f"step counts differ: ours {n_j} vs torch {n_t}"
    loss_j = loss_j[live_j.astype(bool)]

    rel = np.abs(loss_j - loss_t) / np.maximum(np.abs(loss_t), 1e-6)
    # the whole object-only phase + the sil entry must track tightly; the
    # sil phase is analytic (quadratic regularizers, zero mask) so it
    # stays tight; the joint phase accumulates f32 chaos like the other
    # trajectory oracles
    assert rel[:25].max() < 1e-3, f"early trace diverged: {rel[:25]}"
    assert rel[:520].max() < 2e-2, (
        f"obj/sil trace diverged: max rel {rel[:520].max():.3e} at "
        f"step {rel[:520].argmax()}")
    assert rel.max() < 0.35, (
        f"joint trace diverged: max rel {rel.max():.3e} at step "
        f"{rel.argmax()}")
    assert rel.mean() < 0.05, f"diverged on average: {rel.mean():.3e}"

    # final parameters agree within the trajectory-noise envelope
    np.testing.assert_allclose(
        np.asarray(obj_params["obj_t"]), obj_t.detach().numpy(),
        atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(obj_params["obj_s"]), obj_s.detach().numpy(),
        atol=1e-2)
