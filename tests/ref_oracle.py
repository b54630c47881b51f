"""Harness to run the ACTUAL reference torch fitting/generation loops on
CPU, for trajectory-parity oracles (tests/test_trajectory_parity.py).

Technique (same family as tests/test_torch_parity.py / test_prep_parity.py):
module stubs for the CUDA/visualization dependencies the import graph drags
in but the oracled code paths never execute, torch ``.cuda()`` no-ops, a
PATHS.yml pointing SMPL_ASSETS_ROOT at the reference's REAL shipped assets
(/root/reference/assets -- the same pickles our chore_tpu/assets/*.npz were
converted from), and a fake ``ready_arguments`` that feeds our deterministic
synthetic SMPL-H arrays into the reference's SMPL_Layer (the license-gated
model pickles are absent; both frameworks consume the SAME arrays).

Reference entry points exercised through this harness:
  * ReconFitterBehave.optimize_smpl      (recon/recon_fit_behave.py:224-291)
  * ReconFitterBehave.optimize_smpl_object 'object only' phase (:90-163)
  * Generator.gen_pc_batch               (recon/generator.py:123-188)
"""
import os
import sys
import types

import numpy as np

REF = "/root/reference"


def _stub_module(name, **attrs):
    if name in sys.modules:
        mod = sys.modules[name]
    else:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
        parent, _, child = name.rpartition(".")
        if parent:
            _stub_module(parent)
            setattr(sys.modules[parent], child, mod)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


class _Ch:
    """chumpy-array stand-in: ``.r`` recovers the ndarray, slicing returns
    another wrapper (SMPL_Layer does ``shapedirs[:, :, :n].r``,
    smpl_layer.py:52)."""

    def __init__(self, a):
        self._a = np.asarray(a)

    @property
    def r(self):
        return self._a

    def __getitem__(self, idx):
        return _Ch(self._a[idx])


def _install_fake_serialization(arrays):
    """Pre-seed sys.modules with a chumpy-free ``serialization`` module whose
    ready_arguments returns our synthetic SMPL-H arrays in the structure
    SMPL_Layer reads (reference: smpl_layer.py:46-70,
    native/webuser/serialization.py:52-85)."""
    import scipy.sparse as sp

    name = "lib_smpl.smplpytorch.smplpytorch.native.webuser.serialization"
    J = arrays["j_regressor"].shape[0]
    kintree = np.zeros((2, J), dtype=np.int64)
    kintree[0] = np.asarray(arrays["parents"], np.int64)
    kintree[1] = np.arange(J)

    def ready_arguments(fname_or_dict):
        return {
            "betas": _Ch(np.zeros(arrays["shapedirs"].shape[-1], np.float64)),
            "shapedirs": _Ch(arrays["shapedirs"].astype(np.float64)),
            "posedirs": _Ch(arrays["posedirs"].astype(np.float64)),
            "v_template": _Ch(arrays["v_template"].astype(np.float64)),
            "J_regressor": sp.csr_matrix(
                arrays["j_regressor"].astype(np.float64)),
            "weights": _Ch(arrays["weights"].astype(np.float64)),
            "f": np.asarray(arrays["faces"], np.int64),
            "kintree_table": kintree,
        }

    # seed ONLY the leaf: creating stub parents would shadow the real
    # lib_smpl package (the parents are real, chumpy-free __init__ files)
    mod = types.ModuleType(name)
    mod.ready_arguments = ready_arguments
    sys.modules[name] = mod
    return mod


_SETUP_DONE = {}


def setup_reference(tmp_path, smplh_arrays):
    """Import the reference fitting stack against stubs + synthetic SMPL-H.

    Idempotent per process (the reference reads PATHS.yml from cwd at import
    time, so the first call wins; subsequent calls return the cached
    modules). Returns a namespace dict of the imported reference modules.
    """
    if _SETUP_DONE:
        return _SETUP_DONE["ns"]

    import torch

    tmp_path = str(tmp_path)
    os.makedirs(tmp_path, exist_ok=True)
    with open(os.path.join(tmp_path, "PATHS.yml"), "w") as f:
        f.write(
            f"CODE: {REF}\n"
            f"SMPL_ASSETS_ROOT: {REF}/assets\n"
            f"SMPL_MODEL_ROOT: {tmp_path}/models\n"
            f"BEHAVE_PATH: {tmp_path}/behave\n"
            f"RECON_PATH: {tmp_path}/recon\n"
            f"PROCESSED_PATH: {tmp_path}/processed\n"
        )

    # CPU-only torch: .cuda() must be a no-op (the reference hardcodes
    # .cuda() on priors/losses, th_smpl_prior.py:26-27) and .to('cuda:0')
    # must land on cpu (th_hand_prior.py:57 defaults device='cuda:0')
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.cuda = lambda self, *a, **k: self

    def _cpu_args(args, kwargs):
        args = tuple(
            "cpu" if isinstance(a, (str, torch.device)) and "cuda" in str(a)
            else a for a in args)
        if "device" in kwargs and "cuda" in str(kwargs["device"]):
            kwargs = dict(kwargs, device="cpu")
        return args, kwargs

    _tensor_to, _module_to = torch.Tensor.to, torch.nn.Module.to

    def _t_to(self, *a, **k):
        a, k = _cpu_args(a, k)
        return _tensor_to(self, *a, **k)

    def _m_to(self, *a, **k):
        a, k = _cpu_args(a, k)
        return _module_to(self, *a, **k)

    torch.Tensor.to = _t_to
    torch.nn.Module.to = _m_to

    class _Mesh:
        def __init__(self, v=None, f=None, vc=None):
            self.v, self.f, self.vc = v, f, vc

    # visualization / CUDA deps imported at module scope but unused on the
    # oracled paths
    _stub_module("psbody.mesh", Mesh=_Mesh, MeshViewer=object)
    _stub_module("psbody.mesh.sphere", Sphere=object)
    _stub_module("trimesh", Trimesh=object)
    _stub_module("skimage.measure")
    _stub_module("pytorch3d.loss", chamfer_distance=None)
    _stub_module("pytorch3d.structures", Pointclouds=None)
    _stub_module("mesh_intersection.bvh_search_tree", BVH=object)
    _stub_module("mesh_intersection.loss",
                 DistanceFieldPenetrationLoss=object)
    _stub_module("neural_renderer")
    _stub_module("detectron2.structures", BitMasks=None)
    _stub_module("detectron2.structures.boxes", BoxMode=None)
    _stub_module("torchvision.transforms",
                 RandomHorizontalFlip=lambda p=1.0: (lambda img: img))
    _install_fake_serialization(smplh_arrays)

    if REF not in sys.path:
        sys.path.insert(0, REF)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        from lib_smpl.wrapper_pytorch import (
            SMPLPyTorchWrapperBatch, SMPLPyTorchWrapperBatchSplitParams)
        from lib_smpl.th_hand_prior import mean_hand_pose
        from model.camera import KinectColorCamera
        from model.chore import CHORE
        from recon.generator import Generator
        from recon.recon_fit_behave import ReconFitterBehave
    finally:
        os.chdir(cwd)

    ns = {
        "CHORE": CHORE,
        "Generator": Generator,
        "ReconFitterBehave": ReconFitterBehave,
        "SMPLPyTorchWrapperBatch": SMPLPyTorchWrapperBatch,
        "SMPLSplit": SMPLPyTorchWrapperBatchSplitParams,
        "KinectColorCamera": KinectColorCamera,
        "mean_hand_pose": mean_hand_pose,
    }
    _SETUP_DONE["ns"] = ns
    return ns


def make_ref_fitter(ns, net_in_size=128, crop_size=1200, z0=2.2):
    """ReconFitterBehave without its heavyweight __init__ (which needs BVH /
    MeshViewer / BEHAVE data): only the attributes the optimize_smpl and
    'object only' paths read (recon_fit_base.py:74-76,89-90)."""
    import torch

    fitter = ns["ReconFitterBehave"].__new__(ns["ReconFitterBehave"])
    fitter.z_0 = z0
    fitter.camera = ns["KinectColorCamera"](crop_size)
    fitter.net_in_size = net_in_size
    fitter.debug = False
    fitter.device = "cpu"
    fitter.mv = None
    fitter.obj_scale = 1.0
    fitter.part_labels = torch.from_numpy(
        load_ref_part_labels()).to(fitter.device)
    return fitter


def load_ref_part_labels():
    """The reference's per-vertex SMPL part labels, densified exactly as
    ReconFitterBase.load_part_labels does (recon_fit_base.py:277-287)."""
    import pickle

    with open(f"{REF}/assets/smpl_parts_dense.pkl", "rb") as f:
        part_labels = pickle.load(f, encoding="latin1")
    labels = np.zeros((6890,), dtype="int32")
    for n, k in enumerate(part_labels):
        labels[part_labels[k]] = n
    return labels


class LossRecorder:
    """Shadows ``fitter.sum_dict`` (a staticmethod looked up via self) to
    record the weighted total loss of every executed inner step."""

    def __init__(self, fitter):
        self.orig = fitter.sum_dict
        self.trace = []
        fitter.sum_dict = self  # instance attribute wins over the class

    def __call__(self, loss_dict, weight_dict, it):
        loss = self.orig(loss_dict, weight_dict, it)
        self.trace.append(float(loss.detach()))
        return loss


class StopAtSil(Exception):
    """Raised by the fake SilLossROI to end optimize_smpl_object after the
    'object only' phase (the sil phase needs neural_renderer/CUDA)."""


class FakeSilLossROI:
    """Stands in for recon.obj_pose_roi.SilLossROI: constructible from the
    same arguments, raises on first use so the torch loop stops exactly at
    the object-only -> sil boundary."""

    def __init__(self, *a, **k):
        pass

    def to(self, device):
        return self

    def __call__(self, *a, **k):
        raise StopAtSil


def make_ref_smpl(ns, pose72, betas, trans):
    """SMPL-H init exactly as SMPLHGenerator.get_smplh does for 72-dim mocap
    poses (reference: lib_smpl/smpl_generator.py:85-99): body pose from
    mocap, hands from the GRAB mean, betas as given."""
    import torch

    pose72 = np.asarray(pose72, np.float32)
    B = pose72.shape[0]
    pose156 = np.zeros((B, 156), np.float32)
    pose156[:, :72] = pose72
    pose156[:, 66:] = np.asarray(
        ns["mean_hand_pose"](f"{REF}/assets"), np.float32)
    # COPIES, not from_numpy views: nn.Parameter wraps the same storage all
    # the way down (from_smpl passes .data through), so the torch optimizer
    # would otherwise mutate the caller's numpy arrays in place -- poisoning
    # the jax side of the oracle, which reads them afterwards
    smpl = ns["SMPLPyTorchWrapperBatch"](
        "unused_model_root", B,
        betas=torch.tensor(np.asarray(betas, np.float32)),
        pose=torch.tensor(pose156),
        trans=torch.tensor(np.asarray(trans, np.float32)),
        gender="male", num_betas=10, hands=True, device="cpu",
    ).to("cpu")
    return smpl
