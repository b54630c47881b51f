"""Real-data front-end parity: run the ACTUAL reference torch TestData
(reference: data/test_data.py:19-228) on the bundled real example
(/root/reference/example/000000117377/) and assert TestImagePrep produces
the same crop center, resize scale, crop scale, composed image tensor and
rescaled keypoints to tight numeric tolerance.

This closes the last offline parity hole before BEHAVE Chamfer: together
with tests/test_torch_parity.py (network forward + loss parity), it makes
the entire image -> network front-end reference-exact on real data.
"""
import os
import shutil
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
EXAMPLE_DIR = os.path.join(REF, "example", "000000117377")
EXAMPLE_RGB = os.path.join(EXAMPLE_DIR, "k1.color.jpg")

pytestmark = pytest.mark.skipif(
    not os.path.isfile(EXAMPLE_RGB),
    reason="bundled reference example not available",
)


def _stub_module(name, **attrs):
    """Empty stand-in for a dependency the reference imports at module scope
    (same technique as tests/test_torch_parity.py)."""
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


class _Mesh:
    """psbody.mesh.Mesh stand-in backed by our PLY loader (the reference
    only touches .v / .load_from_file in this path)."""

    def __init__(self, v=None, f=None):
        self.v, self.f = v, f

    def load_from_file(self, path):
        from chore_tpu.utils.meshio import load_ply

        self.v, self.f = load_ply(path)


@pytest.fixture(scope="module")
def ref_item(tmp_path_factory):
    """The reference TestData item computed on a writable copy of the
    bundled example (it persists crop_info.pkl next to the rgb)."""
    tmp = tmp_path_factory.mktemp("prep_parity")
    ex = tmp / "000000117377"
    shutil.copytree(EXAMPLE_DIR, ex)
    rgb = str(ex / "k1.color.jpg")

    # the reference reads PATHS.yml from cwd at import time
    (tmp / "PATHS.yml").write_text(
        f"CODE: {REF}\nSMPL_ASSETS_ROOT: {REF}/assets\n"
    )
    _stub_module("psbody.mesh", Mesh=_Mesh)
    _stub_module("skimage.measure")  # model.camera pulls in mesh_util
    _stub_module("torchvision.transforms",
                 RandomHorizontalFlip=lambda p=1.0: (lambda img: img))
    if REF not in sys.path:
        sys.path.insert(0, REF)
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        import data.test_data as ref_td

        # full-suite robustness: the trajectory/generator oracles install
        # their OWN psbody.mesh stub (without load_from_file) and import
        # data.test_data first; `from psbody.mesh import Mesh` then binds
        # their class into the cached module. Rebind ours explicitly so
        # this fixture works regardless of which test file ran first.
        ref_td.Mesh = _Mesh
        td = ref_td.TestData([rgb], batch_size=1, num_workers=0,
                             image_size=(512, 512), use_mean_center=False)
        item = td.get_item(0)
    finally:
        os.chdir(cwd)
    return item, rgb


@pytest.fixture(scope="module")
def our_item(ref_item, tmp_path_factory):
    from chore_tpu.data import TestImagePrep

    _, rgb = ref_item
    prep = TestImagePrep(image_size=(512, 512), use_mean_center=False,
                         crop_info_dir=str(tmp_path_factory.mktemp("ci")))
    return prep.prepare(rgb)


class TestPrepParity:
    def test_crop_center(self, ref_item, our_item):
        ref, _ = ref_item
        np.testing.assert_array_equal(
            np.asarray(ref["crop_center"], np.float64),
            np.asarray(our_item["crop_center"], np.float64))
        np.testing.assert_array_equal(
            np.asarray(ref["old_crop_center"], np.float64),
            np.asarray(our_item["old_crop_center"], np.float64))

    def test_resize_scale(self, ref_item, our_item):
        ref, _ = ref_item
        # ours is returned as f32; compare at f32 resolution
        assert float(ref["resize_scale"]) == pytest.approx(
            float(our_item["resize_scale"]), rel=1e-6)

    def test_crop_scale(self, ref_item, our_item):
        """The depth-normalization scale (mocap landmarks projected through
        the Kinect camera, ref test_data.py:174-210). Our regressor is the
        densified f32 copy of the reference's f64 sparse matrix."""
        ref, _ = ref_item
        assert float(ref["crop_scale"]) == pytest.approx(
            float(our_item["crop_scale"]), rel=1e-4)

    def test_images(self, ref_item, our_item):
        """Composed 5-channel net input: same crop, same resize, same
        background removal, bit-tight. Reference is CHW, ours HWC."""
        ref, _ = ref_item
        ref_img = np.asarray(ref["images"]).transpose(1, 2, 0)
        ours = np.asarray(our_item["images"])
        assert ref_img.shape == ours.shape == (512, 512, 5)
        diff = np.abs(ref_img - ours)
        assert diff.max() < 1e-5, (
            f"image mismatch: max {diff.max()}, mean {diff.mean()}"
        )

    def test_kpts(self, ref_item, our_item):
        """Keypoint rescale into net-input pixels matches the reference
        recipe (recon_fit_base.py:319-331) evaluated with the reference's
        own crop quantities."""
        import json

        ref, rgb = ref_item
        kpts = np.array(
            json.load(open(rgb.replace(".color.jpg", ".color.json")))
            ["body_joints"], np.float64).reshape(-1, 3)
        pxy = kpts[:, :2] * float(ref["resize_scale"])
        crop_size_org = float(ref["crop_scale"]) * 1200.0
        pxy = pxy - np.asarray(ref["old_crop_center"], np.float64) \
            + crop_size_org / 2.0
        pxy = pxy * 512.0 / crop_size_org
        got = np.asarray(our_item["kpts"], np.float64)
        np.testing.assert_allclose(got[:, :2], pxy, atol=1e-2)
        np.testing.assert_allclose(got[:, 2], kpts[:, 2], atol=1e-6)


@pytest.fixture(scope="module")
def ref_item_mc(ref_item, tmp_path_factory):
    """Reference TestData with use_mean_center=True (the in-the-wild /
    coco path: pad image so the crop center lands on the BEHAVE training
    mean, ref test_data.py:127-161)."""
    _, rgb = ref_item
    from data.test_data import TestData

    tmp = tmp_path_factory.mktemp("prep_parity_mc")
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        (tmp / "PATHS.yml").write_text(
            f"CODE: {REF}\nSMPL_ASSETS_ROOT: {REF}/assets\n")
        td = TestData([rgb], batch_size=1, num_workers=0,
                      image_size=(512, 512), use_mean_center=True)
        item = td.get_item(0)
    finally:
        os.chdir(cwd)
    return item, rgb


class TestPrepParityMeanCenter:
    def test_mean_center_path(self, ref_item_mc, tmp_path_factory):
        from chore_tpu.data import TestImagePrep

        ref, rgb = ref_item_mc
        prep = TestImagePrep(
            image_size=(512, 512), use_mean_center=True,
            crop_info_dir=str(tmp_path_factory.mktemp("ci_mc")))
        ours = prep.prepare(rgb)
        np.testing.assert_array_equal(
            np.asarray(ref["crop_center"], np.float64),
            np.asarray(ours["crop_center"], np.float64))  # mean center
        np.testing.assert_array_equal(
            np.asarray(ref["old_crop_center"], np.float64),
            np.asarray(ours["old_crop_center"], np.float64))
        ref_img = np.asarray(ref["images"]).transpose(1, 2, 0)
        diff = np.abs(ref_img - np.asarray(ours["images"]))
        assert diff.max() < 1e-5, (
            f"mean-center image mismatch: max {diff.max()}")
