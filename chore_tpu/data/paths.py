"""Path configuration + dataset splits.

Equivalent of the reference's PATHS.yml + DataPaths (reference:
data/data_paths.py:10-75): machine paths come from a PATHS.yml (searched in
the repo root or $CHORE_TPU_PATHS), train/val splits from a pickle/npz file,
and test images are discovered per sequence with optional occlusion
filtering.
"""
from __future__ import annotations

import functools
import json
import os
import pickle
from glob import glob

import numpy as np

import yaml


@functools.lru_cache()
def load_paths(path=None):
    """Load PATHS.yml: keys BEHAVE_PATH, PROCESSED_PATH, RECON_PATH,
    SMPL_MODEL_ROOT, SMPL_ASSETS_ROOT (optional; vendored assets are the
    default)."""
    candidates = [
        path,
        os.environ.get("CHORE_TPU_PATHS"),
        os.path.join(os.getcwd(), "PATHS.yml"),
        os.path.join(os.path.dirname(__file__), "..", "..", "PATHS.yml"),
    ]
    for c in candidates:
        if c and os.path.isfile(c):
            with open(c) as f:
                return yaml.safe_load(f)
    return {}


class DataPaths:
    """Split loading + test-image discovery (reference:
    data/data_paths.py:24-75)."""

    @staticmethod
    def load_splits(split_file, processed_path=None):
        """-> (train_paths, val_paths) of preprocessed npz files."""
        if split_file.endswith(".pkl"):
            with open(split_file, "rb") as f:
                data = pickle.load(f)
        else:
            data = dict(np.load(split_file, allow_pickle=True))
        train, val = list(data["train"]), list(data["test"])
        root = processed_path or load_paths().get("PROCESSED_PATH")
        if root:
            train = [os.path.join(root, str(p)) for p in train]
            val = [os.path.join(root, str(p)) for p in val]
        return train, val

    @staticmethod
    def get_image_paths_seq(seq_folder, tid=1, check_occlusion=False,
                            occ_thres=0.3):
        """All k{tid}.color.jpg frames of a sequence, sorted; optionally
        filter frames whose object is >70% occluded (visible/full mask
        ratio < occ_thres) (reference: data_paths.py:38-75)."""
        files = sorted(glob(os.path.join(seq_folder, "*", f"k{tid}.color.jpg")))
        if not check_occlusion:
            return files
        import cv2

        keep = []
        for f in files:
            vis = f.replace(".color.jpg", ".obj_rend_mask.jpg")
            full = f.replace(".color.jpg", ".obj_rend_full.jpg")
            if not (os.path.isfile(vis) and os.path.isfile(full)):
                keep.append(f)
                continue
            mv = cv2.imread(vis, cv2.IMREAD_GRAYSCALE)
            mf = cv2.imread(full, cv2.IMREAD_GRAYSCALE)
            full_area = float((mf > 127).sum())
            if full_area == 0:
                continue
            if (mv > 127).sum() / full_area > occ_thres:
                keep.append(f)
        return keep


def load_mocap(json_file):
    """FrankMocap pose (72,) + betas (10,)
    (reference: recon_fit_base.py:143-152)."""
    with open(json_file) as f:
        params = json.load(f)
    return (np.asarray(params["pose"], np.float32),
            np.asarray(params["betas"], np.float32))


def load_kpts_json(json_file, tol=0.3):
    """Openpose body25 keypoints (25, 3); confidence < tol zeroed
    (reference: recon_fit_base.py:303-317)."""
    with open(json_file) as f:
        data = json.load(f)
    j2d = np.asarray(data["body_joints"], np.float32).reshape(-1, 3)
    j2d[:, 2] = np.where(j2d[:, 2] < tol, 0.0, j2d[:, 2])
    return j2d
