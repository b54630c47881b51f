"""One-time conversion of CHORE data assets (landmark regressors, SMPL part
labels, GRAB/body pose priors) from pickle to npz under chore_tpu/assets/.

Usage: python tools/convert_reference_assets.py /path/to/CHORE/assets

These are small public data files shipped with the reference repo (derived
from openpose/SMPL/GRAB); only the storage format is changed (pickle+scipy
-> plain npz) so the framework has no pickle/scipy-sparse loading on the
hot path.
"""
import os
import pickle
import sys

import numpy as np


def convert(ref, out):
    os.makedirs(out, exist_ok=True)

    regs = {}
    for name in ["body25", "face", "hand"]:
        m = pickle.load(
            open(f"{ref}/{name}_regressor.pkl", "rb"), encoding="latin1"
        ).T.tocoo()
        regs[f"{name}_rows"] = m.row.astype(np.int32)
        regs[f"{name}_cols"] = m.col.astype(np.int32)
        regs[f"{name}_vals"] = m.data.astype(np.float32)
        regs[f"{name}_shape"] = np.array(m.shape, np.int32)
    np.savez_compressed(f"{out}/landmark_regressors.npz", **regs)

    parts = pickle.load(
        open(f"{ref}/smpl_parts_dense.pkl", "rb"), encoding="latin1"
    )
    labels = np.zeros(6890, np.int32)
    names = []
    for n, k in enumerate(parts):
        labels[parts[k]] = n
        names.append(k)
    np.savez_compressed(
        f"{out}/smpl_parts_dense.npz", labels=labels, names=np.array(names)
    )

    body = pickle.load(
        open(f"{ref}/priors/body_prior.pkl", "rb"), encoding="latin1"
    )
    lh = pickle.load(open(f"{ref}/priors/lh_prior.pkl", "rb"), encoding="latin1")
    rh = pickle.load(open(f"{ref}/priors/rh_prior.pkl", "rb"), encoding="latin1")
    np.savez_compressed(
        f"{out}/priors.npz",
        body_mean=np.asarray(body["mean"], np.float32),
        body_precision=np.asarray(body["precision"], np.float32),
        lh_mean=np.asarray(lh["mean"], np.float32),
        lh_precision=np.asarray(lh["precision"], np.float32),
        rh_mean=np.asarray(rh["mean"], np.float32),
        rh_precision=np.asarray(rh["precision"], np.float32),
    )


if __name__ == "__main__":
    ref = sys.argv[1]
    out = os.path.join(os.path.dirname(__file__), "..", "chore_tpu", "assets")
    convert(ref, out)
    print("assets written to", out)
