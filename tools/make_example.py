"""Generate a synthetic demo example folder (no external data).

The reference bundles ``example/000000117377/`` (photo + masks + openpose
json + FrankMocap outputs) so its demo runs out of the box
(reference: demo.py:59-84, README.md example section). This repo cannot
ship photographs, so this tool synthesizes an equivalent folder from the
synthetic body model + a sphere object: rendered color image, silhouette
masks, projected body25 keypoints, mocap mesh + params -- everything
``python -m chore_tpu.cli.demo`` needs.

Usage:
  python tools/make_example.py [--out example_synth] [--frames 1]
  python -m chore_tpu.cli.demo chore-release -s example_synth -on basketball
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_example(out_dir, n_frames=1, seed=0):
    import cv2

    from chore_tpu.data.test_data import TestImagePrep
    from chore_tpu.smpl import SMPLH, synthetic_smplh
    from chore_tpu.smpl.assets import load_landmark_regressors
    from chore_tpu.smpl.model import init_params
    from chore_tpu.utils.meshio import octasphere, save_ply
    from chore_tpu.utils.render import render_meshes

    rng = np.random.RandomState(seed)
    smplh = SMPLH(synthetic_smplh())
    prep = TestImagePrep()  # only for persp_proj / camera constants
    reg = load_landmark_regressors(None)["body25"]

    frames = []
    for i in range(n_frames):
        frame = os.path.join(out_dir, f"frame{i:04d}")
        os.makedirs(frame, exist_ok=True)
        pose = (rng.randn(1, 72) * 0.1).astype(np.float32)
        sp = init_params(pose, np.zeros((1, 10)), np.zeros((1, 3)))
        sv = np.asarray(smplh.verts(sp))[0]
        pelvis = np.asarray(smplh.pelvis(sp))[0]
        sv = sv + (np.array([0, 0.0, 2.3]) - pelvis)
        ov, of = octasphere(radius=0.16,
                            center=(0.42, 0.15, 2.35), subdiv=3)

        # rendered scene + silhouettes under the Kinect camera
        img_sq, _ = render_meshes(
            [(sv, smplh.faces), (ov, of)],
            [(0.55, 0.45, 0.4), (0.75, 0.35, 0.2)], image_size=512,
            background=np.full((512, 512, 3), 0.22, np.float32))
        img = cv2.resize(img_sq, (2048, 1536))
        cv2.imwrite(os.path.join(frame, "k1.color.jpg"),
                    (np.clip(img[..., ::-1], 0, 1) * 255).astype(np.uint8))

        def sil(verts, faces):
            _, m = render_meshes([(verts, faces)], [(1, 1, 1)],
                                 image_size=512)
            m = cv2.resize(m.astype(np.float32), (2048, 1536))
            return ((m > 0.5) * 255).astype(np.uint8)

        cv2.imwrite(os.path.join(frame, "k1.person_mask.jpg"),
                    sil(sv, smplh.faces))
        cv2.imwrite(os.path.join(frame, "k1.obj_rend_mask.jpg"), sil(ov, of))

        # openpose-style keypoints = projected body25 joints
        j2d = prep.persp_proj(reg @ sv)
        j2d[:, 2] = 1.0
        with open(os.path.join(frame, "k1.color.json"), "w") as f:
            json.dump({"body_joints": j2d.reshape(-1).tolist()}, f)

        # FrankMocap-style outputs
        save_ply(os.path.join(frame, "k1.mocap.ply"), sv, smplh.faces)
        with open(os.path.join(frame, "k1.mocap.json"), "w") as f:
            json.dump({"pose": pose[0].tolist(),
                       "betas": np.zeros(10).tolist()}, f)
        frames.append(frame)
    return frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="example_synth")
    ap.add_argument("--frames", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    frames = make_example(args.out, args.frames, args.seed)
    print(f"wrote {len(frames)} frame(s) under {args.out}; run e.g.\n"
          f"  python -m chore_tpu.cli.demo chore-release -s {args.out} "
          f"-on basketball")


if __name__ == "__main__":
    main()
