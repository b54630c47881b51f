"""End-to-end system validation on synthetic scenes: preprocess -> train ->
reconstruct -> evaluate, with known ground truth.

No BEHAVE data or SMPL model files are needed: scenes are a synthetic body
(chore_tpu.smpl.synthetic_smplh) plus a sphere object at a fixed offset,
ground truth comes from our own boundary sampler, and the evaluation is the
reference protocol (Procrustes-aligned bidirectional sqrt chamfer). This
exercises every stage of the pipeline INCLUDING learning: if the field
network cannot fit the synthetic UDFs or the reconstruction cannot recover
the meshes from the learned fields, the run fails loudly.

Usage:
  python tools/e2e_synthetic.py [--epochs 40] [--out /tmp/e2e_synth]

Prints one JSON line with the final train loss and chamfer errors.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_scenes(root, n_frames, rng, obj_radius=0.18, mask_res=256,
                 vary_object=False):
    """Synthetic frames: fixed body+object, tiny pose jitter; returns
    (npz paths, GT meshes of frame 0).

    Masks are REAL silhouettes rendered from the GT geometry with the
    Kinect camera (not placeholder rectangles): the network's two mask
    channels are its only evidence of where the object is, so geometric
    masks are what make the synthetic task informative (diagnosed in
    round 2 -- with rectangle masks the field learns no object location
    and the fit converges to a ~14 cm-off field minimum regardless of
    init; tools/diag_object.py)."""
    import cv2
    import jax.numpy as jnp

    from chore_tpu.preprocess.boundary_sampler import BoundarySampler
    from chore_tpu.smpl import SMPLH, synthetic_smplh
    from chore_tpu.smpl.model import init_params
    from chore_tpu.utils.meshio import octasphere
    from chore_tpu.utils.render import render_meshes

    smplh = SMPLH(synthetic_smplh())
    sampler = BoundarySampler(seed=0)
    proc = os.path.join(root, "processed")
    os.makedirs(proc, exist_ok=True)

    # resume guard: npz files are only reusable if they were generated
    # with the SAME scene parameters — otherwise training data and the
    # re-derived frame-0 GT silently diverge (e.g. a --vary-object run
    # on top of a fixed-object cache would score against mismatched GT).
    # Parameter change or missing manifest -> regenerate from scratch.
    import glob as _glob
    import json as _json

    manifest = {"obj_radius": obj_radius, "vary_object": bool(vary_object),
                "mask_res": mask_res}
    mpath = os.path.join(proc, "manifest.json")
    stale = _glob.glob(os.path.join(proc, "*.npz"))
    if stale:
        old = None
        if os.path.isfile(mpath):
            with open(mpath) as f:
                old = _json.load(f)
        if old != manifest:
            print(f"e2e_synthetic: scene parameters changed "
                  f"({old} -> {manifest}); regenerating {len(stale)} npz")
            for f in stale:
                os.remove(f)
    with open(mpath, "w") as f:
        _json.dump(manifest, f)

    paths, gt0 = [], None

    def sil_mask(verts, faces):
        """(1536, 2048) uint8 silhouette under the Kinect camera."""
        _, m = render_meshes([(verts, faces)], [(1.0, 1.0, 1.0)],
                             image_size=mask_res)
        m = cv2.resize(m.astype(np.float32), (2048, 1536),
                       interpolation=cv2.INTER_LINEAR)
        return ((m > 0.5) * 255).astype(np.uint8)

    for i in range(n_frames):
        frame_dir = os.path.join(root, "frames", f"t{i:04d}.000")
        os.makedirs(frame_dir, exist_ok=True)
        pose = (rng.randn(1, 72) * 0.05).astype(np.float32)
        sp = init_params(jnp.asarray(pose), jnp.zeros((1, 10)),
                         jnp.zeros((1, 3)))
        sv = np.asarray(smplh.verts(sp))[0]
        pelvis = np.asarray(smplh.pelvis(sp))[0]
        sv = sv + (np.array([0, 0, 2.2]) - pelvis)
        if vary_object:
            # per-frame object placement: the field must READ the mask
            # channels to localize it (generalization test), instead of
            # memorizing one fixed position
            oc = (rng.uniform(0.25, 0.6), rng.uniform(-0.1, 0.3),
                  rng.uniform(2.0, 2.4))
        else:
            oc = (0.45, 0.1, 2.25)
        ov, of = octasphere(radius=obj_radius, center=oc, subdiv=2)
        npz = os.path.join(proc, f"t{i:04d}_k1_scale.npz")
        if os.path.isfile(npz):
            # resume: scene generation (boundary sampling + mask renders)
            # dominates large --frames runs; geometry above is already
            # re-derived deterministically for gt0
            paths.append(npz)
            rgb_file = os.path.join(frame_dir, "k1.color.jpg")
            if gt0 is None:
                gt0 = {"smpl": (sv, smplh.faces), "obj": (ov, of),
                       "pose": pose, "rgb": rgb_file}
            continue
        out = sampler.boundary_sample_all(
            sv.astype(np.float32), smplh.faces, ov, of,
            sigmas=[0.08, 0.02, 0.003], ratios=[0.01, 0.49, 0.5],
            sample_num=6000, min_samples=200,
        )
        out["smpl_center"][2] = 2.2
        pm = sil_mask(sv.astype(np.float32), smplh.faces)
        om = sil_mask(ov, of)
        img = np.full((1536, 2048, 3), 60, np.uint8)
        img[pm > 127] = (90, 120, 160)
        img[om > 127] = (160, 120, 90)
        rgb_file = os.path.join(frame_dir, "k1.color.jpg")
        cv2.imwrite(rgb_file, img)
        cv2.imwrite(os.path.join(frame_dir, "k1.person_mask.jpg"), pm)
        cv2.imwrite(os.path.join(frame_dir, "k1.obj_rend_mask.jpg"), om)
        npz = os.path.join(proc, f"t{i:04d}_k1_scale.npz")
        np.savez(npz, image_file=rgb_file, **out)
        paths.append(npz)
        if gt0 is None:
            gt0 = {"smpl": (sv, smplh.faces), "obj": (ov, of),
                   "pose": pose, "rgb": rgb_file}
    return paths, gt0, smplh


def train_field(paths, out_dir, epochs, num_stack=2, img_size=256,
                verbose=True):
    """Build the CHORE field net and train it on preprocessed synthetic
    frames (shared by the e2e check and tools/diag_object.py so both
    measure the SAME training regime). Returns (model, params, cfg,
    losses) with params on the accelerator."""
    import jax
    import jax.numpy as jnp

    from chore_tpu.data import BehaveTrainData, DataLoader
    from chore_tpu.models import CHOREField, FieldConfig
    from chore_tpu.train.trainer import Trainer

    cfg = FieldConfig(num_stack=num_stack, num_hourglass=2,
                      net_img_size=img_size)
    model = CHOREField(cfg=cfg)
    with jax.default_device(jax.devices("cpu")[0]):
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)),
                            jnp.zeros((1, 8, 3)), jnp.zeros((1, 2)))
    params = jax.device_put(params, jax.devices()[0])

    if len(paths) < 2:
        raise SystemExit("need >= 2 frames")
    ds = BehaveTrainData(paths, phase="train", total_samplenum=4000,
                         image_size=(img_size, img_size))
    loader = DataLoader(ds, batch_size=min(4, len(paths)), shuffle=True,
                        num_workers=2, drop_last=False)
    # scale the LR milestones to the run length (the release [15, 25]
    # assumes ~3000 steps/epoch; here an epoch is 2 steps)
    trainer = Trainer(model, params, os.path.join(out_dir, "exp"),
                      base_lr=1e-3, ck_period_min=1e9,
                      milestones=(int(epochs * 0.75), int(epochs * 0.9)))
    losses = []
    for epoch in range(epochs):
        loader.set_epoch(epoch)
        trainer.set_epoch_lr(epoch)
        for batch in loader:
            batch.pop("path", None)
            loss, _ = trainer.train_step(batch)
            losses.append(float(loss))
        if verbose:
            print(f"epoch {epoch}: loss {losses[-1]:.3f}", flush=True)
        trainer.epoch += 1
    params = jax.device_put(jax.device_get(trainer.params),
                            jax.devices()[0])
    return model, params, cfg, losses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--out", default="/tmp/e2e_synth")
    ap.add_argument("--num-stack", type=int, default=2)
    ap.add_argument("--img-size", type=int, default=256)
    ap.add_argument("--obj-radius", type=float, default=0.18)
    ap.add_argument("--vary-object", action="store_true",
                    help="random object placement per frame")
    ap.add_argument("--holdout", action="store_true",
                    help="exclude frame 0 from training (generalization)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from chore_tpu.data import BehaveTrainData
    from chore_tpu.ops.chamfer import chamfer_eval
    from chore_tpu.ops.procrustes import apply_transform, similarity_transform
    from chore_tpu.recon import losses as L
    from chore_tpu.recon.fitter import FitConfig, ReconFitter
    from chore_tpu.recon.generator import SamplerConfig
    from chore_tpu.utils.meshio import sample_surface

    rng = np.random.RandomState(0)
    paths, gt0, smplh = build_scenes(args.out, args.frames, rng,
                                     args.obj_radius,
                                     vary_object=args.vary_object)
    train_paths = paths[1:] if args.holdout else paths
    model, params, cfg, losses = train_field(
        train_paths, args.out, args.epochs, num_stack=args.num_stack,
        img_size=args.img_size)

    # reconstruct frame 0 with the trained weights
    tv, tf = gt0["obj"]
    fitter = ReconFitter(
        model, params, smplh,
        tv - tv.mean(0), tf,
        weights=L.BEHAVE_WEIGHTS,
        cfg=FitConfig(net_in_size=args.img_size, sil_rend_size=128),
        sampler_cfg=SamplerConfig(num_points=4000),
    )
    item_ds = BehaveTrainData([paths[0]], phase="val",
                              total_samplenum=4000,
                              image_size=(args.img_size, args.img_size))
    item = item_ds[0]
    kpts = np.concatenate(
        [np.full((25, 2), args.img_size / 2, np.float32),
         np.zeros((25, 1), np.float32)], 1,
    )  # zero-confidence keypoints: rely on the fields + priors
    result = fitter.fit_batch(
        item["images"][None], item["crop_center"][None],
        gt0["pose"], np.zeros((1, 10), np.float32), kpts[None],
        use_silhouette=False,
    )
    rec_smpl = np.asarray(smplh.verts(result["smpl_params"]))[0]
    rec_obj = np.asarray(
        fitter.transform_obj(result["obj_params"],
                             points=fitter.template_verts))[0]

    # reference evaluation protocol
    gt_smpl, gt_smpl_f = gt0["smpl"]
    gt_obj, gt_obj_f = gt0["obj"]
    r, t, s = similarity_transform(
        jnp.asarray(np.concatenate([rec_smpl, rec_obj])),
        jnp.asarray(np.concatenate([gt_smpl, gt_obj])),
    )
    rec_smpl_a = np.asarray(apply_transform(jnp.asarray(rec_smpl), r, t, s))
    rec_obj_a = np.asarray(apply_transform(jnp.asarray(rec_obj), r, t, s))
    err_smpl = float(chamfer_eval(
        jnp.asarray(sample_surface(gt_smpl, gt_smpl_f, 5000)),
        jnp.asarray(sample_surface(rec_smpl_a, gt_smpl_f, 5000)),
    ))
    err_obj = float(chamfer_eval(
        jnp.asarray(sample_surface(gt_obj, gt_obj_f, 5000)),
        jnp.asarray(sample_surface(rec_obj_a, tf, 5000)),
    ))
    # dump reconstructions for inspection
    from chore_tpu.utils.meshio import save_ply

    dump = os.path.join(args.out, "recon")
    os.makedirs(dump, exist_ok=True)
    save_ply(os.path.join(dump, "rec_smpl.ply"), rec_smpl, gt_smpl_f)
    save_ply(os.path.join(dump, "rec_obj.ply"), rec_obj, tf)
    save_ply(os.path.join(dump, "gt_smpl.ply"), gt_smpl, gt_smpl_f)
    save_ply(os.path.join(dump, "gt_obj.ply"), gt_obj, gt_obj_f)
    pc = result["pclouds"]
    save_ply(os.path.join(dump, "pc_human.ply"),
             np.asarray(pc["human"]["points"][0]))
    save_ply(os.path.join(dump, "pc_object.ply"),
             np.asarray(pc["object"]["points"][0]))

    print(json.dumps({
        "final_train_loss": losses[-1],
        "chamfer_smpl_m": round(err_smpl, 4),
        "chamfer_obj_m": round(err_obj, 4),
        "n_valid_human": int(np.asarray(pc["human"]["n_valid"])[0]),
        "n_valid_object": int(np.asarray(pc["object"]["n_valid"])[0]),
        "epochs": args.epochs,
    }))


if __name__ == "__main__":
    main()
