"""Bisect the object-reconstruction pipeline on the synthetic e2e scene.

Round-1 e2e showed object chamfer ~6x the SMPL chamfer (20.7 cm vs 3.2 cm)
with the hypothesis "view-ray depth ambiguity of the under-trained field"
(BASELINE.md). This tool tests that hypothesis directly by measuring every
stage in isolation:

  field      mean |df_o| on the GT object surface, and the df_o profile
             along the camera ray through the GT center (where is the
             field's depth minimum vs the GT depth?)
  pcloud     centroid offset + chamfer of the generated object point cloud
  centers    predicted obj center (smpl_center_pred + rel offset) vs GT
  init       obj_t after init_obj_fit_data vs GT center
  fit        object chamfer after 'object only' phase alone, after the
             full schedule, and after the full schedule with a
             GT-center-corrected init (the depth-ambiguity control: if
             THIS collapses the error, the field init is the bottleneck;
             if not, the optimization drags it off)

Usage: python tools/diag_object.py [--epochs 40] [--frames 8]
Prints one JSON line with every stage's numbers.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from e2e_synthetic import build_scenes, train_field  # noqa: E402  (tools/)


def chamfer_np(a, b):
    """Bidirectional sqrt chamfer on host (small clouds)."""
    d = np.linalg.norm(a[:, None] - b[None], axis=-1)
    return d.min(1).mean() + d.min(0).mean()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--out", default="/tmp/diag_obj")
    ap.add_argument("--num-stack", type=int, default=2)
    ap.add_argument("--img-size", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from chore_tpu.data import BehaveTrainData
    from chore_tpu.recon.fitter import FitConfig, ReconFitter
    from chore_tpu.recon.generator import SamplerConfig
    from chore_tpu.utils.meshio import sample_surface

    rng = np.random.RandomState(0)
    paths, gt0, smplh = build_scenes(args.out, args.frames, rng)
    gt_obj_v, gt_obj_f = gt0["obj"]
    gt_center = gt_obj_v.mean(0)  # octasphere center (0.45, 0.1, 2.25)

    # the SAME training regime the e2e check uses (shared helper)
    model, params, cfg, losses = train_field(
        paths, args.out, args.epochs, num_stack=args.num_stack,
        img_size=args.img_size, verbose=False)
    print(f"trained {args.epochs} epochs, final loss {losses[-1]:.2f}",
          file=sys.stderr)

    item = BehaveTrainData([paths[0]], phase="val", total_samplenum=4000,
                           image_size=(args.img_size, args.img_size))[0]
    images = jnp.asarray(item["images"][None])
    crop_center = jnp.asarray(item["crop_center"][None])

    report = {}

    # ---- stage: raw field quality --------------------------------------
    feats, tmpx = model.apply(params, images, train=False, method="encode")

    def query(points):
        return model.apply(params, feats, tmpx, jnp.asarray(points),
                           crop_center, method="query")[-1]

    surf = sample_surface(gt_obj_v, gt_obj_f, 2000)[None].astype(np.float32)
    preds_surf = query(surf)
    report["field_df_o_on_gt_surface"] = float(
        jnp.abs(preds_surf["df"][..., 1]).mean())
    # view ray through the GT center: where is the df_o minimum in depth?
    ts = np.linspace(-0.4, 0.4, 161, dtype=np.float32)
    ray = (gt_center[None] / np.linalg.norm(gt_center))[None] * \
        (np.linalg.norm(gt_center) + ts)[None, :, None]
    df_ray = np.asarray(query(ray.astype(np.float32))["df"][0, :, 1])
    report["ray_depth_offset_m"] = float(ts[int(df_ray.argmin())])
    report["ray_df_min"] = float(df_ray.min())

    # predicted centers at the GT surface (what ocent consumes)
    smpl_c = np.asarray(preds_surf["centers"][0, :, :3].mean(0))
    rel = np.asarray(preds_surf["centers"][0, :, 3:].mean(0))
    report["pred_center_err_m"] = float(
        np.linalg.norm(smpl_c + rel - gt_center))

    # ---- stage: generated point cloud ----------------------------------
    fitter = ReconFitter(model, params, smplh,
                         gt_obj_v - gt_obj_v.mean(0), gt_obj_f,
                         cfg=FitConfig(net_in_size=args.img_size,
                                       sil_rend_size=128),
                         sampler_cfg=SamplerConfig(num_points=4000))
    pc = fitter.generator.generate_pclouds(images, crop_center,
                                           jax.random.PRNGKey(1))
    opts = np.asarray(pc["object"]["points"][0])
    report["pcloud_n_valid"] = int(np.asarray(pc["object"]["n_valid"])[0])
    report["pcloud_centroid_err_m"] = float(
        np.linalg.norm(opts.mean(0) - gt_center))
    gt_samp = sample_surface(gt_obj_v, gt_obj_f, 2000)
    report["pcloud_chamfer_m"] = float(chamfer_np(opts[:2000], gt_samp))

    # ---- stage: fits ----------------------------------------------------
    kpts = np.concatenate([np.full((1, 25, 2), args.img_size / 2, np.float32),
                           np.zeros((1, 25, 1), np.float32)], -1)

    def run_fit(fit_cfg, center_override=None):
        f = ReconFitter(model, params, smplh, gt_obj_v - gt_obj_v.mean(0),
                        gt_obj_f, cfg=fit_cfg,
                        sampler_cfg=SamplerConfig(num_points=4000))
        if center_override is not None:
            orig = f._jit_fit_object

            def patched(params_, feats_, tmpx_, cc_, sp_, rel_, pca_, ht_,
                        sc_, sil_, key_, use_sil):
                rel_gt = jnp.asarray(
                    (center_override[None] - np.asarray(ht_)).astype(
                        np.float32))
                return orig(params_, feats_, tmpx_, cc_, sp_, rel_gt, pca_,
                            ht_, sc_, sil_, key_, use_sil=use_sil)

            f._jit_fit_object = patched
        out = f.fit_batch(np.asarray(images), np.asarray(crop_center),
                          gt0["pose"], np.zeros((1, 10), np.float32), kpts,
                          use_silhouette=False)
        rec = np.asarray(f.transform_obj(out["obj_params"],
                                         points=f.template_verts))[0]
        return (float(chamfer_np(
                    sample_surface(rec, gt_obj_f, 2000), gt_samp)),
                float(np.linalg.norm(rec.mean(0) - gt_center)))

    base = FitConfig(net_in_size=args.img_size, sil_rend_size=128)
    # object-only phase (joint budget zeroed)
    import dataclasses

    cham, cerr = run_fit(dataclasses.replace(base, iter_joint=0,
                                             iter_joint_max=0))
    report["fit_objonly_chamfer_m"] = cham
    report["fit_objonly_center_err_m"] = cerr
    # full schedule
    cham, cerr = run_fit(base)
    report["fit_full_chamfer_m"] = cham
    report["fit_full_center_err_m"] = cerr
    # full schedule with GT-center-corrected init (depth-ambiguity control)
    cham, cerr = run_fit(base, center_override=gt_center)
    report["fit_gtinit_chamfer_m"] = cham
    report["fit_gtinit_center_err_m"] = cerr

    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in report.items()}))


if __name__ == "__main__":
    main()
