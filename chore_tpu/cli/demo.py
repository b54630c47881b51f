"""Single-image demo: reconstruct human + object and render overlays.

Equivalent of the reference demo.py (reference: demo.py:19-84): the
in-the-wild (coco) fitting variant on one image directory, followed by
front/side overlay rendering.

Usage:
  python -m chore_tpu.cli.demo <exp_name> -s <image_dir> -on basketball \
      [-o out_dir] [--max-frames N]
"""
from __future__ import annotations

import os
import time
from argparse import ArgumentParser
from glob import glob

import numpy as np

from chore_tpu.cli.common import (
    load_object_template,
    load_smplh,
    load_trained,
)
from chore_tpu.config import ChoreConfig, load_config
from chore_tpu.data import TestImagePrep, collate
from chore_tpu.recon import losses as L
from chore_tpu.recon.fitter import FitConfig, ReconFitter
from chore_tpu.recon.generator import SamplerConfig

from chore_tpu.utils.meshio import save_ply
from chore_tpu.utils.render import align_to_input, look_at_side, render_meshes


def extract_field_meshes(fitter, images, crop_center, res=128, level=0.01,
                         bounds=((-1.2, -1.2, 1.7), (1.2, 1.2, 2.7))):
    """Marching-cubes the neural UDF level sets into meshes (the
    reference's PIFu gen_mesh capability, model/net_util.py:50-114 +
    mesh_util.py:8-52, which CHORE keeps as legacy; here exposed per
    head). Returns {'human': (verts, faces), 'object': (verts, faces)}.
    UDFs are unsigned, so the level-set mesh is a thin shell around the
    surface at distance ``level``."""
    import jax.numpy as jnp

    from chore_tpu.utils.marching import reconstruction

    feats, tmpx = fitter.generator.encode(jnp.asarray(images))
    cc = jnp.asarray(np.asarray(crop_center, np.float32))

    out = {}
    for name, idx in (("human", 0), ("object", 1)):
        def eval_fn(pts, idx=idx):
            preds = fitter.model.apply(
                fitter.params, feats, tmpx, jnp.asarray(pts[None]), cc,
                method="query")
            return np.asarray(preds[-1]["df"][0, :, idx])

        bmin = np.asarray(bounds[0], np.float32)
        bmax = np.asarray(bounds[1], np.float32)
        out[name] = reconstruction(eval_fn, res, bmin, bmax, level=level)
    return out


def run_demo(cfg: ChoreConfig, seq_folder, obj_name, outpath="demo_out",
             save_name="demo", max_frames=None, use_silhouette=True,
             fit_cfg: FitConfig = None, sampler_cfg: SamplerConfig = None,
             render_size=512, textured_obj=None, field_mesh_res=0,
             exp_root="experiments"):
    """textured_obj: optional path to a textured OBJ used as the object
    template; its texture shows up in the overlay renders (the reference's
    neural_renderer load_obj/texture path, load_obj.py:98-164)."""
    model, params = load_trained(cfg, exp_root=exp_root)
    smplh = load_smplh()
    tex_data = None
    if textured_obj:
        from chore_tpu.utils.textures import load_obj_textured

        m = load_obj_textured(textured_obj)
        tv, tf = m["verts"], m["faces"]
        if m["texture"] is not None:
            tex_data = (m["uv_faces"], m["texture"])
    else:
        tv, tf = load_object_template(obj_name)
    fitter = ReconFitter(
        model, params, smplh, tv, tf, weights=L.COCO_WEIGHTS,
        cfg=fit_cfg or cfg.fit_config(),
        sampler_cfg=sampler_cfg or cfg.sampler_config(),
    )
    prep = TestImagePrep(
        image_size=tuple(cfg.net_img_size), crop_size=cfg.loadSize,
        use_mean_center=True, crop_info_dir=outpath,
    )
    os.makedirs(outpath, exist_ok=True)
    images = sorted(glob(os.path.join(seq_folder, "k1.color.jpg"))
                    + glob(os.path.join(seq_folder, "*", "k1.color.jpg")))
    if max_frames:
        images = images[:max_frames]
    print(f"{len(images)} images to process")

    for rgb_file in images:
        t0 = time.time()
        item = prep.prepare(rgb_file)
        batch = collate([item])
        result = fitter.fit_batch(
            batch["images"], batch["crop_center"], batch["mocap_pose"],
            batch["mocap_betas"], batch["kpts"],
            use_silhouette=use_silhouette,
        )
        smpl_verts = np.asarray(smplh.verts(result["smpl_params"]))
        obj_verts = np.asarray(
            fitter.transform_obj(result["obj_params"],
                                 points=fitter.template_verts)
        )
        # frame dirs in BEHAVE layouts all contain "k1.color.jpg"; key the
        # output on the parent folder in that case to avoid collisions
        name = os.path.splitext(os.path.basename(rgb_file))[0]
        parent = os.path.basename(os.path.dirname(rgb_file))
        if parent and os.path.abspath(os.path.dirname(rgb_file)) != \
                os.path.abspath(seq_folder):
            name = parent
        frame_out = os.path.join(outpath, name, save_name)
        os.makedirs(frame_out, exist_ok=True)
        save_ply(os.path.join(frame_out, "smpl.ply"), smpl_verts[0],
                 smplh.faces)
        save_ply(os.path.join(frame_out, "object.ply"), obj_verts[0], tf)
        # point clouds from the neural fields
        pc = result["pclouds"]
        save_ply(os.path.join(frame_out, "human_pc.ply"),
                 np.asarray(pc["human"]["points"][0]))
        save_ply(os.path.join(frame_out, "object_pc.ply"),
                 np.asarray(pc["object"]["points"][0]))
        if field_mesh_res:
            meshes_f = extract_field_meshes(
                fitter, batch["images"], batch["crop_center"],
                res=field_mesh_res)
            for head, (fv, ff) in meshes_f.items():
                save_ply(os.path.join(frame_out, f"{head}_field.ply"),
                         fv, ff)

        # overlay rendering (reference demo.py:28-53)
        meshes = [(smpl_verts[0], smplh.faces), (obj_verts[0], tf)]
        colors = [(0.2, 0.7, 0.3), (0.8, 0.3, 0.2)]
        front, mask = render_meshes(meshes, colors, image_size=render_size,
                                    textures=[None, tex_data])
        import cv2

        orig = cv2.imread(rgb_file)
        overlay = align_to_input(front[..., ::-1], mask, orig,
                                 item["crop_info"], use_mean_center=True,
                                 alpha=0.85)
        cv2.imwrite(os.path.join(frame_out, "overlay.jpg"), overlay)
        side_meshes = []
        allv = np.concatenate([smpl_verts[0], obj_verts[0]], 0)
        center = allv.mean(0)
        for v, f in meshes:
            side_meshes.append((look_at_side(v, 90.0, center), f))
        side, _ = render_meshes(side_meshes, colors, image_size=render_size,
                                textures=[None, tex_data])
        cv2.imwrite(os.path.join(frame_out, "side.jpg"),
                    (side[..., ::-1] * 255).astype(np.uint8))
        print(f"{rgb_file}: done in {time.time() - t0:.1f}s -> {frame_out}")
    print("fit phase timing:", fitter.timer.summary())


def main():
    parser = ArgumentParser()
    parser.add_argument("exp_name", nargs="?", default="chore-release")
    parser.add_argument("-s", "--seq_folder", required=True)
    parser.add_argument("-on", "--obj_name", default="basketball")
    parser.add_argument("-o", "--outpath", default="demo_out")
    parser.add_argument("-sn", "--save_name", default="demo")
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("--no-sil", action="store_true")
    parser.add_argument("--textured-obj", default=None,
                        help="textured OBJ template; texture shows in the "
                        "overlay renders")
    parser.add_argument("--field-mesh-res", type=int, default=0,
                        help="also marching-cube the UDF level sets into "
                        "{human,object}_field.ply at this grid resolution")
    parser.add_argument("--exp-root", default="experiments",
                        help="checkpoint search root")
    args = parser.parse_args()
    try:
        cfg = load_config(args.exp_name)
    except FileNotFoundError:
        cfg = ChoreConfig(exp_name=args.exp_name)
    run_demo(cfg, args.seq_folder, args.obj_name, args.outpath,
             args.save_name, args.max_frames,
             use_silhouette=not args.no_sil,
             textured_obj=args.textured_obj,
             field_mesh_res=args.field_mesh_res,
             exp_root=args.exp_root)


if __name__ == "__main__":
    main()
