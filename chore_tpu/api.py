"""One-call reconstruction API.

The reference's entry points are CLI scripts wired to BEHAVE/COCO disk
layouts (reference: demo.py:19-84, recon/recon_fit_behave.py:368-411);
there is no library-level "reconstruct this image" call. This facade wraps
model loading, per-image preparation, fitting and rendering into one
object so the framework is usable as a library:

    from chore_tpu.api import Reconstructor
    rec = Reconstructor("chore-release", obj_name="basketball")
    out = rec.reconstruct("photo/k1.color.jpg")   # needs masks+mocap+kpts
    rec.save(out, "result_dir")                   # plys + overlay

All heavy stages compile once on first use and are reused across images of
the same shape (the fitter's compile-once contract, recon/fitter.py).
"""
from __future__ import annotations

import os

import numpy as np

import jax

from chore_tpu.cli.common import (
    load_object_template,
    load_smplh,
    load_trained,
)
from chore_tpu.config import ChoreConfig, load_config
from chore_tpu.data import TestImagePrep, collate
from chore_tpu.recon import losses as L
from chore_tpu.recon.fitter import ReconFitter


class Reconstructor:
    """Joint human+object reconstruction from single images.

    Args:
      exp_name_or_cfg: experiment name (loads configs/{name}.json when
        present) or a ChoreConfig.
      obj_name: BEHAVE object category (template lookup; sphere stand-in
        when templates are unavailable).
      coco: in-the-wild mode (mean-center restaging + COCO weights).
      exp_root: checkpoint search root.
      fit_cfg / sampler_cfg: schedule overrides (default: release).
      mesh: optional jax.sharding.Mesh for data-parallel multi-frame
        fitting.
    """

    def __init__(self, exp_name_or_cfg="chore-release", obj_name="basketball",
                 coco=False, exp_root="experiments", fit_cfg=None,
                 sampler_cfg=None, gender="male", mesh=None,
                 crop_info_dir=None):
        if isinstance(exp_name_or_cfg, ChoreConfig):
            cfg = exp_name_or_cfg
        else:
            try:
                cfg = load_config(exp_name_or_cfg)
            except FileNotFoundError:
                cfg = ChoreConfig(exp_name=exp_name_or_cfg)
        self.cfg = cfg
        self.coco = coco
        if (fit_cfg is not None
                and fit_cfg.net_in_size != cfg.net_img_size[0]):
            raise ValueError(
                f"fit_cfg.net_in_size={fit_cfg.net_in_size} must match "
                f"cfg.net_img_size={cfg.net_img_size[0]}: the image prep "
                "scales keypoints into net-input pixels with one and the "
                "keypoint loss rescales with the other")
        self.model, self.params = load_trained(cfg, exp_root=exp_root)
        self.smplh = load_smplh(gender)
        self.template_verts, self.template_faces = \
            load_object_template(obj_name)
        self.fitter = ReconFitter(
            self.model, self.params, self.smplh,
            self.template_verts, self.template_faces,
            weights=L.COCO_WEIGHTS if coco else L.BEHAVE_WEIGHTS,
            cfg=fit_cfg if fit_cfg is not None else cfg.fit_config(),
            sampler_cfg=(sampler_cfg if sampler_cfg is not None
                         else cfg.sampler_config()),
            mesh=mesh,
        )
        self.prep = TestImagePrep(
            image_size=tuple(cfg.net_img_size), crop_size=cfg.loadSize,
            use_mean_center=coco, crop_info_dir=crop_info_dir,
        )

    # ------------------------------------------------------------------ #
    def reconstruct(self, rgb_files, use_silhouette=True, key=None,
                    monitor=None):
        """Fit one image or a list of images (batched in one compiled run).

        Each ``rgb_file`` needs the reference's sidecar files next to it
        (person/object masks, openpose ``.color.json``, FrankMocap
        ``.mocap.{ply,json}`` -- data/test_data.py documents the naming).

        Returns a dict (lists aligned with the input): smpl_verts (B,V,3),
        smpl_faces, obj_verts (B,Vt,3), obj_faces, smpl_params, obj_params,
        pclouds, crop_info.
        """
        single = isinstance(rgb_files, (str, os.PathLike))
        files = [rgb_files] if single else list(rgb_files)
        items = [self.prep.prepare(str(f)) for f in files]
        batch = collate(items)
        n_real = len(files)
        if self.fitter.mesh is not None:
            # pad to the device count by repeating the last frame (the
            # sharded stage jits need a divisible batch; extras are
            # dropped below) -- same policy as cli/recon.py
            n_dev = int(self.fitter.mesh.devices.size)
            pad = (-n_real) % n_dev
            if pad:
                batch = {k: np.concatenate([v] + [v[-1:]] * pad, axis=0)
                         for k, v in batch.items()}
        result = self.fitter.fit_batch(
            batch["images"], batch["crop_center"], batch["mocap_pose"],
            batch["mocap_betas"], batch["kpts"],
            use_silhouette=use_silhouette, key=key, monitor=monitor,
        )
        smpl_verts = np.asarray(
            self.smplh.verts(result["smpl_params"]))[:n_real]
        obj_verts = np.asarray(self.fitter.transform_obj(
            result["obj_params"], points=self.fitter.template_verts))[:n_real]
        result = {
            k: (jax.tree_util.tree_map(lambda x: np.asarray(x)[:n_real], v)
                if k in ("smpl_params", "obj_params", "obj_R", "pclouds")
                else v)
            for k, v in result.items()
        }
        return {
            "smpl_verts": smpl_verts,
            "smpl_faces": np.asarray(self.smplh.faces),
            "obj_verts": obj_verts,
            "obj_faces": self.template_faces,
            "smpl_params": result["smpl_params"],
            "obj_params": result["obj_params"],
            "obj_R": np.asarray(result["obj_R"]),
            "pclouds": result["pclouds"],
            "crop_info": [it["crop_info"] for it in items],
            "paths": files,
        }

    # ------------------------------------------------------------------ #
    def save(self, out, result_dir, overlay=True, render_size=512):
        """Write smpl/object plys (+ overlay renders when the source
        images are readable) for every frame of a reconstruct() result."""
        from chore_tpu.utils.meshio import save_ply
        from chore_tpu.utils.render import align_to_input, render_meshes

        os.makedirs(result_dir, exist_ok=True)
        B = out["smpl_verts"].shape[0]
        written = []
        for i in range(B):
            stem = os.path.join(result_dir, f"frame{i:04d}")
            os.makedirs(stem, exist_ok=True)
            save_ply(os.path.join(stem, "smpl.ply"), out["smpl_verts"][i],
                     out["smpl_faces"])
            save_ply(os.path.join(stem, "object.ply"), out["obj_verts"][i],
                     out["obj_faces"])
            if overlay:
                import cv2

                orig = cv2.imread(str(out["paths"][i]))
                if orig is not None:
                    meshes = [(out["smpl_verts"][i], out["smpl_faces"]),
                              (out["obj_verts"][i], out["obj_faces"])]
                    colors = [(0.2, 0.7, 0.3), (0.8, 0.3, 0.2)]
                    front, mask = render_meshes(meshes, colors,
                                                image_size=render_size)
                    ov = align_to_input(front[..., ::-1], mask, orig,
                                        out["crop_info"][i],
                                        use_mean_center=self.coco,
                                        alpha=0.85)
                    cv2.imwrite(os.path.join(stem, "overlay.jpg"), ov)
            written.append(stem)
        return written
