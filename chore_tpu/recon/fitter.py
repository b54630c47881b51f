"""Multi-phase joint SMPL + object fitting against the neural fields.

TPU-native rewrite of the reference's ReconFitterBase/ReconFitterBehave
(reference: recon/recon_fit_base.py:48-845, recon/recon_fit_behave.py:28-358).
The phase schedule is preserved exactly; each phase runs as one jitted
on-device while_loop (see optimize.py) instead of ~1800 host-driven torch
Adam steps:

  SMPL:   'global' (top betas + trans, lr .02)
          -> 'smpl all pose' (all pose + betas + trans, lr .006)
          -> 'kpts' (+2D keypoints, early stop, decay it/3)
  object: 'object only' x20 (R, t, s; lr .006)
          -> 'sil' x50 (R, t, s; silhouette + trans/scale regs; lr .006)
          -> 'joint' x<=100 (t, s only; +contact +collision; lr .002,
             early stop, decay (it+1)/5 continuing the global schedule)
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from chore_tpu.ops.camera import PerspectiveCamera, Z0
from chore_tpu.ops.rotation import init_object_orientation, project_so3, project_so3_jittered
from chore_tpu.recon import losses as L
from chore_tpu.recon.generator import Generator, SamplerConfig
from chore_tpu.recon.optimize import PhaseSpec, freeze_all_except, run_phase
from chore_tpu.recon.silhouette import SilhouetteLossROI
from chore_tpu.smpl.assets import load_part_labels
from chore_tpu.smpl.model import SMPLH, init_params, pack_pose
from chore_tpu.smpl.priors import make_body_prior, make_hand_prior
from chore_tpu.utils.meshio import pca_axes, sample_surface
from chore_tpu.utils.profiling import StepTimer


@dataclasses.dataclass(frozen=True)
class FitConfig:
    # phase iteration budgets (reference: recon_fit_behave.py:52,90,224-225)
    iter_betas: int = 1
    iter_pose: int = 1
    iter_kpts_max: int = 150
    iter_obj: int = 20
    iter_sil: int = 50
    iter_joint_max: int = 100
    steps_per_iter: int = 10
    obj_samples: int = 3000  # template surface samples (recon_fit_base.py:121)
    net_in_size: int = 512
    z0: float = Z0
    obj_scale: float = 1.0
    contact_thresh: float = 0.08
    sil_rend_size: int = 256
    crop_size: int = 1200


class ReconFitter:
    """Fits SMPL-H + object 6DoF/scale to the neural fields of one batch.

    Args:
      model, params: the trained CHOREField + weights.
      smplh: SMPLH wrapper (body model arrays + landmark regressors).
      template_verts/template_faces: canonical (centered) object template.
      weights: loss weight table (L.BEHAVE_WEIGHTS or L.COCO_WEIGHTS).
    """

    def __init__(self, model, params, smplh: SMPLH, template_verts,
                 template_faces, weights=None, cfg: FitConfig = FitConfig(),
                 sampler_cfg: SamplerConfig = SamplerConfig(),
                 assets_dir=None):
        self.model = model
        self.params = params
        self.smplh = smplh
        self.cfg = cfg
        self.weights = weights if weights is not None else L.BEHAVE_WEIGHTS
        tv = np.asarray(template_verts, np.float32)
        tv = tv - tv.mean(0)  # center (recon_fit_base.py:115)
        self.template_verts = tv
        self.template_faces = np.asarray(template_faces, np.int32)
        self.pca_init = jnp.asarray(pca_axes(tv))  # (3, 3)
        self.obj_points = jnp.asarray(
            sample_surface(tv, self.template_faces, cfg.obj_samples)
        )
        self.part_labels = jnp.asarray(load_part_labels(assets_dir))
        self.body_prior = make_body_prior(assets_dir)
        self.hand_prior = make_hand_prior(assets_dir)
        self.camera = PerspectiveCamera(crop_size=cfg.crop_size)
        self.generator = Generator(model, params, sampler_cfg)
        self.timer = StepTimer()  # per-phase wall time, see timer.summary()

    # ------------------------------------------------------------------ #
    def make_query_fn(self, images, crop_center):
        """Encode once; return query closure (points -> last-stack heads)."""
        feats, tmpx = self.model.apply(
            self.params, images, train=False, method="encode"
        )

        def query_fn(points):
            preds = self.model.apply(
                self.params, feats, tmpx, points, crop_center, method="query"
            )
            return preds[-1]

        return query_fn

    def smpl_height(self, smpl_params):
        verts = self.smplh.verts(smpl_params)
        return verts[..., 1].max(-1) - verts[..., 1].min(-1)  # (B,)

    # ------------------------------------------------------------------ #
    def optimize_smpl(self, smpl_params, query_fn, kpts2d, crop_center,
                      pose_init, key):
        """SMPL phases (reference: recon_fit_behave.py:224-291).

        Returns (smpl_params, scale (B,)) where scale is the body-height
        ratio after/before used to initialize the object scale.
        """
        cfg = self.cfg
        height_init = self.smpl_height(smpl_params)

        def smpl_losses(params, phase_kpts, decay, k):
            ld = {}
            verts = self.smplh.verts(params)
            preds = query_fn(verts)
            ld["df_h"] = L.df_h_loss(preds["df"][..., 0])
            pose = pack_pose(params)
            ld["pose"] = self.body_prior(pose).mean()
            ld["hand"] = self.hand_prior(pose).mean()
            ld["part"] = L.part_ce_loss(
                preds["parts"],
                jnp.tile(self.part_labels[None], (verts.shape[0], 1)),
            )
            joints = self.smplh.get_landmarks(params)[0]
            ld["smplz"] = L.smplz_loss(joints, cfg.z0)
            ld["pinit"] = L.pinit_loss(pose, pose_init)
            if phase_kpts:
                ld["j2d"] = L.j2d_loss(joints, kpts2d, crop_center,
                                       self.camera, cfg.net_in_size)
            return L.weighted_sum(ld, self.weights, decay), ld

        k1, k2, k3 = jax.random.split(key, 3)
        # phase 'global': top betas + trans at lr .02
        spec = PhaseSpec(lr=0.02, n_iters=cfg.iter_betas,
                         steps_per_iter=cfg.steps_per_iter,
                         trainable=freeze_all_except(
                             smpl_params, "top_betas", "trans"),
                         decay_fn=lambda it: 1.0)
        smpl_params, _, _ = run_phase(
            lambda p, d, k: smpl_losses(p, False, d, k), smpl_params, spec, k1)

        # phase 'smpl all pose': everything at lr .006
        spec = PhaseSpec(lr=0.006, n_iters=cfg.iter_pose,
                         steps_per_iter=cfg.steps_per_iter,
                         trainable=freeze_all_except(
                             smpl_params, "trans", "global_pose", "body_pose",
                             "top_betas", "other_betas"),
                         decay_fn=lambda it: 1.0)
        smpl_params, _, _ = run_phase(
            lambda p, d, k: smpl_losses(p, False, d, k), smpl_params, spec, k2)

        # phase 'kpts': + 2D keypoints, early stop, decay it/3
        offset = cfg.iter_betas + cfg.iter_pose
        spec = PhaseSpec(lr=0.006, n_iters=cfg.iter_kpts_max,
                         steps_per_iter=cfg.steps_per_iter,
                         trainable=freeze_all_except(
                             smpl_params, "trans", "global_pose", "body_pose",
                             "top_betas", "other_betas"),
                         decay_fn=lambda it: (it + offset) / 3.0,
                         early_stop_after=0.25, early_stop_rel=1e-3)
        smpl_params, _, n = run_phase(
            lambda p, d, k: smpl_losses(p, True, d, k), smpl_params, spec, k3)

        scale = self.smpl_height(smpl_params) / height_init
        return smpl_params, scale

    # ------------------------------------------------------------------ #
    def init_obj_params(self, pc_generated, human_t, scale):
        """Object init from neural predictions
        (reference: recon_fit_base.py:720-747)."""
        obj = pc_generated["object"]
        obj_t = obj["centers"][:, 3:] + human_t
        B = obj_t.shape[0]
        pca_pred = obj["pca_axis"]  # (B, 3, 3)
        obj_r = init_object_orientation(
            pca_pred, jnp.tile(self.pca_init[None], (B, 1, 1))
        )
        return {
            "obj_R": obj_r,
            "obj_t": obj_t,
            "obj_s": jnp.asarray(scale),
        }

    def transform_obj(self, obj_params, key=None, points=None):
        """scale * (template @ R + t) (reference: recon_fit_base.py:361-371).
        R is re-projected to SO(3) each evaluation (+jitter when key given)."""
        pts = self.obj_points if points is None else points
        if key is not None:
            R = project_so3_jittered(obj_params["obj_R"], key)
        else:
            R = project_so3(obj_params["obj_R"])
        v = jnp.einsum("nd,bde->bne", pts, R) + obj_params["obj_t"][:, None]
        return v * obj_params["obj_s"][:, None, None]

    # ------------------------------------------------------------------ #
    def optimize_smpl_object(self, smpl_params, obj_params, query_fn,
                             sil: SilhouetteLossROI, key):
        """Object phases (reference: recon_fit_behave.py:90-163)."""
        cfg = self.cfg
        smpl_verts = self.smplh.verts(smpl_params)  # smpl frozen here
        smpl_faces = jnp.asarray(self.smplh.faces)
        normals = L.vertex_normals(smpl_verts, np.asarray(self.smplh.faces))
        # smpl_center_pred computed once (recon_fit_behave.py:113)
        smpl_center_pred = jnp.mean(
            query_fn(smpl_verts)["centers"][..., :3], axis=1
        )
        part_labels_b = jnp.tile(
            self.part_labels[None], (smpl_verts.shape[0], 1)
        )
        trans_init = jax.lax.stop_gradient(obj_params["obj_t"])

        def obj_losses(params, phase, decay, k):
            ld = {}
            obj = self.transform_obj(params, key=k)
            if phase == "sil":
                ld["mask"], _ = sil(
                    project_so3(params["obj_R"]), params["obj_t"],
                    params["obj_s"],
                )
                ld["scale"] = L.scale_loss(params["obj_s"], cfg.obj_scale)
                ld["trans"] = jnp.mean((params["obj_t"] - trans_init) ** 2)
            else:
                preds_o = query_fn(obj)
                ld["object"] = L.df_o_loss(preds_o["df"][..., 1])
                ld["scale"] = L.scale_loss(params["obj_s"], cfg.obj_scale)
                obj_center_pred = smpl_center_pred + jnp.mean(
                    preds_o["centers"][..., 3:], axis=1
                )
                ld["ocent"] = L.ocent_loss(obj, obj_center_pred)
                if phase == "joint":
                    preds_h = query_fn(smpl_verts)
                    ld["contact"] = L.contact_loss(
                        smpl_verts, obj,
                        df_hum_o=preds_h["df"][..., 1],
                        df_obj_h=preds_o["df"][..., 0],
                        part_labels_h=self.part_labels,
                        part_labels_o=jnp.argmax(preds_o["parts"], -1),
                        thresh=cfg.contact_thresh,
                    )
                    ld["collide"] = L.collision_loss(smpl_verts, normals, obj)
            return L.weighted_sum(ld, self.weights, decay), ld

        k1, k2, k3 = jax.random.split(key, 3)
        # 'object only' x iter_obj, lr .006, decay 1
        spec = PhaseSpec(lr=0.006, n_iters=cfg.iter_obj,
                         steps_per_iter=cfg.steps_per_iter,
                         decay_fn=lambda it: 1.0)
        obj_params, _, _ = run_phase(
            lambda p, d, k: obj_losses(p, "obj", d, k), obj_params, spec, k1)

        # 'sil' x iter_sil, lr .006, decay it+1
        if sil is not None:
            spec = PhaseSpec(lr=0.006, n_iters=cfg.iter_sil,
                             steps_per_iter=cfg.steps_per_iter,
                             decay_fn=lambda it: it + 1.0)
            obj_params, _, _ = run_phase(
                lambda p, d, k: obj_losses(p, "sil", d, k), obj_params, spec, k2)

        # 'joint' x <= iter_joint_max, lr .002, t+s only, early stop,
        # decay continues the global schedule: (global_it - iter_obj + 1)/5
        # with global_it = iter_obj + iter_sil + local_it
        off = cfg.iter_sil + 1.0
        spec = PhaseSpec(lr=0.002, n_iters=cfg.iter_joint_max,
                         steps_per_iter=cfg.steps_per_iter,
                         trainable=freeze_all_except(
                             obj_params, "obj_t", "obj_s"),
                         decay_fn=lambda it: (it + off) / 5.0,
                         early_stop_after=0.25, early_stop_rel=1e-4)
        obj_params, _, _ = run_phase(
            lambda p, d, k: obj_losses(p, "joint", d, k), obj_params, spec, k3)
        return obj_params

    # ------------------------------------------------------------------ #
    def fit_batch(self, images, crop_center, mocap_poses, mocap_betas,
                  kpts2d, key=None, use_silhouette=True):
        """Full per-batch reconstruction (reference fit_recon,
        recon_fit_behave.py:29-76).

        Args:
          images: (B, S, S, 5) net input (channels-last RGBM3).
          crop_center: (B, 2).
          mocap_poses: (B, 72) FrankMocap SMPL pose init.
          mocap_betas: (B, 10).
          kpts2d: (B, 25, 3) openpose keypoints in net-input pixels + conf.

        Returns dict with smpl params, object params, and the generated
        point clouds.
        """
        key = key if key is not None else jax.random.PRNGKey(0)
        images = jnp.asarray(images)
        crop_center = jnp.asarray(crop_center)
        query_fn = self.make_query_fn(images, crop_center)
        k_gen, k_smpl, k_obj = jax.random.split(key, 3)

        with self.timer.phase("generate_pclouds"):
            pc = self.generator.generate_pclouds(images, crop_center, k_gen)
            jax.block_until_ready(pc["object"]["points"])
        human_t = pc["human"]["centers"][:, :3]
        human_t = human_t.at[:, 2].set(self.cfg.z0)  # fixed depth

        smpl_params = init_params(mocap_poses, mocap_betas, human_t)
        pose_init = jax.lax.stop_gradient(
            pack_pose(smpl_params)[:, 3:72]
        )
        with self.timer.phase("optimize_smpl"):
            smpl_params, scale = self.optimize_smpl(
                smpl_params, query_fn, jnp.asarray(kpts2d), crop_center,
                pose_init, k_smpl,
            )
            jax.block_until_ready(smpl_params)

        obj_params = self.init_obj_params(pc, human_t, scale)
        sil = None
        if use_silhouette:
            sil = SilhouetteLossROI(
                np.asarray(images[..., 3]), np.asarray(images[..., 4]),
                self.template_verts, self.template_faces,
                np.asarray(crop_center), rend_size=self.cfg.sil_rend_size,
                crop_size=self.cfg.crop_size, net_input=self.cfg.net_in_size,
            )
        with self.timer.phase("optimize_object"):
            obj_params = self.optimize_smpl_object(
                smpl_params, obj_params, query_fn, sil, k_obj
            )
            jax.block_until_ready(obj_params)
        return {
            "smpl_params": smpl_params,
            "obj_params": obj_params,
            "obj_R": project_so3(obj_params["obj_R"]),
            "pclouds": pc,
            "scale": scale,
        }
