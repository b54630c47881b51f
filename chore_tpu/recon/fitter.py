"""Multi-phase joint SMPL + object fitting against the neural fields.

TPU-native rewrite of the reference's ReconFitterBase/ReconFitterBehave
(reference: recon/recon_fit_base.py:48-845, recon/recon_fit_behave.py:28-358).
The phase schedule is preserved exactly; each stage runs as one jitted
on-device while_loop (see optimize.py) instead of ~1800 host-driven torch
Adam steps:

  SMPL:   'global' (top betas + trans, lr .02)
          -> 'smpl all pose' + 'kpts' as ONE phase (all pose + betas +
             trans, lr .006; j2d switches on and decay becomes it/3 at the
             kpts boundary WITHOUT resetting Adam -- the reference builds
             no new optimizer there, recon_fit_behave.py:260-264)
  object: 'object only' x20 (R, t, s; lr .006)
          -> 'sil' x50 (R, t, s; silhouette + trans/scale regs; lr .006)
          -> 'joint' x<=100 (t, s only; +contact +collision; lr .002,
             early stop, decay (it+1)/5 continuing the global schedule)

Compilation model: the three heavy stages -- encode, the full SMPL phase
chain, the full object phase chain -- are per-instance jitted PURE
functions whose per-frame data (features, keypoints, crop centers,
silhouette ROI tensors, mocap init) arrive as arguments, never as closure
captures. Each stage therefore compiles once per shape and is reused for
every frame of a sequence; host-side glue between stages is numpy.
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
from chore_tpu.recon.silhouette import (
    SilhouetteLossROI,
    offscreen_loss,
    silhouette_loss,
)
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
    iter_kpts: int = 1  # extends the kpts budget (iter_for_kpts, :52,240)
    iter_kpts_max: int = 150
    iter_obj: int = 20
    iter_sil: int = 50
    iter_joint: int = 10  # extends the joint budget (joint_iter, :90,115)
    iter_joint_max: int = 100
    steps_per_iter: int = 10
    obj_samples: int = 3000  # template surface samples (recon_fit_base.py:121)
    net_in_size: int = 512
    z0: float = Z0
    obj_scale: float = 1.0
    contact_thresh: float = 0.08
    sil_rend_size: int = 256
    crop_size: int = 1200
    # re-projection jitter on the optimized rotation before SVD (the
    # reference adds 1e-4*rand to dodge degenerate SVDs,
    # recon_fit_base.py:373-384). Disable for deterministic
    # trajectory-parity oracles.
    svd_jitter: bool = True
    # opt-in coarse-to-fine sigma annealing for the sil phase: the first
    # iterations render with sigma widened by this factor, narrowing
    # geometrically to 1x over `sil_anneal_levels` stages. Widened support
    # gives distant-edge pixels gradient, growing the rotation-recovery
    # basin for bad (e.g. in-the-wild/COCO) inits; the reference
    # compensates with heavier regularization instead
    # (recon_fit_coco.py:55-74). 1.0 = off (reference-exact schedule).
    sil_sigma_anneal: float = 1.0
    sil_anneal_levels: int = 4
    # opt-in offscreen-degeneracy guard for the sil phase (PHOSA's
    # defined-but-unwired compute_offscreen_loss,
    # reference: recon/obj_pose_roi.py:179-199): keeps a badly-initialized
    # object from minimizing mask L2 by leaving the ROI. Recommended for
    # in-the-wild (COCO_WEIGHTS) fits.
    offscreen_guard: bool = False
    # fuse encode + point generation + SMPL chain + object chain into ONE
    # jitted program per fit_batch call (5 dispatches -> 1). Same math
    # (the very same pure stage functions are traced), but XLA fuses the
    # larger program differently, so results are NOT float-identical to
    # the staged path: a 1-ulp df difference can flip the generator's
    # argsort compaction and shift the object init at the mm level.
    # Trades the staged pipeline's cv2-prep/SMPL-chain overlap for zero
    # inter-stage dispatch gaps — a win on remote-tunnel backends where
    # each dispatch pays round-trip latency. Incompatible with
    # record_traces/monitor (the staged path is the debugging path).
    fused_pipeline: bool = False


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
                 assets_dir=None, mesh=None, record_traces=False):
        """mesh: optional jax.sharding.Mesh -- frames of a batch are then
        sharded over its 'data' axis (params replicated); every stage jit
        runs SPMD with XLA inserting the few cross-device reductions the
        batch-mean losses need.

        record_traces: when True the stage jits run every iteration (no
        early-exit while_loop) and fit results carry per-step loss traces
        under 'smpl_trace'/'obj_trace' -- for debugging and the
        trajectory-parity oracle, not production speed."""
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            from chore_tpu.parallel import replicate

            params = replicate(params, mesh)
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
        self.assets_dir = assets_dir
        self.part_labels = jnp.asarray(load_part_labels(assets_dir))
        self.body_prior = make_body_prior(assets_dir)
        self.hand_prior = make_hand_prior(assets_dir)
        self.camera = PerspectiveCamera(crop_size=cfg.crop_size)
        self.generator = Generator(model, params, sampler_cfg)
        self.record_traces = record_traces
        self.timer = StepTimer()  # per-phase wall time, see timer.summary()

        # per-instance jitted stages (pure in params + per-frame data)
        self._jit_fit_smpl = jax.jit(self._fit_smpl_pure)
        self._jit_fit_object = jax.jit(
            self._fit_object_pure, static_argnames=("use_sil",)
        )
        self._jit_fit_all = jax.jit(
            self._fit_all_pure, static_argnames=("use_sil",)
        )

    # ------------------------------------------------------------------ #
    def _query(self, params, feats, tmpx, points, crop_center):
        """Last-stack field query as a pure function (traced inside the
        stage jits). The net is frozen during fitting -- gradients flow
        only to the points -- so the corner-saving frozen sampler applies
        (no backward feature re-gathers)."""
        preds = self.model.apply(
            params, feats, tmpx, points, crop_center,
            frozen_features=True, method="query"
        )
        return preds[-1]

    def smpl_height(self, smpl_params):
        verts = self.smplh.verts(smpl_params)
        return verts[..., 1].max(-1) - verts[..., 1].min(-1)  # (B,)

    def _run(self, loss_fn, params, spec, key, prev_loss, traces, name):
        """run_phase, collecting the per-step trace when record_traces."""
        if self.record_traces:
            params, loss, n, tr = run_phase(
                loss_fn, params, spec, key, prev_loss=prev_loss, record=True
            )
            traces[name] = tr
            return params, loss, n
        return run_phase(loss_fn, params, spec, key, prev_loss=prev_loss)

    # ------------------------------------------------------------------ #
    def _fit_smpl_pure(self, params, feats, tmpx, crop_center, mocap_pose,
                       mocap_betas, human_t, kpts2d, key):
        """SMPL phases (reference: recon_fit_behave.py:224-291), all inside
        one jit. Returns (smpl_params, scale) where scale is the body-height
        ratio after/before, used to initialize the object scale."""
        cfg = self.cfg
        smpl_params = init_params(mocap_pose, mocap_betas, human_t,
                                  assets_dir=self.assets_dir)
        pose_init = jax.lax.stop_gradient(pack_pose(smpl_params)[:, 3:72])
        height_init = self.smpl_height(smpl_params)

        def query_fn(points):
            return self._query(params, feats, tmpx, points, crop_center)

        def smpl_losses(sp, decay, k, kpts_w=None):
            """kpts_w: None = no j2d term at all (phase 'global'); else a
            0/1 weight so the pose->kpts switch can be a TRACED boundary
            inside one phase (weighted_sum is linear, so w*j2d with w in
            {0,1} is exactly the reference's term-present/absent)."""
            ld = {}
            verts = self.smplh.verts(sp)
            preds = query_fn(verts)
            ld["df_h"] = L.df_h_loss(preds["df"][..., 0])
            pose = pack_pose(sp)
            ld["pose"] = self.body_prior(pose).mean()
            ld["hand"] = self.hand_prior(pose).mean()
            ld["part"] = L.part_ce_loss(
                preds["parts"],
                jnp.tile(self.part_labels[None], (verts.shape[0], 1)),
            )
            joints = self.smplh.get_landmarks(sp)[0]
            ld["smplz"] = L.smplz_loss(joints, cfg.z0)
            ld["pinit"] = L.pinit_loss(pose, pose_init)
            if kpts_w is not None:
                ld["j2d"] = kpts_w * L.j2d_loss(joints, kpts2d, crop_center,
                                                self.camera, cfg.net_in_size)
            return L.weighted_sum(ld, self.weights, decay), ld

        traces = {}
        k1, k2 = jax.random.split(key)
        # phase 'global': top betas + trans at lr .02. prev_loss starts at
        # 300 and is threaded through ALL phases (recon_fit_behave.py:236).
        spec = PhaseSpec(lr=0.02, n_iters=cfg.iter_betas,
                         steps_per_iter=cfg.steps_per_iter,
                         trainable=freeze_all_except(
                             smpl_params, "top_betas", "trans"))
        smpl_params, prev, _ = self._run(
            lambda p, it, k: smpl_losses(p, 1.0, k), smpl_params, spec, k1,
            300.0, traces, "global")

        # phases 'smpl all pose' + 'kpts' = ONE optimizer lifetime: the
        # reference switches the description/loss at
        # it == iter_for_betas + iter_for_pose WITHOUT building a new Adam
        # (recon_fit_behave.py:260-264), so moments and step count carry
        # across the boundary. j2d switches on and decay becomes
        # global_it/3 at local it >= iter_pose (global it = local +
        # iter_betas). Early stop: reference gate
        # ``it > 0.25*max_iter + iter_for_betas + iter_for_pose`` on the
        # global counter (:278) -> local gate 0.25*max_iter + iter_pose.
        spec = PhaseSpec(
            lr=0.006,
            n_iters=cfg.iter_pose + cfg.iter_kpts_max + cfg.iter_kpts,
            steps_per_iter=cfg.steps_per_iter,
            trainable=freeze_all_except(
                smpl_params, "trans", "global_pose", "body_pose",
                "top_betas", "other_betas"),
            early_stop_min_iter=0.25 * cfg.iter_kpts_max + cfg.iter_pose,
            early_stop_rel=1e-3)

        def pose_kpts_losses(p, it, k):
            in_kpts = it >= cfg.iter_pose
            decay = jnp.where(in_kpts, (it + cfg.iter_betas) / 3.0, 1.0)
            return smpl_losses(p, decay, k,
                               kpts_w=in_kpts.astype(jnp.float32))

        smpl_params, _, _ = self._run(
            pose_kpts_losses, smpl_params, spec, k2, prev, traces,
            "pose_kpts")

        scale = self.smpl_height(smpl_params) / height_init
        if self.record_traces:
            return smpl_params, scale, traces
        return smpl_params, scale

    # ------------------------------------------------------------------ #
    def transform_obj(self, obj_params, key=None, points=None, R=None):
        """scale * (template @ R + t) (reference: recon_fit_base.py:361-371).
        R is re-projected to SO(3) each evaluation (+jitter when key given),
        or passed in precomputed so one jittered projection can be shared
        across loss terms (the reference projects once per forward_step,
        recon_fit_behave.py:175-176)."""
        pts = self.obj_points if points is None else jnp.asarray(points)
        if R is not None:
            pass
        elif key is not None:
            R = project_so3_jittered(obj_params["obj_R"], key)
        else:
            R = project_so3(obj_params["obj_R"])
        # HIGHEST: a bf16 pass here biases every template vertex ~mm-scale,
        # feeding df/contact/silhouette losses (CLAUDE.md precision rule)
        v = jnp.einsum("nd,bde->bne", pts, R,
                       precision=jax.lax.Precision.HIGHEST)
        v = v + obj_params["obj_t"][:, None]
        return v * obj_params["obj_s"][:, None, None]

    # ------------------------------------------------------------------ #
    def _fit_object_pure(self, params, feats, tmpx, crop_center, smpl_params,
                         obj_center_rel, obj_pca_pred, human_t, scale,
                         sil_data, key, use_sil):
        """Object init + phases (reference: recon_fit_base.py:720-747 +
        recon_fit_behave.py:90-163), all inside one jit."""
        cfg = self.cfg

        def query_fn(points):
            return self._query(params, feats, tmpx, points, crop_center)

        # init from neural predictions (recon_fit_base.py:720-747)
        B = human_t.shape[0]
        obj_params = {
            "obj_R": init_object_orientation(
                obj_pca_pred, jnp.tile(self.pca_init[None], (B, 1, 1))
            ),
            "obj_t": obj_center_rel + human_t,
            "obj_s": jnp.asarray(scale),
        }

        smpl_verts = self.smplh.verts(smpl_params)  # smpl frozen here
        normals = L.vertex_normals(smpl_verts, np.asarray(self.smplh.faces))
        # ONE field query at the frozen smpl verts serves the whole chain:
        # smpl_center_pred (recon_fit_behave.py:113) AND the contact loss's
        # human-side df (recon_fit_base.py:560 re-queries identical inputs
        # every iteration -- net and verts are both frozen here, so that
        # per-step 6890-pt query is loop-invariant; hoisting it halves the
        # joint-phase device time at identical math)
        preds_h = query_fn(smpl_verts)
        smpl_center_pred = jnp.mean(preds_h["centers"][..., :3], axis=1)

        def obj_losses(op, phase, decay, k, trans_init=None, it=0):
            """``decay`` is the reference weight-decay argument; ``it`` is
            the phase-LOCAL iteration (only the sil phase passes it, for
            the anneal schedule -- never derive one from the other, their
            relation differs per phase)."""
            ld = {}
            # ONE SO(3) projection per step shared by every term (the
            # reference projects once in forward_step and feeds the same
            # jittered R to the query AND the silhouette,
            # recon_fit_behave.py:175-189)
            if cfg.svd_jitter:
                R = project_so3_jittered(op["obj_R"], k)
            else:
                R = project_so3(op["obj_R"])
            obj = self.transform_obj(op, R=R)
            if phase == "sil":
                if cfg.sil_sigma_anneal > 1.0 and cfg.sil_anneal_levels > 1:
                    # coarse-to-fine: a lax.switch over a few STATIC sigma
                    # levels (sigma shapes kernel constants, so it cannot
                    # be traced); level k renders at anneal^(1 - k/(L-1))
                    # * default sigma, ending exactly at the release
                    # sigma. sil_anneal_levels <= 1 means annealing off.
                    nl = cfg.sil_anneal_levels
                    base = 0.5 * (2.0 / cfg.sil_rend_size)
                    sigmas = [
                        base * cfg.sil_sigma_anneal ** (1.0 - kk / (nl - 1))
                        for kk in range(nl)
                    ]

                    def mk(sig):
                        return lambda args: silhouette_loss(
                            sil_data, self.template_verts,
                            self.template_faces, *args,
                            cfg.sil_rend_size, sigma=sig)[0]

                    lvl = jnp.minimum(
                        (jnp.asarray(it, jnp.int32) * nl)
                        // max(cfg.iter_sil, 1), nl - 1)
                    ld["mask"] = jax.lax.switch(
                        lvl, [mk(sg) for sg in sigmas],
                        (R, op["obj_t"], op["obj_s"]))
                else:
                    ld["mask"], _ = silhouette_loss(
                        sil_data, self.template_verts, self.template_faces,
                        R, op["obj_t"], op["obj_s"],
                        cfg.sil_rend_size,
                    )
                ld["scale"] = L.scale_loss(op["obj_s"], cfg.obj_scale)
                ld["trans"] = jnp.mean((op["obj_t"] - trans_init) ** 2)
                if cfg.offscreen_guard:
                    ld["offscreen"] = offscreen_loss(
                        sil_data, self.template_verts, R,
                        op["obj_t"], op["obj_s"])
            else:
                preds_o = query_fn(obj)
                ld["object"] = L.df_o_loss(preds_o["df"][..., 1])
                ld["scale"] = L.scale_loss(op["obj_s"], cfg.obj_scale)
                obj_center_pred = smpl_center_pred + jnp.mean(
                    preds_o["centers"][..., 3:], axis=1
                )
                ld["ocent"] = L.ocent_loss(obj, obj_center_pred)
                if phase == "joint":
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

        traces = {}
        k1, k2, k3 = jax.random.split(key, 3)
        # 'object only' x iter_obj, lr .006, decay 1. prev_loss starts at
        # 300 and threads through the chain (recon_fit_behave.py:108,162).
        spec = PhaseSpec(lr=0.006, n_iters=cfg.iter_obj,
                         steps_per_iter=cfg.steps_per_iter)
        obj_params, prev, _ = self._run(
            lambda p, it, k: obj_losses(p, "obj", 1.0, k), obj_params, spec,
            k1, 300.0, traces, "obj")

        # 'sil' x iter_sil, lr .006, decay it+1 (local it: the reference's
        # weight_decay = it - iter_for_obj + 1, recon_fit_behave.py:144-145)
        if use_sil:
            # trans anchor captured AT SIL START, i.e. after the object-only
            # phase moved obj_t (reference: recon_fit_behave.py:130-131 sets
            # data_dict['trans_init'] at the it == iter_for_obj boundary).
            # Anchoring to the pre-obj-phase init instead pulls obj_t back
            # toward the raw network init during the sil phase.
            trans_init = jax.lax.stop_gradient(obj_params["obj_t"])
            spec = PhaseSpec(lr=0.006, n_iters=cfg.iter_sil,
                             steps_per_iter=cfg.steps_per_iter)
            obj_params, prev, _ = self._run(
                lambda p, it, k: obj_losses(p, "sil", it + 1.0, k,
                                            trans_init, it=it),
                obj_params, spec, k2, prev, traces, "sil")

        # 'joint' x <= iter_joint_max + iter_joint, lr .002, t+s only,
        # decay continues the global schedule: (global_it - iter_obj + 1)/5
        # with global_it = iter_obj [+ iter_sil] + local_it. The reference
        # stop gate ``it > 0.25*max_iter`` uses the GLOBAL counter
        # (recon_fit_behave.py:158-159), and the joint phase starts at
        # global iter_obj + iter_sil -- already past the gate with release
        # budgets, so in local iterations the gate is (usually negative)
        # 0.25*max_iter - phase start.
        start = cfg.iter_obj + (cfg.iter_sil if use_sil else 0)
        off = (cfg.iter_sil if use_sil else 0.0) + 1.0
        spec = PhaseSpec(lr=0.002, n_iters=cfg.iter_joint_max + cfg.iter_joint,
                         steps_per_iter=cfg.steps_per_iter,
                         trainable=freeze_all_except(
                             obj_params, "obj_t", "obj_s"),
                         early_stop_min_iter=0.25 * cfg.iter_joint_max - start,
                         early_stop_rel=1e-4)
        obj_params, _, _ = self._run(
            lambda p, it, k: obj_losses(p, "joint", (it + off) / 5.0, k),
            obj_params, spec, k3, prev, traces, "joint")
        if self.record_traces:
            return obj_params, traces
        return obj_params

    # ------------------------------------------------------------------ #
    def _fit_all_pure(self, params, images, crop_center, mocap_poses,
                      mocap_betas, kpts2d, sil_data, key, use_sil):
        """The ENTIRE fit as one pure program: encode -> generate human +
        object clouds -> SMPL chain -> object chain. Same math as the
        staged path (it calls the same pure stage functions); one XLA
        program means one dispatch per frame instead of five, removing
        the inter-stage host/tunnel gaps (BASELINE.md fit profile:
        ~0.9 s device vs 1.08 s wall across three stage jits).

        ``sil_data`` is prepared host-side (cv2) BEFORE dispatch — the
        ROI prep needs only the input images, never device results."""
        k_gen, k_smpl, k_obj = jax.random.split(key, 3)
        kh, ko = jax.random.split(k_gen)
        feats, tmpx = self.generator.encode_pure(params, images)
        pc_h = self.generator.sample_pure(params, feats, tmpx, crop_center,
                                          kh, 0)
        pc_o = self.generator.sample_pure(params, feats, tmpx, crop_center,
                                          ko, 1)
        human_t = pc_h["centers"][:, :3].at[:, 2].set(self.cfg.z0)
        smpl_params, scale = self._fit_smpl_pure(
            params, feats, tmpx, crop_center, mocap_poses, mocap_betas,
            human_t, kpts2d, k_smpl)
        obj_params = self._fit_object_pure(
            params, feats, tmpx, crop_center, smpl_params,
            pc_o["centers"][:, 3:], pc_o["pca_axis"], human_t, scale,
            sil_data, k_obj, use_sil)
        return {
            "smpl_params": smpl_params,
            "obj_params": obj_params,
            "obj_R": project_so3(obj_params["obj_R"]),
            "pclouds": {"human": pc_h, "object": pc_o},
            "scale": scale,
        }

    def _fit_batch_fused(self, images, crop_center, mocap_poses,
                         mocap_betas, kpts2d, key, use_silhouette):
        """fit_batch via the single whole-fit jit (cfg.fused_pipeline)."""
        images_np = np.asarray(images)
        crop_center_np = np.asarray(crop_center, np.float32)
        sil_data = None
        if use_silhouette:
            with self.timer.phase("silhouette_prep"):
                sil_data = SilhouetteLossROI(
                    images_np[..., 3], images_np[..., 4],
                    self.template_verts, self.template_faces,
                    crop_center_np,
                    rend_size=self.cfg.sil_rend_size,
                    crop_size=self.cfg.crop_size,
                    net_input=self.cfg.net_in_size,
                ).data
        args = {
            "images": jnp.asarray(images_np),
            "crop_center": jnp.asarray(crop_center_np),
            "mp": jnp.asarray(np.asarray(mocap_poses, np.float32)),
            "mb": jnp.asarray(np.asarray(mocap_betas, np.float32)),
            "kp": jnp.asarray(np.asarray(kpts2d, np.float32)),
        }
        if self.mesh is not None:
            from chore_tpu.parallel import replicate, shard_batch

            args = shard_batch(args, self.mesh)
            if sil_data is not None:
                sil_data = shard_batch(sil_data, self.mesh)
            key = replicate(key, self.mesh)
        with self.timer.phase("fit_fused"):
            out = self._jit_fit_all(
                self.params, args["images"], args["crop_center"],
                args["mp"], args["mb"], args["kp"], sil_data, key,
                use_sil=use_silhouette)
            jax.block_until_ready(out["obj_params"])
        return out

    # ------------------------------------------------------------------ #
    def fit_batch(self, images, crop_center, mocap_poses, mocap_betas,
                  kpts2d, key=None, use_silhouette=True, monitor=None,
                  block_per_stage=False):
        """Full per-batch reconstruction (reference fit_recon,
        recon_fit_behave.py:29-76).

        Args:
          images: (B, S, S, 5) net input (channels-last RGBM3).
          crop_center: (B, 2).
          mocap_poses: (B, 72) FrankMocap SMPL pose init.
          mocap_betas: (B, 10).
          kpts2d: (B, 25, 3) openpose keypoints in net-input pixels + conf.
          monitor: optional utils.viewer.FitMonitor; snapshots frame 0's
            state after each stage (the reference's MeshViewer debug loop,
            recon_fit_base.py:442-511).
          block_per_stage: block on each stage's outputs inside its timer
            phase, so ``timer.summary()`` reports true per-stage wall time
            (device + dispatch) instead of async dispatch time. Adds host
            syncs between stages — for profiling/bench breakdowns only,
            never production.

        Returns dict with smpl params, object params, and the generated
        point clouds. When constructed with a mesh, B must be divisible by
        the device count (callers pad partial batches; see cli/recon.py).
        """
        key = key if key is not None else jax.random.PRNGKey(0)
        sync = jax.block_until_ready if block_per_stage else (lambda x: x)
        # block_per_stage needs the staged path: the fused pipeline is one
        # dispatch with no stage boundaries to sync, so honoring the flag
        # there would silently report a meaningless single-phase
        # "breakdown"
        if self.cfg.fused_pipeline and not self.record_traces \
                and monitor is None and not block_per_stage:
            return self._fit_batch_fused(
                images, crop_center, mocap_poses, mocap_betas, kpts2d,
                key, use_silhouette)
        # host copies for the silhouette ROI prep (cv2): reading masks back
        # from the device would cost a ~2 MB/example round trip mid-pipeline
        # (only needed when the silhouette phase runs)
        images_np = np.asarray(images) if use_silhouette else None
        crop_center_np = np.asarray(crop_center, np.float32)
        images = jnp.asarray(images)
        crop_center = jnp.asarray(crop_center_np)
        if self.mesh is not None:
            from chore_tpu.parallel import replicate, shard_batch

            sharded = shard_batch(
                {"images": images, "crop_center": crop_center}, self.mesh
            )
            images, crop_center = sharded["images"], sharded["crop_center"]
            key = replicate(key, self.mesh)
        k_gen, k_smpl, k_obj = jax.random.split(key, 3)

        # stages dispatch back-to-back WITHOUT host syncs: encode ->
        # generate -> smpl chain -> object chain chain on device, and the
        # only mid-pipeline host work (cv2 silhouette ROI prep) overlaps
        # the SMPL chain. Timer phases therefore measure dispatch, not
        # device time; use jax.profiler for device breakdowns.
        with self.timer.phase("encode"):
            feats, tmpx = self.generator.encode(images)
            sync(feats)
        with self.timer.phase("generate_pclouds"):
            pc = self.generator.generate_from_feats(
                feats, tmpx, crop_center, k_gen
            )
            sync(pc)

        if monitor is not None:
            monitor.snapshot("pclouds", pclouds={
                "human": np.asarray(pc["human"]["points"][0]),
                "object": np.asarray(pc["object"]["points"][0]),
            })

        # fixed-depth init stays on device: a host readback of the
        # generated centers here would serialize the pipeline
        human_t = pc["human"]["centers"][:, :3].at[:, 2].set(self.cfg.z0)
        mocap_poses = jnp.asarray(np.asarray(mocap_poses, np.float32))
        mocap_betas = jnp.asarray(np.asarray(mocap_betas, np.float32))
        kpts2d = jnp.asarray(np.asarray(kpts2d, np.float32))
        if self.mesh is not None:
            from chore_tpu.parallel import shard_batch

            s = shard_batch(
                {"mp": mocap_poses, "mb": mocap_betas, "kp": kpts2d},
                self.mesh,
            )
            mocap_poses, mocap_betas, kpts2d = s["mp"], s["mb"], s["kp"]

        smpl_trace = obj_trace = None
        with self.timer.phase("optimize_smpl"):
            out = self._jit_fit_smpl(
                self.params, feats, tmpx, crop_center,
                mocap_poses, mocap_betas, human_t, kpts2d, k_smpl,
            )
            if self.record_traces:
                smpl_params, scale, smpl_trace = out
            else:
                smpl_params, scale = out
            sync(smpl_params)

        # host-side cv2 ROI prep runs while the device crunches the SMPL
        # chain (the dispatch above is async); uses the host copies of the
        # inputs, so no device readback is needed
        sil_data = None
        if use_silhouette:
            with self.timer.phase("silhouette_prep"):
                sil_data = SilhouetteLossROI(
                    images_np[..., 3], images_np[..., 4],
                    self.template_verts, self.template_faces,
                    crop_center_np,
                    rend_size=self.cfg.sil_rend_size,
                    crop_size=self.cfg.crop_size,
                    net_input=self.cfg.net_in_size,
                ).data
                if self.mesh is not None:
                    from chore_tpu.parallel import shard_batch

                    sil_data = shard_batch(sil_data, self.mesh)

        if monitor is not None:
            # only the monitor needs smpl_params materialized here; the
            # object chain is ordered by its device-side data dependency,
            # so blocking unconditionally would re-introduce the mid-stage
            # host sync this pipeline removed
            jax.block_until_ready(smpl_params)
            monitor.snapshot("smpl", meshes=[(
                np.asarray(self.smplh.verts(smpl_params))[0],
                np.asarray(self.smplh.faces), monitor.SMPL_COLOR)])
        with self.timer.phase("optimize_object"):
            obj_params = self._jit_fit_object(
                self.params, feats, tmpx, crop_center, smpl_params,
                pc["object"]["centers"][:, 3:], pc["object"]["pca_axis"],
                human_t, scale, sil_data, k_obj, use_sil=use_silhouette,
            )
            if self.record_traces:
                obj_params, obj_trace = obj_params
            jax.block_until_ready(obj_params)
        if monitor is not None:
            monitor.snapshot("object", meshes=[
                (np.asarray(self.smplh.verts(smpl_params))[0],
                 np.asarray(self.smplh.faces), monitor.SMPL_COLOR),
                (np.asarray(self.transform_obj(
                    obj_params, points=self.template_verts))[0],
                 self.template_faces, monitor.OBJ_COLOR),
            ])
        out = {
            "smpl_params": smpl_params,
            "obj_params": obj_params,
            "obj_R": project_so3(obj_params["obj_R"]),
            "pclouds": pc,
            "scale": scale,
        }
        if self.record_traces:
            out["smpl_trace"] = smpl_trace
            out["obj_trace"] = obj_trace
        return out
