"""Silhouette-phase convergence study at realistic template scale.

Guards the documented soft-rasterizer-vs-NMR gradient deviation (SURVEY §7
hard-part 2): the reference's 'sil' phase fine-tunes object rotation with
NMR edge gradients (reference: recon/recon_fit_behave.py:121-131,
recon/obj_pose_roi.py:159-172); our soft-silhouette gradients differ in
form, so this study measures the actual recovery basin of OUR sil phase on
a concave, multi-part, high-face-count template (procedural chair,
chore_tpu/utils/meshio.chair_mesh) with person occlusion, run through the
PRODUCTION phase schedule (iter_sil=50 x 10 steps, lr .006, decay it+1,
trans/scale regularized to the PERTURBED init -- exactly what a real fit
sees).

All perturbation rows run as ONE batched _fit_object_pure call. Results
land in BASELINE.md ("Sil-phase convergence study").

Usage:  PYTHONPATH=/root/repo:$PYTHONPATH python3 tools/sil_convergence.py
        [--subdiv 3] [--iters 50] [--rend 256]
"""
import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def rot_axis(axis, deg):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    a = np.deg2rad(deg)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return (np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * K @ K).astype(
        np.float32)


def geodesic_deg(Ra, Rb):
    tr = np.trace(Ra.T @ Rb)
    return float(np.rad2deg(np.arccos(np.clip((tr - 1) / 2, -1, 1))))


def make_masks(chair_v, chair_f, R_gt, t_gt, s_gt, cc, net_input=512):
    """GT object + person masks in net-input space: chair hard-rasterized
    at the GT pose, occluded by a person stand-in sphere in front."""
    from chore_tpu.ops.camera import PerspectiveCamera
    from chore_tpu.ops.rasterizer import hard_rasterize
    from chore_tpu.utils.meshio import octasphere

    cam = PerspectiveCamera()
    world = (chair_v @ R_gt + t_gt) * s_gt
    ndc = cam.project_points(jnp.asarray(world[None]), jnp.asarray(cc))
    fid_obj, _, _ = hard_rasterize(ndc, jnp.asarray(chair_f),
                                   image_size=net_input)
    sv, sf = octasphere(radius=0.22, center=(0.0, 0.0, 0.0), subdiv=3)
    sphere = sv + np.array([t_gt[0] - 0.18, t_gt[1] + 0.05, t_gt[2] - 0.25],
                           np.float32)
    ndc_p = cam.project_points(jnp.asarray(sphere[None]), jnp.asarray(cc))
    fid_per, _, _ = hard_rasterize(ndc_p, jnp.asarray(sf),
                                   image_size=net_input)
    obj = np.asarray(fid_obj[0]) >= 0
    per = np.asarray(fid_per[0]) >= 0
    # the detected object mask is the VISIBLE part (person in front wins)
    obj_visible = obj & ~per
    return obj_visible.astype(np.float32), per.astype(np.float32)


def run_study(subdiv=3, iters=50, rend=256, seed=0, anneal=1.0):
    from chore_tpu.models import CHOREField, FieldConfig
    from chore_tpu.ops.rotation import project_so3
    from chore_tpu.recon.fitter import FitConfig, ReconFitter
    from chore_tpu.recon.silhouette import SilhouetteLossROI, silhouette_loss
    from chore_tpu.smpl.loader import synthetic_smplh
    from chore_tpu.smpl.model import SMPLH, init_params
    from chore_tpu.utils.meshio import chair_mesh

    rng = np.random.RandomState(seed)
    chair_v, chair_f = chair_mesh(subdiv)
    print(f"chair: {len(chair_v)} verts, {len(chair_f)} faces")

    R_gt = rot_axis([0.2, 1.0, 0.1], 25.0)
    t_gt = np.array([0.10, -0.10, 2.30], np.float32)
    s_gt = 1.0
    cc = np.array([[1018.0, 779.0]], np.float32)
    obj_mask, per_mask = make_masks(chair_v, chair_f, R_gt, t_gt, s_gt, cc)
    print(f"GT mask px: obj {int(obj_mask.sum())}, person-overlap "
          f"{int((per_mask * obj_mask).sum())}, person {int(per_mask.sum())}")

    # perturbation grid: (rot deg, |trans| m, scale factor)
    grid = [(5, 0.03, 1.05), (10, 0.05, 1.05), (20, 0.08, 1.10),
            (30, 0.10, 1.10), (45, 0.15, 1.15), (60, 0.20, 1.15),
            (90, 0.25, 1.20), (15, 0.05, 0.90)]
    B = len(grid)
    R_init = np.stack([
        R_gt @ rot_axis(rng.randn(3), deg) for deg, _, _ in grid])
    dirs = rng.randn(B, 3)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    t_init = t_gt[None] + dirs * np.array([d for _, d, _ in grid])[:, None]
    s_init = np.array([s for _, _, s in grid], np.float32)

    # tiny random field (unused by the sil loss; the obj/joint phases are
    # disabled so only the sil schedule runs)
    model = CHOREField(cfg=FieldConfig(num_stack=1))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)),
                        jnp.zeros((1, 8, 3)), jnp.zeros((1, 2)))
    smplh = SMPLH(synthetic_smplh())
    cfg = FitConfig(iter_obj=0, iter_sil=iters, iter_joint=0,
                    iter_joint_max=0, sil_rend_size=rend,
                    sil_sigma_anneal=anneal)
    fitter = ReconFitter(model, params, smplh, chair_v, chair_f, cfg=cfg)
    fitter.pca_init = jnp.eye(3)  # so pca_pred==R_init IS the init rotation

    images = np.zeros((B, 64, 64, 5), np.float32)
    ccB = np.tile(cc, (B, 1))
    sil = SilhouetteLossROI(
        np.tile(per_mask[None], (B, 1, 1)), np.tile(obj_mask[None], (B, 1, 1)),
        chair_v, chair_f, ccB, rend_size=rend)
    human_t = np.tile(np.array([[0.0, 0.0, 2.2]], np.float32), (B, 1))
    smpl_params = init_params(np.zeros((B, 72), np.float32),
                              np.zeros((B, 10), np.float32), human_t)
    feats, tmpx = fitter.generator.encode(jnp.asarray(images))

    # sanity anchor: at the GT pose the rendered soft sil must match
    # image_ref nearly perfectly; if not, the study is measuring a
    # coordinate bug, not the optimizer basin
    R_gtB = np.tile(R_gt[None], (B, 1, 1))
    t_gtB = np.tile(t_gt[None], (B, 1))
    s_gtB = np.full((B,), s_gt, np.float32)
    loss_gt, img_gt = silhouette_loss(
        sil.data, chair_v, chair_f, jnp.asarray(R_gtB), jnp.asarray(t_gtB),
        jnp.asarray(s_gtB), rend)
    img_gt = np.asarray(img_gt)
    ref0 = sil.data["image_ref"]
    inter = ((img_gt[0] > 0.5) & (ref0[0] > 0.5)).sum()
    union = ((img_gt[0] > 0.5) | (ref0[0] > 0.5)).sum()
    print(f"GT-pose anchor: loss {float(loss_gt):.1f}, "
          f"IoU {inter / max(union, 1):.3f} (must be ~>0.9)")

    t0 = time.time()
    out = fitter._jit_fit_object(
        fitter.params, feats, tmpx, jnp.asarray(ccB), smpl_params,
        jnp.asarray(t_init - human_t), jnp.asarray(R_init),
        jnp.asarray(human_t), jnp.asarray(s_init), sil.data,
        jax.random.PRNGKey(1), use_sil=True,
    )
    out = jax.tree_util.tree_map(np.asarray, out)
    wall = time.time() - t0

    R_fin = np.asarray(project_so3(jnp.asarray(out["obj_R"])))
    _, img = silhouette_loss(sil.data, chair_v, chair_f,
                             jnp.asarray(R_fin), jnp.asarray(out["obj_t"]),
                             jnp.asarray(out["obj_s"]), rend)
    img = np.asarray(img)
    ref = sil.data["image_ref"]

    # per-example masked L2 at final vs GT pose: separates optimizer
    # failure (final > GT) from landscape failure (final < GT but wrong)
    keep = sil.data["keep_mask"]
    l2_fin = ((keep * img - ref) ** 2).sum(axis=(1, 2))
    img_gt_np = np.asarray(img_gt)
    l2_gt = ((keep * img_gt_np - ref) ** 2).sum(axis=(1, 2))

    print(f"\nsil phase: {iters} iters x 10 steps, {len(chair_f)} faces, "
          f"{rend}^2 render, batch {B}, wall {wall:.1f}s")
    print(f"{'pert (deg, m, s)':>22} | {'rot_err0':>8} {'rot_err':>8} "
          f"{'t_err0':>7} {'t_err':>7} {'s_err':>6} {'IoU':>5} "
          f"{'L2fin':>7} {'L2gt':>6} rec")
    results = []
    for i, g in enumerate(grid):
        rot0 = geodesic_deg(R_init[i], R_gt)
        rot1 = geodesic_deg(R_fin[i], R_gt)
        te0 = np.linalg.norm(s_init[i] * t_init[i] - s_gt * t_gt)
        te1 = np.linalg.norm(out["obj_s"][i] * out["obj_t"][i] - s_gt * t_gt)
        se = abs(float(out["obj_s"][i]) - s_gt)
        inter = ((img[i] > 0.5) & (ref[i] > 0.5)).sum()
        union = ((img[i] > 0.5) | (ref[i] > 0.5)).sum()
        iou = inter / max(union, 1)
        rec = rot1 < 8.0 and te1 < 0.05 and iou > 0.75
        results.append(dict(grid=g, rot0=rot0, rot1=rot1, te0=te0, te1=te1,
                            se=se, iou=iou, l2_fin=float(l2_fin[i]),
                            l2_gt=float(l2_gt[i]), recovered=bool(rec)))
        print(f"{str(g):>22} | {rot0:8.1f} {rot1:8.1f} {te0:7.3f} "
              f"{te1:7.3f} {se:6.3f} {iou:5.2f} {l2_fin[i]:7.0f} "
              f"{l2_gt[i]:6.0f} {'YES' if rec else 'no'}")
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdiv", type=int, default=3)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--rend", type=int, default=256)
    ap.add_argument("--anneal", type=float, default=1.0,
                    help="coarse-to-fine start sigma multiplier "
                         "(FitConfig.sil_sigma_anneal; 1.0 = off)")
    args = ap.parse_args()
    run_study(args.subdiv, args.iters, args.rend, anneal=args.anneal)
