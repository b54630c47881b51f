"""Fitting losses for joint SMPL + object optimization.

Functional equivalents of the reference's loss terms (reference:
recon/recon_fit_base.py:513-676, recon/recon_fit_behave.py:165-222,293-358)
with the two CUDA-backed losses rebuilt TPU-native:

  * contact: the ragged per-part pytorch3d Pointclouds chamfer
    (recon_fit_base.py:553-608) becomes two vmapped grouped fused-NN
    kernel calls (group id = part label, batch via the kernel grid), mean
    over valid part pairs (identical semantics to pytorch3d's cloud-mean
    reduction) -- no (N_h, N_o) matrix ever materializes.
  * collision: the BVH + DistanceFieldPenetrationLoss CUDA pair
    (recon_fit_base.py:79-86,610-639) becomes a BVH-free signed-distance
    penalty: object points behind the nearest SMPL vertex's outward normal
    are penalized quadratically. Nearest indices are stop-gradiented like
    the reference's no_grad BVH query.

Loss weights follow w^2 * value / (1 + decay) with the per-phase decay
driven by the optimizer loop (recon_fit_behave.py:339-358).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from chore_tpu.ops.camera import PerspectiveCamera, Z0
from chore_tpu.ops.chamfer import nn_sqdist
from chore_tpu.smpl.const import SMPL_PARTS_NUM

# w^2 constants (reference: recon_fit_behave.py:339-358)
BEHAVE_WEIGHTS = {
    "beta": 1.0,
    "pose": 1e-5,
    "hand": 1e-5,
    "j2d": 0.3**2,
    "object": 30.0**2,
    "part": 0.05**2,
    "contact": 30.0**2,
    "scale": 10.0**2,
    "df_h": 30.0**2,
    "smplz": 30.0**2,
    "mask": 0.003**2,
    "ocent": 15.0**2,
    "collide": 3.0**2,
    "pinit": 5.0**2,
    "rot": 10.0**2,
    "trans": 10.0**2,
    # offscreen-degeneracy guard (opt-in, FitConfig.offscreen_guard). The
    # reference defines but never wires compute_offscreen_loss
    # (obj_pose_roi.py:179-199), so this weight is ours: the hinge is zero
    # on-screen and grows linearly in NDC units off-screen.
    "offscreen": 10.0**2,
}

# in-the-wild variant: stronger pose/contact/keypoint regularization
# (reference: recon_fit_coco.py:55-74)
COCO_WEIGHTS = dict(
    BEHAVE_WEIGHTS,
    j2d=0.8**2,
    object=90.0**2,
    contact=150.0**2,
    scale=2.0**2,
    pinit=10.0**2,
    ocent=30.0**2,
    mask=0.3**2,
    collide=15.0**2,
)


def weighted_sum(loss_dict, weights, decay):
    """sum_k w_k * loss_k / (1 + decay)
    (reference: recon_fit_base.py:351-359)."""
    total = 0.0
    for k, v in loss_dict.items():
        total = total + weights[k] * v / (1.0 + decay)
    return total


def df_h_loss(df_pred_h, clamp=0.1):
    """Mean clamped human UDF at SMPL verts (recon_fit_base.py:537-542)."""
    return jnp.clip(df_pred_h, max=clamp).mean()


def df_o_loss(df_pred_o, clamp=0.8):
    """Mean clamped object UDF at object points (recon_fit_base.py:513-518)."""
    return jnp.clip(df_pred_o, max=clamp).mean()


def scale_loss(obj_s, obj_scale=1.0):
    return jnp.mean((obj_s - obj_scale) ** 2)


def smplz_loss(joints, z0=Z0):
    """Pelvis (body25 joint 8) fixed-depth loss (recon_fit_base.py:230-231)."""
    return jnp.mean((joints[:, 8, 2] - z0) ** 2)


def pinit_loss(pose, pose_init):
    """Stay near the mocap body pose: pose[3:72]
    (recon_fit_behave.py:319-320)."""
    return jnp.mean(jnp.sum((pose[:, 3:72] - pose_init) ** 2, -1))


def part_ce_loss(parts_pred, part_labels):
    """Part-correspondence CE at SMPL verts, summed over verts
    (recon_fit_behave.py:312). parts_pred (B, V, 14), labels (B, V)."""
    from chore_tpu.models.layers import one_hot_ce

    return one_hot_ce(parts_pred, part_labels).sum(-1).mean()


def j2d_loss(joints3d, kpts2d, crop_center, camera: PerspectiveCamera,
             net_in_size=512):
    """2D keypoint reprojection (recon_fit_base.py:661-676): project to the
    crop patch, rescale to network-input pixels, confidence-weighted MSE."""
    px, py = camera.project_screen(joints3d, crop_center)
    proj = jnp.concatenate([px, py], -1) * (net_in_size / camera.crop_size)
    err = (proj - kpts2d[..., :2]) ** 2
    return jnp.mean(jnp.sum(err, axis=-1) * kpts2d[..., 2])


def ocent_loss(obj_points, obj_center_pred):
    """Object-center consistency (recon_fit_behave.py:198-199)."""
    actual = jnp.mean(obj_points, axis=1)
    return jnp.sum((actual - obj_center_pred) ** 2, -1).mean()


def contact_loss(smpl_verts, obj_points, df_hum_o, df_obj_h,
                 part_labels_h, part_labels_o, thresh=0.08):
    """Per-part contact chamfer (recon_fit_base.py:553-608).

    Args:
      smpl_verts: (B, Nh, 3); obj_points: (B, No, 3).
      df_hum_o: (B, Nh) predicted OBJECT df at smpl verts.
      df_obj_h: (B, No) predicted HUMAN df at object points.
      part_labels_h: (Nh,) static SMPL part labels.
      part_labels_o: (B, No) predicted part labels of object points.

    Semantics: points with df < thresh are "in contact"; if one side of an
    example has no contacts at all, ALL its points are eligible (the
    reference pulls the whole cloud). Each part with contacts on both sides
    forms a cloud pair; the loss is the mean over pairs of the
    bidirectional mean squared chamfer (pytorch3d convention).

    All B * 14 part-pair NN problems run as TWO vmapped grouped-kernel
    calls (batch = kernel grid dimension, group id = part label within the
    example) -- nothing materializes the (Nh, No) distance matrix the
    torch version builds per part pair, and each example only sweeps its
    own references.
    """
    _BIG = 1e10
    B, Nh = df_hum_o.shape
    No = df_obj_h.shape[1]
    P = SMPL_PARTS_NUM
    mask_h = df_hum_o < thresh  # (B, Nh)
    mask_o = df_obj_h < thresh  # (B, No)
    any_h = mask_h.any(axis=1, keepdims=True)
    any_o = mask_o.any(axis=1, keepdims=True)
    eff_h = jnp.where(any_h, mask_h, True)  # fall back to all points
    eff_o = jnp.where(any_o, mask_o, True)
    # an example with no contacts on either side contributes nothing
    example_on = (any_h | any_o)[:, 0]  # (B,)

    # vmap over examples: the kernel batches via an extra grid dimension,
    # so all B x 14 part-pair NN problems are still ONE launch but each
    # example only sweeps its own references (B*N*M work, not B^2*N*M as a
    # flattened batch-offset grouping would)
    gh = jnp.broadcast_to(part_labels_h[None], (B, Nh))  # (B, Nh)
    go = part_labels_o  # (B, No)
    d_h, _ = jax.vmap(
        lambda x, y, ym, xg, yg: nn_sqdist(x, y, y_mask=ym, x_group=xg,
                                           y_group=yg)
    )(smpl_verts, obj_points, eff_o, gh, go)
    d_o, _ = jax.vmap(
        lambda x, y, ym, xg, yg: nn_sqdist(x, y, y_mask=ym, x_group=xg,
                                           y_group=yg)
    )(obj_points, smpl_verts, eff_h, go, gh)

    part_ids = jnp.arange(P)
    hm = eff_h[..., None] & (part_labels_h[None, :, None] == part_ids)
    om = eff_o[..., None] & (part_labels_o[..., None] == part_ids)
    nx = hm.sum(1)  # (B, P)
    ny = om.sum(1)
    valid = (nx > 0) & (ny > 0) & example_on[:, None]
    # zero the sentinel of unmatched queries (their (b, part) pair is
    # invalid anyway -- valid pairs have partners on both sides)
    dh_ok = jnp.where(d_h < 0.5 * _BIG, d_h, 0.0)
    do_ok = jnp.where(d_o < 0.5 * _BIG, d_o, 0.0)
    # HIGHEST: these lower to dot_general, and a single bf16 pass would
    # truncate the squared distances feeding early_stop_rel comparisons
    lx = jnp.einsum("bn,bnp->bp", dh_ok, hm.astype(d_h.dtype),
                    precision=jax.lax.Precision.HIGHEST)
    ly = jnp.einsum("bn,bnp->bp", do_ok, om.astype(d_o.dtype),
                    precision=jax.lax.Precision.HIGHEST)
    pair = lx / jnp.maximum(nx, 1) + ly / jnp.maximum(ny, 1)
    pair = jnp.where(valid, pair, 0.0)
    n_pairs = jnp.sum(valid)
    return jnp.where(
        n_pairs > 0, jnp.sum(pair) / jnp.maximum(n_pairs, 1), 0.0
    )


def vertex_normals(verts, faces):
    """(B, V, 3) area-weighted outward vertex normals from shared faces."""
    v0 = verts[:, faces[:, 0]]
    v1 = verts[:, faces[:, 1]]
    v2 = verts[:, faces[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)  # (B, F, 3), area-weighted

    def accumulate(fn_b):
        out = jnp.zeros_like(verts[0])
        for i in range(3):
            out = out.at[faces[:, i]].add(fn_b)
        return out

    n = jax.vmap(accumulate)(fn)
    return n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-12)


def collision_signed(smpl_verts, smpl_normals, obj_points, k=1):
    """Per-point signed distance approximation to the SMPL surface.

    k=1 (the default): signed distance to the tangent plane of the nearest
    SMPL vertex — a discrete pseudonormal test. Validated against an exact
    winding-number + BVH oracle on convex, concave (torus inner ring) and
    thin-slab scenes in tests/test_collision_oracle.py: sign accuracy
    0.97-0.999, penetration-depth correlation >= 0.97. k>1 combines the k
    nearest planes with inverse-distance weights; measured WORSE than k=1
    on every scene (averaging planes of differently-oriented neighbors
    blurs the sign boundary), so it exists only for that measurement.
    Nearest indices are non-differentiable (matching the reference's
    no_grad BVH search, recon_fit_base.py:620-631); gradients flow through
    both the object points and the SMPL surface.

    Returns (B, No) signed values: negative = inside.
    """
    def knn(q, r):
        # expanded sqdist needs HIGHEST precision (distance cancellation,
        # see CLAUDE.md); the (No, V) matrix lives only inside this
        # stop_gradient forward — no backward copy is kept
        d2 = (
            jnp.sum(q * q, -1)[:, None]
            + jnp.sum(r * r, -1)[None, :]
            - 2.0 * jnp.matmul(q, r.T,
                               precision=jax.lax.Precision.HIGHEST)
        )
        _, idx = jax.lax.top_k(-d2, k)
        return idx  # (No, k)

    if k == 1:
        # fused Pallas 1-NN: never materializes the (No, V) matrix
        idx = jax.vmap(lambda q, r: nn_sqdist(q, r)[1])(
            obj_points, smpl_verts
        )[..., None]
    else:
        idx = jax.vmap(knn)(obj_points, smpl_verts)  # (B, No, k)
    idx = jax.lax.stop_gradient(idx)
    v_nn = jnp.take_along_axis(
        smpl_verts[:, :, None], idx[..., None], axis=1
    )  # (B, No, k, 3)
    n_nn = jnp.take_along_axis(smpl_normals[:, :, None], idx[..., None],
                               axis=1)
    rel = obj_points[:, :, None] - v_nn  # (B, No, k, 3)
    plane = jnp.sum(rel * n_nn, axis=-1)  # (B, No, k)
    if k == 1:
        # the inverse-distance weights cancel at k=1 but their norm(rel)
        # has a NaN VJP at rel=0 (an object point bitwise-equal to its
        # nearest vertex) — skip them entirely on the production path
        return plane[..., 0]
    w = 1.0 / (jnp.sqrt(jnp.sum(rel * rel, axis=-1) + 1e-12) + 1e-6)
    return jnp.sum(plane * w, axis=-1) / jnp.sum(w, axis=-1)


def collision_loss(smpl_verts, smpl_normals, obj_points, k=1):
    """Penetration penalty: mean s^2 over points inside the body
    (s < 0 from collision_signed, oracle-validated); BVH-free stand-in
    for the reference's torch-mesh-isect conic penetration field
    (recon_fit_base.py:610-639)."""
    signed = collision_signed(smpl_verts, smpl_normals, obj_points, k=k)
    pen = jnp.minimum(signed, 0.0)
    return jnp.mean(pen**2)
