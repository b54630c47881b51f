"""Occlusion-aware differentiable silhouette loss on an ROI (PHOSA-style).

TPU-native rewrite of SilLossROI (reference: recon/obj_pose_roi.py:20-199).
Host-side preparation (numpy/cv2: mask -> square bbox with 30% expansion,
crop-and-resize of the object/person masks to 256^2, per-example ROI
intrinsics, edge distance transform) runs once per batch; the loss itself is
a jitted soft-silhouette render + masked L2 against the reference mask.

The detectron2 BitMasks.crop_and_resize (ROIAlign) is replaced by cv2
resize of the cropped region; the neural_renderer CUDA rasterizer by
ops.rasterizer.soft_silhouette.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from chore_tpu.ops.camera import (
    DEFAULT_IMAGE_SIZE,
    KINECT_CX,
    KINECT_CY,
    KINECT_FX,
    KINECT_FY,
)
from chore_tpu.ops.rasterizer import project_unit_k, soft_silhouette

KINECT_W = float(DEFAULT_IMAGE_SIZE)
FX, FY = KINECT_FX, KINECT_FY
CX, CY = KINECT_CX, KINECT_CY


def mask_to_square_bbox(mask, expansion=0.3):
    """Object mask (H, W) in net-input space -> square bbox (x, y, size)
    with 30% expansion (reference: obj_pose_roi.py:37-41 + bbox.py)."""
    ys, xs = np.where(mask > 0.5)
    if len(xs) == 0:
        raise ValueError("empty object mask")
    x0, x1 = xs.min(), xs.max() + 1
    y0, y1 = ys.min(), ys.max() + 1
    w, h = x1 - x0, y1 - y0
    size = max(w, h) * (1.0 + expansion)
    cx, cy = x0 + w / 2.0, y0 + h / 2.0
    return np.array([cx - size / 2.0, cy - size / 2.0, size, size])


def crop_resize(mask, bbox, out_size):
    """Crop bbox (x, y, w, h) from mask and resize to out_size^2 (bilinear
    on a padded canvas; replaces BitMasks.crop_and_resize)."""
    import cv2

    x, y, w, h = bbox
    H, W = mask.shape
    pad = int(np.ceil(max(w, h))) + 2
    canvas = np.zeros((H + 2 * pad, W + 2 * pad), np.float32)
    canvas[pad : pad + H, pad : pad + W] = mask
    x0, y0 = int(round(x)) + pad, int(round(y)) + pad
    s = int(round(w))
    crop = canvas[y0 : y0 + s, x0 : x0 + s]
    return cv2.resize(crop, (out_size, out_size), interpolation=cv2.INTER_LINEAR)


def compute_k_roi(bbox_orig, kinect_width=KINECT_W):
    """ROI intrinsics in unit coords (reference: obj_pose_roi.py:114-131)."""
    x, y, b, _ = bbox_orig
    fx_ = FX * kinect_width / b
    fy_ = FY * kinect_width / b
    cx_ = (CX * kinect_width - x) / b
    cy_ = (CY * kinect_width - y) / b
    return np.array([[fx_, 0, cx_], [0, fy_, cy_], [0, 0, 1]], np.float32)


def edge_distance_transform(mask, kernel_size=7, power=0.25):
    """edt^(2*power) of the silhouette edges (reference:
    obj_pose_roi.py:88-101); edges via maxpool - mask."""
    import cv2
    from scipy.ndimage import distance_transform_edt

    kernel = np.ones((kernel_size, kernel_size), np.uint8)
    dil = cv2.dilate((mask > 0.5).astype(np.uint8), kernel)
    edges = dil.astype(np.float32) - (mask > 0.5).astype(np.float32)
    edt = distance_transform_edt(1 - (edges > 0)) ** (power * 2)
    return edt.astype(np.float32)


class SilhouetteLossROI:
    """Build once per batch from net-input person/object masks.

    Args:
      person_masks, obj_masks: (B, S, S) float arrays (net-input channels 3/4).
      template_verts: (Vt, 3) centered object template vertices.
      template_faces: (Ft, 3) int faces.
      crop_centers: (B, 2) crop centers in original 2048p image pixels.
      crop_size: training crop size (1200); net_input: 512.
    """

    def __init__(self, person_masks, obj_masks, template_verts, template_faces,
                 crop_centers, rend_size=256, crop_size=1200, net_input=512,
                 bbox_expansion=0.3, compute_edt=False):
        B = person_masks.shape[0]
        scale = crop_size / float(net_input)  # obj_pose_roi.py:51
        k_rois, keep_masks, image_refs, edts = [], [], [], []
        for i in range(B):
            try:
                bbox = mask_to_square_bbox(np.asarray(obj_masks[i]),
                                           bbox_expansion)
            except ValueError:
                # fully occluded/missing object mask: neutralize this
                # frame's silhouette term (keep=0 -> zero loss) instead of
                # killing the whole batch
                S = obj_masks[i].shape[0]
                image_refs.append(np.zeros((rend_size, rend_size), np.float32))
                keep_masks.append(np.zeros((rend_size, rend_size), np.float32))
                k_rois.append(compute_k_roi(
                    np.array([0.0, 0.0, KINECT_W, KINECT_W])))
                edts.append(np.zeros((rend_size, rend_size), np.float32))
                continue
            obj_crop = crop_resize(np.asarray(obj_masks[i]), bbox, rend_size)
            ps_crop = crop_resize(np.asarray(person_masks[i]), bbox, rend_size)
            # keep mask: 1 everywhere except person-occluded (non-object)
            # pixels (reference cvt_masks: mask_inv >= 0,
            # obj_pose_roi.py:133-146)
            fore = obj_crop > 0.5
            person = ps_crop > 0.5
            keep = (~person) | fore
            image_refs.append(fore.astype(np.float32))
            keep_masks.append(keep.astype(np.float32))
            bbox_orig = bbox * scale
            bbox_orig[:2] += np.asarray(crop_centers[i]) - crop_size / 2.0
            k_rois.append(compute_k_roi(bbox_orig))
            edts.append(edge_distance_transform(fore.astype(np.float32))
                        if compute_edt
                        else np.zeros((rend_size, rend_size), np.float32))
        # host-side numpy; consumers pass .data through their jitted fns
        self.data = {
            "image_ref": np.stack(image_refs),
            "keep_mask": np.stack(keep_masks),
            "edt_ref": np.stack(edts),
            "k_rois": np.stack(k_rois),
        }
        self.verts = np.asarray(template_verts, np.float32)
        self.faces = np.asarray(template_faces, np.int32)
        self.rend_size = rend_size

    def __call__(self, R, t, s):
        return silhouette_loss(self.data, self.verts, self.faces, R, t, s,
                               self.rend_size)

    @property
    def image_ref(self):
        return self.data["image_ref"]

    @property
    def keep_mask(self):
        return self.data["keep_mask"]

    @property
    def k_rois(self):
        return self.data["k_rois"]

    @property
    def edt_ref(self):
        return self.data["edt_ref"]


def silhouette_loss(sil_data, template_verts, faces, R, t, s, rend_size=256,
                    sigma=None):
    """Pure silhouette loss: render the transformed template in the ROI and
    compare to the reference mask (reference: obj_pose_roi.py:159-172).

    Args:
      sil_data: dict with image_ref/keep_mask/k_rois (B, ...) arrays
        (from SilhouetteLossROI.data).
      template_verts: (Vt, 3); faces: (Ft, 3).
      R: (B, 3, 3); t: (B, 3); s: (B,).
      sigma: static coverage-sigmoid softness override (None = the
        renderer's half-pixel default); the annealed sil phase passes
        widened values early (see FitConfig.sil_sigma_anneal).

    Returns (loss scalar, rendered (B, S, S)).
    """
    # HIGHEST: bf16 vertex placement shifts rendered edges by ~mm, biasing
    # the silhouette gradient (CLAUDE.md precision rule)
    verts = jnp.einsum("vd,bde->bve", jnp.asarray(template_verts), R,
                       precision=jax.lax.Precision.HIGHEST)
    verts = (verts + t[:, None, :]) * s[:, None, None]
    ndc = project_unit_k(verts, sil_data["k_rois"])
    image = soft_silhouette(ndc, jnp.asarray(faces), image_size=rend_size,
                            sigma=sigma)
    image = sil_data["keep_mask"] * image
    loss = jnp.sum((image - sil_data["image_ref"]) ** 2, axis=(1, 2)).mean()
    return loss, image


def offscreen_loss(sil_data, template_verts, R, t, s, far=100.0):
    """Offscreen-degeneracy penalty (PHOSA's guard): hinge on how far the
    projected object verts leave the ROI frustum, so a bad init cannot
    minimize the mask L2 by drifting out of the crop entirely.

    Equivalent of the reference's defined-but-never-called
    compute_offscreen_loss (reference: recon/obj_pose_roi.py:179-199):
    sum over verts of relu(xy - 1) + relu(-1 - xy) + relu(-z) +
    relu(z - far), batch-meaned. Opt-in via FitConfig.offscreen_guard;
    zero whenever the object projects fully inside the ROI.
    """
    verts = jnp.einsum("vd,bde->bve", jnp.asarray(template_verts), R,
                       precision=jax.lax.Precision.HIGHEST)
    verts = (verts + t[:, None, :]) * s[:, None, None]
    ndc = project_unit_k(verts, sil_data["k_rois"])
    xy, z = ndc[..., :2], ndc[..., 2]
    per_ex = (
        jnp.sum(jnp.maximum(xy - 1.0, 0.0), axis=(1, 2))
        + jnp.sum(jnp.maximum(-1.0 - xy, 0.0), axis=(1, 2))
        + jnp.sum(jnp.maximum(-z, 0.0), axis=1)
        + jnp.sum(jnp.maximum(z - far, 0.0), axis=1)
    )
    return per_ex.mean()
