"""Visualization: render reconstructed meshes over the input photo.

Equivalent of the reference's NrWrapper/demo overlay path (reference:
utils/render_utils.py:20-267): a front render under the Kinect camera, an
optional side view, and ``align_to_input`` which un-crops/un-scales the
full-view render back onto the original photo using the saved crop info.

Rendering uses ops.rasterizer.hard_rasterize (z-buffer face indices) +
flat lambertian shading on host -- no CUDA renderer.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from chore_tpu.ops.camera import KINECT_CX, KINECT_CY, KINECT_FX, KINECT_FY
from chore_tpu.ops.rasterizer import hard_rasterize, project_unit_k
from chore_tpu.data.test_data import MEAN_CROP_CENTER


def kinect_unit_k():
    """Kinect color intrinsics in unit coords of the 2048-wide image.
    Note v is normalized by the 1536 height (4:3)."""
    return np.array(
        [[KINECT_FX, 0, KINECT_CX],
         [0, KINECT_FY * 2048 / 1536, KINECT_CY * 2048 / 1536],
         [0, 0, 1]], np.float32,
    )


def look_at_side(verts, angle_deg=90.0, center=None):
    """Rotate the scene for a side view around the y axis through its
    center (reference: render_utils.py:190-199 side renderer)."""
    c = verts.mean(0) if center is None else center
    a = np.deg2rad(angle_deg)
    r = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                  [-np.sin(a), 0, np.cos(a)]], np.float32)
    return (verts - c) @ r.T + c


def render_meshes(mesh_list, colors, image_size=512, K=None,
                  light_dir=(0.3, -0.5, -0.8), background=None,
                  textures=None, ambient=0.4, directional=0.6):
    """Lambertian render of several meshes under the Kinect camera: one
    z-buffer pass across all meshes, flat color or texture per mesh
    (reference: render_utils.py:117-143 assembles faces+textures the same
    way for its multi-mesh scenes).

    Args:
      mesh_list: list of (verts (V, 3), faces (F, 3)).
      colors: list of RGB tuples per mesh (used where untextured).
      image_size: output resolution (square; the 4:3 kinect view is
        letterboxed into it via the unit-K normalization).
      K: (3, 3) unit-coord intrinsics; default full-view Kinect.
      textures: optional list parallel to mesh_list; entries are None or
        (uv_faces (F, 3, 2) image coords, texture (H, W, 3) [0, 1]).

    Returns (image (S, S, 3) float [0, 1], mask (S, S) bool).
    """
    K = kinect_unit_k() if K is None else K
    textures = textures or [None] * len(mesh_list)
    all_v, all_f, face_colors, all_uv, tex_id = [], [], [], [], []
    tex_images = []
    off = 0
    for (v, f), c, tx in zip(mesh_list, colors, textures):
        f = np.asarray(f, np.int64)
        all_v.append(np.asarray(v, np.float32))
        all_f.append(f + off)
        face_colors.append(np.tile(np.asarray(c, np.float32), (len(f), 1)))
        if tx is not None:
            uvf, img_tx = tx
            all_uv.append(np.asarray(uvf, np.float32))
            tex_id.append(np.full(len(f), len(tex_images), np.int32))
            tex_images.append(np.asarray(img_tx, np.float32))
        else:
            all_uv.append(np.zeros((len(f), 3, 2), np.float32))
            tex_id.append(np.full(len(f), -1, np.int32))
        off += len(v)
    verts = np.concatenate(all_v, 0)
    faces = np.concatenate(all_f, 0).astype(np.int32)
    fcolors = np.concatenate(face_colors, 0)
    uv_faces = np.concatenate(all_uv, 0)
    tex_id = np.concatenate(tex_id, 0)

    ndc = project_unit_k(jnp.asarray(verts)[None], jnp.asarray(K)[None])
    fi, depth, bary = hard_rasterize(ndc, jnp.asarray(faces),
                                     image_size=image_size)
    fi = np.asarray(fi[0])
    bary = np.asarray(bary[0])
    mask = fi >= 0
    # flat shading from face normals (shared with the textured renderer so
    # lighting changes stay in one place)
    from chore_tpu.utils.textures import face_normals, lighting

    shade = lighting(face_normals(verts, faces), light_dir,
                     ambient=ambient, directional=directional)

    img = (np.zeros((image_size, image_size, 3), np.float32)
           if background is None else background.copy())
    safe_fi = np.clip(fi, 0, len(faces) - 1)
    base = fcolors[safe_fi]
    if tex_images:
        from chore_tpu.utils.textures import sample_uv_colors

        uv_pix = np.einsum("hwk,hwkc->hwc", bary, uv_faces[safe_fi])
        for t, tex in enumerate(tex_images):
            sel = tex_id[safe_fi] == t
            if sel.any():
                base[sel] = sample_uv_colors(tex, uv_pix[sel])
    shaded = base * shade[safe_fi][..., None]
    img[mask] = shaded[mask]
    return img, mask


def align_to_input(render_sq, mask_sq, orig_image, crop_info,
                   use_mean_center=False, alpha=1.0):
    """Paste a full-kinect-view render back onto the original photo
    (reference: render_utils.py:202-267).

    Args:
      render_sq: (S, S, 3) square render of the full 2048x1536 view
        (the 4:3 view occupies the full square -- unit-K normalization).
      mask_sq: (S, S) bool foreground.
      orig_image: (H, W, 3) uint8 original photo.
      crop_info: dict from TestImagePrep (resize_scale, crop_center).
    """
    import cv2

    H, W = orig_image.shape[:2]
    s = crop_info["resize_scale"]
    # render pixel space: 2048 x 1536
    render = cv2.resize(render_sq, (2048, 1536))
    mask = cv2.resize(mask_sq.astype(np.float32), (2048, 1536)) > 0.5
    if use_mean_center:
        # the net input was restaged so crop_center -> mean center; undo
        shift = (np.asarray(crop_info["crop_center"]) - MEAN_CROP_CENTER)
        m = np.float32([[1, 0, shift[0]], [0, 1, shift[1]]])
        render = cv2.warpAffine(render, m, (2048, 1536))
        mask = cv2.warpAffine(mask.astype(np.float32), m, (2048, 1536)) > 0.5
    # crop the region corresponding to the original photo and resize back
    rw, rh = int(round(W * s)), int(round(H * s))
    render = cv2.resize(render[:rh, :rw], (W, H))
    mask = cv2.resize(mask[:rh, :rw].astype(np.float32), (W, H)) > 0.5
    out = orig_image.astype(np.float32) / 255.0
    out[mask] = (1 - alpha) * out[mask] + alpha * render[mask]
    return (out * 255).astype(np.uint8)
