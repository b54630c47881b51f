"""Perspective camera with crop-local normalization.

Reproduces the semantics of the reference's Kinect color camera
(reference: model/camera.py:24-88): normalized intrinsics are scaled to
pixel space of a 4:3 image, points are projected pin-hole style, then
re-centered on a crop square of size ``crop_size`` and mapped to [-1, 1].

All functions are pure and jit/vmap-friendly; the camera itself is a small
frozen dataclass of static floats (hashable -> usable as a static arg).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

# Kinect color-camera intrinsics normalized by the 2048px image width
# (reference: model/camera.py:26-38).
KINECT_FX = 979.7844 / 2048.0
KINECT_FY = 979.840 / 2048.0
KINECT_CX = 1018.952 / 2048.0
KINECT_CY = 779.486 / 2048.0
DEFAULT_IMAGE_SIZE = 2048
DEFAULT_CROP_SIZE = 1200
# Fixed SMPL-center depth every training example is rescaled to
# (reference: preprocess/preprocess_scale.py:66-83, config z_0).
Z0 = 2.2


@dataclasses.dataclass(frozen=True)
class PerspectiveCamera:
    """Pin-hole camera with normalized intrinsics + crop bookkeeping."""

    crop_size: float = DEFAULT_CROP_SIZE
    fx: float = KINECT_FX
    fy: float = KINECT_FY
    cx: float = KINECT_CX
    cy: float = KINECT_CY
    image_size: int = DEFAULT_IMAGE_SIZE

    @property
    def width(self) -> int:
        return self.image_size

    @property
    def height(self) -> int:
        return int(self.image_size * 0.75)

    @property
    def fx_px(self) -> float:
        return self.fx * self.image_size

    @property
    def fy_px(self) -> float:
        return self.fy * self.image_size

    @property
    def cx_px(self) -> float:
        return self.cx * self.image_size

    @property
    def cy_px(self) -> float:
        return self.cy * self.image_size

    def project_screen(self, points, crop_center=None):
        """Project (..., N, 3) camera-space points to original pixel space.

        If ``crop_center`` (B, 2) is given, re-center pixels on the crop
        square so (crop_size/2, crop_size/2) maps to the crop center
        (reference: model/camera.py:51-70).

        Returns (px, py), each (..., N, 1).
        """
        x = points[..., 0:1]
        y = points[..., 1:2]
        z = points[..., 2:3]
        # guard the perspective division: optimization transients can push a
        # point through z=0, which must yield huge-but-finite pixels (the
        # in-image mask rejects them), never inf/nan gradients
        z = jnp.where(jnp.abs(z) < 1e-6, jnp.where(z < 0, -1e-6, 1e-6), z)
        px = self.fx_px * x / z + self.cx_px
        py = self.fy_px * y / z + self.cy_px
        if crop_center is not None:
            px = self.crop_size / 2.0 + px - crop_center[..., 0:1][..., None, :]
            py = self.crop_size / 2.0 + py - crop_center[..., 1:2][..., None, :]
        return px, py

    def normalize_crop(self, px, py, crop_center):
        """Map original-image pixels into crop-local [-1, 1] coordinates.

        (reference: model/camera.py:72-82)
        """
        px = self.crop_size / 2.0 + px - crop_center[..., 0:1][..., None, :]
        py = self.crop_size / 2.0 + py - crop_center[..., 1:2][..., None, :]
        nx = 2.0 * px / self.crop_size - 1.0
        ny = 2.0 * py / self.crop_size - 1.0
        return nx, ny

    def project_points(self, points, crop_center=None):
        """Project (B, N, 3) points -> (B, N, 3) [nx, ny, z] normalized coords.

        Matches the reference's ``project_points`` (model/camera.py:44-49)
        except for the output layout: we keep channels-last (B, N, 3) which is
        the natural TPU layout; the reference transposes to (B, 3, N).
        """
        px, py = self.project_screen(points)
        if crop_center is None:
            nx = 2.0 * px / self.width - 1.0
            ny = 2.0 * py / self.height - 1.0
        else:
            nx, ny = self.normalize_crop(px, py, crop_center)
        return jnp.concatenate([nx, ny, points[..., 2:3]], axis=-1)


@dataclasses.dataclass(frozen=True)
class OrthographicCamera:
    """Approximate orthographic camera (reference: model/camera.py:91-99
    ``KinectOrthCamera`` — defined but unused by the release pipeline).

    Assumes points are already expressed relative to the SMPL center in
    normalized units; ``project_points`` is the identity on xy with depth
    passed through. ``scale`` shrinks the person so the object fits the
    frame (the reference stores but never applies it — kept for schema
    parity). Note the reference's __init__ ignores its ``loadSize``
    argument and hardcodes 512 (model/camera.py:93 — likely a reference
    bug); we store the caller's value, a documented deviation that is
    inert in the release pipeline (the class is dead code there too).
    Output stays channels-last (B, N, 3); the reference transposes to
    (B, 3, N).
    """

    load_size: int = 512
    scale: float = 0.75

    def project_points(self, points, crop_center=None):
        del crop_center  # orthographic: no crop-dependent re-centering
        return jnp.asarray(points)
