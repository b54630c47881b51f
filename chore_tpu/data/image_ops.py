"""Host-side image operations for the data pipeline (numpy/cv2/PIL).

Mirrors the reference's BaseDataset image ops (reference:
data/base_data.py:71-192): mask loading with filename fallbacks, mask-union
bbox via contours, center crop with zero padding, aspect-checked resize, and
the 5-channel RGBM3 composition (background-removed RGB + person mask +
object mask). These stay on host -- they are IO-bound and feed the device
pipeline as plain numpy.
"""
from __future__ import annotations

import os.path as osp

import cv2
import numpy as np
from PIL import Image


def mask_paths_for(rgb_file):
    """Person/object mask paths with the reference's fallback chain
    (base_data.py:71-79)."""
    person = rgb_file.replace(".color.jpg", ".person_mask.jpg")
    if not osp.isfile(person):
        person = rgb_file.replace(".color.jpg", ".person_mask.png")
    obj = rgb_file.replace(".color.jpg", ".obj_rend_mask.jpg")
    if not osp.isfile(obj):
        obj = rgb_file.replace(".color.jpg", ".obj_mask.jpg")
        if not osp.isfile(obj):
            obj = rgb_file.replace(".color.jpg", ".obj_mask.png")
    return person, obj


def load_masks(rgb_file, flip=False):
    person_file, obj_file = mask_paths_for(rgb_file)
    person = cv2.imread(person_file, cv2.IMREAD_GRAYSCALE)
    obj = cv2.imread(obj_file, cv2.IMREAD_GRAYSCALE)
    if person is None or obj is None:
        raise FileNotFoundError(f"masks missing for {rgb_file}")
    if flip:
        person = person[:, ::-1]
        obj = obj[:, ::-1]
    return person, obj


def load_rgb(rgb_file, flip=False, blur_sigma=0.0, rng=None):
    rgb = np.array(Image.open(rgb_file))
    if flip:
        rgb = rgb[:, ::-1]
    if blur_sigma > 1e-6:
        rng = rng or np.random
        s = float(rng.uniform(0, blur_sigma)) * 255.0
        if s > 0:
            k = int(2 * round(3 * s) + 1)
            rgb = cv2.GaussianBlur(rgb, (k, k), s)
    return rgb


def masks2bbox(masks, thres=127):
    """(bmin, bmax) xyxy of the union of masks via contours
    (base_data.py:95-113)."""
    comb = np.zeros_like(masks[0], dtype=np.int32)
    for m in masks:
        comb += m
    comb = np.clip(comb, 0, 255).astype(np.uint8)
    _, threshed = cv2.threshold(comb, thres, 255, cv2.THRESH_BINARY)
    contours, _ = cv2.findContours(threshed, cv2.RETR_TREE,
                                   cv2.CHAIN_APPROX_SIMPLE)
    bmin = np.array([50000, 50000])
    bmax = np.array([-100, -100])
    for c in contours:
        x, y, w, h = cv2.boundingRect(c)
        bmin = np.minimum(bmin, [x, y])
        bmax = np.maximum(bmax, [x + w, y + h])
    return bmin, bmax


def crop(img, center, crop_size):
    """Crop a (crop_size x crop_size) patch around center, zero-padded at
    borders (base_data.py:131-162 -- including its (w-1, h-1) clamping)."""
    h, w = img.shape[:2]
    size = np.broadcast_to(np.asarray(crop_size), (2,))
    topleft = np.round(np.asarray(center) - size / 2).astype(int)
    bottomright = np.round(np.asarray(center) + size / 2).astype(int)
    x1, y1 = max(0, topleft[0]), max(0, topleft[1])
    x2, y2 = min(w - 1, bottomright[0]), min(h - 1, bottomright[1])
    cropped = img[y1:y2, x1:x2]
    p1 = max(0, -topleft[0])
    p2 = max(0, -topleft[1])
    p3 = max(0, bottomright[0] - w + 1)
    p4 = max(0, bottomright[1] - h + 1)
    pad = [[p2, p4], [p1, p3]] + ([[0, 0]] if img.ndim == 3 else [])
    return np.pad(cropped, pad)


def resize(img, img_size, mode=cv2.INTER_LINEAR):
    """Aspect-ratio-checked resize to (width, height)
    (base_data.py:164-177)."""
    h, w = img.shape[:2]
    assert abs(w / h - img_size[0] / img_size[1]) < 1e-6, (
        f"aspect mismatch: image {img.shape} vs target {img_size}"
    )
    return cv2.resize(img, tuple(img_size), interpolation=mode)


def compose_rgbm3(obj_mask, person_mask, rgb):
    """5-channel net input: background-removed RGB + person + object masks
    (base_data.py:179-192). All inputs in [0, 1]; returns (H, W, 5)
    channels-last (the TPU layout; the reference transposes to CHW)."""
    comb = (person_mask > 0.5) | (obj_mask > 0.5)
    rgb = rgb * comb[..., None]
    return np.dstack([rgb, person_mask, obj_mask]).astype(np.float32)


def compose_rgbm3_u8(obj_mask, person_mask, rgb):
    """uint8 variant of ``compose_rgbm3`` for host->device transport.

    The float path divides cv2's uint8 crop/resize output by 255, so every
    channel is exactly k/255-quantized; shipping the uint8 ``k`` and
    normalizing on device (``CHOREField`` accepts integer images) is
    bitwise-lossless and cuts the batch transfer 4x — the training
    input-pipeline bottleneck on remote-device backends. Threshold 127
    matches the float path's ``> 0.5`` (k/255 > 0.5 <=> k >= 128)."""
    comb = (person_mask > 127) | (obj_mask > 127)
    rgb = rgb * comb[..., None].astype(np.uint8)
    return np.dstack([rgb, person_mask, obj_mask]).astype(np.uint8)
