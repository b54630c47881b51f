"""GT generation: boundary-sampled unsigned distance fields.

TPU-native rewrite of the reference BoundarySampler (reference:
preprocess/boundary_sampler.py:19-180): per sigma, sample the combined
human+object surface, perturb with Gaussian noise, add 1% uniform grid
samples in the fixed scene bounds, then compute
  * exact UDF to the SMPL mesh and to the object mesh,
  * 14-way part labels via nearest SMPL vertex,
  * object PCA axes, SMPL center (pelvis) and object center.

The igl.signed_distance CPU calls (the reference's bottleneck -- two exact
mesh distance queries over ~100k points per sigma) become the tiled
point_mesh_udf jitted on device.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from chore_tpu import native
from chore_tpu.ops.point_mesh import point_mesh_udf
from chore_tpu.smpl.assets import load_landmark_regressors, load_part_labels
from chore_tpu.smpl.const import BODY25_PELVIS
from chore_tpu.utils.meshio import pca_axes, sample_surface

# fixed scene bounds (reference: boundary_sampler.py:173-180)
BOUNDS_MIN = np.array([-3.0, -0.9, 0.2])
BOUNDS_MAX = np.array([3.0, 1.80, 4.0])

# left<->right part swap for mirrored data (boundary_sampler.py:75-97)
_FLIP_MAP = {1: 6, 2: 7, 3: 8, 4: 9, 5: 10, 12: 13,
             6: 1, 7: 2, 8: 3, 9: 4, 10: 5, 13: 12}


def flip_part_labels(parts):
    out = parts.copy()
    for src, dst in _FLIP_MAP.items():
        out[parts == src] = dst
    return out


class BoundarySampler:
    def __init__(self, assets_dir=None, seed=0, backend="auto"):
        """backend: 'native' (BVH, O(log F)/query on host), 'device'
        (tiled dense kernel on the accelerator), or 'auto' (native when the
        toolchain-built library is available)."""
        self.part_labels = load_part_labels(assets_dir)  # (6890,)
        self.body25_reg = load_landmark_regressors(assets_dir)["body25"]
        self.rng = np.random.RandomState(seed)
        if backend == "auto":
            backend = "native" if native.available() else "device"
        if backend == "native" and not native.available():
            raise RuntimeError("native backend requested but unavailable")
        self.backend = backend

    def _udf(self, samples, verts, faces):
        if self.backend == "native":
            return native.point_mesh_udf(samples, verts, faces)
        d, vidx = point_mesh_udf(
            jnp.asarray(samples), jnp.asarray(verts), jnp.asarray(faces)
        )
        return np.asarray(d), np.asarray(vidx)

    def boundary_sampling(self, smpl_v, smpl_f, obj_v, obj_f, sigma,
                          sample_num, grid_ratio=0.01):
        """One sigma level -> (points, d_h, d_o, parts)
        (reference: boundary_sampler.py:23-73)."""
        # surface samples of the combined mesh, area-weighted
        comb_v = np.concatenate([smpl_v, obj_v], 0)
        comb_f = np.concatenate([obj_f + len(smpl_v), smpl_f], 0)
        seed = int(self.rng.randint(1 << 31))
        surf = sample_surface(comb_v, comb_f, sample_num, seed=seed)
        pts = surf + sigma * self.rng.randn(sample_num, 3).astype(np.float32)
        n_grid = int(grid_ratio * sample_num)
        grid = (self.rng.rand(n_grid, 3)
                * (BOUNDS_MAX - BOUNDS_MIN) + BOUNDS_MIN).astype(np.float32)
        samples = np.concatenate([pts, grid], 0)

        d_h, vidx = self._udf(samples, smpl_v, smpl_f)
        d_o, _ = self._udf(samples, obj_v, obj_f)
        parts = self.part_labels[np.asarray(vidx)]
        return samples, np.asarray(d_h), np.asarray(d_o), parts

    def boundary_sample_all(self, smpl_v, smpl_f, obj_v, obj_f, sigmas,
                            ratios, sample_num, grid_ratio=1 / 16.0,
                            flip=False, min_samples=10000):
        """All sigma levels + PCA/centers -> npz-ready dict
        (reference: boundary_sampler.py:105-156)."""
        out_points, out_dh, out_do, out_parts = {}, {}, {}, {}
        for s, r in zip(sigmas, ratios):
            n = max(int(r * sample_num), min_samples)
            pts, dh, do, parts = self.boundary_sampling(
                smpl_v, smpl_f, obj_v, obj_f, s, n, grid_ratio
            )
            if flip:
                parts = flip_part_labels(parts)
            key = f"sigma{s}"
            out_points[key] = pts.astype(np.float32)
            out_dh[key] = dh.astype(np.float32)
            out_do[key] = do.astype(np.float32)
            out_parts[key] = parts.astype(np.uint8)

        body_kpts = self.body25_reg @ smpl_v  # (25, 3)
        return {
            "points": out_points,
            "dist_h": out_dh,
            "dist_o": out_do,
            "parts": out_parts,
            "pca_axis": pca_axes(obj_v),
            "smpl_center": body_kpts[BODY25_PELVIS].astype(np.float32),
            "body_kpts": body_kpts.astype(np.float32),
            "obj_center": obj_v.mean(0).astype(np.float32),
        }
