"""Training dataset over preprocessed boundary-sample npz files.

Mirrors the reference BehaveDataset (reference: data/train_data.py:9-150):
per item, subsample ``total_samplenum`` points from the per-sigma boundary
samples at the release ratios, attach UDFs/parts/PCA/centers, and build the
5-channel 512^2 crop around the mask-union bbox center.

Output arrays are channels-last and batch-ready for
``parallel.shard_batch``.
"""
from __future__ import annotations

import numpy as np

from chore_tpu.data import image_ops as iops


class BehaveTrainData:
    def __init__(self, data_paths, phase="train",
                 total_samplenum=20000,
                 image_size=(512, 512),
                 ratios=(0.01, 0.49, 0.5),
                 sigmas=(0.08, 0.02, 0.003),
                 random_flip=False,
                 aug_blur=0.0,
                 crop_size=1200,
                 z0=2.2,
                 seed=0):
        assert phase in ("train", "val", "test")
        self.data_paths = list(data_paths)
        self.phase = phase
        self.img_size = tuple(image_size)
        self.crop_size = np.array([crop_size, crop_size])
        self.total_sample_num = total_samplenum
        self.sample_nums = [int(total_samplenum * r) for r in ratios]
        self.sigmas = list(sigmas)
        self.random_flip = random_flip
        self.aug_blur = aug_blur
        self.z0 = z0
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch):
        """Vary per-item sampling across epochs (called by the loader)."""
        self.epoch = int(epoch)

    def _item_rng(self, idx):
        """Per-item RandomState: deterministic in (seed, epoch, idx) and
        safe under concurrent thread/process workers (a shared mutable
        RandomState is not thread-safe)."""
        return np.random.RandomState(
            (self.seed * 1_000_003 + self.epoch * 7919 + idx) % (2**31 - 1)
        )

    def __len__(self):
        return len(self.data_paths)

    def get_item(self, idx):
        rng = self._item_rng(idx)
        path = self.data_paths[idx]
        flip = bool(self.phase == "train" and self.random_flip
                    and rng.rand() > 0.5)
        if flip:
            # mirrored GT with swapped left/right part labels
            # (train_data.py:49-54)
            path = path.replace(".npz", "_flip.npz")
        data = np.load(path, allow_pickle=True)
        res = self.get_samples(data, rng)
        images, center = self.prepare_image_crop(data, flip, rng)
        res["images"] = images
        res["crop_center"] = center.astype(np.float32)
        res["path"] = path
        return res

    def __getitem__(self, idx):
        """Retry-on-exception with a random other sample
        (reference: base_data.py:29-39). Each attempt draws from an
        attempt-salted RNG — re-deriving from the SAME (seed, epoch, idx)
        would redraw the identical replacement forever when it also fails
        (deterministic infinite recursion); a bounded loop keeps a fully
        corrupt dataset a loud error instead of a hang."""
        cur = idx
        for attempt in range(100):
            try:
                return self.get_item(cur)
            except Exception as e:  # noqa: BLE001
                rng = np.random.RandomState(
                    (self.seed * 1_000_003 + self.epoch * 7919 + idx
                     + 104_729 * (attempt + 1)) % (2**31 - 1))
                ridx = int(rng.randint(0, len(self.data_paths)))
                print(f"failed on {self.data_paths[cur]} ({e}), "
                      f"retrying {self.data_paths[ridx]}")
                cur = ridx
        raise RuntimeError(
            f"100 consecutive sample failures starting at index {idx}; "
            "the dataset looks unreadable")

    def get_samples(self, data, rng=None):
        """Per-sigma subsampling (reference: train_data.py:69-113)."""
        rng = rng if rng is not None else np.random
        points, dfs_h, dfs_o, parts = [], [], [], []
        for sigma, n in zip(self.sigmas, self.sample_nums):
            key = f"sigma{sigma}"
            pts = data["points"].item()[key]
            choice = rng.choice(pts.shape[0], n, replace=False)
            points.append(pts[choice])
            dfs_h.append(data["dist_h"].item()[key][choice])
            dfs_o.append(data["dist_o"].item()[key][choice])
            parts.append(data["parts"].item()[key][choice])
        points = np.concatenate(points, 0).astype(np.float32)

        body_center = data["smpl_center"].astype(np.float32)
        assert abs(body_center[2] - self.z0) < 1e-5, (
            f"invalid smpl center {body_center}"
        )
        obj_center = data["obj_center"].astype(np.float32) - body_center
        # per-image GT, shipped compact; chore_losses broadcasts over the
        # point axis (the reference tiles to (3,3,N), train_data.py:94-103)
        pca = np.asarray(data["pca_axis"], np.float32)  # (3, 3)
        return {
            "points": points,
            "df_h": np.concatenate(dfs_h, 0).astype(np.float32),
            "df_o": np.concatenate(dfs_o, 0).astype(np.float32),
            "parts": np.concatenate(parts, 0).astype(np.int32),
            "pca": pca,
            "body_center": body_center,
            "obj_center": obj_center,
        }

    def prepare_image_crop(self, data, flip, rng=None):
        """Crop 1200^2 around the mask-union bbox center, resize to 512^2,
        compose RGBM3 (reference: train_data.py:115-149).

        Emits uint8 (the quantization cv2's uint8 resize already imposed);
        ``CHOREField`` normalizes integer images to [0,1] on device, so the
        per-batch host->device transfer is 4x smaller with bitwise-identical
        training math (see image_ops.compose_rgbm3_u8)."""
        rgb_file = str(data["image_file"])
        person_mask, obj_mask = iops.load_masks(rgb_file, flip)
        bmin, bmax = iops.masks2bbox([person_mask, obj_mask])
        center = (bmin + bmax) // 2
        ih, iw = person_mask.shape[:2]
        assert 0 < center[0] < iw and 0 < center[1] < ih, (
            f"invalid crop center {center} for {rgb_file}"
        )
        rgb = iops.load_rgb(rgb_file, flip, self.aug_blur, rng)
        rgb = iops.resize(iops.crop(rgb, center, self.crop_size),
                          self.img_size)
        pm = iops.resize(iops.crop(person_mask, center, self.crop_size),
                         self.img_size)
        om = iops.resize(iops.crop(obj_mask, center, self.crop_size),
                         self.img_size)
        return iops.compose_rgbm3_u8(om, pm, rgb), center
