"""Reconstruction evaluation: Procrustes-aligned bidirectional chamfer.

Equivalent of the reference evaluator (reference: recon/evaluate.py:20-229
+ recon/recon_data.py + recon/eval/*): per frame, gate on object occlusion
(visible/full mask ratio >= 0.30), load GT SMPL+object fits and the
reconstruction, Procrustes-align on the combined vertices (SMPL-only
fallback when vertex counts differ), sample 10k surface points per mesh,
and compute the sqrt bidirectional chamfer. Aggregation: overall, per
sequence and per object category mean±std, written as a timestamped JSON.

The chamfer + alignment math runs jitted on device with static shapes; the
reference instead forks one CPU process per sequence with sklearn KD-trees.
IO (mesh loading, mask gating) overlaps device compute via a thread pool.
"""
from __future__ import annotations

import json
import os
from concurrent.futures import ThreadPoolExecutor
from datetime import datetime
from os.path import basename, isfile, join

import numpy as np

import jax
import jax.numpy as jnp

from chore_tpu import native
from chore_tpu.behave.readers import FrameDataReader
from chore_tpu.ops.chamfer import chamfer_eval
from chore_tpu.ops.procrustes import apply_transform, similarity_transform
from chore_tpu.utils.meshio import load_ply, sample_surface


class ReconDataReader(FrameDataReader):
    """Reader for reconstruction outputs layered on FrameDataReader
    (reference: recon/recon_data.py:15-70). Output convention:
    RECON_ROOT/SEQ/<frame>/<save_name>/k{tid}.smpl.ply|.object.ply."""

    def __init__(self, recon_path, seq, **kw):
        super().__init__(seq, **kw)
        self.recon_path = recon_path

    def get_recon_paths(self, idx, save_name, tid=1):
        folder = join(self.recon_path, self.seq_name,
                      self.frames[idx] if isinstance(idx, int) else idx,
                      save_name)
        return (join(folder, f"k{tid}.smpl.ply"),
                join(folder, f"k{tid}.object.ply"))

    def get_recon(self, idx, save_name, tid=1):
        smpl_f, obj_f = self.get_recon_paths(idx, save_name, tid)
        smpl = load_ply(smpl_f) if isfile(smpl_f) else None
        obj = load_ply(obj_f) if isfile(obj_f) else None
        return smpl, obj


def _aligned_chamfer(gt_smpl, gt_obj, rec_smpl, rec_obj,
                     gt_verts, rec_verts):
    """Jit-side: align recon onto GT via the CORRESPONDING vertex arrays
    (orthogonal Procrustes needs correspondence; GT fits and recon share
    mesh topology, reference: eval/pose_utils.py:19-65), then chamfer the
    surface samples of both meshes."""
    r, t, s = similarity_transform(rec_verts, gt_verts)
    rec_smpl_a = apply_transform(rec_smpl, r, t, s)
    rec_obj_a = apply_transform(rec_obj, r, t, s)
    err_smpl = chamfer_eval(gt_smpl, rec_smpl_a)
    err_obj = chamfer_eval(gt_obj, rec_obj_a)
    return err_smpl, err_obj


class ReconEvaluator:
    def __init__(self, recon_path, behave_path, sample_num=10000,
                 outdir="results", smpl_only=False, occ_ratio=0.30):
        self.recon_path = recon_path
        self.behave_path = behave_path
        self.sample_num = sample_num
        self.outdir = outdir
        self.smpl_only = smpl_only
        self.occ_ratio = occ_ratio
        self.errors_dict = {}
        self._jit_chamfer = jax.jit(_aligned_chamfer)

    # ------------------------------------------------------------------ #
    def eval_frame(self, reader: ReconDataReader, i, save_name, tid):
        obj_mask = reader.get_mask(i, tid, "obj")
        mask_full = reader.get_mask_full(i, tid)
        if obj_mask is None or mask_full is None or mask_full.sum() == 0:
            return None
        if obj_mask.sum() / mask_full.sum() < self.occ_ratio:
            return None
        smpl_fit = reader.get_smplfit(i, "fit02")
        obj_fit = reader.get_objfit(i, "fit01")
        rec_smpl, rec_obj = reader.get_recon(i, save_name, tid)
        if None in (smpl_fit, obj_fit, rec_smpl, rec_obj):
            return None

        def samp(mesh, seed):
            v, f = mesh
            if f is None or len(f) == 0:
                idx = np.random.RandomState(seed).choice(
                    len(v), self.sample_num
                )
                return v[idx]
            if native.available():
                return native.sample_surface(v, f, self.sample_num, seed=seed)
            return sample_surface(v, f, self.sample_num, seed=seed)

        gs, go = samp(smpl_fit, 0), samp(obj_fit, 1)
        rs, ro = samp(rec_smpl, 2), samp(rec_obj, 3)
        same_counts = (smpl_fit[0].shape == rec_smpl[0].shape
                       and obj_fit[0].shape == rec_obj[0].shape)
        if same_counts and not self.smpl_only:
            # combined SMPL+object vertex alignment
            gt_verts = np.concatenate([smpl_fit[0], obj_fit[0]], 0)
            rec_verts = np.concatenate([rec_smpl[0], rec_obj[0]], 0)
        else:
            # SMPL-only fallback (vertex counts differ,
            # eval/pose_utils.py:58-65)
            gt_verts, rec_verts = smpl_fit[0], rec_smpl[0]
        err_s, err_o = self._jit_chamfer(
            jnp.asarray(gs), jnp.asarray(go), jnp.asarray(rs),
            jnp.asarray(ro), jnp.asarray(gt_verts), jnp.asarray(rec_verts))
        return float(err_s), float(err_o)

    def _seq_errors(self, seq, save_name, tid=1):
        """All gated frame errors of one sequence (list of (smpl, obj))."""
        reader = ReconDataReader(self.recon_path, seq, check_image=False)
        errors = []
        with ThreadPoolExecutor(4) as pool:
            futs = [pool.submit(self.eval_frame, reader, i, save_name, tid)
                    for i in range(len(reader))]
            for f in futs:
                r = f.result()
                if r is not None:
                    errors.append(r)
        print(f"{seq} done: {len(errors)} frames")
        return errors

    def eval_seq(self, seq, save_name, tid=1):
        errors = self._seq_errors(seq, save_name, tid)
        if errors:
            self.errors_dict[basename(seq.rstrip("/"))] = np.asarray(errors)

    def eval_seqs(self, seqs, save_name, tid=1, seq_workers=1):
        """Evaluate sequences; ``seq_workers`` > 1 overlaps the mesh IO of
        several sequences (the reference forks one process per sequence,
        evaluate.py:133-147; here threads suffice — the PLY/mask reads are
        the bottleneck and the jitted chamfer is thread-safe and shared,
        so a full-split evaluation is no longer serialized on IO)."""
        self.errors_dict = {}  # fresh per run; repeated calls must not mix
        if seq_workers <= 1:
            for seq in seqs:
                self.eval_seq(seq, save_name, tid)
        else:
            with ThreadPoolExecutor(seq_workers) as pool:
                futs = [(seq, pool.submit(self._seq_errors, seq, save_name,
                                          tid)) for seq in seqs]
                for seq, fut in futs:
                    errors = fut.result()
                    if errors:
                        self.errors_dict[basename(seq.rstrip("/"))] = (
                            np.asarray(errors))
        return self.collect_results(save_name, tid)

    # ------------------------------------------------------------------ #
    @staticmethod
    def _extract_objname(seq_name):
        parts = seq_name.split("_")
        return parts[2] if len(parts) > 2 else seq_name

    @staticmethod
    def _format(errors):
        return {
            "smpl": {"mean": float(np.mean(errors[:, 0])),
                     "std": float(np.std(errors[:, 0]))},
            "obj": {"mean": float(np.mean(errors[:, 1])),
                    "std": float(np.std(errors[:, 1]))},
            "total": int(len(errors)),
        }

    def collect_results(self, save_name, tid):
        """Aggregate + write timestamped JSON
        (reference: evaluate.py:149-203)."""
        if not self.errors_dict:
            return None
        all_errors = np.concatenate(list(self.errors_dict.values()), 0)
        per_seq = {s: self._format(e) for s, e in self.errors_dict.items()}
        per_obj = {}
        for s, e in self.errors_dict.items():
            name = self._extract_objname(s)
            per_obj.setdefault(name, []).append(e)
        result = self._format(all_errors)
        result["separate"] = per_seq
        result["save_name"] = save_name
        ts = datetime.now().isoformat().replace(":", "-")
        result["time"] = ts
        for name, errs in sorted(per_obj.items()):
            result[name] = self._format(np.concatenate(errs, 0))
        os.makedirs(self.outdir, exist_ok=True)
        outfile = join(self.outdir, f"{save_name}_k{tid}_{ts}.json")
        with open(outfile, "w") as f:
            json.dump(result, f, indent=2)
        print(f"evaluation saved to {outfile}")
        return result
