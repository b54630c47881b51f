"""BEHAVE sequence reconstruction entry point.

Equivalent of the reference recon_fit_behave.py / recon_fit_coco.py CLIs
(reference: recon_fit_behave.py:368-411, recon_fit_coco.py:84-132):
per-frame joint SMPL+object fitting over a sequence with resume support.

Usage:
  python -m chore_tpu.cli.recon <exp_name> -s SEQ -sn SAVE_NAME \
      [-o RECON_DIR] [--coco] [-fs START -fe END]
"""
from __future__ import annotations

import os
import time
from argparse import ArgumentParser

import numpy as np

from chore_tpu.behave.readers import SeqInfo
from chore_tpu.cli.common import load_object_template, load_smplh, load_trained
from chore_tpu.config import ChoreConfig, load_config
from chore_tpu.data import DataLoader, DataPaths, TestImagePrep
from chore_tpu.recon import losses as L
from chore_tpu.recon.fitter import ReconFitter
from chore_tpu.recon.templates import is_done, save_outputs
from chore_tpu.smpl.model import pack_betas, pack_pose


class _PrepDataset:
    def __init__(self, files, prep):
        self.files = files
        self.prep = prep

    def __len__(self):
        return len(self.files)

    def __getitem__(self, i):
        return self.prep.prepare(self.files[i])


def recon_fit(cfg: ChoreConfig, seq_folder, save_name, outpath="recon_out",
              coco=False, obj_name=None, start=0, end=None, batch_size=1,
              redo=False, tid=1, use_silhouette=True, data_parallel=False,
              exp_root="experiments", fit_cfg=None, sampler_cfg=None,
              debug_viz=None, fused=False, offscreen_guard=False):
    """fit_cfg/sampler_cfg override the release schedule (quick runs,
    tests); exp_root relocates the checkpoint search; debug_viz writes
    per-stage renders to that directory (utils/viewer.py); fused folds
    the whole fit into one jitted program (FitConfig.fused_pipeline);
    offscreen_guard enables the sil-phase off-ROI penalty
    (FitConfig.offscreen_guard, recommended with --coco)."""
    info_file = os.path.join(seq_folder, "info.json")
    if os.path.isfile(info_file):
        info = SeqInfo(seq_folder)
        obj_name = obj_name or info.get_obj_name()
        gender = info.get_gender()
    else:
        assert obj_name is not None, "provide -on for non-BEHAVE folders"
        gender = "male"

    model, params = load_trained(cfg, exp_root=exp_root)
    smplh = load_smplh(gender)
    tv, tf = load_object_template(obj_name)
    weights = L.COCO_WEIGHTS if coco else L.BEHAVE_WEIGHTS
    mesh = None
    if data_parallel:
        import jax

        from chore_tpu.parallel import make_mesh

        mesh = make_mesh()
        n = len(jax.devices())
        batch_size = -(-max(batch_size, n) // n) * n  # multiple of devices
        print(f"data-parallel fitting over {n} devices, "
              f"batch {batch_size}")
    fcfg = fit_cfg if fit_cfg is not None else cfg.fit_config()
    if fused or offscreen_guard:
        import dataclasses

        fcfg = dataclasses.replace(
            fcfg, fused_pipeline=fused or fcfg.fused_pipeline,
            offscreen_guard=offscreen_guard or fcfg.offscreen_guard)
    if debug_viz and fcfg.fused_pipeline:
        print("--debug-viz needs the staged pipeline; ignoring --fused")
        import dataclasses

        fcfg = dataclasses.replace(fcfg, fused_pipeline=False)
    fitter = ReconFitter(model, params, smplh, tv, tf, weights=weights,
                         cfg=fcfg,
                         sampler_cfg=sampler_cfg if sampler_cfg is not None
                         else cfg.sampler_config(), mesh=mesh)
    prep = TestImagePrep(image_size=tuple(cfg.net_img_size),
                         crop_size=cfg.loadSize, use_mean_center=coco,
                         crop_info_dir=outpath)
    files = DataPaths.get_image_paths_seq(seq_folder, tid=tid,
                                          check_occlusion=False)
    files = files[start:end if end is not None else len(files)]
    print(f"{len(files)} test frames")
    loader = DataLoader(_PrepDataset(files, prep), batch_size,
                        shuffle=False, num_workers=4, drop_last=False)
    monitor = None
    if debug_viz:
        from chore_tpu.utils.viewer import FitMonitor

        monitor = FitMonitor(debug_viz)
    for batch in loader:
        paths = batch["path"]
        if not redo and is_done(outpath, paths, save_name, tid):
            print(f"{paths[0]} already done, skipped")
            continue
        t0 = time.time()
        B = len(paths)
        if B < batch_size:
            # pad the trailing partial batch to the FULL batch size by
            # repeating the last frame: keeps one compiled shape for the
            # whole run (and the device-count divisibility under
            # --data-parallel); extras are dropped by save_outputs, which
            # iterates over len(paths)
            pad = batch_size - B
            for k, v in list(batch.items()):
                if k == "path":
                    continue
                batch[k] = np.concatenate([v] + [v[-1:]] * pad, axis=0)
        result = fitter.fit_batch(
            batch["images"], batch["crop_center"], batch["mocap_pose"],
            batch["mocap_betas"], batch["kpts"],
            use_silhouette=use_silhouette, monitor=monitor,
        )
        smpl_verts = np.asarray(smplh.verts(result["smpl_params"]))
        obj_verts = np.asarray(
            fitter.transform_obj(result["obj_params"],
                                 points=fitter.template_verts)
        )
        save_outputs(
            outpath, paths, save_name, tid,
            smpl_verts, smplh.faces,
            np.asarray(pack_pose(result["smpl_params"])),
            np.asarray(pack_betas(result["smpl_params"])),
            np.asarray(result["smpl_params"]["trans"]),
            obj_verts, tf,
            np.asarray(result["obj_R"]),
            np.asarray(result["obj_params"]["obj_t"]),
            np.asarray(result["obj_params"]["obj_s"]),
        )
        print(f"batch done in {time.time() - t0:.1f}s")
    print("fit phase timing:", fitter.timer.summary())


def main():
    parser = ArgumentParser()
    parser.add_argument("exp_name", nargs="?", default="chore-release")
    parser.add_argument("-s", "--seq_folder", required=True)
    parser.add_argument("-sn", "--save_name", required=True)
    parser.add_argument("-o", "--outpath", default="recon_out")
    parser.add_argument("-on", "--obj_name", default=None)
    parser.add_argument("-t", "--tid", type=int, default=1)
    parser.add_argument("-bs", "--batch_size", type=int, default=1)
    parser.add_argument("-fs", "--start", type=int, default=0)
    parser.add_argument("-fe", "--end", type=int, default=None)
    parser.add_argument("-redo", action="store_true")
    parser.add_argument("--coco", action="store_true",
                        help="in-the-wild weights + mean-center restaging")
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard frame batches over all chips")
    parser.add_argument("--debug-viz", default=None,
                        help="write per-stage debug renders to this dir")
    parser.add_argument("--fused", action="store_true",
                        help="single whole-fit jit per batch (one dispatch "
                             "instead of five; see FitConfig.fused_pipeline)")
    parser.add_argument("--offscreen-guard", action="store_true",
                        help="sil-phase off-ROI penalty (recommended with "
                             "--coco; see FitConfig.offscreen_guard)")
    parser.add_argument("--exp-root", default="experiments",
                        help="checkpoint search root")
    args = parser.parse_args()
    try:
        cfg = load_config(args.exp_name)
    except FileNotFoundError:
        cfg = ChoreConfig(exp_name=args.exp_name)
    recon_fit(cfg, args.seq_folder, args.save_name, args.outpath,
              coco=args.coco, obj_name=args.obj_name, start=args.start,
              end=args.end, batch_size=args.batch_size, redo=args.redo,
              tid=args.tid, data_parallel=args.data_parallel,
              debug_viz=args.debug_viz, exp_root=args.exp_root,
              fused=args.fused, offscreen_guard=args.offscreen_guard)


if __name__ == "__main__":
    main()
