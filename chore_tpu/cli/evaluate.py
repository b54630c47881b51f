"""Evaluation entry point (reference: recon/evaluate.py:217-229).

Usage:
  python -m chore_tpu.cli.evaluate -sn SAVE_NAME -r RECON_DIR -b BEHAVE_DIR \
      [--seqs SEQ ...] [-t TID]
"""
from __future__ import annotations

from argparse import ArgumentParser
from glob import glob

from chore_tpu.data.paths import load_paths
from chore_tpu.recon.evaluate import ReconEvaluator


def main():
    parser = ArgumentParser()
    parser.add_argument("-sn", "--save_name", required=True)
    parser.add_argument("-r", "--recon_path", default=None)
    parser.add_argument("-b", "--behave_path", default=None)
    parser.add_argument("--seqs", nargs="+", default=None,
                        help="sequence dirs; default: all under behave_path")
    parser.add_argument("-t", "--tid", type=int, default=1)
    parser.add_argument("-i", "--id", default=None,
                        help="'smpl' evaluates the SMPL mesh only")
    parser.add_argument("--outdir", default="results")
    parser.add_argument("--seq-workers", type=int, default=4,
                        help="sequences evaluated concurrently (mesh IO "
                             "overlap; 1 = serial)")
    args = parser.parse_args()

    paths = load_paths()
    recon = args.recon_path or paths.get("RECON_PATH")
    behave = args.behave_path or paths.get("BEHAVE_PATH")
    seqs = args.seqs or sorted(glob(f"{behave}/*/"))
    ev = ReconEvaluator(recon, behave, smpl_only=args.id == "smpl",
                        outdir=args.outdir)
    ev.eval_seqs(seqs, args.save_name, args.tid,
                 seq_workers=args.seq_workers)


if __name__ == "__main__":
    main()
