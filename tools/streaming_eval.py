#!/usr/bin/env python3
"""Streaming (sAP) evaluation CLI: pair timestamped detections with ground
truth and COCO-evaluate.

Capability parity with `/root/reference/sAP/streamyolo/streaming_eval.py`:
``--annot-path``, ``--result-dir`` (per-sequence pkls from stream_det),
``--fps``, ``--eta``; writes ``results_ccf.pkl`` / ``eval_assoc.pkl`` /
``eval_summary.pkl``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))


def parse_args():
    parser = argparse.ArgumentParser("StreamYOLO-TPU streaming eval")
    parser.add_argument("--annot-path", type=str, required=True)
    parser.add_argument("--result-dir", type=str, required=True)
    parser.add_argument("--out-dir", type=str, default=None)
    parser.add_argument("--fps", type=float, default=30)
    parser.add_argument("--eta", type=int, default=0, help="evaluation offset (frames)")
    parser.add_argument("--overwrite", action="store_true", default=False)
    parser.add_argument("--no-eval", action="store_true", default=False)
    return parser.parse_args()


def main():
    args = parse_args()
    from streamyolo_tpu.data.coco import COCO
    from streamyolo_tpu.stream import streaming_eval

    db = COCO(args.annot_path)
    streaming_eval(
        db, args.result_dir, fps=args.fps, eta=args.eta,
        out_dir=args.out_dir, overwrite=args.overwrite,
    )


if __name__ == "__main__":
    main()
