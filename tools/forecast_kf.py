#!/usr/bin/env python3
"""Post-hoc Kalman forecasting over a saved streaming run, then sAP eval
(the `/root/reference/sAP/forecast/pps_forecast_kf.py` capability)."""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))


def main():
    parser = argparse.ArgumentParser("StreamYOLO-TPU post-hoc KF forecasting")
    parser.add_argument("--annot-path", type=str, required=True)
    parser.add_argument("--in-dir", type=str, required=True,
                        help="streaming run dir (per-seq pkls)")
    parser.add_argument("--out-dir", type=str, required=True)
    parser.add_argument("--fps", type=float, default=30)
    parser.add_argument("--eta", type=int, default=0)
    parser.add_argument("--match-iou-th", type=float, default=0.3)
    parser.add_argument("--no-eval", action="store_true", default=False)
    args = parser.parse_args()

    from streamyolo_tpu.data.coco import COCO
    from streamyolo_tpu.stream import eval_ccf
    from streamyolo_tpu.stream.forecast import forecast_results

    db = COCO(args.annot_path)
    results_by_seq = {}
    for seq in db.dataset["sequences"]:
        with open(os.path.join(args.in_dir, seq + ".pkl"), "rb") as f:
            results_by_seq[seq] = pickle.load(f)

    results_ccf, assoc = forecast_results(
        db, results_by_seq, fps=args.fps, eta=args.eta,
        match_iou_th=args.match_iou_th,
    )
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "results_ccf.pkl"), "wb") as f:
        pickle.dump(results_ccf, f)
    print(f"forecast results: {len(results_ccf)} boxes, {assoc}")

    if not args.no_eval:
        summary = eval_ccf(db, results_ccf)
        if summary is not None:
            with open(os.path.join(args.out_dir, "eval_summary.pkl"), "wb") as f:
                pickle.dump(summary, f)
            s = summary["stats"]
            print(f"forecasted sAP: {s[0]*100:.1f} sAP50: {s[1]*100:.1f} sAP75: {s[2]*100:.1f}")


if __name__ == "__main__":
    main()
