#!/usr/bin/env python3
"""Offline (no clock) detection dump: run the detector on EVERY frame and
write CCF-format results — the `/root/reference/sAP/det/offline_det.py`
capability. Output feeds ``eval_ccf``, the visualization tools, or
``pseudo_gt_from_detections``.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))


def parse_args():
    parser = argparse.ArgumentParser("StreamYOLO-TPU offline detection")
    parser.add_argument("--data-root", type=str, required=True)
    parser.add_argument("--annot-path", type=str, required=True)
    parser.add_argument("--in_scale", type=float, default=0.5)
    parser.add_argument("--config", "-f", type=str, required=True)
    parser.add_argument("--weights", "-c", type=str, required=True)
    parser.add_argument("--conf", type=float, default=0.01)
    parser.add_argument("--nms", type=float, default=0.65)
    parser.add_argument("--out-dir", type=str, required=True)
    parser.add_argument("--no-eval", action="store_true", default=False)
    parser.add_argument("--fp32", action="store_true", default=False,
                        help="disable bf16 (reference uses fp16 half)")
    return parser.parse_args()


def main():
    args = parse_args()
    import cv2

    from streamyolo_tpu.data.coco import COCO
    from streamyolo_tpu.exp import get_exp
    from streamyolo_tpu.stream import TPUStreamDetector, eval_ccf
    from streamyolo_tpu.stream.pairing import ltrb2ltwh
    from streamyolo_tpu.utils.checkpoint import load_checkpoint
    from streamyolo_tpu.utils.torch_import import merge_variables

    db = COCO(args.annot_path)
    exp = get_exp(args.config)
    if not args.fp32:
        exp.compute_dtype = "bfloat16"  # bf16 modules, not just a bf16 input
    model = exp.get_model()
    variables = exp.init_model(model)
    ckpt = load_checkpoint(args.weights)
    variables = merge_variables(variables, ckpt["model"], strict=False)

    img0 = next(iter(db.imgs.values()))
    h = int(img0["height"] * args.in_scale)
    w = int(img0["width"] * args.in_scale)
    detector = TPUStreamDetector(
        model, variables, input_size=(h, w), in_scale=args.in_scale,
        conf_thre=args.conf, nms_thre=args.nms, num_classes=exp.num_classes,
    )

    seq_dirs = db.dataset["seq_dirs"]
    results_ccf = []
    for img in db.dataset["images"]:
        path = os.path.join(args.data_root, seq_dirs[img["sid"]], img["name"])
        frame = cv2.imread(path)
        assert frame is not None, path
        if img["fid"] == 0:
            detector.reset()
        bboxes, scores, labels, _ = detector(frame)
        if len(bboxes):
            ltwh = ltrb2ltwh(bboxes)
            for i in range(len(bboxes)):
                results_ccf.append(
                    dict(image_id=img["id"], bbox=[float(v) for v in ltwh[i]],
                         score=float(scores[i]), category_id=int(labels[i]))
                )

    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "results_ccf.pkl"), "wb") as f:
        pickle.dump(results_ccf, f)
    print(f"wrote {len(results_ccf)} detections")

    if not args.no_eval:
        summary = eval_ccf(db, results_ccf)
        if summary is not None:
            with open(os.path.join(args.out_dir, "eval_summary.pkl"), "wb") as f:
                pickle.dump(summary, f)


if __name__ == "__main__":
    main()
