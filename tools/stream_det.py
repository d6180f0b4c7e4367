#!/usr/bin/env python3
"""Real-time streaming detection CLI.

Capability parity with `/root/reference/sAP/streamyolo/streamyolo_det.py`
(flags `:30-47`): run the StreamYOLO detector against a frame stream under a
wall clock, writing per-sequence pkls + ``time_info.pkl``. Adds
``--sim-runtime`` / ``--sim-zoo`` to run the same protocol under a fake clock
with simulated runtimes (the `sAP/det/srt_det.py` capability) so results are
reproducible off-TPU.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))


def parse_args():
    parser = argparse.ArgumentParser("StreamYOLO-TPU streaming detection")
    parser.add_argument("--data-root", type=str, required=True)
    parser.add_argument("--annot-path", type=str, required=True)
    parser.add_argument("--det-stride", type=int, default=1)
    parser.add_argument("--in_scale", type=float, default=0.5)
    parser.add_argument("--fps", type=float, default=30)
    parser.add_argument("--dynamic-schedule", action="store_true", default=False)
    parser.add_argument("--out-dir", type=str, required=True)
    parser.add_argument("--config", "-f", type=str, required=True)
    parser.add_argument("--weights", "-c", type=str, required=True)
    parser.add_argument("--conf", type=float, default=0.01)
    parser.add_argument("--nms", type=float, default=0.65)
    parser.add_argument("--fp32", action="store_true", default=False,
                        help="disable bf16 (reference uses fp16 half)")
    parser.add_argument("--overwrite", action="store_true", default=False)
    parser.add_argument("--sim-zoo", type=str, default=None,
                        help="runtime zoo pkl: run under a fake clock with simulated runtimes")
    parser.add_argument("--infinite", action="store_true", default=False,
                        help="infinite-compute simulation: process EVERY frame "
                             "(srt_det_inf protocol); requires --sim-zoo")
    parser.add_argument("--sim-name", type=str, default=None, help="zoo entry name")
    parser.add_argument("--perf-factor", type=float, default=1.0)
    parser.add_argument("--aot-dir", type=str, default=None,
                        help="load serialized serving executables from this "
                             "directory (tools/precompile.py --serve) — "
                             "compile-free startup; falls back to jit on a "
                             "key miss")
    return parser.parse_args()


def main():
    args = parse_args()
    from streamyolo_tpu.data.coco import COCO
    from streamyolo_tpu.exp import get_exp
    from streamyolo_tpu.stream import (
        SimClock,
        TPUStreamDetector,
        dist_from_zoo,
        run_streaming_detection,
    )
    from streamyolo_tpu.utils.checkpoint import load_checkpoint
    from streamyolo_tpu.utils.torch_import import merge_variables

    db = COCO(args.annot_path)
    exp = get_exp(args.config)
    if not args.fp32:
        # the detector casts the INPUT to bf16, but flax modules built
        # fp32 promote right back — the model must be built bf16 too
        # (measured ~20x on the step; `bench.py` builds bf16 directly)
        exp.compute_dtype = "bfloat16"
    model = exp.get_model()
    variables = exp.init_model(model)
    ckpt = load_checkpoint(args.weights)
    variables = merge_variables(variables, ckpt["model"], strict=False)
    print("loaded checkpoint done.")

    img0 = next(iter(db.imgs.values()))
    h = int(img0["height"] * args.in_scale)
    w = int(img0["width"] * args.in_scale)
    detector = TPUStreamDetector(
        model, variables, input_size=(h, w), in_scale=args.in_scale,
        conf_thre=args.conf, nms_thre=args.nms, num_classes=exp.num_classes,
        use_bf16=not args.fp32, aot_dir=args.aot_dir,
    )
    detector.warmup(10)

    clock = None
    runtime_dist = None
    if args.sim_zoo:
        clock = SimClock()
        runtime_dist = dist_from_zoo(
            args.sim_zoo, args.sim_name, perf_factor=args.perf_factor
        )

    if args.infinite:
        import pickle

        import cv2

        from streamyolo_tpu.stream import stream_sequence_infinite

        assert runtime_dist is not None, "--infinite requires --sim-zoo"
        os.makedirs(args.out_dir, exist_ok=True)
        seq_dirs = db.dataset["seq_dirs"]
        for sid, seq in enumerate(db.dataset["sequences"]):
            frames = []
            for img in (i for i in db.imgs.values() if i["sid"] == sid):
                frame = cv2.imread(os.path.join(args.data_root, seq_dirs[sid], img["name"]))
                assert frame is not None
                frames.append(frame)
            detector.reset()
            result = stream_sequence_infinite(
                frames, detector, fps=args.fps, runtime_dist=runtime_dist
            )
            with open(os.path.join(args.out_dir, seq + ".pkl"), "wb") as f:
                pickle.dump(result, f)
        return

    run_streaming_detection(
        db, args.data_root, args.out_dir, detector,
        fps=args.fps, det_stride=args.det_stride,
        dynamic_schedule=args.dynamic_schedule,
        clock=clock, runtime_dist=runtime_dist,
        overwrite=args.overwrite,
    )


if __name__ == "__main__":
    main()
