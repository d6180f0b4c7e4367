#!/usr/bin/env python3
"""Offline evaluation CLI (pseudo-streaming sAP / plain AP).

Flag surface mirrors `/root/reference/tools/eval.py:27-112`: ``-f`` config,
``-c`` checkpoint (defaults to ``best_ckpt``; torch ``.pth`` released weights
load through the importer), ``-b`` batch, ``--conf``/``--nms``/``--tsize``,
``--fuse`` (conv+BN fold), ``--speed`` (speed-only mode). The TensorRT path
maps to what XLA gives every run: an AOT-compiled fixed-shape executable
(persistent compilation cache) — no separate engine flag needed. Multi-GPU
process plumbing is N/A (single SPMD process).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))


def make_parser():
    parser = argparse.ArgumentParser("StreamYOLO-TPU eval")
    parser.add_argument("-expn", "--experiment-name", type=str, default=None)
    parser.add_argument("-n", "--name", type=str, default=None)
    parser.add_argument("-f", "--exp_file", default=None, type=str)
    parser.add_argument("-b", "--batch-size", type=int, default=64)
    parser.add_argument("-c", "--ckpt", default=None, type=str)
    parser.add_argument("--conf", default=None, type=float)
    parser.add_argument("--nms", default=None, type=float)
    parser.add_argument("--tsize", default=None, type=int, nargs=2, metavar=("H", "W"))
    parser.add_argument("--fuse", dest="fuse", default=False, action="store_true",
                        help="fold BN into conv weights before eval")
    parser.add_argument("--fp16", dest="fp16", default=False, action="store_true")
    parser.add_argument("--dedup", action="store_true", default=False,
                        help="force sequential-dedup eval (one backbone pass "
                             "per unique video frame, support features ride "
                             "an HBM carry). DEFAULT for single-process "
                             "ONE/TWO-pairing eval since the measured 1.6x "
                             "win — this flag now only hard-asserts the "
                             "preconditions instead of silently falling back")
    parser.add_argument("--no-dedup", dest="no_dedup", action="store_true",
                        default=False,
                        help="force the dual-frame (off_pipe) eval forward: "
                             "both halves of every 6-channel sample through "
                             "the backbone, the reference's layout "
                             "(exps/model/dfp_pafpn.py:120-167 there)")
    parser.add_argument("--int8", dest="int8", default=False, action="store_true",
                        help="int8 PTQ serving path (quant/ptq.py): fold BN, "
                             "calibrate activation scales on val batches, run "
                             "the CBS convs int8 on the MXU — packed and raw "
                             "layouts both quantize (packed is faster; only "
                             "the Focus stem stays fp there). Validate "
                             "accuracy before shipping: int8 is approximate")
    parser.add_argument("--calib-batches", type=int, default=8,
                        help="number of val batches observed by --int8 "
                             "calibration (absmax)")
    parser.add_argument("--per-channel-act", dest="per_channel_act",
                        default=False, action="store_true",
                        help="--int8 with one activation scale per input "
                             "channel (folded into the kernel, same conv "
                             "cost). Raw layout only — run with 'packed "
                             "False'; packed convs keep per-tensor scales")
    parser.add_argument("--seed", default=None, type=int)
    parser.add_argument("--test", dest="test", default=False, action="store_true",
                        help="evaluate on test split")
    parser.add_argument("--speed", dest="speed", default=False, action="store_true",
                        help="speed-only test")
    parser.add_argument("--tolerant", dest="tolerant", default=False,
                        action="store_true",
                        help="shape-tolerant checkpoint load (missing/"
                             "mismatched leaves keep init values). Eval loads "
                             "STRICTLY by default, like the reference "
                             "(tools/eval.py:168 there); tolerance belongs to "
                             "fine-tune, not eval")
    parser.add_argument("--legacy", dest="legacy", default=False, action="store_true",
                        help="accepted for older-version compatibility; like the "
                             "reference (tools/eval.py:86-93, evaluator call with "
                             "legacy commented out at :152) it changes nothing")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return parser


def main():
    args = make_parser().parse_args()
    from streamyolo_tpu.exp import get_exp
    from streamyolo_tpu.utils.checkpoint import load_checkpoint
    from streamyolo_tpu.utils.logger import get_logger, setup_logger
    from streamyolo_tpu.utils.torch_import import merge_variables

    exp = get_exp(args.exp_file, args.name)
    exp.merge(args.opts)
    if not args.experiment_name:
        args.experiment_name = exp.exp_name
    if args.conf is not None:
        exp.test_conf = args.conf
    if args.nms is not None:
        exp.nmsthre = args.nms
    if args.tsize is not None:
        exp.test_size = tuple(args.tsize)
    if args.fp16:
        exp.compute_dtype = "bfloat16"
    if args.test:
        # evaluate the test split (the reference's --test/testdev pathway,
        # `tools/eval.py:91-98` there)
        exp.val_ann = "test.json"

    file_name = os.path.join(exp.output_dir, args.experiment_name)
    os.makedirs(file_name, exist_ok=True)
    setup_logger(file_name, filename="val_log.txt")
    logger = get_logger()
    logger.info(f"Args: {args}")

    model = exp.get_model()
    variables = exp.init_model(model)

    if not args.speed:  # speed-only mode runs on init weights (`eval.py:161`)
        ckpt_file = args.ckpt or os.path.join(file_name, "best_ckpt.pkl")
        logger.info(f"loading checkpoint from {ckpt_file}")
        ckpt = load_checkpoint(ckpt_file)
        # Strict by default: a typo'd/truncated checkpoint must fail loudly,
        # not silently evaluate random init in the missing leaves.
        variables = merge_variables(variables, ckpt["model"], strict=not args.tolerant)
        logger.info("loaded checkpoint done.")

    if args.fuse and not args.int8:
        from streamyolo_tpu.utils.fuse import fuse_model_variables

        logger.info("\tFusing conv+BN...")
        variables = fuse_model_variables(variables)

    evaluator = None
    if args.int8:
        import itertools

        import numpy as np

        from streamyolo_tpu.quant import quantize_for_serving

        if args.speed:
            # no dataset in speed mode: calibrate on the synthetic batch the
            # speed loop will time (same distribution, same shapes)
            h, w = exp.test_size
            calib = [np.random.RandomState(0).randint(
                0, 255, (args.batch_size, h, w, 6)).astype(np.float32)]
        else:
            evaluator = exp.get_evaluator(args.batch_size, is_distributed=False)
            calib = [
                batch[0]
                for batch in itertools.islice(
                    iter(evaluator.dataloader), max(1, args.calib_batches))
            ]
        logger.info(
            f"\tint8 PTQ: folding BN + calibrating on {len(calib)} batches"
            f"{' (per-channel act scales)' if args.per_channel_act else ''}...")
        variables = quantize_for_serving(
            model, variables, calib, per_channel_act=args.per_channel_act)

    forward_fn = exp.get_forward_fn(model, variables)

    if args.speed:
        # speed-only mode (`/root/reference/tools/eval.py --speed`): time the
        # batched forward+NMS on synthetic data, no dataset needed.
        import time

        import numpy as np

        from streamyolo_tpu.ops.nms import postprocess_fixed
        from streamyolo_tpu.utils.model_info import get_model_info

        logger.info(get_model_info(model, variables, exp.test_size))
        h, w = exp.test_size
        imgs = np.random.RandomState(0).randint(
            0, 255, (args.batch_size, h, w, 6)
        ).astype(np.float32)
        for _ in range(3):  # warmup/compile
            dets = postprocess_fixed(
                forward_fn(imgs), exp.num_classes, exp.test_conf, exp.nmsthre
            )
            np.asarray(dets)
        times = []
        for _ in range(10):
            t0 = time.perf_counter()
            dets = postprocess_fixed(
                forward_fn(imgs), exp.num_classes, exp.test_conf, exp.nmsthre
            )
            np.asarray(dets)
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        logger.info(
            f"speed test: {med * 1e3:.1f} ms / batch of {args.batch_size} "
            f"({args.batch_size / med:.1f} imgs/s)"
        )
        return

    if evaluator is None:
        evaluator = exp.get_evaluator(args.batch_size, is_distributed=False)
    import jax

    assert not (args.dedup and args.no_dedup), "--dedup conflicts with --no-dedup"
    can_dedup = (
        exp.evaluator_name in ("onex", "twox") and jax.process_count() == 1
    )
    if args.dedup and not can_dedup:
        # explicit --dedup keeps the loud preconditions instead of a fallback
        assert exp.evaluator_name in ("onex", "twox"), \
            "--dedup needs a sequential (ONE/TWO) pairing"
        assert jax.process_count() == 1, "--dedup needs an unsharded loader"
    if can_dedup and not args.no_dedup:
        # Default: sequential-dedup forward — one backbone pass per unique
        # frame, measured 1.6x faster with identical detections; a
        # first-batch parity assertion against the dual-frame forward guards
        # the default in-run (eval/seq_forward.py).
        logger.info("sequential-dedup eval (default; --no-dedup for the "
                    "dual-frame forward)")
        forward_fn = exp.get_dedup_forward_fn(
            model, variables, evaluator.dataset)
    ap, ap50, summary = exp.eval(forward_fn, evaluator)
    logger.info(f"\n{summary}")
    logger.info(f"AP: {ap:.4f}  AP50: {ap50:.4f}")


if __name__ == "__main__":
    main()
