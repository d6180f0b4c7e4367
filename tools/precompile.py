#!/usr/bin/env python3
"""Warm the persistent XLA compilation cache for a config's hot programs.

TPU compiles of the full model take minutes (and much longer through a
remote-attached dev chip); this warms the serving step (on_pipe + NMS), the
batched offline eval forward, and optionally the train step, so later
`tools/eval.py` / `tools/stream_det.py` / `tools/train.py` runs start
instantly from the cache (`utils/aot.py` enables the cache process-wide).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))


def main():
    parser = argparse.ArgumentParser("StreamYOLO-TPU cache warmer")
    parser.add_argument("-f", "--exp_file", required=True)
    parser.add_argument("-b", "--batch-size", type=int, default=8,
                        help="offline eval batch size to warm")
    parser.add_argument("--train", action="store_true", default=False,
                        help="also warm the train step (slowest compile)")
    parser.add_argument("--train-batch", type=int, default=4)
    parser.add_argument("--fp16", action="store_true", default=True)
    parser.add_argument("--serve", metavar="AOT_DIR", default=None,
                        help="also AOT-compile the TPUStreamDetector star + "
                             "steady-state programs at the serving defaults "
                             "and serialize them under AOT_DIR; a detector "
                             "constructed with aot_dir=AOT_DIR then starts "
                             "compile-free (the TensorRT-engine slot)")
    parser.add_argument("--conf", type=float, default=0.01,
                        help="serving conf threshold (detector default)")
    parser.add_argument("--nms", type=float, default=0.65,
                        help="serving NMS threshold (detector default)")
    parser.add_argument("--topk", type=int, default=200,
                        help="serving pre-NMS top-k (detector default)")
    parser.add_argument("--streams", type=int, default=0,
                        help="with --serve: also export the batched "
                             "MultiStreamDetector executables for N streams")
    args = parser.parse_args()

    import numpy as np

    from streamyolo_tpu.utils.aot import enable_compilation_cache

    cache_dir = enable_compilation_cache()
    print(f"compilation cache: {cache_dir}")

    from streamyolo_tpu.exp import get_exp
    from streamyolo_tpu.ops.nms import postprocess_fixed

    exp = get_exp(args.exp_file)
    if args.fp16:
        exp.compute_dtype = "bfloat16"
    model = exp.get_model()
    variables = exp.init_model(model)
    h, w = exp.test_size
    ch = 6 if exp.dataset_name in ("one", "two") else 3

    import jax

    # 1) streaming step (star + steady state) at the serving operating point
    #    (conf/nms/topk must match TPUStreamDetector's or the cache misses)
    t0 = time.perf_counter()

    def _stream(v, x, b):
        preds, nb = model.apply(v, x, buffer=b, mode="on_pipe", train=False)
        dets = postprocess_fixed(
            preds, exp.num_classes, args.conf, args.nms, pre_nms_topk=args.topk
        )
        return dets, nb

    frame = np.zeros((1, h, w, 3), np.float32)
    dets, buf = jax.jit(_stream)(variables, frame, None)
    np.asarray(dets)
    dets, buf = jax.jit(_stream, donate_argnums=2)(variables, frame, buf)
    np.asarray(dets)
    print(f"streaming step warmed in {time.perf_counter() - t0:.1f}s")

    # 1b) serialized serving executables (uint8-input detector programs)
    if args.serve:
        from streamyolo_tpu.stream import export_stream_executables

        t0 = time.perf_counter()
        star_path, buf_path = export_stream_executables(
            model, variables, args.serve,
            input_size=(h, w), conf_thre=args.conf, nms_thre=args.nms,
            num_classes=exp.num_classes, pre_nms_topk=args.topk,
            use_bf16=args.fp16,
        )
        print(f"serving executables exported in {time.perf_counter() - t0:.1f}s:"
              f"\n  {star_path}\n  {buf_path}")
        if args.streams:
            from streamyolo_tpu.stream import export_multi_stream_executables

            t0 = time.perf_counter()
            star_path, buf_path = export_multi_stream_executables(
                model, variables, args.serve, n_streams=args.streams,
                input_size=(h, w), conf_thre=args.conf, nms_thre=args.nms,
                num_classes=exp.num_classes, pre_nms_topk=args.topk,
                use_bf16=args.fp16,
            )
            print(f"{args.streams}-stream executables exported in "
                  f"{time.perf_counter() - t0:.1f}s:"
                  f"\n  {star_path}\n  {buf_path}")

    # 2) batched offline eval
    t0 = time.perf_counter()
    forward = exp.get_forward_fn(model, variables)
    imgs = np.zeros((args.batch_size, h, w, ch), np.float32)
    dets = postprocess_fixed(
        forward(imgs), exp.num_classes, exp.test_conf, exp.nmsthre
    )
    np.asarray(dets)
    print(f"offline eval b={args.batch_size} warmed in {time.perf_counter() - t0:.1f}s")

    # 3) train step
    if args.train:
        t0 = time.perf_counter()
        from streamyolo_tpu.parallel import make_mesh, replicated, shard_batch
        from streamyolo_tpu.train import (
            create_train_state,
            jit_train_step,
            make_train_step,
        )
        from streamyolo_tpu.train.trainer import _donation_safe

        B = args.train_batch
        sched = exp.get_lr_schedule(B, 100)
        state, tx = create_train_state(variables, sched)
        step = make_train_step(
            model, tx, exp.num_classes, sched,
            gamma=getattr(exp, "tal_gamma", 1.0),
            ignore_thr=getattr(exp, "tal_ignore_thr", 0.5),
            ignore_value=getattr(exp, "tal_ignore_value", 1.5),
            use_tal=exp.head_name == "tal",
        )
        mesh = make_mesh(jax.devices()[:1])
        jitted = jit_train_step(step, mesh=mesh, donate=_donation_safe())
        state = jax.device_put(state, replicated(mesh))
        labels = np.zeros((B, 120, 5), np.float32)
        labels[:, 0] = [2.0, w / 2, h / 2, 30.0, 20.0]
        batch = shard_batch(
            {"images": np.zeros((B, h, w, ch), np.float32),
             "labels": labels, "support_labels": labels.copy()},
            mesh,
        )
        state, metrics = jitted(state, batch)
        float(metrics["total_loss"])
        print(f"train step b={B} warmed in {time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
