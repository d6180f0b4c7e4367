#!/usr/bin/env python3
"""Predicted-on-TPU streaming sAP rehearsal: the full L7 chain, one command.

The reference measures streaming AP two ways: a wall-clock run on the target
GPU (`/root/reference/sAP/det/rt_det.py`) or a SIMULATED real-time run that
replays latencies measured once on the target
(`/root/reference/sAP/det/srt_det.py:72-165`, harvested into a reusable zoo
by `sAP/util/add_to_runtime_zoo.py:28-40`). This tool is the srt_det pattern
end-to-end: the REAL detector produces real detections while the clock
advances by latencies drawn from the zoo — so one latency measurement on the
target chip predicts the streaming sAP of any deployment without holding a
30 FPS camera feed on the dev host.

Pipeline (each stage is the library's own public piece):
  1. dataset — an existing Argoverse-HD layout (``--data-root/--annot-path``)
     or a deterministic synthetic one (`data/dbcode.py::make_synthetic_argoverse`,
     ``--seqs x --frames`` moving-object sequences);
  2. latency — ``--latency-ms`` samples (e.g. bench.py's measured device
     step), an existing ``--zoo`` entry, or ``--measure`` (time the real
     detector per call — the honest harvest on a directly-attached chip;
     through the axon relay each call carries ~30 ms of host-sync overhead,
     so prefer --latency-ms from bench.py there). Written to
     ``<out>/runtime_zoo.pkl`` for reuse;
  3. ground truth — the dataset's annotations (``--gt annotations``), or
     pseudo-GT from an offline every-frame run of the SAME detector
     (``--gt oracle``, default): the score then measures temporal staleness
     against the detector's own zero-latency output — the streaming protocol
     pairs each frame with the newest COMPLETED result, so even an
     instantaneous detector is one frame stale, and extra latency shows up
     as additional frame lag (``mismatch``) and box drift;
  4. streaming run — `stream/online.py::run_streaming_detection` under
     SimClock, per-sequence pkls + ``time_info.pkl``;
  5. scoring — `stream/pairing.py::streaming_eval` (pairing + native
     COCOeval): sAP + miss/in_time/mismatch; one table row on stdout and
     ``rehearsal_summary.json``.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))


def parse_args():
    p = argparse.ArgumentParser("StreamYOLO-TPU streaming sAP rehearsal")
    p.add_argument("--config", "-f", type=str, required=True)
    p.add_argument("--weights", "-c", type=str, default=None,
                   help="checkpoint; omitted = init weights (fine with the "
                        "default --gt oracle, which scores the detector "
                        "against its own zero-latency run)")
    p.add_argument("--out-dir", type=str, required=True)
    # dataset: either point at real data or synthesize
    p.add_argument("--data-root", type=str, default=None)
    p.add_argument("--annot-path", type=str, default=None)
    p.add_argument("--seqs", type=int, default=4,
                   help="synthetic fixture: number of sequences")
    p.add_argument("--frames", type=int, default=75,
                   help="synthetic fixture: frames per sequence")
    p.add_argument("--size", type=int, nargs=2, default=(300, 480),
                   metavar=("H", "W"), help="synthetic frame size")
    p.add_argument("--seed", type=int, default=0)
    # latency source
    p.add_argument("--latency-ms", type=str, default=None,
                   help="comma-separated per-frame latency samples in ms "
                        "(e.g. bench.py's measured device step)")
    p.add_argument("--zoo", type=str, default=None, help="existing zoo pkl")
    p.add_argument("--zoo-name", type=str, default=None)
    p.add_argument("--measure", type=int, default=0, metavar="N",
                   help="measure N per-call latencies of the real detector "
                        "on the current backend as the zoo samples")
    p.add_argument("--measure-chain", type=int, default=0, metavar="N",
                   help="measure the DEVICE per-step time with bench.py's "
                        "methodology (N samples, each a dependency-chained "
                        "run of 50 full steps synced once) — the honest "
                        "harvest through a remote relay, where per-call "
                        "--measure pays a ~30 ms host sync per frame")
    p.add_argument("--perf-factor", type=float, default=1.0)
    # protocol
    p.add_argument("--fps", type=float, default=30.0)
    p.add_argument("--eta", type=int, default=0)
    p.add_argument("--det-stride", type=int, default=1)
    p.add_argument("--dynamic-schedule", action="store_true", default=False)
    p.add_argument("--in_scale", type=float, default=0.5)
    p.add_argument("--conf", type=float, default=0.01)
    p.add_argument("--nms", type=float, default=0.65)
    p.add_argument("--fp32", action="store_true", default=False)
    p.add_argument("--gt", choices=["oracle", "annotations"], default="oracle")
    p.add_argument("--pgt-score-th", type=float, default=0.3,
                   help="score threshold for --gt oracle pseudo annotations")
    p.add_argument("--perfect-detector", action="store_true", default=False,
                   help="replace the model with an oracle that returns the "
                        "input frame's ground truth (stream/online.py::"
                        "SimulatedDetector): the run isolates the PURE cost "
                        "of the simulated latency + frame motion — no model "
                        "error, no TPU needed. Implies --gt annotations")
    p.add_argument("opts", default=None, nargs=argparse.REMAINDER,
                   help="extra 'key value' Exp overrides (real-detector mode)")
    return p.parse_args()


def _offline_ccf(db, data_root, detector):
    """Every-frame zero-latency detections in CCF format (the
    `tools/offline_det.py` loop, reused as the oracle)."""
    import cv2

    from streamyolo_tpu.stream.pairing import ltrb2ltwh

    seq_dirs = db.dataset["seq_dirs"]
    results_ccf = []
    for img in db.dataset["images"]:
        path = os.path.join(data_root, seq_dirs[img["sid"]], img["name"])
        frame = cv2.imread(path)
        assert frame is not None, path
        if img["fid"] == 0:
            detector.reset()
        bboxes, scores, labels, _ = detector(frame)
        if len(bboxes):
            ltwh = ltrb2ltwh(bboxes)
            for i in range(len(bboxes)):
                results_ccf.append(dict(
                    image_id=img["id"], bbox=[float(v) for v in ltwh[i]],
                    score=float(scores[i]), category_id=int(labels[i])))
    return results_ccf


def _measure_chained_step(model, variables, exp, args, input_size, n_samples):
    """Device per-step time via bench.py's methodology, tuned for small
    models: ONE jitted ``lax.fori_loop`` chain of K=50 full steps (on_pipe
    forward consuming the previous step's DFP buffer + fixed-shape NMS,
    reduced so nothing dead-codes) per sample, one dispatch, one host sync —
    a remote relay charges each DISPATCH of a many-leaf variables tree tens
    of ms (measured: the same 50 steps cost ~27 ms as one dispatch and
    ~1300 ms as five), so the sample must amortize the dispatch, not just
    the sync. Returns per-sample mean step times (seconds); the min is the
    uncontended estimate and still carries ~1/K of one dispatch as floor."""
    import time as _time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from streamyolo_tpu.ops.nms import postprocess_fixed

    K, R = 50, 1
    h, w = input_size
    dt = jnp.float32 if args.fp32 else jnp.bfloat16
    topk = getattr(exp, "pre_nms_topk", 200)

    @jax.jit
    def chain(v, x, b):
        def body(i, carry):
            b, acc = carry
            preds, nb = model.apply(v, x.astype(dt), buffer=b, mode="on_pipe")
            dets = postprocess_fixed(
                preds, num_classes=exp.num_classes, conf_thre=args.conf,
                nms_thre=args.nms, pre_nms_topk=topk)
            return nb, acc + jnp.sum(dets.astype(jnp.float32))

        return jax.lax.fori_loop(0, K, body, (b, jnp.float32(0)))

    img = np.random.RandomState(0).randint(0, 255, (1, h, w, 3)).astype(np.uint8)
    image = jax.device_put(img)
    _, buf = jax.jit(
        lambda v, x: model.apply(v, x.astype(dt), mode="on_pipe")
    )(variables, image)
    buf, acc = chain(variables, image, buf)
    float(acc)  # compile + warm
    samples = []
    for _ in range(max(n_samples, 2)):
        t0 = _time.perf_counter()
        for _ in range(R):
            buf, acc = chain(variables, image, buf)
        float(acc)
        samples.append((_time.perf_counter() - t0) / (R * K))
    return samples


def _run_perfect_streaming(db, out_dir, runtime_dist, fps=30.0, det_stride=1,
                           dynamic_schedule=False):
    """Whole-dataset simulated run with the ground-truth oracle detector
    (no images read, no model): per-seq pkls + time_info.pkl, the same
    artifact layout ``run_streaming_detection`` writes."""
    import numpy as np

    from streamyolo_tpu.stream import SimClock, SimulatedDetector, stream_sequence

    os.makedirs(out_dir, exist_ok=True)
    by_sid_fid = {}
    for ann in db.dataset["annotations"]:
        img = db.imgs[ann["image_id"]]
        x, y, w, h = ann["bbox"]
        by_sid_fid.setdefault((img["sid"], img["fid"]), ([], []))
        by_sid_fid[(img["sid"], img["fid"])][0].append([x, y, x + w, y + h])
        by_sid_fid[(img["sid"], img["fid"])][1].append(ann["category_id"])

    runtime_all, n_processed, n_total = [], 0, 0
    for sid, seq in enumerate(db.dataset["sequences"]):
        n_frames = sum(1 for i in db.imgs.values() if i["sid"] == sid)
        det = SimulatedDetector(
            lambda f, sid=sid: by_sid_fid.get((sid, f), ([], [])), runtime_dist)
        result = stream_sequence(
            list(range(n_frames)), det, fps=fps, clock=SimClock(),
            det_stride=det_stride, dynamic_schedule=dynamic_schedule,
            runtime_dist=runtime_dist, frame_arg_is_index=True)
        with open(os.path.join(out_dir, seq + ".pkl"), "wb") as f:
            pickle.dump(result, f)
        runtime_all += result["runtime"]
        n_processed += len(result["results_parsed"])
        n_total += n_frames
    time_info = {
        "runtime_all": runtime_all,
        "n_processed": n_processed,
        "n_total": n_total,
        "n_small_runtime": int((np.asarray(runtime_all) < 1.0 / fps).sum())
        if runtime_all else 0,
    }
    with open(os.path.join(out_dir, "time_info.pkl"), "wb") as f:
        pickle.dump(time_info, f)
    return time_info


def main():
    args = parse_args()
    import numpy as np

    from streamyolo_tpu.data.coco import COCO
    from streamyolo_tpu.data.dbcode import (
        make_synthetic_argoverse,
        pseudo_gt_from_detections,
    )
    from streamyolo_tpu.exp import get_exp
    from streamyolo_tpu.stream import (
        SimClock,
        TPUStreamDetector,
        dist_from_zoo,
        run_streaming_detection,
        streaming_eval,
    )
    from streamyolo_tpu.utils.checkpoint import load_checkpoint
    from streamyolo_tpu.utils.torch_import import merge_variables

    os.makedirs(args.out_dir, exist_ok=True)

    # ---- 1. dataset
    if args.data_root:
        assert args.annot_path, "--data-root needs --annot-path"
        data_root, annot_path = args.data_root, args.annot_path
    else:
        fix = os.path.join(args.out_dir, "fixture")
        annot_path = os.path.join(fix, "Argoverse-HD", "annotations", "val.json")
        if not os.path.isfile(annot_path):
            print(f"[1/5] synthesizing {args.seqs}x{args.frames} frames "
                  f"@ {args.size[0]}x{args.size[1]} under {fix}")
            make_synthetic_argoverse(
                fix, seq_lens=(args.frames,) * args.seqs,
                size=tuple(args.size), seed=args.seed)
        data_root = os.path.join(fix, "Argoverse-1.1", "tracking")
    db = COCO(annot_path)

    # ---- model + detector
    img0 = next(iter(db.imgs.values()))
    detector = None
    if args.perfect_detector:
        assert not (args.measure or args.measure_chain), \
            "--measure/--measure-chain need the real detector"
        args.gt = "annotations"
    else:
        exp = get_exp(args.config)
        exp.merge(args.opts)
        if not args.fp32:
            # build the model bf16: the detector's input cast alone would
            # promote back to fp32 inside fp32-built flax modules
            exp.compute_dtype = "bfloat16"
        model = exp.get_model()
        variables = exp.init_model(model)
        if args.weights:
            ckpt = load_checkpoint(args.weights)
            variables = merge_variables(variables, ckpt["model"], strict=False)
        h = int(img0["height"] * args.in_scale)
        w = int(img0["width"] * args.in_scale)
        detector = TPUStreamDetector(
            model, variables, input_size=(h, w), in_scale=args.in_scale,
            conf_thre=args.conf, nms_thre=args.nms, num_classes=exp.num_classes,
            use_bf16=not args.fp32,
        )
        detector.warmup(5)

    # ---- 2. latency -> zoo
    zoo_path = os.path.join(args.out_dir, "runtime_zoo.pkl")
    name = args.zoo_name or f"{os.path.basename(args.config)}"
    if args.latency_ms:
        samples = [float(v) / 1e3 for v in args.latency_ms.split(",")]
    elif args.zoo:
        with open(args.zoo, "rb") as f:
            entries = pickle.load(f)
        if name not in entries:
            raise SystemExit(
                f"zoo entry '{name}' not in {args.zoo} "
                f"(has: {sorted(entries)}); pick one with --zoo-name")
        samples = list(entries[name]["samples"])
    elif args.measure:
        import jax

        if jax.default_backend() not in ("tpu",):
            print(f"[warn] --measure on backend '{jax.default_backend()}'")
        frame = np.asarray(
            255 * np.random.RandomState(0).rand(img0["height"], img0["width"], 3),
            np.uint8)
        samples = []
        for _ in range(args.measure):
            t0 = time.perf_counter()
            detector(frame)
            samples.append(time.perf_counter() - t0)
        print(f"[2/5] measured {len(samples)} per-call latencies: "
              f"mean {1e3 * np.mean(samples):.2f} ms, "
              f"p99 {1e3 * np.percentile(samples, 99):.2f} ms "
              "(includes host sync; through a remote relay prefer "
              "--measure-chain for the device step)")
    elif args.measure_chain:
        samples = _measure_chained_step(
            model, variables, exp, args, (h, w), args.measure_chain)
        print(f"[2/5] chained device step: min "
              f"{1e3 * np.min(samples):.3f} ms, median "
              f"{1e3 * np.median(samples):.3f} ms over "
              f"{len(samples)} samples of 50 chained steps each")
    else:
        raise SystemExit("need a latency source: --latency-ms, --zoo, "
                         "--measure, or --measure-chain")
    zoo = {}
    if os.path.isfile(zoo_path):
        with open(zoo_path, "rb") as f:
            zoo = pickle.load(f)
    zoo[name] = {"type": "empirical", "samples": samples}
    with open(zoo_path, "wb") as f:
        pickle.dump(zoo, f)
    runtime_dist = dist_from_zoo(zoo_path, name, perf_factor=args.perf_factor,
                                 seed=args.seed)

    # ---- 3. ground truth
    if args.gt == "oracle":
        print("[3/5] offline every-frame oracle run (pseudo-GT: sAP scores "
              "staleness vs the detector's own zero-latency output)")
        oracle_ccf = _offline_ccf(db, data_root, detector)
        with open(os.path.join(args.out_dir, "oracle_ccf.pkl"), "wb") as f:
            pickle.dump(oracle_ccf, f)
        pgt = pseudo_gt_from_detections(
            db.dataset, oracle_ccf, score_th=args.pgt_score_th)
        annot_path = os.path.join(args.out_dir, "pseudo_gt.json")
        with open(annot_path, "w") as f:
            json.dump(pgt, f)
        db = COCO(annot_path)
        assert len(pgt["annotations"]), (
            f"oracle produced no detections above score {args.pgt_score_th}; "
            "lower --pgt-score-th or pass trained --weights")

    # ---- 4. simulated-clock streaming run
    print(f"[4/5] streaming run: SimClock, latency mean "
          f"{1e3 * runtime_dist.mean():.3f} ms over {len(db.imgs)} frames")
    run_dir = os.path.join(args.out_dir, "stream_run")
    if args.perfect_detector:
        time_info = _run_perfect_streaming(
            db, run_dir, runtime_dist, fps=args.fps,
            det_stride=args.det_stride, dynamic_schedule=args.dynamic_schedule)
    else:
        time_info = run_streaming_detection(
            db, data_root, run_dir, detector, fps=args.fps,
            det_stride=args.det_stride, dynamic_schedule=args.dynamic_schedule,
            clock=SimClock(), runtime_dist=runtime_dist, overwrite=True,
        )

    # ---- 5. pairing + COCOeval
    print("[5/5] pairing + COCOeval")
    eval_summary, assoc = streaming_eval(
        db, run_dir, fps=args.fps, eta=args.eta, out_dir=run_dir,
        overwrite=True,
    )
    stats = [float(v) for v in eval_summary["stats"]] if eval_summary else []
    summary = {
        "config": os.path.basename(args.config),
        "gt": args.gt,
        "fps": args.fps,
        "latency_ms": {
            "mean": round(1e3 * runtime_dist.mean(), 3),
            "min": round(1e3 * runtime_dist.min(), 3),
            "max": round(1e3 * runtime_dist.max(), 3),
            "n_samples": len(samples),
        },
        "perf_factor": args.perf_factor,
        "frames": {"total": time_info["n_total"],
                   "processed": time_info["n_processed"],
                   "faster_than_frame_interval": time_info["n_small_runtime"]},
        "association": assoc,
        "sAP": round(100 * stats[0], 2) if stats else None,
        "sAP50": round(100 * stats[1], 2) if stats else None,
        "sAP75": round(100 * stats[2], 2) if stats else None,
    }
    with open(os.path.join(args.out_dir, "rehearsal_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print("| config | latency (ms) | fps | frames | in_time | mismatch | "
          "sAP | sAP50 | sAP75 |")
    print(f"| {summary['config']} | {summary['latency_ms']['mean']:.2f} | "
          f"{args.fps:g} | {time_info['n_processed']}/{time_info['n_total']} | "
          f"{assoc['in_time']} | {assoc['mismatch']} | "
          f"{summary['sAP']} | {summary['sAP50']} | {summary['sAP75']} |")


if __name__ == "__main__":
    main()
