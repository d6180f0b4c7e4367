"""Streaming-evaluation pairing pass (sAP): match timestamped detector
outputs to ground-truth frame times, then COCO-evaluate.

Capability parity with `/root/reference/sAP/streamyolo/streaming_eval.py:46-167`
and the ``eval_ccf`` wrapper (`sAP/det/__init__.py:180-200`):

  * for each GT frame ii of a sequence, the query time is ``(ii - eta)/fps``;
    the paired prediction is the LAST detector output with timestamp <= t;
  * ``miss`` counts frames with no output yet, ``in_time`` counts exact
    input-frame matches, ``mismatch`` accumulates the frame-index lag;
  * paired boxes (ltrb, original image scale) convert to COCO ltwh rows and
    run through COCOeval -> the sAP table.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from streamyolo_tpu.eval.cocoeval import COCOeval_opt
from streamyolo_tpu.utils.logger import get_logger


# re-exported here because the pairing pass is its main consumer
from streamyolo_tpu.stream.bbox import ltrb2ltwh  # noqa: E402


def pair_streaming_results(
    db,
    results_by_seq: Dict[str, Dict],
    fps: float = 30.0,
    eta: int = 0,
) -> Tuple[List[dict], Dict[str, int]]:
    """Pair per-sequence streaming outputs with gt frames.

    Args:
      db: COCO index with ``sequences`` in the dataset root.
      results_by_seq: seq name -> dict(results_parsed, timestamps, input_fidx).

    Returns (results_ccf, {miss, in_time, mismatch}).
    """
    seqs = db.dataset["sequences"]
    results_ccf: List[dict] = []
    in_time = 0
    miss = 0
    mismatch = 0

    for sid, seq in enumerate(seqs):
        frame_list = [img for img in db.imgs.values() if img["sid"] == sid]
        results = results_by_seq[seq]
        results_parsed = results["results_parsed"]
        timestamps = results["timestamps"]
        input_fidx = results["input_fidx"]

        tidx_p1 = 0
        for ii, img in enumerate(frame_list):
            t = (ii - eta) / fps
            while tidx_p1 < len(timestamps) and timestamps[tidx_p1] <= t:
                tidx_p1 += 1
            if tidx_p1 == 0:
                miss += 1
                bboxes, scores, labels = [], [], []
            else:
                tidx = tidx_p1 - 1
                ifidx = input_fidx[tidx]
                in_time += int(ii == ifidx)
                mismatch += ii - ifidx
                bboxes, scores, labels = results_parsed[tidx][:3]

            n = len(bboxes)
            if n:
                bboxes_ltwh = ltrb2ltwh(np.asarray(bboxes))
            for i in range(n):
                results_ccf.append(
                    {
                        "image_id": img["id"],
                        "bbox": [float(v) for v in bboxes_ltwh[i]],
                        "score": float(scores[i]),
                        "category_id": int(labels[i]),
                    }
                )
    return results_ccf, {"miss": miss, "in_time": in_time, "mismatch": mismatch}


def detections_for_image(
    results_ccf: Sequence[dict],
    image_id: int,
    start_idx: Optional[int] = None,
) -> Tuple[Optional[int], np.ndarray, np.ndarray, np.ndarray]:
    """Detections of one image id from a CCF result list (the
    ``result_from_ccf`` role, `/root/reference/sAP/det/__init__.py:202-224`):
    returns ``(next_start_idx, bboxes_ltwh [N,4], scores [N], category_ids
    [N])``.

    With ``start_idx`` the list is assumed image_id-sorted (the order
    ``pair_streaming_results`` emits) and scanned forward from there —
    ``next_start_idx`` then lets a caller sweep a whole db in one pass;
    without it, the list is filtered in full and ``next_start_idx`` is None.
    """
    if start_idx is not None:
        i = start_idx
        while i < len(results_ccf) and results_ccf[i]["image_id"] < image_id:
            i += 1
        end = i
        while end < len(results_ccf) and \
                results_ccf[end]["image_id"] == image_id:
            end += 1
        dets, nxt = results_ccf[i:end], end
    else:
        dets, nxt = [r for r in results_ccf if r["image_id"] == image_id], None
    return (
        nxt,
        np.asarray([d["bbox"] for d in dets], np.float64).reshape(-1, 4),
        np.asarray([d["score"] for d in dets], np.float64),
        np.asarray([d["category_id"] for d in dets], np.int64),
    )


def eval_ccf(db, results_ccf: Sequence[dict], img_ids=None):
    """COCO-evaluate CCF-format results against ``db``
    (`sAP/det/__init__.py:180-200` capability, on our native COCOeval)."""
    if len(results_ccf) == 0:
        return None
    cocoDt = db.loadRes(list(results_ccf))
    coco_eval = COCOeval_opt(db, cocoDt, "bbox")
    if img_ids is not None:
        coco_eval.params.imgIds = list(img_ids)
    coco_eval.evaluate()
    coco_eval.accumulate()
    coco_eval.summarize()
    return {"stats": coco_eval.stats, "eval": coco_eval.eval}


def streaming_eval(
    db,
    result_dir: str,
    fps: float = 30.0,
    eta: int = 0,
    out_dir: Optional[str] = None,
    overwrite: bool = False,
):
    """Full offline pairing + eval pass over a detection run directory
    (per-seq pkls from ``run_streaming_detection``)."""
    logger = get_logger()
    out_dir = out_dir or result_dir
    os.makedirs(out_dir, exist_ok=True)

    results_by_seq = {}
    for seq in db.dataset["sequences"]:
        with open(os.path.join(result_dir, seq + ".pkl"), "rb") as f:
            results_by_seq[seq] = pickle.load(f)

    logger.info("Pairing the output with the ground truth")
    results_ccf, assoc = pair_streaming_results(db, results_by_seq, fps, eta)

    with open(os.path.join(out_dir, "results_ccf.pkl"), "wb") as f:
        pickle.dump(results_ccf, f)
    with open(os.path.join(out_dir, "eval_assoc.pkl"), "wb") as f:
        pickle.dump(assoc, f)

    eval_summary = eval_ccf(db, results_ccf)
    if eval_summary is not None:
        with open(os.path.join(out_dir, "eval_summary.pkl"), "wb") as f:
            pickle.dump(eval_summary, f)
        logger.info(
            f"sAP: {eval_summary['stats'][0] * 100:.1f}  "
            f"sAP50: {eval_summary['stats'][1] * 100:.1f}  "
            f"sAP75: {eval_summary['stats'][2] * 100:.1f}"
        )
    logger.info(f"association: {assoc}")
    return eval_summary, assoc
