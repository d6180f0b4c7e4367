"""C++-accelerated COCOeval (the ``COCOeval_opt`` role).

Same algorithm as ``streamyolo_tpu.eval.cocoeval.COCOeval``; the per-image
T x D x G greedy matching loop — the Python hot spot — runs in the native
kernel (``native/streamyolo_native.cpp``). The NumPy implementation stays as
the oracle, mirroring the reference's COCOeval_opt / pycocotools fallback
pair (`/root/reference/exps/evaluators/onex_stream_evaluator.py:251-254`).
"""

from __future__ import annotations

import numpy as np

from streamyolo_tpu.eval.cocoeval import COCOeval
from streamyolo_tpu.native import cocoeval_match_image_cpp


class COCOeval_opt(COCOeval):
    def evaluateImg(self, imgId, catId, aRng, maxDet):
        gt = self._gts[(imgId, catId)]
        dt = self._dts[(imgId, catId)]
        if len(gt) == 0 and len(dt) == 0:
            return None
        p = self.params

        for g in gt:
            g["_ignore"] = 1 if (
                g["ignore"] or g["area"] < aRng[0] or g["area"] > aRng[1]
            ) else 0

        gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in dtind[:maxDet]]
        iscrowd = np.array([int(g.get("iscrowd", 0)) for g in gt], np.uint8)
        ious = (
            self.ious[(imgId, catId)][:, gtind]
            if len(self.ious[(imgId, catId)]) > 0
            else self.ious[(imgId, catId)]
        )

        T = len(p.iouThrs)
        G = len(gt)
        D = len(dt)
        gtIg = np.array([g["_ignore"] for g in gt])
        if len(ious) and D and G:
            dtm, gtm, dtIg = cocoeval_match_image_cpp(
                np.asarray(ious, np.float64)[:D],
                gtIg.astype(np.uint8),
                iscrowd,
                np.asarray(p.iouThrs, np.float64),
                np.array([d["id"] for d in dt], np.int64),
                np.array([g["id"] for g in gt], np.int64),
            )
            dtm = dtm.astype(np.float64)
            gtm = gtm.astype(np.float64)
            dtIg = dtIg.astype(np.float64)
        else:
            dtm = np.zeros((T, D))
            gtm = np.zeros((T, G))
            dtIg = np.zeros((T, D))

        a = np.array(
            [d["area"] < aRng[0] or d["area"] > aRng[1] for d in dt]
        ).reshape(1, D)
        dtIg = np.logical_or(dtIg, np.logical_and(dtm == 0, np.repeat(a, T, 0)))
        return {
            "image_id": imgId,
            "category_id": catId,
            "aRng": aRng,
            "maxDet": maxDet,
            "dtIds": [d["id"] for d in dt],
            "gtIds": [g["id"] for g in gt],
            "dtMatches": dtm,
            "gtMatches": gtm,
            "dtScores": [d["score"] for d in dt],
            "gtIgnore": gtIg,
            "dtIgnore": dtIg,
        }
