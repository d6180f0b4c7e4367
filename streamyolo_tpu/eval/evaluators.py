"""Offline streaming-AP evaluators (ONEX / TWOX / STILL).

Capability parity with `/root/reference/exps/evaluators/`:

  * ``ONEX_COCOEvaluator`` (`onex_stream_evaluator.py:55-268`): batched
    offline eval of the dual-frame model; the prediction made from the input
    pair at image id t is written under ``image_id = t+1`` (the future frame)
    — the "pseudo-streaming" sAP trick. Sequence-boundary rules replicated
    exactly, including the reference's quirks:
      - detections for ids [15060, 15061] are dropped (`:191` hard-code);
      - frames whose NEXT image has fid==0 are dropped (`:193`);
      - frames with fid==0 hit a branch that assigns ``idd`` but never
        appends (the append sits in the else block, `:195-207`) — so they
        contribute no detections;
  * ``TWOX_COCOEvaluator`` (`twox_stream_evaluator.py`): same with a t+2
    shift and wider boundary skips;
  * ``STILL_COCOEvaluator`` (`still_stream_evaluator.py`): plain COCO eval.

TPU-native re-design: the model forward + decode + fixed-shape NMS run as ONE
jitted program per batch (`streamyolo_tpu.ops.nms.postprocess_fixed``); only
the final [K, 8] detection rows cross to the host. Forward/NMS wall-times are
reported with the same meter names as the reference (`:136-153`).
"""

from __future__ import annotations

import itertools
import time
from typing import Callable, List, Sequence

import numpy as np

from streamyolo_tpu.eval.cocoeval import COCOeval_opt
from streamyolo_tpu.utils.logger import get_logger


def per_class_AP_table(coco_eval, class_names: Sequence[str], headers=("class", "AP"), colums=6):
    """Per-class AP table (`onex_stream_evaluator.py:31-52`)."""
    from tabulate import tabulate

    per_class_AP = {}
    precisions = coco_eval.eval["precision"]
    assert len(class_names) == precisions.shape[2]
    for idx, name in enumerate(class_names):
        precision = precisions[:, :, idx, 0, -1]
        precision = precision[precision > -1]
        ap = np.mean(precision) if precision.size else float("nan")
        per_class_AP[name] = float(ap * 100)

    num_cols = min(colums, len(per_class_AP) * len(headers))
    result_pair = [x for pair in per_class_AP.items() for x in pair]
    row_pair = itertools.zip_longest(*[result_pair[i::num_cols] for i in range(num_cols)])
    table_headers = headers * (num_cols // len(headers))
    return tabulate(
        row_pair, tablefmt="pipe", floatfmt=".3f", headers=table_headers, numalign="left"
    )


class _StreamEvaluatorBase:
    """Shared driver: iterate the val loader, run the jitted forward+NMS,
    convert to COCO json rows, run COCOeval."""

    def __init__(
        self,
        dataloader,
        img_size,
        confthre: float,
        nmsthre: float,
        num_classes: int,
        testdev: bool = False,
        per_class_AP: bool = False,
    ):
        self.dataloader = dataloader
        self.img_size = img_size
        self.confthre = confthre
        self.nmsthre = nmsthre
        self.num_classes = num_classes
        self.testdev = testdev
        self.per_class_AP = per_class_AP

    @property
    def dataset(self):
        ds = self.dataloader.dataset
        # unwrap adapter layers (loader._IndexUnpackDataset / mosaic wrapper)
        for attr in ("dataset", "_dataset"):
            while hasattr(ds, attr):
                ds = getattr(ds, attr)
        return ds

    def evaluate(
        self,
        forward_fn: Callable[[np.ndarray], np.ndarray],
        distributed: bool = None,
        half: bool = False,
        return_outputs: bool = False,
    ):
        """Run the full evaluation.

        Args:
          forward_fn: jitted fn, NHWC image batch (uint8 from the
            loader — the model casts on device; float accepted) -> decoded
            predictions [B, N, 5 + num_classes] (obj/cls already sigmoided).
          distributed: gather per-process detections to every host before
            COCOeval. ``None`` (default) auto-detects multi-process runs the
            same way ``get_eval_loader`` auto-shards the dataset
            (``jax.process_count() > 1``) — sharded data without the gather
            would score each host's shard alone. Mirrors the reference's
            unconditional gather-to-rank-0
            (`onex_stream_evaluator.py:158-161`).
        """
        from streamyolo_tpu.ops.nms import candidate_counts, postprocess_fixed

        if distributed is None:
            import jax

            distributed = jax.process_count() > 1

        data_list: List[dict] = []
        inference_time = 0.0
        nms_time = 0.0
        n_saturated = 0
        n_samples = max(len(self.dataloader) - 1, 1)

        batch_size = getattr(self.dataloader, "batch_size", None)
        for cur_iter, batch in enumerate(self.dataloader):
            imgs, _, info_imgs, ids = batch
            is_time_iter = cur_iter < len(self.dataloader) - 1

            # Pad the last partial batch to the fixed batch size: XLA compiles
            # per shape, and a second full compile for the tail batch costs
            # far more than the padded rows (padding outputs are sliced off).
            n_real = imgs.shape[0]
            if batch_size and n_real < batch_size:
                pad = np.zeros((batch_size - n_real,) + imgs.shape[1:], imgs.dtype)
                imgs = np.concatenate([imgs, pad], axis=0)

            if is_time_iter:
                start = time.perf_counter()
            if getattr(forward_fn, "needs_ids", False):
                # sequential-dedup forward (eval/seq_forward.py) maps ids to
                # the dataset's self-support boundary flags
                preds = forward_fn(np.asarray(imgs), ids)
            else:
                preds = forward_fn(np.asarray(imgs))
            fixed = postprocess_fixed(
                preds, self.num_classes, self.confthre, self.nmsthre
            )
            # slice padded rows off AFTER the fixed-shape postprocess so the
            # NMS program compiles once too
            dets = np.asarray(fixed)[:n_real]  # device sync
            if dets.shape[1] < np.shape(preds)[1]:  # K < anchors: cap can bite
                n_saturated += int(
                    (candidate_counts(dets, self.confthre) >= dets.shape[1]).sum()
                )
            if is_time_iter:
                # forward+NMS are one fused program on TPU; report the whole
                # step under "inference" and keep the NMS meter at the tiny
                # host-side unpack cost for surface parity.
                infer_end = time.perf_counter()
                inference_time += infer_end - start
            outputs = [
                (row[row[:, 7] > 0.5][:, :7] if (row[:, 7] > 0.5).any() else None)
                for row in dets
            ]
            if is_time_iter:
                nms_time += time.perf_counter() - infer_end
            data_list.extend(self.convert_to_coco_format(outputs, info_imgs, ids))

        if n_saturated:
            get_logger().warning(
                "pre-NMS candidate selection saturated on %d image(s) at conf "
                "%.4g (the reference NMS is uncapped) — rerun with a larger "
                "pre_nms_topk if the COCO rows matter at this density",
                n_saturated, self.confthre,
            )
        statistics = np.array([inference_time, nms_time, n_samples])
        if distributed:
            # multi-host: gather detection lists from every process and sum
            # the timing meters; only the main process evaluates (the
            # reference's `gather`/`reduce` to rank 0,
            # `onex_stream_evaluator.py:158-161` — SPMD all-gather here).
            from streamyolo_tpu.parallel import (
                all_gather_objects,
                is_main_process,
                psum_stats,
            )

            gathered = all_gather_objects(data_list)
            data_list = list(itertools.chain(*gathered))
            statistics = psum_stats(statistics)
            if not is_main_process():
                return (0.0, 0.0, None) if not return_outputs else (
                    (0.0, 0.0, None), data_list
                )
        eval_results = self.evaluate_prediction(data_list, statistics)
        if return_outputs:
            return eval_results, data_list
        return eval_results

    # -- conversion (quirks replicated per subclass) --------------------------

    def _scale_boxes(self, output, img_h, img_w):
        bboxes = output[:, 0:4].copy()
        scale = min(self.img_size[0] / float(img_h), self.img_size[1] / float(img_w))
        bboxes /= scale
        # xyxy -> ltwh
        bboxes[:, 2] = bboxes[:, 2] - bboxes[:, 0]
        bboxes[:, 3] = bboxes[:, 3] - bboxes[:, 1]
        return bboxes

    def convert_to_coco_format(self, outputs, info_imgs, ids):
        raise NotImplementedError

    def evaluate_prediction(self, data_dict, statistics):
        logger = get_logger()
        logger.info("Evaluate in main process...")

        inference_time, nms_time, n_samples = statistics
        bs = getattr(self.dataloader, "batch_size", None) or 1
        a_infer_time = 1000 * inference_time / (n_samples * bs)
        a_nms_time = 1000 * nms_time / (n_samples * bs)
        # NOTE the labels: on TPU the forward and NMS run as ONE fused XLA
        # program, so the whole device step is reported under
        # "forward+NMS (fused)" and the second meter is only the host-side
        # row unpack. The meter names keep the reference's two-column layout
        # (`onex_stream_evaluator.py:219-234`); the labels say what each
        # column actually measures here.
        time_info = ", ".join(
            f"Average {k} time: {v:.2f} ms"
            for k, v in zip(
                ["forward+NMS (fused)", "host unpack", "inference"],
                [a_infer_time, a_nms_time, a_infer_time + a_nms_time],
            )
        )
        info = time_info + "\n"

        if len(data_dict) > 0:
            cocoGt = self.dataset.coco
            cocoDt = cocoGt.loadRes(data_dict)
            coco_eval = COCOeval_opt(cocoGt, cocoDt, "bbox")
            coco_eval.evaluate()
            coco_eval.accumulate()
            coco_eval.summarize()
            # full 12-stat vector (AP, AP50, AP75, ...) for consumers that
            # need more than the (AP, AP50) return — tools/validate_baseline.py
            self.last_stats = np.asarray(coco_eval.stats, dtype=np.float64)
            info += str(coco_eval) + "\n"
            if self.per_class_AP:
                from streamyolo_tpu.data.argoverse_classes import ARGOVERSE_CLASSES

                info += "per class AP:\n" + per_class_AP_table(
                    coco_eval, ARGOVERSE_CLASSES
                ) + "\n"
            return coco_eval.stats[0], coco_eval.stats[1], info
        return 0.0, 0.0, info


class ONEX_COCOEvaluator(_StreamEvaluatorBase):
    """1x-velocity pseudo-streaming evaluator (image_id shift t -> t+1)."""

    def convert_to_coco_format(self, outputs, info_imgs, ids):
        data_list = []
        images = self.dataset.coco.dataset["images"]
        class_ids = self.dataset.class_ids
        for output, img_h, img_w, img_id in zip(
            outputs, info_imgs[0], info_imgs[1], ids
        ):
            if output is None:
                continue
            bboxes = self._scale_boxes(output, img_h, img_w)
            cls = output[:, 6]
            scores = output[:, 4] * output[:, 5]
            img_id = int(np.asarray(img_id).reshape(-1)[0])

            for ind in range(bboxes.shape[0]):
                label = class_ids[int(cls[ind])]
                # Quirks replicated from `onex_stream_evaluator.py:191-207`.
                # The +1 bound guard can't trigger on Argoverse val (the
                # hard-coded id skip covers the dataset tail) but keeps
                # synthetic datasets safe.
                if img_id in (15060, 15061) or img_id + 1 >= len(images):
                    continue
                elif images[img_id + 1]["fid"] == 0:
                    continue
                elif images[img_id]["fid"] == 0:
                    # reference assigns idd but never appends (dead branch)
                    continue
                else:
                    data_list.append(
                        {
                            "image_id": img_id + 1,
                            "category_id": label,
                            "bbox": bboxes[ind].tolist(),
                            "score": float(scores[ind]),
                            "segmentation": [],
                        }
                    )
        return data_list


class TWOX_COCOEvaluator(_StreamEvaluatorBase):
    """2x-velocity evaluator (shift t -> t+2, wider boundary skips;
    `twox_stream_evaluator.py:188-206`)."""

    def convert_to_coco_format(self, outputs, info_imgs, ids):
        data_list = []
        images = self.dataset.coco.dataset["images"]
        class_ids = self.dataset.class_ids
        n_images = len(images)
        for output, img_h, img_w, img_id in zip(
            outputs, info_imgs[0], info_imgs[1], ids
        ):
            if output is None:
                continue
            bboxes = self._scale_boxes(output, img_h, img_w)
            cls = output[:, 6]
            scores = output[:, 4] * output[:, 5]
            img_id = int(np.asarray(img_id).reshape(-1)[0])

            for ind in range(bboxes.shape[0]):
                label = class_ids[int(cls[ind])]
                # `twox_stream_evaluator.py:188-206` (the fid 0/1 branches
                # assign idd but never append — dead branches). The +2 bound
                # guard can't trigger on Argoverse val (the hard-coded skip
                # covers the tail) but keeps synthetic datasets safe.
                if img_id in (15060, 15061) or img_id + 2 >= n_images:
                    continue
                elif images[img_id + 1]["fid"] == 0:
                    continue
                elif images[img_id + 2]["fid"] == 0:
                    continue
                elif images[img_id]["fid"] in (0, 1):
                    continue
                else:
                    data_list.append(
                        {
                            "image_id": img_id + 2,
                            "category_id": label,
                            "bbox": bboxes[ind].tolist(),
                            "score": float(scores[ind]),
                            "segmentation": [],
                        }
                    )
        return data_list


class STILL_COCOEvaluator(_StreamEvaluatorBase):
    """Plain COCO evaluator, no id shift (`still_stream_evaluator.py:159-168`)."""

    def convert_to_coco_format(self, outputs, info_imgs, ids):
        data_list = []
        class_ids = self.dataset.class_ids
        for output, img_h, img_w, img_id in zip(
            outputs, info_imgs[0], info_imgs[1], ids
        ):
            if output is None:
                continue
            bboxes = self._scale_boxes(output, img_h, img_w)
            cls = output[:, 6]
            scores = output[:, 4] * output[:, 5]
            for ind in range(bboxes.shape[0]):
                data_list.append(
                    {
                        "image_id": int(img_id),
                        "category_id": class_ids[int(cls[ind])],
                        "bbox": bboxes[ind].tolist(),
                        "score": float(scores[ind]),
                        "segmentation": [],
                    }
                )
        return data_list
