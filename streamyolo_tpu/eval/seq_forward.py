"""Sequential-dedup eval forward: one backbone pass per unique frame.

The reference's offline dual-frame eval (and our off_pipe path) runs the
backbone+PAFPN on BOTH halves of every 6-channel sample
(`/root/reference/exps/model/dfp_pafpn.py:120-167`), but on a sequential
video sample i's support frame IS sample i-1's current frame — half the
backbone work recomputes the previous sample's features. This wrapper
evaluates with the model's ``mode='seq'``: a single batched pafpn pass over
the current frames, support features taken as the batch-shifted outputs
(the previous batch's last frame rides in an HBM-resident carry, exactly
like the online DFP buffer), except at the ONE dataset's self-support
boundaries. Bit-identical to off_pipe eval because BN uses running stats;
~2x fewer backbone FLOPs per image.

Requires the val loader to traverse the dataset sequentially and unsharded
(shuffle=False, single process) — the constructor asserts what it can.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def self_support_flags(dataset) -> np.ndarray:
    """Per-dataset-index bool: True where the ONE dataset pairs the frame
    with ITSELF (mirrors ``ONE_ARGOVERSEDataset._load_anno_from_id``:
    fid==0, dataset tail, or next frame starts a new sequence)."""
    images = dataset.coco.dataset["images"]
    n = len(dataset.ids)
    flags = np.zeros(n, bool)
    for idx, id_ in enumerate(dataset.ids):
        i = int(id_)
        flags[idx] = (
            images[i]["fid"] == 0
            or i == n - 1
            or images[i + 1]["fid"] == 0
        )
    return flags


class SequentialDedupForward:
    """Drop-in ``forward_fn`` for ``BaseEvaluator.evaluate`` (it advertises
    ``needs_ids`` so the evaluator passes the batch's image ids; padded tail
    rows self-fuse harmlessly and are sliced off downstream)."""

    needs_ids = True

    def __init__(self, model, variables: Dict[str, Any], dataset):
        import jax

        self._model = model
        self._variables = variables
        self._flags = self_support_flags(dataset)
        self._id_to_idx = {int(v): k for k, v in enumerate(dataset.ids)}
        self._carry = None

        def run(v, frames, carry, flags):
            return model.apply(
                v, frames, buffer=carry, mode="seq", is_self_support=flags
            )

        self._jit = jax.jit(run)

    def reset(self):
        self._carry = None

    def __call__(self, images: np.ndarray, ids) -> Any:
        n_real = len(ids)
        flags = np.ones(images.shape[0], bool)  # padded rows self-fuse
        flags[:n_real] = [
            self._flags[self._id_to_idx[int(np.asarray(i).reshape(-1)[0])]]
            for i in ids
        ]
        preds, self._carry = self._jit(
            self._variables, images[..., :3], self._carry, flags
        )
        return preds
