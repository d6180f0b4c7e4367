"""Sequential-dedup eval forward: one backbone pass per unique frame.

The reference's offline dual-frame eval (and our off_pipe path) runs the
backbone+PAFPN on BOTH halves of every 6-channel sample
(`/root/reference/exps/model/dfp_pafpn.py:120-167`), but on a sequential
video sample i's support frame IS an earlier sample's current frame — half
the backbone work recomputes features already produced. This wrapper
evaluates with the model's ``mode='seq'``: a single batched pafpn pass over
the current frames, support features gathered as the batch-shifted outputs
(the previous batch's last two frames ride in an HBM-resident carry, exactly
like the online DFP buffer). The per-row shift encodes the dataset's pairing
rule — ONE: support = t-1 (shift 0 at boundaries); TWO: support = t-2
(shift 1 or 0 at its boundaries). Bit-identical to off_pipe eval because BN
uses running stats; ~2x fewer backbone FLOPs per image.

Requires the val loader to traverse the dataset sequentially and unsharded
(shuffle=False, single process) — the constructor asserts what it can.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from streamyolo_tpu.data.datasets import TWO_ARGOVERSEDataset


def support_shifts(dataset) -> np.ndarray:
    """Per-dataset-index support shift s (support frame = frame idx-s),
    mirroring the dataset's ``_load_anno_from_id`` boundary rules.

    ONE pairing (`tal_flip_one_future_argoversedataset.py:74-91`): shift 1,
    or 0 (self) at fid==0 / dataset tail / sequence tail.  TWO pairing
    (`tal_flip_two_future_argoversedataset.py:73-103`): shift 2, degrading to
    1 (fid==1, next-to-last rows, next-next frame starts a sequence) or 0.
    """
    images = dataset.coco.dataset["images"]
    n = len(dataset.ids)
    two = isinstance(dataset, TWO_ARGOVERSEDataset)
    shifts = np.zeros(n, np.int32)
    for idx, id_ in enumerate(dataset.ids):
        i = int(id_)
        if two:
            if images[i]["fid"] == 0:
                s = 0
            elif images[i]["fid"] == 1:
                s = 1
            elif i == n - 1:
                s = 0
            elif i + 1 == n - 1:
                s = 1
            elif images[i + 1]["fid"] == 0:
                s = 0
            elif images[i + 2]["fid"] == 0:
                s = 1
            else:
                s = 2
        else:
            if images[i]["fid"] == 0 or i == n - 1 or images[i + 1]["fid"] == 0:
                s = 0
            else:
                s = 1
        shifts[idx] = s
    return shifts


class SequentialDedupForward:
    """Drop-in ``forward_fn`` for ``BaseEvaluator.evaluate`` (it advertises
    ``needs_ids`` so the evaluator passes the batch's image ids; padded tail
    rows self-fuse harmlessly and are sliced off downstream).

    ``verify_fn`` (the off_pipe forward over the same variables) arms a
    first-batch parity assertion: the first batch is also run dual-frame and
    the decoded predictions must agree within ``verify_tol`` — the in-run
    guard for making dedup the DEFAULT eval path. The first batch covers the
    hardest rows (fid==0 self-support boundaries), and any wiring error
    (wrong shifts, stale carry, mismatched variables) shows up there."""

    needs_ids = True

    def __init__(self, model, variables: Dict[str, Any], dataset, jit_fn=None,
                 verify_fn=None, verify_tol=(1e-4, 1e-4)):
        import jax

        self._model = model
        self._variables = variables
        self._shifts = support_shifts(dataset)
        self._id_to_idx = {int(v): k for k, v in enumerate(dataset.ids)}
        self._carry = None
        self._saw_partial = False
        self._verify_fn = verify_fn
        self._verify_tol = verify_tol

        def run(v, frames, carry, shifts):
            return model.apply(
                v, frames, buffer=carry, mode="seq", support_shift=shifts
            )

        # ``jit_fn`` lets a caller that evaluates repeatedly with fresh
        # variables (the Trainer's per-epoch EMA eval) reuse one compiled
        # program: variables are a traced ARGUMENT, but each fresh closure
        # would key its own jit cache entry.
        self._jit = jax.jit(run) if jit_fn is None else jit_fn

    @property
    def jit_fn(self):
        return self._jit

    def reset(self):
        self._carry = None
        self._saw_partial = False

    def __call__(self, images: np.ndarray, ids) -> Any:
        n_real = len(ids)
        # Padded rows (shift 0) of a partial batch enter the 2-frame carry via
        # ext[-2:]; that is only safe because a partial batch can occur at the
        # dataset tail ONLY. A loader that pads mid-epoch would corrupt the
        # next batch's support features — assert it never happens.
        assert not self._saw_partial, (
            "SequentialDedupForward received a batch after a partial batch; "
            "partial batches are only valid at the dataset tail (call reset() "
            "between epochs)"
        )
        if n_real < images.shape[0]:
            self._saw_partial = True
        shifts = np.zeros(images.shape[0], np.int32)  # padded rows self-fuse
        shifts[:n_real] = [
            self._shifts[self._id_to_idx[int(np.asarray(i).reshape(-1)[0])]]
            for i in ids
        ]
        preds, self._carry = self._jit(
            self._variables, images[..., :3], self._carry, shifts
        )
        if self._verify_fn is not None:
            self._assert_first_batch_parity(images, preds, n_real)
            self._verify_fn = None
        return preds

    def _assert_first_batch_parity(self, images, preds, n_real: int):
        """Run the dual-frame (off_pipe) forward on the same batch and assert
        the decoded predictions agree — box channels and score channels
        checked separately (boxes are pixel-scale, scores are sigmoided)."""
        from streamyolo_tpu.utils.logger import get_logger

        atol_box, atol_score = self._verify_tol
        want = np.asarray(self._verify_fn(images), np.float32)[:n_real]
        got = np.asarray(preds, np.float32)[:n_real]
        box_diff = float(np.abs(got[..., :4] - want[..., :4]).max())
        score_diff = float(np.abs(got[..., 4:] - want[..., 4:]).max())
        if box_diff > atol_box or score_diff > atol_score:
            raise AssertionError(
                "sequential-dedup eval disagrees with the dual-frame forward "
                f"on the first batch: max box diff {box_diff:.3e} px (tol "
                f"{atol_box:g}), max score diff {score_diff:.3e} (tol "
                f"{atol_score:g}). The dedup carry/shift wiring does not "
                "match this dataset's pairing — rerun with --no-dedup and "
                "report the config."
            )
        get_logger().info(
            "dedup parity check passed on the first batch: "
            f"max box diff {box_diff:.2e} px, max score diff {score_diff:.2e}"
        )
