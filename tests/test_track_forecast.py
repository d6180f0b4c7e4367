"""Track association + Kalman forecasting tests (hand-verified geometry)."""

import numpy as np
import pytest

from streamyolo_tpu.stream import (
    KFForecaster,
    bbox_extrap_lin,
    extrap_clean_up,
    iou_assoc,
    iou_assoc_no_tracks,
    iou_ltwh,
    track_based_shuffle,
)


def test_iou_ltwh():
    a = np.array([[0.0, 0, 10, 10]])
    b = np.array([[5.0, 0, 10, 10], [100.0, 100, 5, 5]])
    iou = iou_ltwh(a, b)
    assert iou[0, 0] == pytest.approx(50 / 150)
    assert iou[0, 1] == 0.0


def test_iou_assoc_matches_and_new_tracks():
    prev = np.array([[0.0, 0, 10, 10], [50.0, 50, 10, 10]])
    prev_labels = np.array([1, 2])
    tracks = np.array([7, 9])
    new = np.array([[1.0, 0, 10, 10], [200.0, 200, 10, 10]])
    new_labels = np.array([1, 1])
    order1, order2, n_matched, tracks2, tkidx = iou_assoc(
        prev, prev_labels, tracks, 10, new, new_labels, 0.3
    )
    assert n_matched == 1
    assert tracks2[0] == 7          # matched keeps its id
    assert tracks2[1] == 10         # unmatched new gets a fresh id
    assert tkidx == 11
    assert order2 == [0, 1]


def test_iou_assoc_label_gate():
    prev = np.array([[0.0, 0, 10, 10]])
    new = np.array([[0.0, 0, 10, 10]])  # perfect overlap, wrong class
    _, _, n_matched = iou_assoc_no_tracks(prev, [1], new, [2], 0.3)
    assert n_matched == 0


def test_track_based_shuffle():
    order1, order2, n = track_based_shuffle(
        np.array([3, 5, 8]), np.array([8, 1, 3])
    )
    assert n == 2
    assert set(order1[:2].tolist()) == {0, 2}
    assert set(order2[:2].tolist()) == {0, 2}


def test_extrap_clean_up_drops_small_and_offscreen():
    boxes = np.array(
        [
            [10.0, 10, 20, 20],    # fine
            [-100.0, 10, 20, 20],  # clipped away entirely -> w 0
            [10.0, 10, 4, 4],      # area 16 < 75
        ]
    )
    kept, keep = extrap_clean_up(boxes, 200, 200, min_size=75, lt=True)
    assert keep.tolist() == [True, False, False]
    np.testing.assert_allclose(kept[0], [10, 10, 20, 20])


def test_linear_extrapolation():
    b1 = np.array([[0.0, 0, 10, 10]])
    b2 = np.array([[5.0, 0, 10, 10]])
    b3, keep = bbox_extrap_lin(b1, b2, 1.0, 200, 200)
    np.testing.assert_allclose(b3[0], [10, 0, 10, 10])


def test_kf_forecaster_constant_velocity():
    """A box moving +30 px/s: after two observations the KF velocity should
    carry the forecast forward."""
    f = KFForecaster(match_iou_th=0.3)
    n = 30
    for k in range(n):
        t = k * 0.1
        box = np.array([[10.0 + 30 * t, 20.0, 40.0, 30.0]])
        f.update(t, box, np.array([0.9]), np.array([2]))
    assert len(f.tracks) == 1  # one stable track across all updates
    t_query = n * 0.1  # one period past the last observation
    bboxes, scores, labels, tracks = f.forecast(t_query, 1920, 1200)
    assert labels[0] == 2 and tracks[0] == 0
    # converged filter: forecast within 2px of the true position (the
    # reference's covariances R=10I / P0=100I / Q=dt^2 I are slow starters,
    # so convergence needs a couple dozen updates)
    assert bboxes[0][0] == pytest.approx(10.0 + 30 * t_query, abs=2.0)
    # and strictly ahead of the last observation: velocity was learned
    assert bboxes[0][0] > 10.0 + 30 * (n - 1) * 0.1


def test_kf_forecaster_new_and_lost_tracks():
    f = KFForecaster()
    f.update(0.0, np.array([[0.0, 0, 10, 10]]), np.array([1.0]), np.array([1]))
    # second frame: the old object gone, a new one far away
    f.update(0.1, np.array([[500.0, 500, 10, 10]]), np.array([1.0]), np.array([1]))
    assert f.tkidx == 2
    assert f.tracks.tolist() == [1]  # only the new track remains live


def test_posthoc_forecast_improves_lagged_run(fake_argoverse):
    """Post-hoc KF forecasting over a lag-1 streaming run must beat the raw
    pairing at tight IoU: the forecaster extrapolates the drifting box to the
    query time, the raw pairing serves stale boxes."""
    import os

    from streamyolo_tpu.data.coco import COCO
    from streamyolo_tpu.stream import (
        Empirical,
        SimClock,
        SimulatedDetector,
        eval_ccf,
        pair_streaming_results,
        stream_sequence,
    )
    from streamyolo_tpu.stream.forecast import forecast_results

    db = COCO(os.path.join(fake_argoverse, "Argoverse-HD/annotations/val.json"))

    def gt_oracle(sid):
        offset = min(i["id"] for i in db.dataset["images"] if i["sid"] == sid)

        def gt(fidx):
            anns = db.img_to_anns[offset + fidx]
            boxes = [[a["bbox"][0], a["bbox"][1],
                      a["bbox"][0] + a["bbox"][2], a["bbox"][1] + a["bbox"][3]]
                     for a in anns]
            return boxes, [a["category_id"] for a in anns]

        return gt

    results = {}
    for sid, seq in enumerate(db.dataset["sequences"]):
        n = sum(1 for i in db.dataset["images"] if i["sid"] == sid)
        det = SimulatedDetector(gt_oracle(sid), None)
        results[seq] = stream_sequence(
            list(range(n)), det, fps=30.0, clock=SimClock(),
            runtime_dist=Empirical([1.0 / 30.0], seed=0), frame_arg_is_index=True,
        )

    raw_ccf, _ = pair_streaming_results(db, results, fps=30.0, eta=0)
    raw = eval_ccf(db, raw_ccf)

    fc_ccf, assoc = forecast_results(db, results, fps=30.0, eta=0, min_size=20)
    fc = eval_ccf(db, fc_ccf)
    # raw lag-1 boxes: IoU 8/12 -> sAP75 = 0; forecasting at least ties it.
    # (Overall sAP may dip on these 3-4 frame toy tracks: the KF's slow-start
    # covariances haven't converged, which is faithful to the reference
    # filter — its gains show on real-length sequences.)
    assert fc["stats"][2] >= raw["stats"][2]
    assert assoc["miss"] == 2  # first frame of each sequence, same as raw
    assert len(fc_ccf) == 5  # one forecast box per forecastable frame


def _toy_detector_builder():
    """Top-level so mp.spawn can pickle it: detects one fixed box."""

    def detect(frame):
        x = float(frame[0][0])  # frame encodes the box position
        return ([[x, 20.0, x + 10.0, 28.0]], [0.9], [2])

    return detect


def test_streamer_process_roundtrip():
    """Detector-in-child-process: submit/poll/forecast across the pipe, and
    the child's tracebacks surface instead of silent death."""
    from streamyolo_tpu.stream import Streamer

    s = Streamer(_toy_detector_builder, match_iou_th=0.3)
    try:
        # two observations of a box moving +30 px/s
        for k in range(2):
            t = k * 0.1
            frame = [[10.0 + 30 * t]]
            assert s.submit(k, frame, t_sent=t)
            # busy submit is refused while in flight
            assert not s.submit(k, frame, t_sent=t)
            got = None
            for _ in range(100):
                got = s.poll(timeout=0.1)
                if got is not None:
                    break
            assert got == k
        bboxes, scores, labels, tracks = s.forecast(0.2, 1920, 1200)
        assert len(bboxes) == 1 and labels[0] == 2
        assert bboxes[0][0] > 10.0  # moved forward
    finally:
        s.close()
