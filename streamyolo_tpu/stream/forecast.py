"""Forecasting meta-detector: batched Kalman filter + box extrapolation +
the process-isolated "Streamer".

Capability parity with `/root/reference/sAP/forecast/`:

  * batched 8-state constant-velocity Kalman filter over boxes
    x = [l, t, w, h, vl, vt, vw, vh], H = slice of the first 4 states, with
    dt-scaled F and Q = dt^2 I (`pps_forecast_kf.py:54-97`) — implemented in
    NumPy (these are tiny per-track 8x8 host-side mats; the detector is the
    TPU part);
  * linear / quadratic box extrapolation + out-of-image cleanup
    (`forecast/__init__.py:12-89`);
  * ``Streamer``: the detector runs in a child process connected by pipes
    (`forecast/streamer.py:66-124`) while the parent associates detections
    across frames (greedy IoU, `streamyolo_tpu.stream.track`) and forecasts
    to the query time — async process parallelism (SURVEY.md §2.4).
"""

from __future__ import annotations

import multiprocessing as mp
import traceback
from typing import Callable

import numpy as np

from streamyolo_tpu.stream.track import iou_assoc

# ---------------------------------------------------------------- KF core


# State layout: [l, t, w, h] followed by their per-frame velocities. All
# tracks are filtered at once: states are [n, 8, 1] column stacks, and every
# matrix op below broadcasts the shared [8, 8] model over the track axis.
_DIM = 8


def _transition(dt: float) -> np.ndarray:
    """Constant-velocity model: each box coordinate drifts by dt * velocity."""
    A = np.eye(_DIM)
    A[np.arange(4), np.arange(4, 8)] = dt
    return A


def _drift_noise(dt: float) -> np.ndarray:
    """Isotropic process noise growing with the prediction horizon."""
    return (dt * dt) * np.eye(_DIM)


def _as_states(boxes_ltwh: np.ndarray) -> np.ndarray:
    """[n,4] boxes -> [n,8,1] zero-velocity state columns."""
    b = np.asarray(boxes_ltwh, np.float64)
    return np.concatenate((b, np.zeros_like(b)), axis=1)[:, :, None]


def _as_measurements(boxes_ltwh: np.ndarray) -> np.ndarray:
    """[n,4] boxes -> [n,4,1] observation columns (positions only)."""
    return np.asarray(boxes_ltwh, np.float64)[:, :, None]


def _boxes_of(states: np.ndarray) -> np.ndarray:
    """[n,8,1] states -> [n,4] ltwh boxes (drop the velocity half)."""
    return states[:, :4, 0]


def _kf_project(A: np.ndarray, states: np.ndarray) -> np.ndarray:
    """Advance states without touching the covariances (forecast query)."""
    return A @ states


def _kf_time_step(A, Q, states, covs):
    """Batched predict: x' = A x,  P' = A P Aᵀ + Q."""
    return A @ states, A @ covs @ A.T + Q


def _kf_correct(states, covs, observations, R):
    """Batched measurement update. The observation matrix is [I₄ 0] (boxes
    observe positions, never velocities), so H-products reduce to slicing:
    gain K = P[:, :, :4] (P[:, :4, :4] + R)⁻¹."""
    innovation = observations - states[:, :4]
    gain = covs[:, :, :4] @ np.linalg.inv(covs[:, :4, :4] + R)
    return states + gain @ innovation, covs - gain @ covs[:, :4]


# ------------------------------------------------------------ extrapolation


def extrap_clean_up(bboxes, w_img, h_img, min_size: int = 75, lt: bool = False):
    """Clip extrapolated boxes to the image and drop degenerate/small ones
    (`forecast/__init__.py:33-57`). Input [n,4] cxcywh (or ltwh if lt)."""
    bboxes = np.asarray(bboxes, np.float64).copy()
    keep = (bboxes[:, 2] > 0) & (bboxes[:, 3] > 0)
    if lt:
        bboxes[:, 2:] = bboxes[:, :2] + bboxes[:, 2:]
    else:
        bboxes[:, :2] = bboxes[:, :2] - bboxes[:, 2:] / 2
        bboxes[:, 2:] = bboxes[:, :2] + bboxes[:, 2:]
    bboxes[:, [0, 2]] = bboxes[:, [0, 2]].clip(0, w_img)
    bboxes[:, [1, 3]] = bboxes[:, [1, 3]].clip(0, h_img)
    bboxes[:, 2:] = bboxes[:, 2:] - bboxes[:, :2]
    keep &= bboxes[:, 2].astype(int) * bboxes[:, 3].astype(int) >= min_size
    return bboxes[keep], keep


def bbox_extrap_lin(bboxes1, bboxes2, tk, w_img, h_img, min_size=75):
    bboxes3 = np.asarray(bboxes2) + tk * (np.asarray(bboxes2) - np.asarray(bboxes1))
    return extrap_clean_up(bboxes3, w_img, h_img, min_size, lt=True)


def bbox_extrap_quad(bboxes1, bboxes2, v1, v2, tk, t32, w_img, h_img, min_size=75):
    """Quadratic (velocity-aware) extrapolation (`forecast/__init__.py:64-89`)."""
    n_v1, n_v2 = len(v1), len(v2)
    if n_v1 == 0 or n_v2 == 0:
        return bbox_extrap_lin(bboxes1, bboxes2, tk, w_img, h_img, min_size)
    v2 = np.asarray(v2)[:n_v1]
    v3 = v2 + tk * (v2 - np.asarray(v1))
    bboxes1 = np.array(bboxes1, np.float64)
    bboxes2 = np.array(bboxes2, np.float64)
    bboxes1[:, :2] += bboxes1[:, 2:] / 2
    bboxes2[:, :2] += bboxes2[:, 2:] / 2
    bboxes3 = bboxes2[:n_v1] + v3 * t32
    if len(bboxes1) > n_v1:
        tail = bboxes2[n_v1:] + tk * (bboxes2[n_v1:] - bboxes1[n_v1:])
        bboxes3 = np.vstack((bboxes3, tail))
    return extrap_clean_up(bboxes3, w_img, h_img, min_size)


# ------------------------------------------------------------ KF forecaster


class KFForecaster:
    """Stateful track set: associate new detections, KF-update matched
    tracks, spawn new ones, and forecast all boxes to any future time.

    This is the association/forecast core of the reference's Streamer loop
    (`forecast/streamer.py:176-321`) as a reusable object.
    """

    def __init__(self, match_iou_th: float = 0.3, R_scale: float = 10.0,
                 P_init_scale: float = 100.0):
        # covariances match the reference (`forecast/streamer.py:140-143`):
        # R = 10 I, P_init = 100 I (high initial uncertainty so the filter
        # locks onto measurements quickly), Q = dt^2 I per step.
        self.match_iou_th = match_iou_th
        self.R = R_scale * np.eye(4)
        self.P_init_scale = P_init_scale
        self.reset()

    def reset(self):
        self.x = np.zeros((0, 8, 1))
        self.P = np.zeros((0, 8, 8))
        self.tracks = np.zeros(0, np.int64)
        self.labels = np.zeros(0, np.int64)
        self.scores = np.zeros(0)
        self.tkidx = 0
        self.last_t = None

    def update(self, t: float, bboxes_ltwh, scores, labels):
        """Ingest detections made from the frame at time ``t``."""
        bboxes_ltwh = np.asarray(bboxes_ltwh, np.float64).reshape(-1, 4)
        scores = np.asarray(scores, np.float64).reshape(-1)
        labels = np.asarray(labels, np.int64).reshape(-1)

        if len(self.tracks) and self.last_t is not None:
            dt = t - self.last_t
            self.x, self.P = _kf_time_step(
                _transition(dt), _drift_noise(dt), self.x, self.P
            )

        if len(self.tracks) == 0:
            self.x = _as_states(bboxes_ltwh)
            self.P = np.tile(self.P_init_scale * np.eye(8), (len(bboxes_ltwh), 1, 1))
            self.tracks = np.arange(len(bboxes_ltwh), dtype=np.int64)
            self.labels = labels
            self.scores = scores
            self.tkidx = len(bboxes_ltwh)
        else:
            prev_boxes = _boxes_of(self.x)
            order1, order2, n_matched, tracks2, self.tkidx = iou_assoc(
                prev_boxes, self.labels, self.tracks, self.tkidx,
                bboxes_ltwh, labels, self.match_iou_th,
            )
            # matched tracks: KF update with the new measurement
            x = self.x[order1]
            P = self.P[order1]
            new_boxes = bboxes_ltwh[order2]
            if n_matched:
                x_m, P_m = _kf_correct(
                    x[:n_matched], P[:n_matched],
                    _as_measurements(new_boxes[:n_matched]), self.R,
                )
            else:
                x_m = x[:0]
                P_m = P[:0]
            # unmatched new detections: fresh tracks
            n_new = len(new_boxes) - n_matched
            x_new = _as_states(new_boxes[n_matched:])
            P_new = np.tile(self.P_init_scale * np.eye(8), (n_new, 1, 1))
            self.x = np.concatenate((x_m, x_new))
            self.P = np.concatenate((P_m, P_new))
            self.tracks = tracks2
            self.labels = labels[order2]
            self.scores = scores[order2]
        self.last_t = t

    def forecast(self, t_query: float, w_img: int, h_img: int, min_size: int = 75):
        """Predict all live tracks' boxes at ``t_query``; clean up."""
        if len(self.tracks) == 0 or self.last_t is None:
            return (
                np.zeros((0, 4)), np.zeros(0), np.zeros(0, np.int64),
                np.zeros(0, np.int64),
            )
        dt = t_query - self.last_t
        x_pred = _kf_project(_transition(dt), self.x)
        bboxes, keep = extrap_clean_up(_boxes_of(x_pred), w_img, h_img, min_size, lt=True)
        return bboxes, self.scores[keep], self.labels[keep], self.tracks[keep]


# ------------------------------------------------------------ Streamer


def _det_process(detect_fn_builder, conn, frames_conn_or_none=None):
    """Child process: build the detector and serve (fidx, frame) -> parsed
    detections over the pipe; forwards full tracebacks to the parent instead
    of dying silently (`forecast/streamer.py:97-100`)."""
    try:
        detect = detect_fn_builder()
        conn.send("ready")
        while True:
            msg = conn.recv()
            if msg is None:
                break
            fidx, frame = msg
            conn.send((fidx, detect(frame)))
    except Exception:
        conn.send(("__error__", traceback.format_exc()))


class Streamer:
    """Detector-in-a-child-process + parent-side KF forecasting meta-detector
    (`forecast/streamer.py:66-321`). The parent never blocks on the detector:
    it polls the pipe, associates/updates tracks when results arrive, and can
    emit a forecast for ANY query time in between."""

    def __init__(self, detect_fn_builder: Callable[[], Callable],
                 match_iou_th: float = 0.3):
        ctx = mp.get_context("spawn")
        self._parent_conn, child_conn = ctx.Pipe()
        self._proc = ctx.Process(
            target=_det_process, args=(detect_fn_builder, child_conn), daemon=True
        )
        self._proc.start()
        ready = self._parent_conn.recv()
        assert ready == "ready", ready
        self.forecaster = KFForecaster(match_iou_th=match_iou_th)
        self._in_flight = False

    def submit(self, fidx: int, frame, t_sent: float) -> bool:
        """Send a frame to the detector if it is idle. Returns whether sent."""
        if self._in_flight:
            return False
        self._t_sent = t_sent
        self._parent_conn.send((fidx, frame))
        self._in_flight = True
        return True

    def poll(self, timeout: float = 0.0):
        """Collect a finished detection if available and fold it into the
        track set (timestamped at submission: the detection describes the
        world at the input frame's time)."""
        if self._in_flight and self._parent_conn.poll(timeout):
            fidx, result = self._parent_conn.recv()
            if fidx == "__error__":
                raise RuntimeError(f"detector process failed:\n{result}")
            self._in_flight = False
            bboxes, scores, labels = result[:3]
            if len(bboxes):
                from streamyolo_tpu.stream.pairing import ltrb2ltwh

                self.forecaster.update(self._t_sent, ltrb2ltwh(bboxes), scores, labels)
            return fidx
        return None

    def forecast(self, t_query: float, w_img: int, h_img: int):
        return self.forecaster.forecast(t_query, w_img, h_img)

    def close(self):
        try:
            self._parent_conn.send(None)
        except (BrokenPipeError, OSError):
            pass
        self._proc.join(timeout=5)
        if self._proc.is_alive():
            self._proc.terminate()


def forecast_results(
    db,
    results_by_seq,
    fps: float = 30.0,
    eta: int = 0,
    match_iou_th: float = 0.3,
    min_size: int = 75,
):
    """Post-hoc KF forecasting over a saved streaming run (the
    `/root/reference/sAP/forecast/pps_forecast_kf.py:99-325` capability):
    re-play each sequence's timestamped detections through the association +
    Kalman tracker and, for every gt frame time, emit the tracks' boxes
    FORECAST to that time instead of the stale last output.

    Returns (results_ccf, assoc_counters) matching the pairing-pass contract
    so the result feeds ``eval_ccf`` directly.
    """
    from streamyolo_tpu.stream.pairing import ltrb2ltwh

    seqs = db.dataset["sequences"]
    results_ccf = []
    miss = 0
    for sid, seq in enumerate(seqs):
        frame_list = [img for img in db.imgs.values() if img["sid"] == sid]
        results = results_by_seq[seq]
        parsed = results["results_parsed"]
        timestamps = results["timestamps"]
        input_fidx = results["input_fidx"]

        f = KFForecaster(match_iou_th=match_iou_th)
        tidx = 0
        for ii, img in enumerate(frame_list):
            t_query = (ii - eta) / fps
            # fold in every detection that has landed by the query time,
            # timestamped at its INPUT frame's capture time (that is the
            # world state the boxes describe)
            while tidx < len(timestamps) and timestamps[tidx] <= t_query:
                bboxes, scores, labels = parsed[tidx][:3]
                if len(bboxes):
                    f.update(
                        input_fidx[tidx] / fps, ltrb2ltwh(np.asarray(bboxes)),
                        scores, labels,
                    )
                tidx += 1
            if f.last_t is None:
                miss += 1
                continue
            bboxes_ltwh, scores, labels, _ = f.forecast(
                t_query, img["width"], img["height"], min_size=min_size
            )
            for i in range(len(bboxes_ltwh)):
                results_ccf.append(
                    {
                        "image_id": img["id"],
                        "bbox": [float(v) for v in bboxes_ltwh[i]],
                        "score": float(scores[i]),
                        "category_id": int(labels[i]),
                    }
                )
    return results_ccf, {"miss": miss}
