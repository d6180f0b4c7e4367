"""End-to-end tests for the streaming sAP rehearsal (tools/sap_rehearsal.py):
the srt_det pattern — measured latencies replayed through a SimClock over the
full L7 chain (fixture -> zoo -> streaming run -> pairing -> COCOeval).
Reference protocol: `/root/reference/sAP/det/srt_det.py:72-165` +
`sAP/util/add_to_runtime_zoo.py:28-40`.
"""

import json
import os
import pickle
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _run(tmp_path, monkeypatch, out_name, extra):
    import importlib

    mod = importlib.import_module("sap_rehearsal")
    out = tmp_path / out_name
    monkeypatch.setattr(
        sys, "argv",
        ["sap_rehearsal.py", "-f",
         # the l config keeps the reference's deliberate 'filp' filename typo
         os.path.join(REPO, "cfgs", "l_s50_onex_dfp_tal_filp.py"),
         "--out-dir", str(out), "--seqs", "2", "--frames", "25",
         "--size", "60", "96"] + extra,
    )
    mod.main()
    with open(out / "rehearsal_summary.json") as f:
        return out, json.load(f)


def test_perfect_detector_latency_cost_monotone(tmp_path, monkeypatch):
    """The oracle-detector rehearsal quantifies the pure latency cost: every
    artifact of the chain is written, the association accounting is exact
    (first frame of each sequence missed, everything else one-or-more frames
    stale), and a latency above the frame interval scores strictly worse than
    a sub-frame-interval one."""
    out, fast = _run(tmp_path, monkeypatch, "fast",
                     ["--perfect-detector", "--latency-ms", "1.46"])
    # chain artifacts
    for f in ("runtime_zoo.pkl", "stream_run/time_info.pkl",
              "stream_run/results_ccf.pkl", "stream_run/eval_assoc.pkl",
              "stream_run/eval_summary.pkl"):
        assert os.path.isfile(out / f), f
    with open(out / "runtime_zoo.pkl", "rb") as f:
        zoo = pickle.load(f)
    (entry,) = zoo.values()
    assert entry["type"] == "empirical" and entry["samples"] == [0.00146]
    # protocol accounting: 2 sequences x 25 frames; at 1.46 ms every frame is
    # processed, frame 0 of each sequence has no completed result (miss), and
    # every other frame pairs one frame stale (mismatch = 48, in_time = 0)
    assert fast["frames"] == {"total": 50, "processed": 50,
                              "faster_than_frame_interval": 50}
    assert fast["association"] == {"miss": 2, "in_time": 0, "mismatch": 48}
    assert 0 < fast["sAP"] < 100 and fast["sAP50"] > fast["sAP75"]

    # 45 ms > the 33 ms frame interval: frames get skipped, staleness grows,
    # sAP drops strictly
    _, slow = _run(tmp_path, monkeypatch, "slow",
                   ["--perfect-detector", "--latency-ms", "45"])
    assert slow["frames"]["processed"] < 50
    assert slow["association"]["mismatch"] > fast["association"]["mismatch"]
    assert slow["sAP"] < fast["sAP"]
    assert slow["sAP50"] < fast["sAP50"]


def test_measure_chain_harvests_device_step(tmp_path, monkeypatch):
    """--measure-chain: the zoo entry comes from the chained-dispatch
    measurement (bench.py methodology) instead of per-call wall times —
    samples must be positive, finite, and actually drive the run."""
    out, summary = _run(
        tmp_path, monkeypatch, "chain",
        ["--measure-chain", "2", "--conf", "1e-5", "--pgt-score-th", "1e-5",
         "width", "0.25", "depth", "0.33", "packed", "False"],
    )
    with open(out / "runtime_zoo.pkl", "rb") as f:
        (entry,) = pickle.load(f).values()
    assert len(entry["samples"]) >= 2
    assert all(0 < s < 10 for s in entry["samples"])
    assert summary["latency_ms"]["mean"] > 0
    assert summary["frames"]["total"] == 50


def test_real_detector_oracle_gt_chain(tmp_path, monkeypatch):
    """The real-detector rehearsal (TPUStreamDetector under SimClock, pseudo
    ground truth from its own zero-latency run) exercises model, zoo,
    pseudo-GT, streaming run, and scoring in one command."""
    out, summary = _run(
        tmp_path, monkeypatch, "real",
        # init weights: obj AND cls biases carry the focal prior, so scores
        # peak around 2e-4 — the thresholds must sit below that
        ["--latency-ms", "1.4,1.5", "--conf", "1e-5",
         "--pgt-score-th", "1e-5", "--in_scale", "0.5",
         "width", "0.25", "depth", "0.33", "packed", "False"],
    )
    assert os.path.isfile(out / "oracle_ccf.pkl")
    assert os.path.isfile(out / "pseudo_gt.json")
    assert summary["gt"] == "oracle"
    assert summary["frames"]["processed"] == summary["frames"]["total"] == 50
    assert summary["sAP"] is not None and 0 <= summary["sAP"] <= 100
    # the pseudo-GT db must carry annotations (the assert inside the tool)
    with open(out / "pseudo_gt.json") as f:
        assert len(json.load(f)["annotations"])
