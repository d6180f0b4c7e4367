"""CLI surface tests (in-process, CPU backend from conftest)."""

import os
import sys

import numpy as np
import pytest

pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_train_parser_flags():
    import importlib

    train = importlib.import_module("train")
    args = train.make_parser().parse_args(
        ["-f", "cfgs/s_s50_onex_dfp_tal_flip.py", "-b", "16", "--fp16",
         "-c", "w.pth", "--resume", "-e", "3", "max_epoch", "2"]
    )
    assert args.batch_size == 16 and args.fp16 and args.resume
    assert args.start_epoch == 3 and args.ckpt == "w.pth"
    assert args.opts == ["max_epoch", "2"]


def test_eval_cli_speed_mode(tmp_path, monkeypatch, capsys):
    """--speed: no dataset, no checkpoint — compiles the batched forward+NMS
    on synthetic input and logs throughput."""
    import importlib

    eval_mod = importlib.import_module("eval")
    monkeypatch.setattr(
        sys, "argv",
        ["eval.py", "-f", os.path.join(REPO, "cfgs", "s_s50_onex_dfp_tal_flip.py"),
         "-b", "1", "--speed", "--tsize", "64", "96",
         "output_dir", str(tmp_path)],
    )
    eval_mod.main()
    log = open(os.path.join(
        str(tmp_path), "s_s50_onex_dfp_tal_flip", "val_log.txt")).read()
    assert "speed test:" in log
    assert "Params:" in log


def test_stream_det_parser():
    import importlib

    sd = importlib.import_module("stream_det")
    # validate the flag surface via a full command line
    sys_argv = sys.argv
    sys.argv = ["stream_det.py", "--data-root", "/x", "--annot-path", "/y",
                "--out-dir", "/z", "--config", "c.py", "--weights", "w.pth",
                "--dynamic-schedule", "--fps", "30", "--in_scale", "0.5"]
    try:
        args = sd.parse_args()
    finally:
        sys.argv = sys_argv
    assert args.dynamic_schedule and args.fps == 30 and args.in_scale == 0.5


def test_train_cli_end_to_end(fake_argoverse, tmp_path, monkeypatch):
    """tools/train.py main() end-to-end on the synthetic dataset: config
    load, opts merge, trainer construction, one epoch, checkpoints."""
    import importlib

    from tests.conftest import FAKE_IMG_SIZE

    train = importlib.import_module("train")
    monkeypatch.setattr(
        sys, "argv",
        ["train.py",
         "-f", os.path.join(REPO, "cfgs", "s_s50_onex_dfp_tal_flip.py"),
         "-b", "8",
         "--seed", "1",
         # Exp attribute overrides through the opts remainder:
         "data_dir", fake_argoverse,
         "input_size", repr(tuple(FAKE_IMG_SIZE)),
         "test_size", repr(tuple(FAKE_IMG_SIZE)),
         "random_size", "None",
         "data_num_workers", "0",
         "max_epoch", "1",
         "no_aug_epochs", "1",
         "eval_interval", "1",
         "save_history_ckpt", "False",
         "width", "0.25",
         "print_interval", "1",
         "output_dir", str(tmp_path)],
    )
    train.main()
    out = os.path.join(str(tmp_path), "s_s50_onex_dfp_tal_flip")
    assert os.path.exists(os.path.join(out, "latest_ckpt.pkl"))
    assert os.path.exists(os.path.join(out, "train_log.txt"))
    log = open(os.path.join(out, "train_log.txt")).read()
    assert "Training done" in log


def test_eval_cli_strict_ckpt_load(tmp_path, monkeypatch):
    """Eval loads checkpoints STRICTLY by default (round-2 finding: a typo'd
    or truncated checkpoint must fail loudly, not evaluate random init) —
    matching the reference's strict load at tools/eval.py:168."""
    import importlib
    import pickle

    from streamyolo_tpu.exp import get_exp

    cfg = os.path.join(REPO, "cfgs", "s_s50_onex_dfp_tal_flip.py")
    exp = get_exp(cfg)
    exp.width = 0.25
    variables = exp.init_model(exp.get_model())
    # truncate: drop one whole subtree
    broken = {
        "params": {k: v for k, v in variables["params"].items() if k != "head"},
        "batch_stats": variables["batch_stats"],
    }
    ckpt = tmp_path / "truncated_ckpt.pkl"
    with open(ckpt, "wb") as f:
        pickle.dump({"model": broken, "start_epoch": 0}, f)

    eval_mod = importlib.import_module("eval")
    monkeypatch.setattr(
        sys, "argv",
        ["eval.py", "-f", cfg, "-b", "1", "-c", str(ckpt),
         "width", "0.25", "output_dir", str(tmp_path)],
    )
    with pytest.raises(ValueError, match="missing/mismatched"):
        eval_mod.main()


def test_validate_baseline_end_to_end(fake_argoverse, tmp_path, monkeypatch, capsys):
    """tools/validate_baseline.py driven end-to-end on the synthetic fixture:
    strict weight load + fuse + eval for a row, table diffed against an
    expected table, nonzero exit outside tolerance — so the first run with
    real data/weights is turnkey (BASELINE recipe, reference README:108-122)."""
    import importlib
    import json
    import pickle

    from tests.conftest import FAKE_IMG_SIZE

    from streamyolo_tpu.exp import get_exp

    opts = ["data_num_workers", "0",
            "input_size", repr(tuple(FAKE_IMG_SIZE)),
            "test_size", repr(tuple(FAKE_IMG_SIZE)),
            "width", "0.25"]

    # fabricate "released weights" matching the overridden s config
    cfg = os.path.join(REPO, "cfgs", "s_s50_onex_dfp_tal_flip.py")
    exp = get_exp(cfg)
    exp.merge(opts)
    variables = exp.init_model(exp.get_model())
    wpath = tmp_path / "s_weights.pkl"
    with open(wpath, "wb") as f:
        pickle.dump({"model": variables}, f)

    vb = importlib.import_module("validate_baseline")

    def run(expected):
        epath = tmp_path / "expected.json"
        epath.write_text(json.dumps(expected))
        monkeypatch.setattr(
            sys, "argv",
            ["validate_baseline.py", "--weights-dir", str(tmp_path),
             "--data-dir", fake_argoverse, "-b", "4", "--models", "s",
             "--weights", f"s={wpath}", "--expected-json", str(epath),
             "--tolerance", "0.5"] + opts,
        )
        return vb.main()

    # random init scores ~0 sAP: far outside tolerance of the published 29.8
    assert run({"s": [29.8, 50.3, 29.8]}) == 1
    out = capsys.readouterr().out
    assert "FAIL" in out and "s " in out

    # ... and inside tolerance of 0 the same run passes
    assert run({"s": [0.0, 0.0, 0.0]}) == 0
    assert "OK" in capsys.readouterr().out

    # --int8 validates the PTQ serving path end-to-end (calibrate on the
    # val loader, quantize, evaluate) — the accuracy check the quant docs
    # point to before shipping an int8 deployment
    epath = tmp_path / "expected_int8.json"
    epath.write_text(json.dumps({"s": [0.0, 0.0, 0.0]}))
    monkeypatch.setattr(
        sys, "argv",
        ["validate_baseline.py", "--weights-dir", str(tmp_path),
         "--data-dir", fake_argoverse, "-b", "4", "--models", "s",
         "--weights", f"s={wpath}", "--expected-json", str(epath),
         "--tolerance", "0.5", "--int8", "--calib-batches", "1"] + opts,
    )
    assert vb.main() == 0
    assert "OK" in capsys.readouterr().out

    # a missing weight file is an ERROR row + nonzero exit, not a crash
    monkeypatch.setattr(
        sys, "argv",
        ["validate_baseline.py", "--weights-dir", str(tmp_path / "nope"),
         "--data-dir", fake_argoverse, "--models", "s"] + opts,
    )
    assert vb.main() == 1
    assert "ERROR" in capsys.readouterr().out


def test_bench_hostpath_host_only(monkeypatch, capsys):
    """tools/bench_hostpath.py --host-only: host pieces measured, budget
    table printed with both configurations, JSON parseable."""
    import importlib
    import json

    pytest.importorskip("cv2")
    bh = importlib.import_module("bench_hostpath")
    monkeypatch.setattr(
        sys, "argv", ["bench_hostpath.py", "--host-only", "--samples", "3"])
    assert bh.main() == 0
    out = capsys.readouterr().out
    payload = json.loads(out.strip().splitlines()[-1])
    budget = payload["direct_attach_budget"]
    assert set(budget) == {"host_resize", "device_resize"}
    for cfg in budget.values():
        assert cfg["total_ms"] > 0


def test_selftest_pallas_cli_interpret(monkeypatch, capsys):
    """tools/selftest_pallas.py --interpret: both kernels verified on CPU."""
    import importlib

    sp = importlib.import_module("selftest_pallas")
    monkeypatch.setattr(sys, "argv", ["selftest_pallas.py", "--interpret"])
    assert sp.main() == 0
    out = capsys.readouterr().out
    assert "NMS OK" in out and "preproc OK" in out


def test_analyze_hlo_parser_and_tile_padding(capsys):
    """tools/analyze_hlo.py core: physical shape bytes honor the (8,128)
    tile padding of the two minor dims, ENTRY parsing attributes reads to
    producers, and analyze() renders the census from raw HLO text."""
    import importlib

    ah = importlib.import_module("analyze_hlo")

    # logical 16*300*480*48*2B = 221 MB; physical pads 48 -> 128 lanes
    padded = ah.shape_bytes("bf16[16,300,480,48]{3,2,1,0:T(8,128)(2,1)}")
    assert padded == 16 * 300 * 480 * 128 * 2
    # a 128-channel tensor is already lane-exact
    exact = ah.shape_bytes("bf16[16,300,480,128]{3,2,1,0:T(8,128)(2,1)}")
    assert exact == 16 * 300 * 480 * 128 * 2
    # the sublane dim (second-minor) pads to 8
    sub = ah.shape_bytes("f32[4,3]{1,0:T(8,128)}")
    assert sub == 8 * 128 * 4
    # no layout: logical bytes; tuples sum their elements
    assert ah.shape_bytes("f32[2,2]") == 16
    assert ah.shape_bytes("(f32[2,2], bf16[4])") == 16 + 8

    hlo = """
HloModule jit_step

ENTRY %main (p0: bf16[1,8,128]) -> bf16[1,8,128] {
  %p0 = bf16[1,8,128]{2,1,0:T(8,128)(2,1)} parameter(0)
  %fusion.1 = bf16[1,8,128]{2,1,0:T(8,128)(2,1)} fusion(%p0), kind=kLoop, calls=%fused_add, backend_config={"flag_configs":[],"fusion_config":{"estimated_cycles":"9400"}}
  %conv.2 = bf16[1,8,128]{2,1,0:T(8,128)(2,1)} convolution(%fusion.1, %p0), window={size=1x1}, dim_labels=b01f_01io->b01f, backend_config={"fusion_config":{"estimated_cycles":"18800"}}
  ROOT %copy.3 = bf16[1,8,128]{2,1,0:T(8,128)(2,1)} copy(%conv.2)
}
"""
    entry = ah.parse_entry(hlo)
    by_name = {e[0]: e for e in entry}
    assert set(by_name) == {"p0", "fusion.1", "conv.2", "copy.3"}
    name, opcode, rbytes, operands, cycles, _ = by_name["fusion.1"]
    assert opcode == "fusion" and rbytes == 8 * 128 * 2 and cycles == 9400
    assert operands[0] == "p0"
    assert by_name["conv.2"][1] == "convolution"
    assert by_name["conv.2"][3] == ["fusion.1", "p0"]

    ah.analyze(hlo, top=5)
    out = capsys.readouterr().out
    assert "traffic / est-time by opcode" in out
    assert "convolution census (1 top-level convs" in out


def test_eval_cli_int8_speed_mode(tmp_path, monkeypatch):
    """--int8 --speed: calibrates on the synthetic batch, quantizes, and
    times the int8 forward — the CLI wiring of quant/ptq.py."""
    import importlib

    eval_mod = importlib.import_module("eval")
    monkeypatch.setattr(
        sys, "argv",
        ["eval.py", "-f", os.path.join(REPO, "cfgs", "s_s50_onex_dfp_tal_flip.py"),
         "-b", "1", "--speed", "--int8", "--tsize", "64", "96",
         "output_dir", str(tmp_path), "packed", "False"],
    )
    eval_mod.main()
    log = open(os.path.join(
        str(tmp_path), "s_s50_onex_dfp_tal_flip", "val_log.txt")).read()
    assert "int8 PTQ" in log
    assert "speed test:" in log


def test_eval_cli_dedup_default_and_escape(fake_argoverse, tmp_path, monkeypatch):
    """Sequential-dedup is the DEFAULT eval forward for single-process
    ONE/TWO pairings (with the in-run first-batch parity assertion), and
    --no-dedup escapes to the dual-frame forward with identical AP."""
    import importlib
    import pickle
    import re

    from tests.conftest import FAKE_IMG_SIZE

    from streamyolo_tpu.exp import get_exp

    cfg = os.path.join(REPO, "cfgs", "s_s50_onex_dfp_tal_flip.py")
    base_opts = ["data_num_workers", "0", "data_dir", fake_argoverse,
                 "input_size", repr(tuple(FAKE_IMG_SIZE)),
                 "test_size", repr(tuple(FAKE_IMG_SIZE)),
                 "width", "0.25", "packed", "False"]
    exp = get_exp(cfg)
    exp.merge(base_opts + ["output_dir", str(tmp_path / "dedup")])
    variables = exp.init_model(exp.get_model())
    ckpt = tmp_path / "w.pkl"
    with open(ckpt, "wb") as f:
        pickle.dump({"model": variables}, f)

    eval_mod = importlib.import_module("eval")
    aps = {}
    for sub, extra in (("dedup", []), ("dual", ["--no-dedup"])):
        out = tmp_path / sub
        monkeypatch.setattr(
            sys, "argv",
            ["eval.py", "-f", cfg, "-b", "4", "-c", str(ckpt)] + extra
            + base_opts + ["output_dir", str(out)],
        )
        eval_mod.main()
        log = open(os.path.join(
            str(out), "s_s50_onex_dfp_tal_flip", "val_log.txt")).read()
        if sub == "dedup":
            assert "sequential-dedup eval" in log
            assert "dedup parity check passed" in log
        else:
            assert "sequential-dedup eval" not in log
        aps[sub] = re.search(r"AP: ([\d.]+)  AP50: ([\d.]+)", log).groups()
    assert aps["dedup"] == aps["dual"]


def test_eval_cli_int8_full_eval(fake_argoverse, tmp_path, monkeypatch):
    """--int8 without --speed: calibrates on real val batches (the loader is
    iterated once for calibration and again for the eval) and completes a
    full COCOeval with the quantized forward."""
    import importlib
    import pickle

    from tests.conftest import FAKE_IMG_SIZE

    from streamyolo_tpu.exp import get_exp

    opts = ["data_num_workers", "0", "data_dir", fake_argoverse,
            "input_size", repr(tuple(FAKE_IMG_SIZE)),
            "test_size", repr(tuple(FAKE_IMG_SIZE)),
            "width", "0.25", "packed", "False",
            "output_dir", str(tmp_path)]
    cfg = os.path.join(REPO, "cfgs", "s_s50_onex_dfp_tal_flip.py")
    exp = get_exp(cfg)
    exp.merge(opts)
    variables = exp.init_model(exp.get_model())
    ckpt = tmp_path / "w.pkl"
    with open(ckpt, "wb") as f:
        pickle.dump({"model": variables}, f)

    eval_mod = importlib.import_module("eval")
    monkeypatch.setattr(
        sys, "argv",
        ["eval.py", "-f", cfg, "-b", "4", "-c", str(ckpt),
         "--int8", "--calib-batches", "1"] + opts,
    )
    eval_mod.main()
    log = open(os.path.join(
        str(tmp_path), "s_s50_onex_dfp_tal_flip", "val_log.txt")).read()
    assert "int8 PTQ" in log
    assert "AP:" in log
