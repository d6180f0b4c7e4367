#!/usr/bin/env python3
"""One-command BASELINE validation: run all five config evals against the
released reference weights and diff the result against the published table.

The BASELINE north star (`/root/reference/README.md:14-22`, BASELINE.md) is
unverifiable in the offline build container — the released ``.pth`` files and
Argoverse-HD are not present — so this tool makes the first run with real
data turnkey:

    python tools/validate_baseline.py \
        --weights-dir /path/with/{s,m,l}_s50_one_x.pth \
        --data-dir /path/containing/Argoverse-HD

It mirrors the reference eval recipe exactly (`README.md:108-122` there):
``--conf 0.01``, conv+BN fuse, batch 64, strict weight load through the torch
importer — then prints a table diffed against the published sAP/sAP50/sAP75
and exits nonzero if any model lands outside ``--tolerance`` sAP points.

Testability hooks (exercised end-to-end on the synthetic fixture): ``opts``
remainder forwards ``key value`` overrides to every Exp (tiny input sizes),
``--expected-json`` swaps the published table, ``--models`` selects a subset,
``--weights NAME=PATH`` overrides individual weight files.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))

# name -> (config file, released weight file, (sAP, sAP50, sAP75))
# Published numbers: /root/reference/README.md:18-22 (BASELINE.md table).
BASELINE_ROWS = {
    "s": ("cfgs/s_s50_onex_dfp_tal_flip.py", "s_s50_one_x.pth", (29.8, 50.3, 29.8)),
    "m": ("cfgs/m_s50_onex_dfp_tal_flip.py", "m_s50_one_x.pth", (33.7, 54.5, 34.0)),
    "l": ("cfgs/l_s50_onex_dfp_tal_filp.py", "l_s50_one_x.pth", (36.9, 58.1, 37.5)),
    "l2x": ("cfgs/l_s50_twox_dfp_tal_flip.py", "l_s50_two_x.pth", (34.6, 56.3, 34.7)),
    "still": ("cfgs/l_s50_still_dfp_flip.py", "l_s50_still.pth", (39.4, 60.0, 40.2)),
}


def make_parser():
    p = argparse.ArgumentParser("StreamYOLO-TPU baseline validation")
    p.add_argument("--weights-dir", required=True,
                   help="directory holding the released .pth files")
    p.add_argument("--data-dir", required=True,
                   help="directory containing Argoverse-HD/ and Argoverse-1.1/")
    p.add_argument("-b", "--batch-size", type=int, default=64)
    p.add_argument("--conf", type=float, default=0.01,
                   help="eval confidence threshold (reference recipe: 0.01)")
    p.add_argument("--tolerance", type=float, default=0.5,
                   help="max |sAP - published| in AP points before failing")
    p.add_argument("--no-fuse", action="store_true",
                   help="skip the conv+BN fold (the recipe fuses)")
    p.add_argument("--int8", action="store_true",
                   help="validate the int8 PTQ serving path instead of "
                        "fp: fold BN, calibrate activation scales on "
                        "--calib-batches val batches, evaluate the "
                        "quantized model. Expect a small sAP drop — widen "
                        "--tolerance accordingly (int8 is approximate)")
    p.add_argument("--calib-batches", type=int, default=8,
                   help="val batches observed by --int8 calibration")
    p.add_argument("--models", default=",".join(BASELINE_ROWS),
                   help="comma-separated subset of rows to run "
                        f"(of {','.join(BASELINE_ROWS)})")
    p.add_argument("--weights", default="", metavar="NAME=PATH[,NAME=PATH...]",
                   help="per-model weight-file overrides")
    p.add_argument("--expected-json", default=None,
                   help="JSON {name: [sAP, sAP50, sAP75]} replacing the "
                        "published table (testing hook)")
    p.add_argument("opts", nargs=argparse.REMAINDER,
                   help="Exp attribute overrides applied to every config")
    return p


def _run_one(name, cfg_path, weight_path, args):
    """Evaluate one config; returns (sAP, sAP50, sAP75) in percent."""
    from streamyolo_tpu.exp import get_exp
    from streamyolo_tpu.utils.checkpoint import load_checkpoint
    from streamyolo_tpu.utils.logger import get_logger
    from streamyolo_tpu.utils.torch_import import merge_variables

    logger = get_logger()
    logger.info("=== %s: %s + %s", name, cfg_path, weight_path)
    exp = get_exp(cfg_path)
    exp.merge(args.opts)
    exp.data_dir = args.data_dir
    exp.test_conf = args.conf

    model = exp.get_model()
    variables = exp.init_model(model)
    ckpt = load_checkpoint(weight_path)
    variables = merge_variables(variables, ckpt["model"], strict=True)
    evaluator = exp.get_evaluator(args.batch_size, is_distributed=False)
    if args.int8:
        import itertools

        from streamyolo_tpu.quant import quantize_for_serving

        calib = [
            batch[0]
            for batch in itertools.islice(
                iter(evaluator.dataloader), max(1, args.calib_batches))
        ]
        logger.info("\tint8 PTQ: folding BN + calibrating on %d batches",
                    len(calib))
        variables = quantize_for_serving(model, variables, calib)
    elif not args.no_fuse:
        from streamyolo_tpu.utils.fuse import fuse_model_variables

        variables = fuse_model_variables(variables)

    forward_fn = exp.get_forward_fn(model, variables)
    ap, ap50, summary = exp.eval(forward_fn, evaluator)
    logger.info("\n%s", summary)
    stats = getattr(evaluator, "last_stats", None)
    ap75 = float(stats[2]) * 100 if stats is not None else math.nan
    return float(ap) * 100, float(ap50) * 100, ap75


def main():
    args = make_parser().parse_args()
    from streamyolo_tpu.utils.logger import get_logger

    logger = get_logger()
    expected = {k: v[2] for k, v in BASELINE_ROWS.items()}
    if args.expected_json:
        with open(args.expected_json) as f:
            expected.update({k: tuple(v) for k, v in json.load(f).items()})
    args.models = [m for m in args.models.split(",") if m]
    unknown = [m for m in args.models if m not in BASELINE_ROWS]
    if unknown:
        logger.error("unknown model rows: %s (of %s)",
                     unknown, list(BASELINE_ROWS))
        return 2
    weight_overrides = dict(
        kv.split("=", 1) for kv in args.weights.split(",") if kv
    )

    repo = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
    results = {}
    failures = []
    for name in args.models:
        cfg, weight_file, _ = BASELINE_ROWS[name]
        weight_path = weight_overrides.get(
            name, os.path.join(args.weights_dir, weight_file)
        )
        if not os.path.exists(weight_path):
            failures.append(f"{name}: missing weights {weight_path}")
            results[name] = None
            continue
        try:
            results[name] = _run_one(
                name, os.path.join(repo, cfg), weight_path, args
            )
        except Exception as e:  # a failed row must not mask the others
            logger.exception("row %s failed", name)
            failures.append(f"{name}: {type(e).__name__}: {e}")
            results[name] = None

    # ---- table ----
    hdr = (f"{'model':<6} {'sAP':>7} {'pub':>6} {'diff':>7}   "
           f"{'sAP50':>7} {'pub':>6}   {'sAP75':>7} {'pub':>6}   status")
    lines = [hdr, "-" * len(hdr)]
    for name in args.models:
        exp_row = expected[name]
        got = results[name]
        if got is None:
            lines.append(f"{name:<6} {'—':>7} {exp_row[0]:>6.1f} {'—':>7}   "
                         f"{'—':>7} {exp_row[1]:>6.1f}   {'—':>7} "
                         f"{exp_row[2]:>6.1f}   ERROR")
            continue
        diff = got[0] - exp_row[0]
        ok = abs(diff) <= args.tolerance
        if not ok:
            failures.append(
                f"{name}: sAP {got[0]:.2f} vs published {exp_row[0]:.2f} "
                f"(|diff| {abs(diff):.2f} > tolerance {args.tolerance})"
            )
        lines.append(
            f"{name:<6} {got[0]:>7.2f} {exp_row[0]:>6.1f} {diff:>+7.2f}   "
            f"{got[1]:>7.2f} {exp_row[1]:>6.1f}   {got[2]:>7.2f} "
            f"{exp_row[2]:>6.1f}   {'OK' if ok else 'FAIL'}"
        )
    table = "\n".join(lines)
    logger.info("BASELINE validation (conf %.3g, fuse=%s, b=%d):\n%s",
                args.conf, not args.no_fuse, args.batch_size, table)
    print(table)

    if failures:
        for f in failures:
            logger.error("baseline validation failure: %s", f)
        return 1
    logger.info("all %d rows within %.2f sAP of the published table",
                len(args.models), args.tolerance)
    return 0


if __name__ == "__main__":
    sys.exit(main())
