#!/usr/bin/env python3
"""Aggregate streaming-eval outputs across experiment directories into a CSV
(the `/root/reference/sAP/util/collect_summary.py` CLI surface)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))

if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser("StreamYOLO-TPU summary aggregation")
    parser.add_argument("dirs", nargs="+", help="experiment output directories")
    parser.add_argument("--out", default="summary.csv")
    args = parser.parse_args()

    from streamyolo_tpu.stream.collect_summary import collect_summary

    rows = collect_summary(args.dirs, args.out)
    print(f"wrote {len(rows)} rows to {args.out}")
