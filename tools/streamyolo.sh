#!/bin/bash
# Two-stage online sAP pipeline (detect under a wall clock, then pair+eval).
# Capability parity with /root/reference/sAP/streamyolo/streamyolo.sh:7-27
# (fps 30, input scale 0.5, eta 0).
set -e

DATA_ROOT="${DATA_ROOT:-/data/Argoverse-1.1/tracking}"
ANNOT_PATH="${ANNOT_PATH:-/data/Argoverse-HD/annotations/val.json}"
FPS="${FPS:-30}"
CONFIG="${1:?usage: streamyolo.sh CONFIG WEIGHTS OUT_DIR}"
WEIGHTS="${2:?usage: streamyolo.sh CONFIG WEIGHTS OUT_DIR}"
OUT_DIR="${3:?usage: streamyolo.sh CONFIG WEIGHTS OUT_DIR}"

python "$(dirname "$0")/stream_det.py" \
  --data-root "$DATA_ROOT" \
  --annot-path "$ANNOT_PATH" \
  --fps "$FPS" \
  --in_scale 0.5 \
  --config "$CONFIG" \
  --weights "$WEIGHTS" \
  --out-dir "$OUT_DIR" \
  --overwrite

python "$(dirname "$0")/streaming_eval.py" \
  --annot-path "$ANNOT_PATH" \
  --result-dir "$OUT_DIR" \
  --fps "$FPS" \
  --eta 0 \
  --overwrite
