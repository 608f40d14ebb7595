#!/bin/bash
# Pseudo-GT wrapper (counterpart of run_generate_pseudo_gt.sh: 512², frame_skip 5;
# pass CALIB_FILE to use a thermal calibration instead of estimation — the
# reference fetches calibrations/t_calib.json from jzuern/heatnet-pub).
set -euo pipefail

DATASET_DIR="${DATASET_DIR:-/data/freiburg}"
OUTPUT_DIR="${OUTPUT_DIR:-pseudo_gt}"
WEIGHTS="${WEIGHTS:-checkpoints/MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth}"
CALIB_FILE="${CALIB_FILE:-}"

EXTRA=()
if [[ -n "$CALIB_FILE" ]]; then EXTRA+=(--calib_file "$CALIB_FILE"); fi

python -m thermal3d.cli.pseudo_gt \
    --dataset_dir "$DATASET_DIR" \
    --output_dir "$OUTPUT_DIR" \
    --weights "$WEIGHTS" \
    --img_size 512 512 \
    --frame_skip 5 \
    "${EXTRA[@]}" \
    "$@"
