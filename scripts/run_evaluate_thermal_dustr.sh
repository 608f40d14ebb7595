#!/bin/bash
# Evaluation wrapper. (The reference's run_evaluate_thermal_dustr.sh calls a
# missing evaluate_thermal_dustr.py — SURVEY.md C27; this one targets the real
# evaluator CLI.)
set -euo pipefail

MODEL="${MODEL:-checkpoints/thermal_dustr_ft_best.pth}"
THERMAL_DIR="${THERMAL_DIR:-/data/freiburg/test/night/ImagesIR}"
PSEUDO_GT_DIR="${PSEUDO_GT_DIR:-pseudo_gt_test_set/night/depth}"
OUTPUT_DIR="${OUTPUT_DIR:-thermal_evaluation_results}"

python -m thermal3d.cli.evaluate \
    --model "$MODEL" \
    --thermal_dir "$THERMAL_DIR" \
    --pseudo_gt_dir "$PSEUDO_GT_DIR" \
    --output_dir "$OUTPUT_DIR" \
    --img_size 224 224 \
    "$@"
