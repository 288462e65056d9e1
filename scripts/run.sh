#!/bin/bash
# Batch launcher — the run.sh analog (reference: implicit-neural-representations/
# run.sh drove master.py under SLURM with 8 positional args; here positional
# args map to the same hyperparameters and output is teed per experiment).
#
# Usage: scripts/run.sh TOTAL_STEPS SEG HIDDEN_LAYERS HIDDEN_FEATURES LR SCALE EXP_NAME ERD
set -euo pipefail
cd "$(dirname "$0")/.."
TOTAL_STEPS=${1:-3000}
SEG=${2:-150}
HIDDEN_LAYERS=${3:-6}
HIDDEN_FEATURES=${4:-64}
LR=${5:-0.0003}
SCALE=${6:-3}
EXP_NAME=${7:-sr2}
ERD=${8:-0}

python cli/master.py \
  --total_steps "$TOTAL_STEPS" --seg "$SEG" \
  --hidden_layers "$HIDDEN_LAYERS" --hidden_features "$HIDDEN_FEATURES" \
  --learning_rate "$LR" --scale "$SCALE" --exp_name "$EXP_NAME" --erd "$ERD" \
  2>&1 | tee "$EXP_NAME.out"
