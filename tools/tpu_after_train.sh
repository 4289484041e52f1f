#!/usr/bin/env bash
# Post-training follow-on: wait for the final checkpoint, then run the
# operating-point sweeps (group + TTA, both reporting DSB/COCO/AJI/PQ)
# whose winning rows feed the README tables (docs/OPERATIONS.md).
#
# Usage:
#   nohup tools/tpu_after_train.sh SAVE_DIR FINAL_EPOCH DATASET OUT_PREFIX \
#       >/dev/null 2>&1 &
# e.g. tools/tpu_after_train.sh runs/kg_hard1024 99 synthetic_hard runs/kg_hard1024/sweep99
#
# GROUP_ARGS / TTA_ARGS env vars append extra flags to the respective sweep
# (e.g. GROUP_ARGS="--sp 1.2,1.5,2" to include an operating point outside
# the default grid).
set -u
SAVE_DIR=$1; FINAL=$2; DATASET=$3; PREFIX=$4

while [ ! -d "$SAVE_DIR/model_$FINAL" ]; do sleep 120; done
echo "$(date -Is) after_train: model_$FINAL present, sweeping" >"${PREFIX}_status.log"

python benchmarks/sweep_group.py --weights "$SAVE_DIR/model_$FINAL" \
    --dataset "$DATASET" ${GROUP_ARGS:-} >"${PREFIX}_group.log" 2>&1
echo "$(date -Is) after_train: group sweep rc=$?" >>"${PREFIX}_status.log"

python benchmarks/sweep_tta.py --weights "$SAVE_DIR/model_$FINAL" \
    --dataset "$DATASET" ${TTA_ARGS:-} >"${PREFIX}_tta.log" 2>&1
echo "$(date -Is) after_train: tta sweep rc=$?" >>"${PREFIX}_status.log"
echo "$(date -Is) after_train: done" >>"${PREFIX}_status.log"
