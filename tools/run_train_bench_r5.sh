#!/usr/bin/env bash
# Round-5 config-2 train-step matrix (VERDICT r4 item 1): the CORRECTED
# bench (full fwd+bwd+optimizer/EMA kept alive) across batch sizes, at
# k=1 and k=8 steps-per-dispatch — the dispatch-vs-device overhead split.
# One JSON line per cell into $1 (default /tmp/train_bench_r5.jsonl).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/train_bench_r5.jsonl}
: >"$OUT"
for bs in 8 16 32 64; do
  for k in 1 8; do
    echo "[$(date -Is)] batch=$bs k=$k" >&2
    KGTPU_BENCH_BATCH=$bs KGTPU_BENCH_K=$k \
      timeout 900 python benchmarks/bench_config2_train_step.py >>"$OUT" 2>/tmp/train_bench_r5.err
    rc=$?
    echo "[$(date -Is)] batch=$bs k=$k rc=$rc" >&2
    [ $rc -ne 0 ] && tail -3 /tmp/train_bench_r5.err >&2
  done
done
echo "[$(date -Is)] matrix done -> $OUT" >&2
