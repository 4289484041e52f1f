#!/usr/bin/env bash
# Round-5 follow-up train-step arms (after the k-matrix):
#   - pallas gaussian renderer A/B (VERDICT r4 item 6) at batch 8, k=1/8
#   - remat A/B (fewer HBM bytes for more FLOPs) at batch 8 and 32
#   - roofline.py (now with per-backbone backbone_heads rows)
# JSON lines append to $1 (default /tmp/train_bench_r5b.jsonl).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/train_bench_r5b.jsonl}
: >"$OUT"

cell() {
  echo "[$(date -Is)] $*" >&2
  env "$@" timeout "${CELL_TIMEOUT:-900}" \
    python benchmarks/bench_config2_train_step.py \
    >>"$OUT" 2>/tmp/train_bench_r5b.err
  rc=$?
  echo "[$(date -Is)] rc=$rc" >&2
}

# large-batch k=8 cells that outran the matrix's 900 s cap (slow tunnel
# compiles of the scanned program)
CELL_TIMEOUT=2400 cell KGTPU_BENCH_BATCH=32 KGTPU_BENCH_K=8
CELL_TIMEOUT=2400 cell KGTPU_BENCH_BATCH=64 KGTPU_BENCH_K=8

cell KGTPU_BENCH_BATCH=8  KGTPU_BENCH_K=1 KGTPU_BENCH_RENDERER=pallas
cell KGTPU_BENCH_BATCH=8  KGTPU_BENCH_K=8 KGTPU_BENCH_RENDERER=pallas
cell KGTPU_BENCH_BATCH=8  KGTPU_BENCH_K=1 KGTPU_BENCH_REMAT=1
cell KGTPU_BENCH_BATCH=32 KGTPU_BENCH_K=1 KGTPU_BENCH_REMAT=1
cell KGTPU_BENCH_BATCH=8  KGTPU_BENCH_K=8 KGTPU_BENCH_REMAT=1

echo "[$(date -Is)] roofline" >&2
timeout 1800 python benchmarks/roofline.py >>"$OUT" 2>>/tmp/train_bench_r5b.err
rc=$?
echo "[$(date -Is)] roofline rc=$rc" >&2
echo "[$(date -Is)] r5b done -> $OUT" >&2
