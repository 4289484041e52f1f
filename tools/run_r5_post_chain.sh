#!/usr/bin/env bash
# Round-5 post-chain TPU cells (run after tools/run_r5_tpu_chain.sh):
#   1. matched-protocol TTA rows for the unet flagship decider — the
#      hourglass sweep99_tta.log grid (conf .30/.35, vote max@0 +
#      mean@0.15, sp 1.2) so the README decider compares like with like,
#   2. the remat batch-8 k=1 cell that emitted no JSON in the r5b run,
#   3. inference batch-48/64 rows (amortize the starved backbone's fixed
#      cost; headline stays batch 32 for cross-round comparability),
#   4. a default-config bench.py sanity run (the driver's round-end
#      command).
#
#   nohup tools/run_r5_post_chain.sh >/tmp/r5_post.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

CHAIN_PID=${1:-$(cat /tmp/r5_chain.pid 2>/dev/null || true)}
if [ -n "${CHAIN_PID:-}" ]; then
  echo "[$(date -Is)] post: waiting on chain pid $CHAIN_PID"
  while kill -0 "$CHAIN_PID" 2>/dev/null; do sleep 60; done
fi
echo "[$(date -Is)] post: chain done"

echo "[$(date -Is)] post: matched TTA rows"
timeout 1800 python benchmarks/sweep_tta.py \
    --weights runs/kg_unet1024/model_99 --dataset synthetic_hard \
    --use_ema 1 --conf 0.3,0.35 --vote max,mean --vote_thresh 0,0.15 \
    --size_prune 1.2 >runs/kg_unet1024/sweep99_tta_matched.log 2>&1
rc=$?
echo "[$(date -Is)] post: tta rc=$rc"

OUT=benchmarks/results/train_bench_r5b.jsonl
echo "[$(date -Is)] post: remat batch8 k1 cell"
KGTPU_BENCH_BATCH=8 KGTPU_BENCH_K=1 KGTPU_BENCH_REMAT=1 \
  timeout 1800 python benchmarks/bench_config2_train_step.py \
  >>"$OUT" 2>/tmp/r5_post_remat.err
rc=$?
echo "[$(date -Is)] post: remat rc=$rc"

for bb in hourglass unet; do
  for b in 48 64; do
    echo "[$(date -Is)] post: inference batch $b backbone $bb"
    KGTPU_BENCH_BATCH=$b KGTPU_BENCH_BACKBONE=$bb timeout 1800 python bench.py \
      >>benchmarks/results/infer_batch_r5.jsonl 2>/tmp/r5_post_b${b}_$bb.err
    rc=$?
    echo "[$(date -Is)] post: batch $b $bb rc=$rc"
  done
done

echo "[$(date -Is)] post: bench.py default sanity"
timeout 1800 python bench.py >/tmp/r5_bench_default.json 2>/tmp/r5_bench_default.err
rc=$?
echo "[$(date -Is)] post: bench rc=$rc"
cat /tmp/r5_bench_default.json
echo "[$(date -Is)] post: all done"
