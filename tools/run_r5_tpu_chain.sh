#!/usr/bin/env bash
# Round-5 TPU chain (one tunneled chip — everything sequential; concurrent
# runs corrupt each other's timing, CLAUDE.md):
#   1. wait for the r5b bench arms (PID in /tmp/r5b.pid) to finish,
#   2. flagship-scale unet decider (VERDICT r4 item 3): the exact
#      kg_hard1024 recipe with --backbone unet, watcher-kept-alive,
#      swept with the same group+TTA sweeps as the hourglass flagship,
#   3. elastic (alpha,sigma) tune-or-demote arms (item 5) at the round-4
#      ablation scale, all compared against the committed abl4_base.
#
#   nohup tools/run_r5_tpu_chain.sh >/tmp/r5_chain.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

R5B_PID=${1:-$(cat /tmp/r5b.pid 2>/dev/null || true)}
if [ -n "${R5B_PID:-}" ]; then
  echo "[$(date -Is)] chain: waiting on r5b pid $R5B_PID"
  while kill -0 "$R5B_PID" 2>/dev/null; do sleep 60; done
fi
echo "[$(date -Is)] chain: r5b done, starting flagship unet"

# Run from a snapshot so later repo edits can't leak into watchdog
# relaunches mid-run (docs/OPERATIONS.md).
git worktree add .r5_wt HEAD 2>/dev/null || true

D=runs/kg_unet1024
mkdir -p "$D" && echo '[99]' > "$D/pinned.json"
tools/tpu_watch_resume.sh "$D" 99 "$D/train.log" -- \
  python .r5_wt/train.py --dataset synthetic_hard --synthetic_n 1024 \
    --input_size 512 --batch_size 8 --num_epochs 100 --lr_schedule cosine \
    --ema_decay 0.999 --aug_rotate 15 --eval_every 10 --keep_last 8 \
    --steps_per_dispatch 8 --backbone unet --save_dir "$D"
echo "[$(date -Is)] chain: flagship unet trained, sweeping"
# tpu_after_train's wait loop passes immediately (checkpoint exists);
# identical sweep defaults to the hourglass flagship's sweep99 logs.
tools/tpu_after_train.sh "$D" 99 synthetic_hard "$D/sweep99"
echo "[$(date -Is)] chain: flagship sweeps done"

# ---- elastic (alpha,sigma) arms: lower local-shear ratios than the
# losing 12,32 default (shear ~ alpha/sigma: 0.375 there; 0.125-0.21 here)
FINAL=39
RECIPE=(--dataset synthetic_hard --synthetic_n 512 --input_size 512
        --batch_size 8 --num_epochs 40 --lr_schedule cosine
        --ema_decay 0.999 --aug_rotate 15 --eval_every 10
        --keep_last 2 --steps_per_dispatch 8)
for spec in "6,48" "12,64" "20,96"; do
  name="abl5_elastic_a${spec%,*}s${spec#*,}"
  dir="runs/$name"
  mkdir -p "$dir"
  echo "[$(date -Is)] chain: arm $name start"
  tools/tpu_watch_resume.sh "$dir" "$FINAL" "$dir/train.log" -- \
    python .r5_wt/train.py "${RECIPE[@]}" --aug_elastic "$spec" \
      --save_dir "$dir"
  # same sweep grid as the round-4 arms so rows are comparable
  python benchmarks/sweep_group.py --weights "$dir/model_$FINAL" \
      --dataset synthetic_hard --use_ema 1 \
      --conf 0.3,0.35 --sp 1.2,1.5 >"$dir/sweep_group.log" 2>&1
  rc=$?
  echo "[$(date -Is)] chain: arm $name sweep rc=$rc done"
done
echo "[$(date -Is)] chain: all done"
