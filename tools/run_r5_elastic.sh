#!/usr/bin/env bash
# Round-5 elastic (alpha,sigma) tune-or-demote arms (VERDICT r4 item 5) —
# the tail of tools/run_r5_tpu_chain.sh, split out because the original
# chain's elastic section never ran before the host was recycled.  Waits
# on the post-chain runner (single tunneled chip — concurrent runs corrupt
# each other's timing, CLAUDE.md), then trains three arms at lower
# local-shear ratios than the losing 12,32 default (shear ~ alpha/sigma:
# 0.375 there; 0.125-0.21 here) and sweeps each with the round-4 grid so
# rows are comparable against the committed abl4_base.
#
#   nohup tools/run_r5_elastic.sh >/tmp/r5_elastic.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

POST_PID=${1:-$(cat /tmp/r5_post.pid 2>/dev/null || true)}
if [ -n "${POST_PID:-}" ]; then
  echo "[$(date -Is)] elastic: waiting on post-chain pid $POST_PID"
  while kill -0 "$POST_PID" 2>/dev/null; do sleep 60; done
fi
echo "[$(date -Is)] elastic: post-chain done, starting arms"

# Snapshot so later repo edits can't leak into watchdog relaunches
# mid-run (docs/OPERATIONS.md); removed by the session teardown step.
git worktree add .r5_wt HEAD 2>/dev/null || true

FINAL=39
RECIPE=(--dataset synthetic_hard --synthetic_n 512 --input_size 512
        --batch_size 8 --num_epochs 40 --lr_schedule cosine
        --ema_decay 0.999 --aug_rotate 15 --eval_every 10
        --keep_last 2 --steps_per_dispatch 8)
for spec in "6,48" "12,64" "20,96"; do
  name="abl5_elastic_a${spec%,*}s${spec#*,}"
  dir="runs/$name"
  mkdir -p "$dir"
  echo "[$(date -Is)] elastic: arm $name start"
  tools/tpu_watch_resume.sh "$dir" "$FINAL" "$dir/train.log" -- \
    python .r5_wt/train.py "${RECIPE[@]}" --aug_elastic "$spec" \
      --save_dir "$dir"
  # same sweep grid as the round-4 arms so rows are comparable
  python benchmarks/sweep_group.py --weights "$dir/model_$FINAL" \
      --dataset synthetic_hard --use_ema 1 \
      --conf 0.3,0.35 --sp 1.2,1.5 >"$dir/sweep_group.log" 2>&1
  rc=$?
  echo "[$(date -Is)] elastic: arm $name sweep rc=$rc done"
done
echo "[$(date -Is)] elastic: all arms done"
