#!/usr/bin/env bash
# Continuation of tools/run_r5_elastic.sh: the 6,48 arm completed but the
# host was recycled while 12,64 was initializing, killing the watcher.
# Re-runs the remaining two arms with the identical recipe/snapshot so the
# three rows stay comparable.
#
#   nohup tools/run_r5_elastic_rest.sh >/tmp/r5_elastic_rest.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

git worktree add .r5_wt HEAD 2>/dev/null || true

FINAL=39
RECIPE=(--dataset synthetic_hard --synthetic_n 512 --input_size 512
        --batch_size 8 --num_epochs 40 --lr_schedule cosine
        --ema_decay 0.999 --aug_rotate 15 --eval_every 10
        --keep_last 2 --steps_per_dispatch 8)
for spec in "12,64" "20,96"; do
  name="abl5_elastic_a${spec%,*}s${spec#*,}"
  dir="runs/$name"
  mkdir -p "$dir"
  if [ -f "$dir/sweep_group.log" ] && grep -q "mAP=" "$dir/sweep_group.log"; then
    echo "[$(date -Is)] elastic-rest: arm $name already swept — skipping"
    continue
  fi
  echo "[$(date -Is)] elastic-rest: arm $name start"
  tools/tpu_watch_resume.sh "$dir" "$FINAL" "$dir/train.log" -- \
    python .r5_wt/train.py "${RECIPE[@]}" --aug_elastic "$spec" \
      --save_dir "$dir"
  python benchmarks/sweep_group.py --weights "$dir/model_$FINAL" \
      --dataset synthetic_hard --use_ema 1 \
      --conf 0.3,0.35 --sp 1.2,1.5 >"$dir/sweep_group.log" 2>&1
  rc=$?
  echo "[$(date -Is)] elastic-rest: arm $name sweep rc=$rc done"
done
echo "[$(date -Is)] elastic-rest: all arms done"
