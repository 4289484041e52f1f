#!/usr/bin/env bash
# Round-4 ablation arms (VERDICT item 4 + hourglass_fast quality evidence):
# four 40-epoch synthetic_hard arms trained SEQUENTIALLY through the tunnel,
# each kept alive by tools/tpu_watch_resume.sh and swept with
# benchmarks/sweep_group.py when its final checkpoint lands.
#
#   nohup tools/run_ablation_arms_r4.sh >/tmp/abl4_chain.log 2>&1 &
#
# Arms (shared recipe = the flagship's, at 512 imgs / 40 epochs):
#   abl4_base     hourglass, rotate-15 aug only        (the +/- baseline)
#   abl4_elastic  + --aug_elastic 12,32
#   abl4_unet     --backbone unet
#   abl4_fast     --backbone hourglass_fast
set -u
cd "$(dirname "$0")/.."

FINAL=39
RECIPE=(--dataset synthetic_hard --synthetic_n 512 --input_size 512
        --batch_size 8 --num_epochs 40 --lr_schedule cosine
        --ema_decay 0.999 --aug_rotate 15 --eval_every 10
        --keep_last 2 --steps_per_dispatch 8)

run_arm() {
  local name=$1; shift
  local dir="runs/$name"
  mkdir -p "$dir"
  echo "[$(date -Is)] arm $name: start"
  tools/tpu_watch_resume.sh "$dir" "$FINAL" "$dir/train.log" -- \
    python train.py "${RECIPE[@]}" --save_dir "$dir" "$@"
  echo "[$(date -Is)] arm $name: trained, sweeping"
  python benchmarks/sweep_group.py --weights "$dir/model_$FINAL" \
      --dataset synthetic_hard --use_ema 1 \
      --conf 0.3,0.35 --sp 1.2,1.5 >"$dir/sweep_group.log" 2>&1
  local rc=$?
  echo "[$(date -Is)] arm $name: sweep rc=$rc done"
}

run_arm abl4_base
run_arm abl4_elastic --aug_elastic 12,32
run_arm abl4_unet    --backbone unet
run_arm abl4_fast    --backbone hourglass_fast
echo "[$(date -Is)] all arms done"
