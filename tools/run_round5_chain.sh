#!/usr/bin/env bash
# Round-5 TPU training chain (VERDICT r4 items 3 + 5), run SEQUENTIALLY
# through the tunnel:
#
#   1. kg_unet1024 — the architecture decider: `--backbone unet` at the
#      EXACT kg_hard1024 flagship recipe (1024 imgs / 100 epochs), swept
#      at epoch 99 with the same group+TTA grids as the hourglass flagship
#      so the README table compares like for like.
#   2. abl5_el_* — elastic-augmentation (alpha, sigma) sweep at the
#      round-4 ablation arm scale (512 imgs / 40 epochs, hourglass),
#      compared against the existing runs/abl4_base arm.  Round 4 measured
#      the default 12,32 losing 0.105 mAP; these arms test whether a
#      smoother/gentler field (cells are 6-150 px) recovers it.
#
#   nohup tools/run_round5_chain.sh >/tmp/r5_chain.log 2>&1 &
#
# Each run is kept alive by tools/tpu_watch_resume.sh (PID-based relaunch
# with --resume on tunnel outages).  Trains from a worktree snapshot so
# later repo edits can't change the code a relaunch picks up
# (docs/OPERATIONS.md); the snapshot is removed at the end.
set -u
cd "$(dirname "$0")/.."

WT=.r5chain_wt
[ -d "$WT" ] || git worktree add "$WT" HEAD

# --- 1. flagship unet arm -------------------------------------------------
DIR=runs/kg_unet1024
mkdir -p "$DIR"
echo '[99]' >"$DIR/pinned.json"
echo "[$(date -Is)] flagship unet: start"
tools/tpu_watch_resume.sh "$DIR" 99 "$DIR/train.log" -- \
  python "$WT/train.py" --backbone unet --dataset synthetic_hard \
    --synthetic_n 1024 --input_size 512 --batch_size 8 --num_epochs 100 \
    --lr_schedule cosine --ema_decay 0.999 --aug_rotate 15 --eval_every 10 \
    --keep_last 8 --steps_per_dispatch 8 --save_dir "$DIR"
echo "[$(date -Is)] flagship unet: trained, sweeping"
GROUP_ARGS="--use_ema 1" TTA_ARGS="--use_ema 1" \
  tools/tpu_after_train.sh "$DIR" 99 synthetic_hard "$DIR/sweep99"
rc=$?
echo "[$(date -Is)] flagship unet: sweeps rc=$rc"

# --- 2. elastic (alpha, sigma) arms ----------------------------------------
FINAL=39
RECIPE=(--dataset synthetic_hard --synthetic_n 512 --input_size 512
        --batch_size 8 --num_epochs 40 --lr_schedule cosine
        --ema_decay 0.999 --aug_rotate 15 --eval_every 10
        --keep_last 2 --steps_per_dispatch 8)

run_arm() {
  local name=$1 elastic=$2
  local dir="runs/$name"
  mkdir -p "$dir"
  echo "[$(date -Is)] arm $name (--aug_elastic $elastic): start"
  tools/tpu_watch_resume.sh "$dir" "$FINAL" "$dir/train.log" -- \
    python "$WT/train.py" "${RECIPE[@]}" --save_dir "$dir" \
      --aug_elastic "$elastic"
  echo "[$(date -Is)] arm $name: trained, sweeping"
  python benchmarks/sweep_group.py --weights "$dir/model_$FINAL" \
      --dataset synthetic_hard --use_ema 1 \
      --conf 0.3,0.35 --sp 1.2,1.5 >"$dir/sweep_group.log" 2>&1
  local rc=$?
  echo "[$(date -Is)] arm $name: sweep rc=$rc done"
}

run_arm abl5_el_a4s64   4,64
run_arm abl5_el_a8s128  8,128
run_arm abl5_el_a12s128 12,128

git worktree remove --force "$WT"
echo "[$(date -Is)] round-5 chain done"
