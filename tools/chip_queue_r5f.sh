#!/bin/bash
# Round-5 part F: seed-replicate the NEW headline operating point
# (tiled G64xC2048 + neg_candidates 4, b131072) so the 103x headline's
# quality claim is statistical like the hybrid one (5-seed band).
# Seed 2020 already recorded (results/b131072-tiled-c4*). ~13 min/seed.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== chip_queue_r5f start $(date +%H:%M:%S) ==="
for SEED in 1 7 42; do
  echo "--- tiled-c4 seed $SEED $(date +%H:%M:%S)"
  timeout 2700 python -m gsrs_tpu --dataset gowalla --bpr_batch 131072 \
    --lr 8e-3 --decay 1e-4 --layer 3 --recdim 64 --reg_mode ego --bf16 \
    --seed "$SEED" --spmm tiled --tiled_groups 64 --tiled_cols 2048 \
    --neg_candidates 4 \
    --use_scheduler --sched_milestones "[750,900,1050]" --sched_gamma 0.5 \
    --epochs 1500 --eval_every 25 --early_stop 10 --tensorboard 0 \
    --checkpoint_dir "checkpoints/b131072-tiledc4-seed$SEED" \
    --comment "b131072-tiledc4-seed$SEED" --save_last_every 25 \
    > "results/b131072-tiledc4-seed$SEED.log" 2>&1
  cp "checkpoints/b131072-tiledc4-seed$SEED/valid_epoch_metrics.csv" \
     "results/b131072-tiledc4-seed$SEED-valid.csv" 2>/dev/null
  sleep 10
done
echo "=== chip_queue_r5f done $(date +%H:%M:%S) ==="
