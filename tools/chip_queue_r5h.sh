#!/bin/bash
# Round-5 part H (resumed session): finish the interrupted part-F/G
# chip work, highest-value first.
#   1. seed 7 tiled+C4 re-run (part F was cut at epoch 880/1500)
#   2. UNCHECKED-sampler (neg_candidates=0) timing probe
#   3. b131072 tiled+C0 quality shot (decides whether C0 is usable)
#   4. seed 42 tiled+C4 (4th seed for the headline band)
#   5. b65536 tiled+C4 quality (best-quality batch at the r5 speed lever)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== chip_queue_r5h start $(date +%H:%M:%S) ==="
for SEED in 7 42; do
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
  sleep 5
  if [ "$SEED" = 7 ]; then
    echo "--- C0 timing probe $(date +%H:%M:%S)"
    timeout 1200 python tools/probe_fused_adam.py --epochs 4 --neg_candidates 0 \
      > results/probe_sampler_c0.log 2> results/probe_sampler_c0.err
    sleep 5
    echo "--- b131072 tiled+C0 quality shot $(date +%H:%M:%S)"
    timeout 2700 python -m gsrs_tpu --dataset gowalla --bpr_batch 131072 \
      --lr 8e-3 --decay 1e-4 --layer 3 --recdim 64 --reg_mode ego --bf16 \
      --seed 2020 --spmm tiled --tiled_groups 64 --tiled_cols 2048 \
      --neg_candidates 0 \
      --use_scheduler --sched_milestones "[750,900,1050]" --sched_gamma 0.5 \
      --epochs 1500 --eval_every 25 --early_stop 10 --tensorboard 0 \
      --checkpoint_dir checkpoints/b131072-tiledc0 --comment b131072-tiledc0 \
      --save_last_every 25 \
      > results/b131072-tiledc0.log 2>&1
    cp checkpoints/b131072-tiledc0/valid_epoch_metrics.csv \
       results/b131072-tiledc0-valid.csv 2>/dev/null
    sleep 5
  fi
done

echo "--- b65536 tiled-c4 quality $(date +%H:%M:%S)"
timeout 3600 python -m gsrs_tpu --dataset gowalla --bpr_batch 65536 \
  --lr 5.7e-3 --decay 1e-4 --layer 3 --recdim 64 --reg_mode ego --bf16 \
  --seed 2020 --spmm tiled --tiled_groups 64 --tiled_cols 2048 \
  --neg_candidates 4 \
  --use_scheduler --sched_milestones "[650,800,950]" --sched_gamma 0.5 \
  --epochs 1300 --eval_every 25 --early_stop 10 --tensorboard 0 \
  --checkpoint_dir checkpoints/b65536-tiledc4 --comment b65536-tiledc4 \
  --save_last_every 25 \
  > results/b65536-tiledc4.log 2>&1
cp checkpoints/b65536-tiledc4/valid_epoch_metrics.csv \
   results/b65536-tiledc4-valid.csv 2>/dev/null
echo "=== chip_queue_r5h done $(date +%H:%M:%S) ==="
