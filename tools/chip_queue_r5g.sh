#!/bin/bash
# Round-5 part G: the best-QUALITY batch (b65536, recall 0.183429 in r4
# at 0.63 s/epoch hybrid) re-run at the round-5 operating point — tiled
# G64xC2048 + neg_candidates 4 — same lr/schedule playbook as the r4
# run (lr 5.7e-3 = 1e-3*sqrt(32), milestones [650,800,950]). If quality
# holds, the project's best-quality point also gets the ~1.5x round-5
# speed lever.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== chip_queue_r5g start $(date +%H:%M:%S) ==="
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
sleep 10

# UNCHECKED sampler (neg_candidates=0) frontier: timing A/B on the
# production Trainer, then the quality shot that decides whether the
# mode is usable at the headline batch.
echo "--- C0 timing probe $(date +%H:%M:%S)"
timeout 1200 python tools/probe_fused_adam.py --epochs 4 --neg_candidates 0 \
  > results/probe_sampler_c0.log 2> results/probe_sampler_c0.err
sleep 10

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
echo "=== chip_queue_r5g done $(date +%H:%M:%S) ==="
