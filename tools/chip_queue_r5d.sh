#!/bin/bash
# Round-5 chip queue, part D (replaces the r5c sketch) — after r5b:
# 1) sampler-cost probe: neg_candidates sweep {16,8,4,2} + fused-Adam
#    check (the round-5 roofline follow-up; the sampler is the dominant
#    per-triplet train cost).
# 2) b131072 quality shot at the would-be new headline: tiled G64:C2048
#    + neg_candidates 4 (bias floor rho^4 ~ 1e-12/triplet — ~0.001
#    biased triplets over the whole 1.4e9-draw run; the different RNG
#    stream is covered statistically by the seed-replication table).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== chip_queue_r5d start $(date +%H:%M:%S) ==="

echo "--- sampler cost probe $(date +%H:%M:%S)"
timeout 1800 python tools/probe_sampler_cost.py --batch 131072 \
  > results/probe_sampler_cost.log 2> results/probe_sampler_cost.err

echo "--- b131072 tiled+C4 quality shot (seed 2020) $(date +%H:%M:%S)"
timeout 2700 python -m gsrs_tpu --dataset gowalla --bpr_batch 131072 \
  --lr 8e-3 --decay 1e-4 --layer 3 --recdim 64 --reg_mode ego --bf16 \
  --seed 2020 --spmm tiled --tiled_groups 64 --tiled_cols 2048 \
  --neg_candidates 4 \
  --use_scheduler --sched_milestones "[750,900,1050]" --sched_gamma 0.5 \
  --epochs 1500 --eval_every 25 --early_stop 10 --tensorboard 0 \
  --checkpoint_dir checkpoints/b131072-tiled-c4 \
  --comment b131072-tiled-c4 --save_last_every 25 \
  > results/b131072-tiled-c4.log 2>&1
cp checkpoints/b131072-tiled-c4/valid_epoch_metrics.csv \
   results/b131072-tiled-c4-valid.csv 2>/dev/null

echo "=== chip_queue_r5d done $(date +%H:%M:%S) ==="
