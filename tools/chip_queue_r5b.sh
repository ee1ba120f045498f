#!/bin/bash
# Round-5 chip queue, part B (part A was killed by a session restart
# before any job completed — results/chip_queue_r5.out).
#
# 1) VERDICT r4 item 1: seed-replicate the b131072 headline parity
#    config (hybrid, EXACTLY the recorded r4 config) at 4 extra seeds.
# 2) Tiled quality confirmation: one b131072 run with --spmm tiled
#    G64:C2048 (the round-5 A/B winner, results/bench_spmm_tiled_*.log)
#    so the new fastest mode carries its own end-to-end quality
#    evidence before bench.py pins it.
# 3) VERDICT r4 item 5: NGCF + PureMF quality runs (paper bars ~0.157
#    and ~0.129 recall@20 on Gowalla).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== chip_queue_r5b start $(date +%H:%M:%S) ==="

for SEED in 1 7 42 2021; do
  echo "--- b131072 parity seed=$SEED $(date +%H:%M:%S)"
  timeout 2700 python -m gsrs_tpu --dataset gowalla --bpr_batch 131072 \
    --lr 8e-3 --decay 1e-4 --layer 3 --recdim 64 --reg_mode ego --bf16 \
    --seed "$SEED" --spmm hybrid --hybrid_cols 8192 \
    --use_scheduler --sched_milestones "[750,900,1050]" --sched_gamma 0.5 \
    --epochs 1500 --eval_every 25 --early_stop 10 --tensorboard 0 \
    --checkpoint_dir "checkpoints/b131072-seed$SEED" \
    --comment "b131072-seed$SEED" --save_last_every 25 \
    > "results/b131072-seed$SEED.log" 2>&1
  cp "checkpoints/b131072-seed$SEED/valid_epoch_metrics.csv" \
     "results/b131072-seed$SEED-valid.csv" 2>/dev/null
  sleep 10
done

echo "--- b131072 tiled G64:C2048 quality (seed 2020) $(date +%H:%M:%S)"
timeout 2700 python -m gsrs_tpu --dataset gowalla --bpr_batch 131072 \
  --lr 8e-3 --decay 1e-4 --layer 3 --recdim 64 --reg_mode ego --bf16 \
  --seed 2020 --spmm tiled --tiled_groups 64 --tiled_cols 2048 \
  --use_scheduler --sched_milestones "[750,900,1050]" --sched_gamma 0.5 \
  --epochs 1500 --eval_every 25 --early_stop 10 --tensorboard 0 \
  --checkpoint_dir checkpoints/b131072-tiled \
  --comment b131072-tiled --save_last_every 25 \
  > results/b131072-tiled.log 2>&1
cp checkpoints/b131072-tiled/valid_epoch_metrics.csv \
   results/b131072-tiled-valid.csv 2>/dev/null
sleep 10

echo "--- ngcf quality run $(date +%H:%M:%S)"
# NGCF paper operating point scaled 2x batch (paper: b1024, reg 1e-5,
# node+message dropout 0.1 -> edge dropout keepprob 0.9 here).
timeout 4200 python -m gsrs_tpu --dataset gowalla --model ngcf \
  --bpr_batch 2048 --lr 1e-3 --decay 1e-5 --layer 3 --recdim 64 --bf16 \
  --seed 2020 --spmm hybrid --hybrid_cols 8192 \
  --dropout 1 --keepprob 0.9 \
  --epochs 600 --eval_every 20 --early_stop 10 --tensorboard 0 \
  --checkpoint_dir checkpoints/ngcf-gowalla --comment ngcf-gowalla --save_last_every 20 \
  > results/ngcf-gowalla.log 2>&1
cp checkpoints/ngcf-gowalla/valid_epoch_metrics.csv \
   results/ngcf-gowalla-valid.csv 2>/dev/null
sleep 10

echo "--- puremf quality run $(date +%H:%M:%S)"
timeout 3600 python -m gsrs_tpu --dataset gowalla --model mf \
  --bpr_batch 2048 --lr 1e-3 --decay 1e-4 --recdim 64 --bf16 \
  --seed 2020 \
  --epochs 1000 --eval_every 25 --early_stop 10 --tensorboard 0 \
  --checkpoint_dir checkpoints/mf-gowalla --comment mf-gowalla --save_last_every 25 \
  > results/mf-gowalla.log 2>&1
cp checkpoints/mf-gowalla/valid_epoch_metrics.csv \
   results/mf-gowalla-valid.csv 2>/dev/null

echo "=== chip_queue_r5b done $(date +%H:%M:%S) ==="
