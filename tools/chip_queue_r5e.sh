#!/bin/bash
# Round-5 chip queue, part E — replaces r5b's NGCF/MF tail and r5d:
# r5b's NGCF job was misconfigured (--spmm hybrid: NGCF supports
# ell/segment only, so it would silently fall to the scatter segment
# path at b2048 — ~13 s/epoch, hours for 600 epochs). Here:
# 1) NGCF quality at b16384 on the scatter-free ELL path, lr
#    sqrt-scaled from the paper's 1e-3@b1024 (x4), the same playbook
#    every LightGCN parity point used. Paper bar ~0.157 recall@20.
# 2) PureMF quality (b2048; BPR-MF paper bar ~0.129 via LightGCN paper).
# 3) sampler-cost probe (neg_candidates sweep + fused Adam).
# 4) b131072 tiled+C4 quality shot — the would-be new headline config.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== chip_queue_r5e start $(date +%H:%M:%S) ==="

echo "--- ngcf quality run (b16384, ell) $(date +%H:%M:%S)"
timeout 2700 python -m gsrs_tpu --dataset gowalla --model ngcf \
  --bpr_batch 16384 --lr 4e-3 --decay 1e-5 --layer 3 --recdim 64 --bf16 \
  --seed 2020 --spmm ell \
  --dropout 1 --keepprob 0.9 \
  --epochs 600 --eval_every 20 --early_stop 10 --tensorboard 0 \
  --checkpoint_dir checkpoints/ngcf-gowalla --comment ngcf-gowalla \
  --save_last_every 20 \
  > results/ngcf-gowalla.log 2>&1
cp checkpoints/ngcf-gowalla/valid_epoch_metrics.csv \
   results/ngcf-gowalla-valid.csv 2>/dev/null
sleep 10

echo "--- puremf quality run $(date +%H:%M:%S)"
timeout 2700 python -m gsrs_tpu --dataset gowalla --model mf \
  --bpr_batch 2048 --lr 1e-3 --decay 1e-4 --recdim 64 --bf16 \
  --seed 2020 \
  --epochs 1000 --eval_every 25 --early_stop 10 --tensorboard 0 \
  --checkpoint_dir checkpoints/mf-gowalla --comment mf-gowalla \
  --save_last_every 25 \
  > results/mf-gowalla.log 2>&1
cp checkpoints/mf-gowalla/valid_epoch_metrics.csv \
   results/mf-gowalla-valid.csv 2>/dev/null
sleep 10

echo "--- sampler cost probe $(date +%H:%M:%S)"
timeout 1800 python tools/probe_sampler_cost.py --batch 131072 \
  > results/probe_sampler_cost.log 2> results/probe_sampler_cost.err
sleep 10

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

echo "=== chip_queue_r5e done $(date +%H:%M:%S) ==="
