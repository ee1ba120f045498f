#!/bin/bash
# Round-4 chip queue, part D: push the headline past b32768.
# b32768 hybrid8192 holds 0.93 s/epoch at quality parity; b65536 has
# never been timed or quality-tuned. Speed probe first, then the
# sqrt-lr + late-MultiStepLR playbook that won b8192/b16384/b32768
# gets one shot (lr 5.7e-3 = 1e-3*sqrt(32), milestones later, more
# epochs — fewer/noisier steps per epoch converge slower in epochs).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== chip_queue_r4d start $(date +%H:%M:%S) ==="

echo "--- b65536 speed probe $(date +%H:%M:%S)"
timeout 1200 python tools/bench_spmm_modes.py --batch 65536 \
  --hybrid_cols 8192 --timed_epochs 3 \
  > results/bench_spmm_b65536.log 2>&1
sleep 15

echo "--- b65536 quality shot $(date +%H:%M:%S)"
timeout 4500 python -m gsrs_tpu --dataset gowalla --bpr_batch 65536 \
  --lr 5.7e-3 --decay 1e-4 --layer 3 --recdim 64 --reg_mode ego --bf16 \
  --seed 2020 --spmm hybrid --hybrid_cols 8192 \
  --use_scheduler --sched_milestones "[650,800,950]" --sched_gamma 0.5 \
  --epochs 1300 --eval_every 25 --early_stop 10 --tensorboard 0 \
  --checkpoint_dir checkpoints/b65536-parity --comment b65536-parity \
  > results/b65536-parity.log 2>&1
cp checkpoints/b65536-parity/valid_epoch_metrics.csv \
   results/b65536-parity-valid.csv 2>/dev/null
cp checkpoints/b65536-parity/train_epoch_metrics.csv \
   results/b65536-parity-train.csv 2>/dev/null

echo "=== chip_queue_r4d done $(date +%H:%M:%S) ==="
