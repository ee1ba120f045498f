#!/bin/bash
# Round-3 third chip queue: beyond-verdict measurements.
set -u
cd /root/repo
mkdir -p results
while ! grep -q "chip_queue_r3b done" results/chip_queue_r3b.log 2>/dev/null; do
  sleep 60
done
sleep 30
echo "=== chip_queue_r3c start $(date +%H:%M:%S) ==="

# 0. b32768 quality retune — the b32768 speed probe measured
#    0.929 s/epoch (36x); the sqrt-lr + MultiStepLR playbook that won
#    b8192 and b16384 gets one shot at turning it into the headline.
#    lr 4e-3 = 1e-3 * sqrt(16); decays placed late (fewer, noisier
#    steps per epoch converge slower in epochs).
echo "--- b32768 retune $(date +%H:%M:%S)"
timeout 3000 python -m gsrs_tpu --dataset gowalla --bpr_batch 32768 \
  --lr 4e-3 --decay 1e-4 --layer 3 --recdim 64 --reg_mode ego --bf16 \
  --seed 2020 --spmm hybrid --hybrid_cols 8192 \
  --use_scheduler --sched_milestones "[550,700,850]" --sched_gamma 0.5 \
  --epochs 1100 --eval_every 25 --tensorboard 0 \
  --checkpoint_dir checkpoints/b32768-parity --comment b32768-parity \
  > results/b32768-parity.log 2>&1
cp checkpoints/b32768-parity/valid_epoch_metrics.csv \
   results/b32768-parity-valid.csv 2>/dev/null
cp checkpoints/b32768-parity/train_epoch_metrics.csv \
   results/b32768-parity-train.csv 2>/dev/null
sleep 15

# 1. Sequential family epoch time on the chip — first TPU numbers for
#    the seq stack (100k x 20k, len 64, d128, b1024, bf16).
echo "--- bench_seq_tpu $(date +%H:%M:%S)"
timeout 2400 python tools/bench_seq_tpu.py \
  > results/bench_seq_tpu.log 2>&1
sleep 15

# 2. XSimGCL at the new headline batch: does the contrastive fast-path
#    still converge ~10x faster in wall-clock at b16384 hybrid?
echo "--- xsimgcl b16384 $(date +%H:%M:%S)"
timeout 1800 python -m gsrs_tpu --dataset gowalla --model xsimgcl \
  --bpr_batch 16384 --lr 2.8e-3 --decay 1e-4 --layer 3 --recdim 64 \
  --reg_mode ego --bf16 --seed 2020 --spmm hybrid --hybrid_cols 8192 \
  --cl_lambda 0.05 --cl_eps 0.2 \
  --epochs 150 --eval_every 25 --tensorboard 0 \
  --checkpoint_dir checkpoints/xsimgcl-b16384 --comment xsimgcl-b16384 \
  > results/xsimgcl-b16384.log 2>&1
cp checkpoints/xsimgcl-b16384/valid_epoch_metrics.csv \
   results/xsimgcl-b16384-valid.csv 2>/dev/null
sleep 15

# 3. Hybrid+hashdrop QUALITY spot-check (not just timing): 400 epochs at
#    the b16384 config with keep_prob 0.6 — is the regularizer neutral
#    at the new batch too?
echo "--- b16384 hashdrop quality $(date +%H:%M:%S)"
timeout 2400 python -m gsrs_tpu --dataset gowalla --bpr_batch 16384 \
  --lr 2.8e-3 --decay 1e-4 --layer 3 --recdim 64 --reg_mode ego --bf16 \
  --seed 2020 --spmm hybrid --hybrid_cols 8192 --dropout 1 --keepprob 0.6 \
  --use_scheduler --sched_milestones "[500,650,800]" --sched_gamma 0.5 \
  --epochs 400 --eval_every 50 --tensorboard 0 \
  --checkpoint_dir checkpoints/b16384-drop06 --comment b16384-drop06 \
  > results/b16384-drop06.log 2>&1
cp checkpoints/b16384-drop06/valid_epoch_metrics.csv \
   results/b16384-drop06-valid.csv 2>/dev/null

echo "=== chip_queue_r3c done $(date +%H:%M:%S) ==="
