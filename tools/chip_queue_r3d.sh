#!/bin/bash
# Round-3 final chip queue, ordered by value: verify drive, finish the
# b32768 retune (timed out at ~e725 with 2 decays left — resumable),
# the dispatch-duration bisect, amazon stand-ins with the 128-step
# auto-chunk, the UltraGCN pool (inclusion) quality run, then the
# lower-priority probes if time remains.
set -u
cd /root/repo
mkdir -p results
while ! grep -q "chip_queue_r3c done" results/chip_queue_r3c.log 2>/dev/null; do
  sleep 60
done
sleep 30
echo "=== chip_queue_r3d start $(date +%H:%M:%S) ==="

echo "--- drive_tpu $(date +%H:%M:%S)"
timeout 600 python tools/drive_tpu.py > results/drive_tpu_r3b.log 2>&1
echo "drive exit=$?"
sleep 15

echo "--- b32768 resume $(date +%H:%M:%S)"
timeout 3000 python -m gsrs_tpu --dataset gowalla --bpr_batch 32768 \
  --lr 4e-3 --decay 1e-4 --layer 3 --recdim 64 --reg_mode ego --bf16 \
  --seed 2020 --spmm hybrid --hybrid_cols 8192 \
  --use_scheduler --sched_milestones "[550,700,850]" --sched_gamma 0.5 \
  --epochs 1100 --eval_every 25 --tensorboard 0 --resume \
  --checkpoint_dir checkpoints/b32768-parity --comment b32768-parity \
  >> results/b32768-parity.log 2>&1
cp checkpoints/b32768-parity/valid_epoch_metrics.csv \
   results/b32768-parity-valid.csv 2>/dev/null
cp checkpoints/b32768-parity/train_epoch_metrics.csv \
   results/b32768-parity-train.csv 2>/dev/null
sleep 15

echo "--- probe_yelp_bisect $(date +%H:%M:%S)"
timeout 4200 python tools/probe_yelp_bisect.py \
  > results/probe_yelp_bisect.log 2> results/probe_yelp_bisect.err
echo "bisect exit=$?"
sleep 30

echo "--- bench_scale_standin amazon (128-step auto-chunk) $(date +%H:%M:%S)"
timeout 4200 python tools/bench_scale_standin.py --shapes amazon-book-scale \
  > results/bench_scale_standin_amazon.log 2> results/bench_scale_standin_amazon.err
sleep 15

echo "--- ultragcn pool(inclusion) N=800 P=8192 $(date +%H:%M:%S)"
timeout 3600 python -m gsrs_tpu --dataset gowalla --model ultragcn \
  --bpr_batch 512 --lr 1e-4 --decay 1e-4 --recdim 64 --bf16 --seed 2020 \
  --ug_neg_sharing pool --ug_neg_num 800 --ug_neg_pool 8192 \
  --ug_neg_weight 300 --ug_lambda 2.75 --ug_ii_k 10 \
  --epochs 500 --eval_every 25 --early_stop 8 --tensorboard 0 \
  --checkpoint_dir checkpoints/ug-pool-n800 --comment ug-pool-n800 \
  > results/ug-pool-n800.log 2>&1
cp checkpoints/ug-pool-n800/valid_epoch_metrics.csv results/ug-pool-n800-valid.csv 2>/dev/null
sleep 15

echo "--- probe_pallas_gather (whole-array smem) $(date +%H:%M:%S)"
timeout 900 python tools/probe_pallas_gather.py \
  > results/probe_pallas_gather.log 2> results/probe_pallas_gather.err
sleep 15

echo "--- probe_megahub trainer no-split $(date +%H:%M:%S)"
timeout 1200 python tools/probe_megahub.py --trainer \
  --max_width 1073741824 \
  > results/probe_megahub_trainer_nosplit.log 2>&1
echo "exit=$?"
sleep 60
echo "--- probe_megahub trainer split $(date +%H:%M:%S)"
timeout 1200 python tools/probe_megahub.py --trainer --max_width 65536 \
  > results/probe_megahub_trainer_split.log 2>&1
echo "exit=$?"

echo "=== chip_queue_r3d done $(date +%H:%M:%S) ==="
