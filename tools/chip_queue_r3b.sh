#!/bin/bash
# Round-3 follow-up chip queue: reruns with the round-3 fixes
# (realistic synthetic generator, ELL mega-row splitting, SMEM scalar
# output in the DMA probe, serving int8 export fix) + the UltraGCN
# 'pool' estimator quality run. Waits for chip_queue_r3.sh to finish.
set -u
cd /root/repo
mkdir -p results

# wait until the first queue's jobs are gone (poll the log tail)
while ! grep -q "chip_queue_r3 done" results/chip_queue_r3.log 2>/dev/null; do
  sleep 60
done
sleep 30
echo "=== chip_queue_r3b start $(date +%H:%M:%S) ==="

# 0. End-to-end verify drive on the freshly-freed chip (the working
#    tree changed since the last drive: ELL row splitting, generator
#    fix, UltraGCN pool estimator).
echo "--- drive_tpu $(date +%H:%M:%S)"
timeout 600 python tools/drive_tpu.py > results/drive_tpu_r3b.log 2>&1
echo "drive exit=$?"
sleep 15

# 1. Mega-hub causality probe: r2 layout expected to fault, r3 splitting
#    expected to run. Each in its own process.
echo "--- probe_megahub no-split $(date +%H:%M:%S)"
timeout 900 python tools/probe_megahub.py --max_width 1073741824 \
  > results/probe_megahub_nosplit.log 2>&1
echo "exit=$? (nonzero expected: reproduces the r2 fault)"
sleep 60  # grant-release grace after a worker fault
echo "--- probe_megahub split $(date +%H:%M:%S)"
timeout 900 python tools/probe_megahub.py --max_width 65536 \
  > results/probe_megahub_split.log 2>&1
echo "exit=$?"
sleep 15

# 2. Scale stand-ins with the FIXED generator (realistic degree caps).
echo "--- bench_scale_standin (fixed) $(date +%H:%M:%S)"
timeout 3600 python tools/bench_scale_standin.py \
  > results/bench_scale_standin.log 2> results/bench_scale_standin.err
sleep 15

# 3. DMA-gather probe with the SMEM scalar-output fix.
echo "--- probe_pallas_gather (smem fix) $(date +%H:%M:%S)"
timeout 900 python tools/probe_pallas_gather.py \
  > results/probe_pallas_gather.log 2> results/probe_pallas_gather.err
sleep 15

# 4. Serving bench with the int8 export fix.
echo "--- bench_serving (int8 fix) $(date +%H:%M:%S)"
timeout 1800 python tools/bench_serving.py \
  --checkpoint_dir checkpoints/b16384-parity \
  > results/bench_serving.log 2> results/bench_serving.err
sleep 15

# 5. UltraGCN 'pool' + sift_pos: per-example distinct subsets AND exact
#    positive sifting — the paper's full sampler, TPU-shaped.
echo "--- ultragcn pool+sift N=800 P=8192 $(date +%H:%M:%S)"
timeout 5400 python -m gsrs_tpu --dataset gowalla --model ultragcn \
  --bpr_batch 512 --lr 1e-4 --decay 1e-4 --recdim 64 --bf16 --seed 2020 \
  --ug_neg_sharing pool --ug_neg_num 800 --ug_neg_pool 8192 --ug_sift_pos \
  --ug_neg_weight 300 --ug_lambda 2.75 --ug_ii_k 10 \
  --epochs 500 --eval_every 25 --early_stop 8 --tensorboard 0 \
  --checkpoint_dir checkpoints/ug-pool-n800 --comment ug-pool-n800 \
  > results/ug-pool-n800.log 2>&1
cp checkpoints/ug-pool-n800/valid_epoch_metrics.csv results/ug-pool-n800-valid.csv 2>/dev/null

echo "=== chip_queue_r3b done $(date +%H:%M:%S) ==="
