#!/bin/bash
# Round-2 chip queue: serialized TPU jobs after the b8192 parity run.
# Each job under `timeout` so a tunnel wedge can't stall the queue.
set -u
cd /root/repo
mkdir -p results
echo "=== chip_queue_r2 start $(date +%H:%M:%S) ==="

# 1. Eval-throughput A/B with the trained parity checkpoint (meaningful
#    approx-vs-exact quality deltas) — VERDICT r1 item 3.
echo "--- bench_eval $(date +%H:%M:%S)"
timeout 1800 python tools/bench_eval.py \
  --checkpoint_dir checkpoints/b8192-parity \
  > results/bench_eval.log 2> results/bench_eval.err

# 2. Yelp2018-/amazon-book-scale synthetic stand-ins — VERDICT r1 item 5.
echo "--- bench_scale_standin $(date +%H:%M:%S)"
timeout 2400 python tools/bench_scale_standin.py \
  > results/bench_scale_standin.log 2> results/bench_scale_standin.err

# 3. Pallas DMA-gather re-probe — VERDICT r1 item 8b.
echo "--- probe_pallas_gather $(date +%H:%M:%S)"
timeout 900 python tools/probe_pallas_gather.py \
  > results/probe_pallas_gather.log 2> results/probe_pallas_gather.err

# 4. Edge-dropout quality A/B vs the recorded no-dropout b8192-lr2e3
#    trajectory (same seed/lr/decay, keep_prob 0.6) — VERDICT r1 item 6.
echo "--- dropout A/B $(date +%H:%M:%S)"
timeout 3600 python -m gsrs_tpu --dataset gowalla --bpr_batch 8192 \
  --lr 2e-3 --decay 1e-4 --layer 3 --recdim 64 --reg_mode ego --bf16 \
  --seed 2020 --epochs 400 --eval_every 25 --tensorboard 0 \
  --dropout 1 --keepprob 0.6 \
  --checkpoint_dir checkpoints/b8192-drop06 --comment b8192-drop06 \
  > results/b8192-drop06.log 2>&1
cp checkpoints/b8192-drop06/valid_epoch_metrics.csv results/b8192-drop06-valid.csv 2>/dev/null
cp checkpoints/b8192-drop06/train_epoch_metrics.csv results/b8192-drop06-train.csv 2>/dev/null

# 5. UltraGCN ndcg-gap shot: closed-form 'full' estimator + exact
#    positive sifting at the paper's operating point — VERDICT r1 item 9.
echo "--- ultragcn full+sift $(date +%H:%M:%S)"
timeout 3600 python -m gsrs_tpu --dataset gowalla --model ultragcn \
  --bpr_batch 512 --lr 1e-4 --decay 1e-4 --recdim 64 --bf16 --seed 2020 \
  --ug_neg_sharing full --ug_sift_pos --ug_neg_weight 300 \
  --ug_lambda 2.75 --ug_ii_k 10 \
  --epochs 500 --eval_every 25 --early_stop 8 --tensorboard 0 \
  --checkpoint_dir checkpoints/ug-full-sift --comment ug-full-sift \
  > results/ug-full-sift.log 2>&1
cp checkpoints/ug-full-sift/valid_epoch_metrics.csv results/ug-full-sift-valid.csv 2>/dev/null

# 6. Fine hybrid_cols sweep at the headline batch + a b16384 speed probe
#    (is there more headroom past b8192?).
echo "--- hybrid_cols sweep $(date +%H:%M:%S)"
timeout 1800 python tools/bench_spmm_modes.py \
  --batch 8192 --hybrid_cols 4096 6144 10240 12288 \
  > results/bench_spmm_cols.log 2>&1
timeout 900 python tools/bench_spmm_modes.py \
  --batch 16384 --hybrid_cols 8192 \
  > results/bench_spmm_b16384.log 2>&1

echo "=== chip_queue_r2 done $(date +%H:%M:%S) ==="
