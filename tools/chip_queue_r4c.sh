#!/bin/bash
# Round-4 chip queue, part C: the UltraGCN per-example-estimator
# convergence run (VERDICT r3 item 3 / r2 item 7).
#
# The committed Bernoulli-inclusion 'pool' estimator is batch-like cost
# (results/profile_ug_pool.log: full_step[pool] 6.05 ms == full_step
# [batch] 6.07 ms, dispatch-overhead dominated; the r3 32.7 s/epoch
# measurement predates the inclusion rewrite — the run logged 09:08,
# the rewrite landed 11:29 in 970cd61). This run takes the paper's
# operating point to convergence: per-example subsets (pool) + exact
# positive sifting, N=800, b512, lr 1e-4 — the configuration whose
# wedge/slowness blocked the ndcg-gap-to-paper question twice.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== chip_queue_r4c start $(date +%H:%M:%S) ==="

# NOTE: --ug_sift_pos dropped after the first r4c attempt measured
# 95 s/epoch with it (the (B,P) bitset_lookup gather is issue-rate
# bound: ~4.2M word-gathers/step — results/ug-pool-r4-sift-abort.log).
# Without sift this matches the 'none' estimator's expectation exactly
# (uniform draws, collisions included — the paper's published
# objective), at batch-like cost.
echo "--- ultragcn pool (no sift) N=800 P=8192 to convergence $(date +%H:%M:%S)"
timeout 10800 python -m gsrs_tpu --dataset gowalla --model ultragcn \
  --bpr_batch 512 --lr 1e-4 --decay 1e-4 --recdim 64 --bf16 --seed 2020 \
  --ug_neg_sharing pool --ug_neg_num 800 --ug_neg_pool 8192 \
  --ug_neg_weight 300 --ug_lambda 2.75 --ug_ii_k 10 \
  --epochs 600 --eval_every 25 --early_stop 8 --tensorboard 0 \
  --checkpoint_dir checkpoints/ug-pool-r4 --comment ug-pool-r4 \
  > results/ug-pool-r4.log 2>&1
cp checkpoints/ug-pool-r4/valid_epoch_metrics.csv results/ug-pool-r4-valid.csv 2>/dev/null
cp checkpoints/ug-pool-r4/train_epoch_metrics.csv results/ug-pool-r4-train.csv 2>/dev/null

echo "=== chip_queue_r4c done $(date +%H:%M:%S) ==="
