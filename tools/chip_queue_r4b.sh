#!/bin/bash
# Round-4 chip queue, part B: reruns that needed data recovery or a free
# chip, plus the duration-threshold flake arms.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== chip_queue_r4b start $(date +%H:%M:%S) ==="

echo "--- drive_tpu (verify) $(date +%H:%M:%S)"
timeout 300 python tools/drive_tpu.py > results/drive_tpu_r4.log 2>&1
sleep 15

echo "--- profile_ug_pool (gowalla recovered) $(date +%H:%M:%S)"
timeout 1200 python tools/profile_ug_pool.py \
  > results/profile_ug_pool.log 2> results/profile_ug_pool.err
sleep 15

echo "--- probe_topk_twostage (clean, exclusive chip) $(date +%H:%M:%S)"
timeout 900 python tools/probe_topk_twostage.py \
  > results/probe_topk_twostage.log 2>&1
sleep 15

echo "--- profile_eval_phases rerun (fixed calib + evaluator-scan rows) $(date +%H:%M:%S)"
timeout 2700 python tools/profile_eval_phases.py --shape amazon \
  > results/profile_eval_phases.log 2> results/profile_eval_phases.err
sleep 15

echo "--- flake probe arms B,D x3 (duration threshold) $(date +%H:%M:%S)"
timeout 3600 python tools/probe_yelp_bisect.py --arms B D --reps 3 \
  > results/probe_flake_r4b.log 2> results/probe_flake_r4b.err
sleep 15

echo "=== chip_queue_r4b done $(date +%H:%M:%S) ==="
