#!/bin/bash
# Round-4 serialized TPU job queue (one chip process at a time; 15 s
# grant-release grace between jobs). Queue order favors the VERDICT r3
# items: flake-rate fault experiment (#2), UltraGCN pool profile (#3),
# eval auto-select A/B (#4), eval phase roofline (#5), serving
# on-device latency (#6).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== chip_queue_r4 start $(date +%H:%M:%S) ==="

echo "--- smoke_serve_bitplane $(date +%H:%M:%S)"
timeout 900 python tools/smoke_serve_bitplane.py \
  > results/smoke_serve_bitplane.log 2>&1
sleep 15

echo "--- profile_ug_pool $(date +%H:%M:%S)"
timeout 900 python tools/profile_ug_pool.py \
  > results/profile_ug_pool.log 2> results/profile_ug_pool.err
sleep 15

echo "--- flake probe arms A,C x5 $(date +%H:%M:%S)"
timeout 7200 python tools/probe_yelp_bisect.py --arms A C --reps 5 \
  > results/probe_flake_r4.log 2> results/probe_flake_r4.err
sleep 15

echo "--- bench_eval (auto-select) $(date +%H:%M:%S)"
# no trained checkpoint survives the round boundary (checkpoints/ is
# gitignored); random params keep the timing + the bitplane==exact
# equality check valid, quality columns vacuous
timeout 2700 python tools/bench_eval.py \
  > results/bench_eval_r4.log 2> results/bench_eval_r4.err
sleep 15

echo "--- profile_eval_phases amazon $(date +%H:%M:%S)"
timeout 2700 python tools/profile_eval_phases.py --shape amazon \
  > results/profile_eval_phases.log 2> results/profile_eval_phases.err
sleep 15

echo "--- bench_serving (ondevice cols) $(date +%H:%M:%S)"
timeout 1800 python tools/bench_serving.py \
  > results/bench_serving_r4.log 2> results/bench_serving_r4.err
sleep 15

echo "=== chip_queue_r4 done $(date +%H:%M:%S) ==="
