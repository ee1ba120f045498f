#!/bin/bash
# Round-5 chip queue, part C — runs after r5b's quality queue frees the
# chip:
# 1) sampler-cost probe (neg_candidates sweep + fused-Adam check) — the
#    round-5 roofline follow-up (BENCH_NOTES train roofline).
# 2) one b131072 quality run at the would-be headline config
#    (tiled G64:C2048 + neg_candidates 4) IF the probe shows the
#    sampler win is real — launched manually after reading 1).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== chip_queue_r5c start $(date +%H:%M:%S) ==="

echo "--- sampler cost probe $(date +%H:%M:%S)"
timeout 1800 python tools/probe_sampler_cost.py --batch 131072 \
  > results/probe_sampler_cost.log 2> results/probe_sampler_cost.err

echo "=== chip_queue_r5c done $(date +%H:%M:%S) ==="
