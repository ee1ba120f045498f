#!/bin/bash
# Round-3 chip queue: serialized TPU jobs after the b16384 parity run.
# Each job under `timeout` so a tunnel wedge can't stall the queue; a
# 15 s grace between jobs lets the device grant release cleanly.
set -u
cd /root/repo
mkdir -p results
echo "=== chip_queue_r3 start $(date +%H:%M:%S) ==="

# 1. Yelp2018-/amazon-book-scale stand-ins with the fixed per-config
#    subprocess driver — reproduce or clear the r2 TPU-worker crash
#    (VERDICT r2 item 2).
echo "--- bench_scale_standin $(date +%H:%M:%S)"
timeout 3600 python tools/bench_scale_standin.py \
  > results/bench_scale_standin.log 2> results/bench_scale_standin.err
sleep 15

# 2. Eval A/B incl. the NEW bit-plane Pallas kernel compile attempt
#    (VERDICT r2 item 4 / SURVEY §7 step 6) — uses the b16384 parity
#    checkpoint for meaningful quality columns.
echo "--- bench_eval (bitplane) $(date +%H:%M:%S)"
timeout 1800 python tools/bench_eval.py \
  --checkpoint_dir checkpoints/b16384-parity \
  > results/bench_eval_r3.log 2> results/bench_eval_r3.err
sleep 15

# 3. Pallas DMA-gather probe re-run (ADVICE r2: committed log is stale).
echo "--- probe_pallas_gather $(date +%H:%M:%S)"
timeout 900 python tools/probe_pallas_gather.py \
  > results/probe_pallas_gather.log 2> results/probe_pallas_gather.err
sleep 15

# 4. Serving latency/QPS (VERDICT r2 item 8).
echo "--- bench_serving $(date +%H:%M:%S)"
timeout 1800 python tools/bench_serving.py \
  --checkpoint_dir checkpoints/b16384-parity \
  > results/bench_serving.log 2> results/bench_serving.err
sleep 15

# 5. UltraGCN last hypothesis: per-example distinct negatives at modest
#    count (VERDICT r2 item 7) — the paper's exact estimator, N=800.
echo "--- ultragcn none N=800 $(date +%H:%M:%S)"
timeout 7200 python -m gsrs_tpu --dataset gowalla --model ultragcn \
  --bpr_batch 512 --lr 1e-4 --decay 1e-4 --recdim 64 --bf16 --seed 2020 \
  --ug_neg_sharing none --ug_neg_num 800 --ug_neg_weight 300 \
  --ug_lambda 2.75 --ug_ii_k 10 \
  --epochs 500 --eval_every 25 --early_stop 8 --tensorboard 0 \
  --checkpoint_dir checkpoints/ug-none-n800 --comment ug-none-n800 \
  > results/ug-none-n800.log 2>&1
cp checkpoints/ug-none-n800/valid_epoch_metrics.csv results/ug-none-n800-valid.csv 2>/dev/null
sleep 15

# 5b. Hybrid + hash-dropout epoch-cost probe (VERDICT r2 item 6): the
#     headline config can now train WITH the regularizer — measure what
#     the stateless mask costs per epoch vs 2.85 s clean / 5.08 s ELL
#     eidx-mask dropout.
echo "--- hybrid hashdrop timing $(date +%H:%M:%S)"
timeout 900 python -m gsrs_tpu --dataset gowalla --bpr_batch 8192 \
  --lr 2e-3 --decay 1e-4 --layer 3 --recdim 64 --reg_mode ego --bf16 \
  --seed 2020 --spmm hybrid --hybrid_cols 8192 --dropout 1 --keepprob 0.6 \
  --epochs 12 --eval_every 100 --tensorboard 0 \
  --checkpoint_dir checkpoints/b8192-hybdrop-probe \
  --comment b8192-hybdrop-probe \
  > results/b8192-hybdrop-probe.log 2>&1
sleep 15

# 6. Pop-gate sweep on lastfm (VERDICT r2 item 9): gate_temp x
#    entropy_coeff x pop_hidden, 200 epochs each — decide whether any
#    operating point beats plain LightGCN, or retire with evidence.
echo "--- pop-gate sweep $(date +%H:%M:%S)"
for cfgname in t1-e001-h32:1.0:0.01:32 t2-e001-h32:2.0:0.01:32 \
               t05-e001-h32:0.5:0.01:32 t1-e01-h32:1.0:0.1:32 \
               t1-e0-h32:1.0:0.0:32 t2-e001-h8:2.0:0.01:8; do
  name="${cfgname%%:*}"; rest="${cfgname#*:}"
  temp="${rest%%:*}"; rest="${rest#*:}"
  ent="${rest%%:*}"; hid="${rest#*:}"
  echo "--- pop-gate $name $(date +%H:%M:%S)"
  timeout 1800 python -m gsrs_tpu --dataset lastfm --bpr_batch 2048 \
    --lr 1e-3 --decay 1e-4 --layer 3 --recdim 64 --reg_mode ego --bf16 \
    --seed 2020 --epochs 200 --eval_every 25 --tensorboard 0 \
    --use_pop_gate --pop_gate_temp "$temp" --gate_entropy_coeff "$ent" \
    --pop_hidden "$hid" \
    --checkpoint_dir "checkpoints/popgate-$name" --comment "popgate-$name" \
    > "results/popgate-$name.log" 2>&1
  cp "checkpoints/popgate-$name/valid_epoch_metrics.csv" \
     "results/popgate-$name-valid.csv" 2>/dev/null
  sleep 10
done
# plain-LightGCN control at the same budget
echo "--- pop-gate control $(date +%H:%M:%S)"
timeout 1800 python -m gsrs_tpu --dataset lastfm --bpr_batch 2048 \
  --lr 1e-3 --decay 1e-4 --layer 3 --recdim 64 --reg_mode ego --bf16 \
  --seed 2020 --epochs 200 --eval_every 25 --tensorboard 0 \
  --checkpoint_dir checkpoints/popgate-control --comment popgate-control \
  > results/popgate-control.log 2>&1
cp checkpoints/popgate-control/valid_epoch_metrics.csv \
   results/popgate-control-valid.csv 2>/dev/null

# 7. Headroom probes past b16384: batch 32768 and hub-width fine sweep
#    at the new headline batch.
echo "--- spmm headroom probes $(date +%H:%M:%S)"
timeout 1200 python tools/bench_spmm_modes.py \
  --batch 32768 --hybrid_cols 8192 12288 \
  > results/bench_spmm_b32768.log 2>&1
sleep 15
timeout 1200 python tools/bench_spmm_modes.py \
  --batch 16384 --hybrid_cols 6144 10240 \
  > results/bench_spmm_b16384_cols.log 2>&1

echo "=== chip_queue_r3 done $(date +%H:%M:%S) ==="
