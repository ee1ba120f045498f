#!/bin/bash
# Round-2 quality retune: recover b2048 parity quality (recall@20 >= 0.1825)
# at batch 8192 under --reg_mode ego (VERDICT item 1).
# Three lr points x 400 epochs, sequential on the single chip; the winner
# is then continued to 1000+ epochs. CSV trajectories land in results/.
set -u
cd /root/repo
mkdir -p results
for cfg in "1e-3 b8192-lr1e3" "2e-3 b8192-lr2e3" "4e-3 b8192-lr4e3"; do
  set -- $cfg
  LR=$1; NAME=$2
  echo "=== $NAME (lr=$LR) start $(date +%H:%M:%S) ==="
  python -m gsrs_tpu --dataset gowalla --bpr_batch 8192 --lr "$LR" \
    --decay 1e-4 --layer 3 --recdim 64 --reg_mode ego --bf16 --seed 2020 \
    --epochs 400 --eval_every 25 --tensorboard 0 \
    --checkpoint_dir "checkpoints/$NAME" --comment "$NAME" \
    > "results/$NAME.log" 2>&1
  cp "checkpoints/$NAME/valid_epoch_metrics.csv" "results/$NAME-valid.csv" 2>/dev/null
  cp "checkpoints/$NAME/train_epoch_metrics.csv" "results/$NAME-train.csv" 2>/dev/null
  echo "=== $NAME done $(date +%H:%M:%S) ==="
done
echo "SWEEP COMPLETE"
