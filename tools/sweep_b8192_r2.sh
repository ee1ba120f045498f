#!/bin/bash
# Continuation after the tunnel-grant wedge at lr1e3 e252: the two
# lr-scaled arms (400 epochs each), then resume lr1e3 from its
# checkpoint to 800 epochs.
set -u
cd /root/repo
mkdir -p results
run() {
  LR=$1; NAME=$2; EPOCHS=$3; RESUME=$4
  echo "=== $NAME (lr=$LR, epochs=$EPOCHS) start $(date +%H:%M:%S) ==="
  python -m gsrs_tpu --dataset gowalla --bpr_batch 8192 --lr "$LR" \
    --decay 1e-4 --layer 3 --recdim 64 --reg_mode ego --bf16 --seed 2020 \
    --epochs "$EPOCHS" --eval_every 25 --tensorboard 0 \
    --checkpoint_dir "checkpoints/$NAME" --comment "$NAME" $RESUME \
    >> "results/$NAME.log" 2>&1
  cp "checkpoints/$NAME/valid_epoch_metrics.csv" "results/$NAME-valid.csv" 2>/dev/null
  cp "checkpoints/$NAME/train_epoch_metrics.csv" "results/$NAME-train.csv" 2>/dev/null
  echo "=== $NAME done $(date +%H:%M:%S) ==="
}
run 2e-3 b8192-lr2e3 400 ""
run 4e-3 b8192-lr4e3 400 ""
run 1e-3 b8192-lr1e3 800 "--resume"
echo "SWEEP2 COMPLETE"
