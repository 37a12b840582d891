#!/bin/bash
# Wait for round4_after.sh to finish, then regenerate the analytic-overfit
# checkpoint (output/shape/shape_overfit/best.ckpt) that bench.py's
# trained-weights mode reads — the round-4 environment lost the earlier one.
# Usage: scripts/round4_chain.sh  (detached; logs to /tmp/round4_chain.log)
set -u
cd /root/repo
LOG=/tmp/round4_chain.log
echo "[chain] waiting for round4_after ALL DONE" >> "$LOG"
while ! grep -q "ALL DONE" /tmp/round4_after.log 2>/dev/null; do sleep 60; done
echo "[chain] batch done; starting overfit retrain $(date -u +%H:%M:%S)" >> "$LOG"
timeout 9000 python train.py --yaml=options/shape_overfit.yaml \
  > /tmp/train_overfit400.log 2>&1
echo "[chain] overfit retrain exit $? $(date -u +%H:%M:%S)" >> "$LOG"
echo "[chain] ALL DONE" >> "$LOG"
