#!/bin/bash
# Round-4 follow-ups after the device-prefetch landing: re-measure the full
# train.py loops at the reference batches (before/after table vs
# round4_measure.sh), depth-step MFU, the MiDaS median A/B on chip, and the
# fused-vs-grouped end-to-end recon A/B that decides the shipped attention
# layout. Data: /tmp/bench_data + /tmp/overfit_data from round4_measure.sh.
# Usage: scripts/round4_after.sh  (logs to /tmp/round4_after.log + per-stage)
set -u
cd /root/repo
LOG=/tmp/round4_after.log
run() {
  local name="$1"; shift
  echo "[after] === $name: $* ===" >> "$LOG"
  local t0=$SECONDS
  timeout 5400 "$@" > "/tmp/${name}.log" 2>&1
  echo "[after] $name exit $? after $((SECONDS-t0)) s" >> "$LOG"
}

run train_b28_pf python train.py --yaml=options/shape_overfit.yaml \
  --name=shape_b28_pf --batch_size=28 --data.root=/tmp/bench_data \
  --max_epoch=40 --freq.eval=1000 --freq.print=50 --debug

run train_depth44_pf python train.py --yaml=options/depth_overfit.yaml \
  --name=depth_b44_pf --batch_size=44 --data.root=/tmp/bench_data \
  --max_epoch=30 --freq.eval=1000 --freq.print=20 --debug

run train_depth8_pf python train.py --yaml=options/depth_overfit.yaml \
  --name=depth_b8_pf --max_epoch=60 --freq.eval=1000 --freq.print=20 --debug

run mfu_depth python scripts/mfu.py depth

run bench_midas python scripts/bench_midas.py 8 44

BENCH_CKPT=output/shape/shape_b28/checkpoint/ep39.ckpt \
BENCH_DATA=/tmp/bench_data \
run bench_ab_grouped python scripts/bench_ab.py 8 fused,fused-grouped

echo "[after] ALL DONE" >> "$LOG"
