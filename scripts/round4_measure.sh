#!/bin/bash
# Round-4 measurement debt (VERDICT.md Next #1/#2/#7): run every remaining
# CLI measurement sequentially on the single tunneled chip — MFU for the
# batch-28 train step and the recon path, the real train.py steady window at
# batch 28, the reference-schedule profiler trace, the depth-engine step at
# config (8) and reference (44) batch, and the host loader throughput.
# Data: /tmp/overfit_data (5x8 views) and /tmp/bench_data (20x14 views,
# 260 train samples -> 9 steps/epoch at B=28), generated beforehand.
# Usage: scripts/round4_measure.sh  (logs to /tmp/round4_measure.log + per-stage logs)
set -u
cd /root/repo
LOG=/tmp/round4_measure.log
run() {
  local name="$1"; shift
  echo "[measure] === $name: $* ===" >> "$LOG"
  local t0=$SECONDS
  timeout 5400 "$@" > "/tmp/${name}.log" 2>&1
  echo "[measure] $name exit $? after $((SECONDS-t0)) s" >> "$LOG"
}

run mfu_train python scripts/mfu.py train

run train_b28 python train.py --yaml=options/shape_overfit.yaml \
  --name=shape_b28 --batch_size=28 --data.root=/tmp/bench_data \
  --max_epoch=40 --freq.eval=1000 --freq.print=50 --debug

run train_b28_prof python train.py --yaml=options/shape_overfit.yaml \
  --name=shape_b28_prof --batch_size=28 --data.root=/tmp/bench_data \
  --max_epoch=40 --freq.eval=1000 --debug --profile
python scripts/analyze_trace.py debug/profiler_log 40 > /tmp/trace_top.txt 2>&1
echo "[measure] trace analyzed" >> "$LOG"

run train_depth8 python train.py --yaml=options/depth_overfit.yaml \
  --name=depth_b8 --max_epoch=60 --freq.eval=1000 --freq.print=20 --debug

run train_depth44 python train.py --yaml=options/depth_overfit.yaml \
  --name=depth_b44 --batch_size=44 --data.root=/tmp/bench_data \
  --max_epoch=30 --freq.eval=1000 --freq.print=20 --debug

run mfu_recon python scripts/mfu.py recon

run bench_loader python scripts/bench_loader.py /tmp/bench_data

echo "[measure] ALL DONE" >> "$LOG"
