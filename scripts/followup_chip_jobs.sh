#!/bin/bash
# Follow-on chip jobs after the overfit training run (launched by
# retry_chip_job.sh) completes. Waits for the retrier to exit, checks the
# train run succeeded, then runs the accuracy evaluation, the hier-vs-dense
# decode A/B on the trained checkpoint, the fused-layout end-to-end A/B, and
# a bench.py refresh — sequentially, so the single chip is never contended.
# Usage: followup_chip_jobs.sh <retrier_pid>
set -u
RETRIER_PID="$1"
LOG=/tmp/followup.log

echo "[followup] waiting for retrier pid $RETRIER_PID" >> "$LOG"
while kill -0 "$RETRIER_PID" 2>/dev/null; do sleep 60; done

if ! grep -q "exit code 0" /tmp/overfit_train.log; then
  echo "[followup] train did not exit 0; aborting" >> "$LOG"
  exit 1
fi

run() {
  echo "[followup] === $* ===" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  echo "[followup] exit $?" >> "$LOG"
}

cd /root/repo
run python evaluate.py --yaml=options/shape_overfit.yaml --resume
cp -r output/shape/shape_overfit output/shape/shape_overfit.dense_eval
# hier-vs-dense decode A/B on the trained checkpoint (ADVICE medium item)
run python evaluate.py --yaml=options/shape_overfit.yaml --resume --eval.hier_final
run python scripts/bench_ab.py 8 xla,fused,fused-grouped
run python bench.py
echo "[followup] all done" >> "$LOG"
