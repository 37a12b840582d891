#!/bin/bash
# Retry a chip-bound command until the axon tunnel is back, then run it once.
# Usage: retry_chip_job.sh <logfile> <cmd...>
# Probes the backend with a tiny jit between attempts; sleeps 120 s when the
# tunnel is down. Writes the command's output to <logfile>.
LOG="$1"; shift
for i in $(seq 1 500); do
  if timeout 240 python - <<'PY' >/dev/null 2>&1
import jax, numpy as np, jax.numpy as jnp
np.asarray(jax.jit(lambda a: a + 1)(jnp.ones(8)))
PY
  then
    echo "[retry_chip_job] chip up after $i probe(s); launching: $*" >> "$LOG"
    "$@" >> "$LOG" 2>&1
    echo "[retry_chip_job] exit code $?" >> "$LOG"
    exit 0
  fi
  echo "[retry_chip_job] probe $i failed; tunnel down, sleeping 120 s" >> "$LOG"
  sleep 120
done
echo "[retry_chip_job] gave up after 500 probes" >> "$LOG"
exit 1
