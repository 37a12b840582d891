#!/bin/bash
# Round-5 final chip queue: after the gate calibration (running, pid in
# /tmp/gate.pid) finishes -> hier-capacity measurement on BOTH trained arms
# in one process (compile paid once) -> random-init floor save + eval.
set -u
cd /root/repo
step() { echo "[after3] $1 $(date -u +%H:%M:%S)"; }

GPID=$(cat /tmp/gate.pid)
step "waiting for gate calibration (pid $GPID)"
while kill -0 "$GPID" 2>/dev/null; do sleep 30; done
step "gate calibration done"

step "measure_hier (staged + scratch, one process)"
timeout 3600 python scripts/measure_hier.py --yaml=options/shape_gen.yaml \
  --name=shape_gen_staged --resume \
  --extra_ckpts=output/shape/shape_gen/best.ckpt \
  > /tmp/r5_hier.log 2>&1
step "measure_hier exit $?"

step "random-init floor checkpoint"
timeout 1800 python scripts/save_random_init.py --yaml=options/shape_gen.yaml \
  --name=shape_gen_rand > /tmp/r5_rand_save.log 2>&1
step "save_random_init exit $?"

if [ -d output/shape/shape_gen_rand/best.ckpt ]; then
  step "evaluate random-init floor (turntables off: meshes are noise)"
  timeout 5400 python evaluate.py --yaml=options/shape_gen.yaml \
    --name=shape_gen_rand --ckpt=output/shape/shape_gen_rand/best.ckpt \
    --eval.dump_mesh_viz! > /tmp/r5_eval_rand.log 2>&1
  step "rand evaluate exit $?"
fi
step "ALL DONE"
