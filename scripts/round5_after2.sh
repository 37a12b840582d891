#!/bin/bash
# Round-5 follow-on chip jobs, reordered (gate calibration before the
# rand-floor eval so VERDICT r4 #7 survives a late tunnel stall).
set -u
cd /root/repo
step() { echo "[after2] $1 $(date -u +%H:%M:%S)"; }

step "waiting for round5_chain ALL DONE"
while ! grep -q "ALL DONE" /tmp/round5_chain.log 2>/dev/null; do sleep 60; done

step "accuracy-gate calibration (3 seeds, on-chip)"
timeout 7200 python scripts/calibrate_gate.py 3 > /tmp/r5_gate_cal.log 2>&1
step "calibrate_gate exit $?"

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
