#!/bin/bash
# Round-5 chip chain: execute the held-out-object generalization experiment
# end-to-end through the unmodified CLIs (VERDICT r4 #1/#2), then the
# measurement debt (#3 exact-BF cost, #6 hier capacity).
# Usage: nohup scripts/round5_chain.sh > /tmp/round5_chain.log 2>&1 &
# Data must exist: python scripts/generalize_e2e.py gen /tmp/gen_data
set -u
cd /root/repo

step() { echo "[chain] $1 $(date -u +%H:%M:%S)"; }

step "stage1: depth_gen pretrain"
timeout 7200 python train.py --yaml=options/depth_gen.yaml \
  > /tmp/r5_depth_gen.log 2>&1
step "depth_gen exit $?"

if [ -d output/depth/depth_gen/best.ckpt ]; then
  step "stage2a: shape_gen_staged (pretrain.depth staged)"
  timeout 10800 python train.py --yaml=options/shape_gen.yaml \
    --name=shape_gen_staged \
    --pretrain.depth=output/depth/depth_gen/best.ckpt \
    > /tmp/r5_shape_staged.log 2>&1
  step "shape_gen_staged exit $?"
else
  step "SKIP staged arm: no depth_gen best.ckpt"
fi

step "stage2b: shape_gen from scratch (A/B arm)"
timeout 10800 python train.py --yaml=options/shape_gen.yaml \
  > /tmp/r5_shape_scratch.log 2>&1
step "shape_gen exit $?"

for name in shape_gen_staged shape_gen; do
  if [ -d output/shape/$name/best.ckpt ]; then
    step "evaluate $name (default exact dense protocol)"
    timeout 5400 python evaluate.py --yaml=options/shape_gen.yaml \
      --name=$name --resume > /tmp/r5_eval_$name.log 2>&1
    step "evaluate $name exit $?"
  fi
done

# exact brute-force protocol cost (VERDICT r4 weak#1): separate output dir so
# the default-protocol result files above survive
BFCKPT=""
[ -d output/shape/shape_gen_staged/best.ckpt ] && BFCKPT=output/shape/shape_gen_staged/best.ckpt
[ -z "$BFCKPT" ] && [ -d output/shape/shape_gen/best.ckpt ] && BFCKPT=output/shape/shape_gen/best.ckpt
if [ -n "$BFCKPT" ]; then
  step "evaluate exact brute-force ($BFCKPT)"
  timeout 10800 python evaluate.py --yaml=options/shape_gen.yaml \
    --name=shape_gen_bf --ckpt=$BFCKPT --eval.brute_force \
    > /tmp/r5_eval_bf.log 2>&1
  step "bf evaluate exit $?"
fi

for name in shape_gen_staged shape_gen; do
  if [ -d output/shape/$name/best.ckpt ]; then
    step "measure_hier $name"
    timeout 3600 python scripts/measure_hier.py --yaml=options/shape_gen.yaml \
      --name=$name --resume > /tmp/r5_hier_$name.log 2>&1
    step "measure_hier $name exit $?"
  fi
done

step "ALL DONE"
