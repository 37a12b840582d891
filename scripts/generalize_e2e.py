"""Held-out-object generalization experiment: the zero-shot protocol at
analytic scale (VERDICT round-4 #1/#2).

The reference's capability is *zero-shot* reconstruction of unseen objects
(reference README.md:103-123; the eval harness scores unseen
Pix3D/OCRTOC/OmniObject3D shapes, utils/eval_3D.py:104-207). Real datasets
are unreachable here (no egress), so this recipe holds out analytic
*objects* — not just views: train on 40 primitives, evaluate on 8 fresh
parameter draws the model never saw, through the unmodified CLIs.

Usage:
  python scripts/generalize_e2e.py gen [root]   # write /tmp/gen_data (CPU)

  # stage 1: depth+intr pretrain (TPU)
  python train.py --yaml=options/depth_gen.yaml
  # stage 2a: shape training staged from the stage-1 checkpoint (TPU)
  python train.py --yaml=options/shape_gen.yaml --name=shape_gen_staged \
      --pretrain.depth=output/depth/depth_gen/best.ckpt
  # stage 2b: from-scratch A/B arm (same seed/epochs, no staging)
  python train.py --yaml=options/shape_gen.yaml
  # score both arms on the 64 unseen-object views + 10 seen-object views
  python evaluate.py --yaml=options/shape_gen.yaml --name=shape_gen_staged --resume
  python evaluate.py --yaml=options/shape_gen.yaml --resume

cd_cat.txt separates seen ("prim") from unseen ("ho0".."ho7") categories;
the summary CD is dominated by the unseen views (64 of 74).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    cmd = sys.argv[1] if len(sys.argv) > 1 else "gen"
    if cmd != "gen":
        raise SystemExit(__doc__)
    from zeroshape_tpu.data.analytic import generate_dataset

    root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/gen_data"
    t0 = time.time()
    base = generate_dataset(
        root, n_objects=40, n_views=8, H=224, seed=0,
        n_pc_points=10000, n_sdf_points=20000, val_views=1,
        holdout_objects=8,
    )
    print(f"wrote {base} in {time.time()-t0:.1f} s")


if __name__ == "__main__":
    main()
