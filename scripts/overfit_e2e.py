"""End-to-end accuracy verification: overfit on analytic shapes, then eval.

Usage:
  python scripts/overfit_e2e.py gen        # write /tmp/overfit_data (CPU)
  python train.py --yaml=options/shape_overfit.yaml          # train (TPU)
  python evaluate.py --yaml=options/shape_overfit.yaml --resume  # score (TPU)

The generated dataset has *exact* ground truth (analytic SDFs), so the
evaluated Chamfer/F-score measures the whole stack — DPT depth + intrinsics
prediction, unprojection/normalization, coordinate encoding, implicit
decoding, marching cubes, surface sampling, and the Chamfer harness — with
genuinely trained weights rather than random init.
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

    root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/overfit_data"
    t0 = time.time()
    base = generate_dataset(
        root, n_objects=5, n_views=8, H=224, seed=0,
        n_pc_points=10000, n_sdf_points=20000, val_views=1,
    )
    print(f"wrote {base} in {time.time()-t0:.1f} s")


if __name__ == "__main__":
    main()
