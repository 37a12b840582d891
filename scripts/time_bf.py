"""Brute-force alignment parameter sweep on the real chip.

Times brute_force_search over rot_batch and prune settings, checking that the
selected best CD stays identical across variants.
Run: python scripts/time_bf.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

from zeroshape_tpu.metrics import eval3d

N = 10000


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, *args, n=5):
    sync(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    rng = np.random.default_rng(0)
    # two blobby clouds so the best rotation is nontrivial
    pred = rng.normal(size=(N, 3)).astype(np.float32)
    pred[:, 0] *= 2.0
    gt = rng.normal(size=(N, 3)).astype(np.float32)
    gt[:, 1] *= 2.0
    pred, gt = jax.numpy.asarray(pred), jax.numpy.asarray(gt)

    ref_cd = None
    for rot_batch, prune in [
        (48, (1024, 128)),
        (128, (1024, 128)),
        (128, (512, 128)),
        (128, (1024, 64)),
        (256, (1024, 128)),
    ]:
        fn = lambda p, g, rb=rot_batch, pr=prune: eval3d.brute_force_search(
            p, g, rot_batch=rb, prune=pr
        )
        t = timeit(fn, pred, gt)
        out = fn(pred, gt)
        cd = float((out["acc"] + out["comp"]) / 2.0)
        if ref_cd is None:
            ref_cd = cd
        same = "SAME" if abs(cd - ref_cd) < 1e-6 else f"DIFF({cd:.6f} vs {ref_cd:.6f})"
        print(f"rot_batch={rot_batch} prune={prune}: {t * 1e3:.0f} ms  cd={cd:.6f} {same}",
              flush=True)


if __name__ == "__main__":
    main()
