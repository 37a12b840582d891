"""MiDaS-loss cost on chip: bisection median vs full-sort median.

Times ``jax.value_and_grad(midas_loss)`` at the depth-pretrain shape
([B, 1, 224, 224], reference batch 44) with the shipped 32-step bit-space
bisection median vs the full-sort formulation, same inputs, same process.
The two are bit-identical in value (tests/test_losses.py); this measures
the step-time difference that justified the swap.

Run: python scripts/bench_midas.py [B ...] (default 8 44). Env: REPS (7).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from zeroshape_tpu import losses


def timed(fn, args, reps):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [8, 44]
    reps = int(os.environ.get("REPS", "7"))
    H = 224
    rng = np.random.default_rng(0)
    for B in sizes:
        mask = np.zeros((B, 1, H, H), np.float32)
        mask[:, :, 40:190, 50:200] = 1.0
        gt = (rng.uniform(0.4, 1.2, (B, 1, H, H)) * mask).astype(np.float32)
        pred = np.clip(gt + rng.normal(0, 0.05, gt.shape), 0, None).astype(np.float32)
        args = (jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask))

        def loss_with(median_fn):
            def f(p, t, m):
                old = losses._masked_median
                losses._masked_median = median_fn
                try:
                    return losses.midas_loss(p, t, m, alpha=0.1)
                finally:
                    losses._masked_median = old

            return jax.jit(jax.value_and_grad(f))

        t_bis = timed(loss_with(losses._masked_median), args, reps)
        t_sort = timed(loss_with(losses._masked_median_sort), args, reps)
        v_b = loss_with(losses._masked_median)(*args)[0]
        v_s = loss_with(losses._masked_median_sort)(*args)[0]
        print(
            f"B={B}: midas fwd+bwd bisection {t_bis*1e3:.1f} ms vs sort "
            f"{t_sort*1e3:.1f} ms ({t_sort/t_bis:.2f}x); values "
            f"{float(v_b):.6f} / {float(v_s):.6f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
